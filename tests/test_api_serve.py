"""AutoShape-style API + REST serving (reference AutoShape/restapi parity)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def obb_model():
    from yolov5_obb_tpu.api import OBBModel

    return OBBModel(cfg="yolov5n.yaml", names=[f"c{i}" for i in range(15)],
                    imgsz=128, conf_thres=0.01)


def test_api_single_and_batch(obb_model, tmp_path):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (100 + 20 * i, 160, 3), dtype=np.uint8)
            for i in range(3)]

    res1 = obb_model(imgs[0])  # single input
    assert len(res1.polys) == 1

    res3 = obb_model(imgs)  # odd batch → padded to 4 internally, 3 results out
    assert len(res3.polys) == 3
    dfs = res3.pandas()
    assert len(dfs) == 3
    for df in dfs:
        assert list(df.columns[:3]) == ["x1", "y1", "x2"] or len(df.columns) >= 8

    out = res3.save(tmp_path / "render")
    assert len(list((tmp_path / "render").glob("*.png"))) == 3 or out is not None


def test_api_input_breadth(obb_model, tmp_path, monkeypatch):
    """URL / PIL / torch / grayscale inputs (reference AutoShape,
    models/common.py:439-475) produce the same detections as the ndarray
    path for the same pixels."""
    import cv2

    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    ref = obb_model(bgr)

    def same(res):
        assert len(res.polys) == 1
        np.testing.assert_allclose(
            np.asarray(res.polys[0]), np.asarray(ref.polys[0]), atol=1e-4)

    # file path
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), bgr)
    same(obb_model(str(p)))

    # URL (http fetch monkeypatched — zero-egress container)
    png_bytes = cv2.imencode(".png", bgr)[1].tobytes()

    class _Resp:
        def read(self):
            return png_bytes

    import urllib.request as _ur
    monkeypatch.setattr(_ur, "urlopen", lambda url: _Resp())
    same(obb_model("https://example.com/img.png?raw=1"))

    # PIL (RGB convention)
    PIL = pytest.importorskip("PIL.Image")
    same(obb_model(PIL.fromarray(bgr[..., ::-1])))

    # torch tensors: HWC uint8 and CHW float in [0,1]
    torch = pytest.importorskip("torch")
    same(obb_model(torch.from_numpy(bgr.copy())))
    same(obb_model(torch.from_numpy(
        bgr.transpose(2, 0, 1).astype(np.float32) / 255.0)))

    # grayscale ndarray broadcasts to 3 channels and runs
    res = obb_model(bgr[..., 0])
    assert len(res.polys) == 1


def test_serve_http_roundtrip(obb_model):
    import cv2
    from http.server import ThreadingHTTPServer

    from yolov5_obb_tpu.serve import _Worker, make_handler

    worker = _Worker(obb_model, max_batch=4)
    worker.start()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        ok, blob = cv2.imencode(".png", img)
        assert ok

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/obb-detection",
                data=blob.tobytes(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())

        # concurrent posts exercise the dynamic batching path
        results = [None, None]

        def run(i):
            results[i] = post()

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for x in ts:
            x.start()
        for x in ts:
            x.join(timeout=180)
        for status, payload in results:
            assert status == 200
            assert isinstance(payload, list)

        # bad payload → 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/obb-detection",
            data=b"not an image", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_detections_crop(obb_model, tmp_path):
    from yolov5_obb_tpu.api import Detections

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 160, 3), dtype=np.uint8)
    # one rotated box: 40x20 at 30 degrees around (80, 50)
    t = np.deg2rad(30)
    c, s = np.cos(t), np.sin(t)
    base = np.array([[-20, -10], [20, -10], [20, 10], [-20, 10]], float)
    pts = base @ np.array([[c, -s], [s, c]]).T + [80, 50]
    det = Detections([img.copy()], [pts.reshape(1, 8)],
                     [np.array([0.9])], [np.array([2.0])],
                     [f"c{i}" for i in range(15)], [None])

    crops = det.crop(save_dir=tmp_path / "crops", rectify=True)
    assert len(crops) == 1 and len(crops[0]) == 1
    h, w = crops[0][0].shape[:2]
    assert abs(w - 40) <= 2 and abs(h - 20) <= 2  # rectified to box dims
    assert len(list((tmp_path / "crops").glob("*.png"))) == 1

    hbb_crops = det.crop(rectify=False)
    hh, ww = hbb_crops[0][0].shape[:2]
    assert ww > 40 and hh > 20  # axis-aligned cover is larger
