"""Data pipeline tests on a synthetic on-disk DOTA mini-dataset."""

import numpy as np
import pytest

from yolov5_obb_tpu.data.dota import (
    DOTA_V1_NAMES,
    DotaDataset,
    img2label_path,
    parse_dota_annotation,
)
from yolov5_obb_tpu.data.loader import create_dataloader
from yolov5_obb_tpu.ops.geometry import rbox2poly

HYP = {
    "mosaic": 1.0, "mixup": 0.0, "degrees": 180.0, "translate": 0.1,
    "scale": 0.25, "shear": 0.0, "perspective": 0.0, "flipud": 0.5,
    "fliplr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
    "csl_radius": 2.0, "copy_paste": 0.0,
}


@pytest.fixture(scope="module")
def mini_dota(tmp_path_factory):
    from conftest import build_mini_dota

    return build_mini_dota(tmp_path_factory.mktemp("dota"))


def test_label_path_mapping():
    assert img2label_path("/d/images/P01.png") == "/d/labelTxt/P01.txt"
    assert img2label_path("/d/images/sub/P01.png") == "/d/labelTxt/sub/P01.txt"


def test_parse_drops_difficult2(mini_dota):
    name_to_id = {n: i for i, n in enumerate(DOTA_V1_NAMES)}
    polys, cls = parse_dota_annotation(
        mini_dota / "labelTxt" / "im0.txt", name_to_id
    )
    assert polys.shape == (4, 8)  # 5 written, 1 difficult-2 dropped
    assert cls.shape == (4,)


def test_eval_sample_shapes(mini_dota):
    ds = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=256, hyp=HYP,
        augment=False, max_labels=32,
    )
    assert len(ds) == 4
    s = ds.get_eval_sample(0)
    assert s["image"].shape == (256, 256, 3) and s["image"].dtype == np.uint8
    assert s["targets"].shape == (32, 186)
    n = int(s["target_mask"].sum())
    assert n == 4
    rb = s["targets"][:n, 1:6]
    assert (rb[:, 0] >= 0).all() and (rb[:, 0] < 256).all()
    assert (rb[:, 2] >= rb[:, 3]).all()  # long-edge convention
    # CSL peak must be 1 at theta bin
    csl = s["targets"][:n, 6:]
    np.testing.assert_allclose(csl.max(axis=1), 1.0)
    peak = csl.argmax(axis=1)
    want = np.round(rb[:, 4] * 180 / np.pi + 90)
    assert (np.abs(peak - want) <= 1).all()


def test_train_sample_mosaic(mini_dota):
    ds = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=256, hyp=HYP,
        augment=True, max_labels=64,
    )
    rng = np.random.default_rng(3)
    for _ in range(4):
        s = ds.get_train_sample(0, rng)
        assert s["image"].shape == (256, 256, 3)
        assert s["targets"].shape == (64, 186)
        n = int(s["target_mask"].sum())
        if n:
            rb = s["targets"][:n, 1:6]
            assert (rb[:, 2] >= rb[:, 3] - 1e-3).all()
            assert np.isfinite(rb).all()


def test_loader_batches(mini_dota):
    ds = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=128, hyp=HYP,
        augment=True, max_labels=16,
    )
    it = create_dataloader(ds, batch_size=2, num_epochs=1, seed=0)
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b.image.shape == (2, 128, 128, 3)
    assert b.targets.shape == (2, 16, 186)
    assert b.target_mask.shape == (2, 16)


def test_loader_grain_workers(mini_dota):
    ds = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=128, hyp=HYP,
        augment=False, max_labels=16,
    )
    it = create_dataloader(
        ds, batch_size=2, num_epochs=1, seed=0, num_workers=2, augment=False,
        shuffle=False,
    )
    b = next(iter(it))
    assert b.image.shape == (2, 128, 128, 3)
    assert b.orig_hw is not None and b.orig_hw.shape == (2, 2)


def test_label_cache_roundtrip(mini_dota, tmp_path):
    ds1 = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=128, cache_dir=tmp_path
    )
    ds2 = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=128, cache_dir=tmp_path
    )
    for a, b in zip(ds1.polys, ds2.polys):
        np.testing.assert_array_equal(a, b)


def test_load_streams_from_video_file(tmp_path):
    import cv2

    from yolov5_obb_tpu.data.streams import LoadStreams, is_stream_source

    vid = tmp_path / "clip.avi"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 30, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(40):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    lst = tmp_path / "src.streams"
    lst.write_text(f"{vid}\n")
    assert is_stream_source(str(lst)) and is_stream_source("0") \
        and is_stream_source("rtsp://cam/live") and not is_stream_source("img.png")

    streams = LoadStreams(str(lst), max_frames=5)
    batches = list(streams)
    assert 1 <= len(batches) <= 5
    srcs, frames, fps = batches[0]
    assert len(frames) == 1 and frames[0].shape == (48, 64, 3)
    assert fps[0] > 0
    assert not any(streams.alive)


def test_loader_determinism(mini_dota):
    """Same seed → bit-identical augmented batches (incl. mosaic/perspective);
    different seed → different batches. SURVEY §7 step-6 determinism bar."""
    hyp = dict(HYP)
    hyp.update(mosaic=1.0, fliplr=0.5, degrees=10.0, scale=0.3)

    def epoch(seed):
        ds = DotaDataset(
            mini_dota / "images", DOTA_V1_NAMES, img_size=128, hyp=hyp,
            augment=True, max_labels=16,
        )
        it = create_dataloader(ds, batch_size=2, num_epochs=1, seed=seed,
                               shuffle=True)
        return list(it)

    a, b = epoch(7), epoch(7)
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba.image, bb.image)
        np.testing.assert_array_equal(ba.targets, bb.targets)
        np.testing.assert_array_equal(ba.target_mask, bb.target_mask)

    c = epoch(8)
    assert any(
        not np.array_equal(ba.image, bc.image) for ba, bc in zip(a, c)
    )


def test_single_cls_zeroes_classes(mini_dota):
    ds = DotaDataset(
        mini_dota / "images", DOTA_V1_NAMES, img_size=256, hyp=HYP,
        augment=False, max_labels=32, single_cls=True,
    )
    assert all((c == 0).all() for c in ds.cls)
    s = ds.get_eval_sample(0)
    n = int(s["target_mask"].sum())
    assert n > 0 and (s["targets"][:n, 0] == 0).all()


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_identical_and_isolated(mini_dota, tmp_path, mode):
    kw = dict(img_size=256, hyp=HYP, augment=False, max_labels=32,
              cache_dir=tmp_path / "cache")
    plain = DotaDataset(mini_dota / "images", DOTA_V1_NAMES, **kw)
    cached = DotaDataset(mini_dota / "images", DOTA_V1_NAMES,
                         cache_images=mode, **kw)
    for i in range(len(plain)):
        a = plain.load_image(i)
        b = cached.load_image(i)   # fills cache
        c = cached.load_image(i)   # cache hit
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[0], c[0])
        np.testing.assert_allclose(a[1], c[1])
        assert a[3] == c[3]
    # mutation of a returned image must not poison the cache
    img, *_ = cached.load_image(0)
    img[:] = 0
    img2, *_ = cached.load_image(0)
    assert img2.max() > 0


def test_extra_augment_shapes_and_determinism():
    """Optional photometric extras (reference albumentations block): pixel
    shapes preserved, polys untouched, deterministic under a seeded rng."""
    from yolov5_obb_tpu.data.augment import extra_augment

    base = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    a = base.copy()
    b = base.copy()
    extra_augment(a, np.random.default_rng(7), p=1.0)
    extra_augment(b, np.random.default_rng(7), p=1.0)
    assert a.shape == base.shape and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, base)  # p=1.0 → transforms applied
    c = base.copy()
    extra_augment(c, np.random.default_rng(7), p=0.0)
    np.testing.assert_array_equal(c, base)  # p=0 → no-op


def test_eval_pad_rect_canvas_roundtrip(mini_dota):
    """--rect-pad 0.5 canvas (reference rect-val bucket for square tiles,
    utils/datasets.py:470-492): content scale must equal the square mode's
    and the returned ratio_pad must map canvas coords back to original coords."""
    from yolov5_obb_tpu.ops.geometry import scale_polys

    sq = DotaDataset(mini_dota / "images", DOTA_V1_NAMES, img_size=256,
                     hyp=HYP, augment=False, max_labels=32)
    rc = DotaDataset(mini_dota / "images", DOTA_V1_NAMES, img_size=256,
                     hyp=HYP, augment=False, max_labels=32, eval_pad=0.5)
    assert rc.eval_canvas == 288  # ceil(256/32 + 0.5) * 32

    s_sq, s_rc = sq.get_eval_sample(0), rc.get_eval_sample(0)
    assert s_rc["image"].shape == (288, 288, 3)
    n = int(s_sq["target_mask"].sum())
    assert int(s_rc["target_mask"].sum()) == n

    # same content scale: rect targets = square targets + letterbox offset
    rb_sq = s_sq["targets"][:n, 1:6]
    rb_rc = s_rc["targets"][:n, 1:6]
    np.testing.assert_allclose(rb_rc[:, 2:4], rb_sq[:, 2:4], atol=1e-5)

    # ratio_pad maps canvas coords back to ORIGINAL image coords
    rp = s_rc["ratio_pad"]
    rp_arg = ((rp[0], rp[0]), (rp[1], rp[2]))
    from yolov5_obb_tpu.ops.geometry import rbox2poly

    polys_canvas = rbox2poly(rb_rc)
    polys_orig = scale_polys((288, 288), polys_canvas, None, rp_arg)
    # square path: recomputed-gain mapping (the original code path)
    polys_orig_sq = scale_polys((256, 256), rbox2poly(rb_sq), (340, 460))
    # sub-pixel agreement (int-rounded load resize makes the recomputed
    # square gain differ from the exact ratio by ~1e-3 → ≤0.5 px here)
    np.testing.assert_allclose(polys_orig, polys_orig_sq, atol=0.5)
