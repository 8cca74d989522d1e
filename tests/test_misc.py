"""Tests for support components: fuse, DOTA API, autoanchor, metrics, tools."""

import numpy as np
import pytest

from yolov5_obb_tpu.utils.autoanchor import (
    best_possible_recall,
    kmean_anchors,
)
from yolov5_obb_tpu.utils.metrics import ap_per_class, compute_ap, process_batch_hbb


def test_compute_ap_perfect_and_zero():
    ap, _, _ = compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert ap == pytest.approx(1.0, abs=1e-6)
    ap0, _, _ = compute_ap(np.array([0.0, 0.0]), np.array([0.0, 0.0]))
    assert ap0 < 0.05


def test_ap_per_class_simple():
    # 2 preds, both TP at every IoU threshold, one class, 2 GT
    tp = np.ones((2, 10), bool)
    conf = np.array([0.9, 0.8])
    pred_cls = np.zeros(2)
    target_cls = np.zeros(2)
    p, r, ap, f1, cls = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap.shape == (1, 10)
    assert ap[0, 0] > 0.99
    assert cls.tolist() == [0]


def test_process_batch_one_to_one():
    det = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    gt = np.array([[0, 0, 10, 10]], float)
    tp = process_batch_hbb(det, np.array([0.9, 0.8]), np.zeros(2), gt,
                           np.zeros(1), np.linspace(0.5, 0.95, 10))
    assert tp[0].all() and not tp[1].any()


def test_kmean_anchors_improves_bpr(rng):
    wh = np.abs(rng.normal(0, 1, (400, 2))) * [40, 20] + 4
    bad = np.array([[500.0, 500.0]] * 9)
    bpr_bad, _ = best_possible_recall(wh, bad)
    k = kmean_anchors(wh, n=9, gen=50, seed=0)
    bpr_new, _ = best_possible_recall(wh, k)
    assert k.shape == (9, 2)
    assert bpr_new > bpr_bad
    assert bpr_new > 0.95


def test_fuse_conv_bn_preserves_output():
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.fuse import fuse_conv_bn, model_info

    model, variables, meta = create_model("yolov5n.yaml", nc=2, imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    # make BN stats non-trivial
    _, upd = model.apply(variables, x * 3 + 1, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}
    want = model.apply(variables, x, train=False)

    fused = fuse_conv_bn(variables)
    got = model.apply(fused, x, train=False)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    info = model_info(variables)
    assert info["params_M"] > 1.0


def test_dota_api(mini_dota_session):
    from yolov5_obb_tpu.devkit.dota_api import DOTA, parse_dota_poly, parse_dota_rec

    api = DOTA(mini_dota_session)
    ids = api.get_img_ids()
    assert len(ids) == 4
    anns = api.load_anns(img_id=ids[0])
    assert len(anns) == 5  # difficult-2 boxes included in raw API
    rec = parse_dota_rec(mini_dota_session / "labelTxt" / f"{ids[0]}.txt")
    assert all(o["bndbox"][0] <= o["bndbox"][2] for o in rec)
    img = api.show_anns(ids[0])
    assert img is not None and img.ndim == 3


def test_dataset_tools(mini_dota_session, tmp_path):
    from yolov5_obb_tpu.data.tools import autosplit, dataset_stats, extract_boxes

    files = autosplit(mini_dota_session / "images", weights=(0.5, 0.5, 0.0))
    assert sum(f.exists() for f in files) >= 1
    out, n = extract_boxes(mini_dota_session / "images", tmp_path / "cls")
    assert n > 0 and any(out.iterdir())

    data_yaml = tmp_path / "d.yaml"
    data_yaml.write_text(
        f"path: {mini_dota_session}\ntrain: images\nnc: 15\n"
        "names: [plane, baseball-diamond, bridge, ground-track-field, small-vehicle,\n"
        "        large-vehicle, ship, tennis-court, basketball-court, storage-tank,\n"
        "        soccer-ball-field, roundabout, harbor, swimming-pool, helicopter]\n"
    )
    stats = dataset_stats(data_yaml)
    assert stats["train"]["image_count"] == 4


def test_callbacks_registry():
    from yolov5_obb_tpu.utils.callbacks import Callbacks

    cb = Callbacks()
    hits = []
    cb.register_action("on_train_start", "t", lambda: hits.append(1))
    cb.run("on_train_start")
    assert hits == [1]
    with pytest.raises(ValueError):
        cb.register_action("nope", "x", lambda: None)


def test_verify_images_quarantine(tmp_path):
    import cv2

    from yolov5_obb_tpu.data.dota import DotaDataset, DOTA_V1_NAMES

    (tmp_path / "images").mkdir()
    (tmp_path / "labelTxt").mkdir()
    ok = np.full((64, 64, 3), 120, np.uint8)
    cv2.imwrite(str(tmp_path / "images/good.png"), ok)
    (tmp_path / "images/bad.png").write_bytes(b"not an image at all")
    (tmp_path / "labelTxt/good.txt").write_text("")

    ds = DotaDataset(tmp_path / "images", DOTA_V1_NAMES, img_size=64, verify=True)
    assert len(ds) == 1
    assert ds.img_files[0].endswith("good.png")


def test_remat_step_matches(rng):
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import create_train_state, make_train_step
    from yolov5_obb_tpu.models.yolo import create_model
    import jax

    model, variables, meta = create_model("yolov5n.yaml", nc=2, imgsz=64)
    loss_fn = ComputeLoss(meta)
    tx, _ = build_optimizer(variables["params"], {}, epochs=2, steps_per_epoch=2,
                            batch_size=64)
    img = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    targets = np.zeros((2, 4, 186), np.float32)
    targets[:, 0, 1:6] = [32, 32, 20, 10, 0.2]
    targets[:, 0, 6 + 101] = 1.0
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True

    v1 = jax.tree.map(jnp.copy, variables)
    v2 = jax.tree.map(jnp.copy, variables)
    s1 = create_train_state(v1, tx)
    s2 = create_train_state(v2, tx)
    step_plain = make_train_step(model, loss_fn, tx)
    step_remat = make_train_step(model, loss_fn, tx, remat=True)
    _, m1 = step_plain(s1, jnp.asarray(img), jnp.asarray(targets), jnp.asarray(mask))
    _, m2 = step_remat(s2, jnp.asarray(img), jnp.asarray(targets), jnp.asarray(mask))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_freeze_zeroes_updates(rng):
    import jax
    import jax.numpy as jnp

    from yolov5_obb_tpu.engine.loss import ComputeLoss
    from yolov5_obb_tpu.engine.optim import build_optimizer
    from yolov5_obb_tpu.engine.trainer import create_train_state, make_train_step
    from yolov5_obb_tpu.models.yolo import create_model

    model, variables, meta = create_model("yolov5n.yaml", nc=2, imgsz=64)
    loss_fn = ComputeLoss(meta)
    tx, _ = build_optimizer(variables["params"], {}, epochs=2, steps_per_epoch=2,
                            batch_size=64, freeze=3)
    state = create_train_state(variables, tx)
    before = {k: np.asarray(jax.tree.leaves(state.params[k])[0]).copy()
              for k in ("m0", "m1", "m2", "m4")}
    img = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    targets = np.zeros((2, 4, 186), np.float32)
    targets[:, 0, 1:6] = [32, 32, 20, 10, 0.2]
    targets[:, 0, 6 + 101] = 1.0
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    step = make_train_step(model, loss_fn, tx)
    state, _ = step(state, jnp.asarray(img), jnp.asarray(targets), jnp.asarray(mask))
    for k in ("m0", "m1", "m2"):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(state.params[k])[0]), before[k]
        )
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(state.params["m4"])[0]), before["m4"]
    )


def test_autobatch_sane():
    from yolov5_obb_tpu.utils.autobatch import autobatch

    b = autobatch(21_600_000, imgsz=1024, width_multiple=0.75,
                  depth_multiple=0.67, hbm_bytes=16 << 30)
    assert 4 <= b <= 64
    b_remat = autobatch(21_600_000, imgsz=1024, width_multiple=0.75,
                        depth_multiple=0.67, hbm_bytes=16 << 30, remat=True)
    assert b_remat >= b
    assert autobatch(21_600_000, imgsz=1024, width_multiple=0.75,
                     depth_multiple=0.67, hbm_bytes=1 << 28) == 1


def test_confusion_matrix_plot(tmp_path):
    from yolov5_obb_tpu.utils.metrics import ConfusionMatrix
    from yolov5_obb_tpu.utils.plots import plot_confusion_matrix

    cm = ConfusionMatrix(nc=3)
    det = np.array([[0, 0, 10, 10]], float)
    gt = np.array([[0, 0, 10, 10]], float)
    cm.process_batch(det, np.array([0.9]), np.array([1]), gt, np.array([1]))
    assert cm.matrix[1, 1] == 1
    out = plot_confusion_matrix(cm.matrix, ["a", "b", "c"], tmp_path / "cm.png")
    assert (tmp_path / "cm.png").exists()


def test_voc_xml_to_dota(tmp_path):
    from yolov5_obb_tpu.devkit.converters import voc_xml_to_dota

    (tmp_path / "xml").mkdir()
    (tmp_path / "xml/a.xml").write_text(
        "<annotation><object><name>feright car</name><difficult>0</difficult>"
        "<polygon><x1>1</x1><y1>2</y1><x2>3</x2><y2>2</y2>"
        "<x3>3</x3><y3>6</y3><x4>1</x4><y4>6</y4></polygon></object>"
        "<object><name>car</name><bndbox><xmin>10</xmin><ymin>10</ymin>"
        "<xmax>20</xmax><ymax>18</ymax></bndbox></object></annotation>"
    )
    out, n = voc_xml_to_dota(tmp_path / "xml", tmp_path / "dota")
    assert n == 1
    txt = (out / "a.txt").read_text().splitlines()
    assert txt[0].startswith("1.0 2.0 3.0 2.0 3.0 6.0 1.0 6.0 feright-car")
    assert "10.0 10.0 20.0 10.0 20.0 18.0 10.0 18.0 car" in txt[1]


def test_dota_to_mmdet_json(mini_dota_session, tmp_path):
    import json
    from pathlib import Path

    from yolov5_obb_tpu.devkit.converters import dota_to_mmdet_json

    out = dota_to_mmdet_json(mini_dota_session, tmp_path / "mm.json")
    recs = json.loads(Path(out).read_text())
    assert len(recs) == 4
    r = recs[0]
    assert set(r) >= {"filename", "height", "width", "id", "annotations"}
    ann = r["annotations"]
    assert len(ann["bboxes"]) == len(ann["labels"])
    for b in ann["bboxes"] + ann["bboxes_ignore"]:
        assert len(b) == 5  # [cx cy l s theta]
        assert b[2] >= b[3] - 1e-6  # long-edge convention


def test_bundled_configs_parse():
    """Every bundled hyp/dataset yaml loads and carries the required keys."""
    from pathlib import Path

    import yaml

    cfg_dir = Path("yolov5_obb_tpu/data/configs")
    hyps = sorted(cfg_dir.glob("hyp_*.yaml"))
    assert len(hyps) >= 4
    need = {"lr0", "lrf", "momentum", "box", "cls", "obj", "theta",
            "theta_pw", "cls_theta", "csl_radius", "anchor_t", "mosaic"}
    for h in hyps:
        d = yaml.safe_load(h.read_text())
        missing = need - d.keys()
        assert not missing, f"{h.name} missing {missing}"
        assert d["cls_theta"] == 180
    for ds in ("dotav1", "dotav15", "dotav2", "dronevehicle"):
        d = yaml.safe_load((cfg_dir / f"{ds}.yaml").read_text())
        assert len(d["names"]) == d["nc"], ds


def test_restore_model_meta_anchors():
    """Evolved anchors saved in checkpoint meta must restore into ModelMeta
    (regression: round-1 checkpoints decoded with config anchors after
    autoanchor evolution)."""
    from yolov5_obb_tpu.models.yolo import create_model
    from yolov5_obb_tpu.utils.checkpoint import restore_model_meta

    _, _, meta = create_model("yolov5n.yaml", nc=15, imgsz=128)
    evolved = np.asarray(meta.anchors_px) * 1.37 + 2.0
    ckpt_meta = {"anchors": evolved.tolist(), "names": ["a"] * 15}
    restore_model_meta(meta, ckpt_meta)
    np.testing.assert_allclose(meta.anchors_px, evolved, rtol=1e-6)
    # wrong shape → ignored, not crashed
    restore_model_meta(meta, {"anchors": [[1.0, 2.0]]})
    np.testing.assert_allclose(meta.anchors_px, evolved, rtol=1e-6)
    # no anchors key → no-op
    restore_model_meta(meta, {})
    np.testing.assert_allclose(meta.anchors_px, evolved, rtol=1e-6)


def test_disk_image_cache_keyed_by_dataset(mini_dota_session, tmp_path):
    """Two datasets sharing cache_dir must not share image npz files
    (regression: val lazily read train's cached image for index i)."""
    from yolov5_obb_tpu.data.dota import DotaDataset

    cache = tmp_path / "cache"
    names = [str(i) for i in range(15)]
    ds1 = DotaDataset(str(mini_dota_session / "images"), names, img_size=64,
                      max_labels=16, cache_images="disk", cache_dir=str(cache))
    # same images, different file list order → different dataset identity
    files = sorted(str(p) for p in (mini_dota_session / "images").glob("*.png"))
    lst = tmp_path / "subset.txt"
    lst.write_text("\n".join(files[:2]))
    ds2 = DotaDataset(str(lst), names, img_size=64, max_labels=16,
                      cache_images="disk", cache_dir=str(cache))
    assert ds1._disk_cache_dir != ds2._disk_cache_dir
