"""Devkit tests: split → merge → evaluate round trip on synthetic data."""

import numpy as np
import pytest

from yolov5_obb_tpu.devkit.converters import groundtruth_to_task1, json_to_task1
from yolov5_obb_tpu.devkit.evaluate import evaluate_maoe, evaluate_task1, voc_ap
from yolov5_obb_tpu.devkit.img_split import (
    clip_poly_to_tile,
    split_dataset,
    split_single_image,
)
from yolov5_obb_tpu.devkit.result_merge import (
    merge_by_poly_nms,
    parse_tile_name,
    poly_nms_np,
    results_obb2hbb,
)
from yolov5_obb_tpu.ops.geometry import rbox2poly

NAMES = ["plane", "ship"]


@pytest.fixture(scope="module")
def big_dota(tmp_path_factory):
    """One 1500x1900 image with well-separated boxes of 2 classes."""
    import cv2

    root = tmp_path_factory.mktemp("bigdota")
    (root / "images").mkdir()
    (root / "labelTxt").mkdir()
    rng = np.random.default_rng(5)
    h, w = 1500, 1900
    img = np.full((h, w, 3), 70, np.uint8)
    lines = []
    polys = []
    for k in range(12):
        cx = 120 + (k % 4) * 450 + rng.uniform(-30, 30)
        cy = 150 + (k // 4) * 500 + rng.uniform(-30, 30)
        l, s = rng.uniform(80, 140), rng.uniform(40, 60)
        t = rng.uniform(-np.pi / 2, np.pi / 2)
        poly = rbox2poly(np.array([[cx, cy, l, s, t]]))[0]
        polys.append(poly)
        cv2.fillPoly(img, [poly.reshape(4, 2).astype(np.int32)],
                     tuple(int(v) for v in rng.integers(120, 255, 3)))
        lines.append(" ".join(f"{v:.1f}" for v in poly) + f" {NAMES[k % 2]} 0")
    cv2.imwrite(str(root / "images" / "P0001.png"), img)
    (root / "labelTxt" / "P0001.txt").write_text("\n".join(lines))
    return root, np.array(polys)


def test_tile_name_roundtrip():
    assert parse_tile_name("P0001__1.0__824___0") == ("P0001", 1.0, 824, 0)
    assert parse_tile_name("P12__0.5__0___1648") == ("P12", 0.5, 0, 1648)
    assert parse_tile_name("P0001") == ("P0001", 1.0, 0, 0)


def test_clip_poly_to_tile_inside_and_straddle():
    poly = rbox2poly(np.array([[100.0, 100, 60, 30, 0.4]]))[0]
    clipped, flag = clip_poly_to_tile(poly, 0, 0, 512)
    assert flag == "" and np.allclose(clipped, poly, atol=1e-6)
    # straddling a boundary at x=120 → clipped + difficult when IoA < 0.7
    clipped, flag = clip_poly_to_tile(poly, 90, 0, 512)
    assert clipped is not None
    assert (clipped[0::2] >= -1e-6).all()


def test_split_and_merge_roundtrip(big_dota, tmp_path):
    root, gt_polys = big_dota
    out = tmp_path / "split"
    # x origins {0, 824, 876}, y origins {0, 476} → 6 tiles
    n = split_dataset(root, out, subsize=1024, gap=200, num_workers=1)
    assert n == 6
    tiles = sorted((out / "images").glob("*.png"))
    assert len(tiles) == 6
    labels = sorted((out / "labelTxt").glob("*.txt"))
    assert len(labels) == 6
    # every tile image is 1024x1024 (padding on)
    import cv2

    for t in tiles:
        assert cv2.imread(str(t)).shape[:2] == (1024, 1024)

    # fake per-tile detections = the tile ground truth with score 1
    # (skip the clipped difficult-2 boundary copies: with gap=200 > box size
    # every object is fully contained in at least one tile)
    raw = groundtruth_to_task1(
        out / "labelTxt", tmp_path / "task1_raw", NAMES, skip_difficult2=True
    )
    merged = tmp_path / "task1_merged"
    merge_by_poly_nms(raw, merged, nms_thresh=0.2, num_workers=1)

    image_ids = ["P0001"]
    mean_ap, classaps = evaluate_task1(
        merged, root / "labelTxt", image_ids, NAMES, ovthresh=0.5
    )
    assert mean_ap > 0.95, (mean_ap, classaps)

    maoe, per_cls = evaluate_maoe(merged, root / "labelTxt", image_ids, NAMES)
    assert maoe < 5.0, (maoe, per_cls)

    # obb→hbb conversion emits Task2 files
    results_obb2hbb(merged, tmp_path / "task2")
    assert len(list((tmp_path / "task2").glob("Task2_*.txt"))) == 2


def test_poly_nms_suppresses_duplicates():
    base = rbox2poly(np.array([[100.0, 100, 60, 30, 0.3]]))[0]
    shifted = rbox2poly(np.array([[102.0, 100, 60, 30, 0.3]]))[0]
    far = rbox2poly(np.array([[400.0, 400, 60, 30, 0.3]]))[0]
    polys = np.stack([base, shifted, far])
    keep = poly_nms_np(polys, np.array([0.9, 0.8, 0.7]), 0.3)
    assert keep == [0, 2]


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)


def test_json_to_task1(tmp_path):
    import json

    dets = [
        {"image_id": "P1", "category_id": 0, "score": 0.9,
         "poly": [0, 0, 10, 0, 10, 5, 0, 5], "bbox": [5, 2.5, 10, 5],
         "file_name": "P1"},
        {"image_id": "P1", "category_id": 1, "score": 0.5,
         "poly": [20, 20, 30, 20, 30, 25, 20, 25], "bbox": [25, 22.5, 10, 5],
         "file_name": "P1"},
    ]
    jp = tmp_path / "preds.json"
    jp.write_text(json.dumps(dets))
    out = json_to_task1(jp, tmp_path / "task1", NAMES)
    assert (out / "Task1_plane.txt").read_text().startswith("P1 0.90000")
    assert "P1 0.50000" in (out / "Task1_ship.txt").read_text()


def test_coco_eval_bbox_perfect_and_degraded(tmp_path):
    """COCOeval-lite: perfect predictions → AP 1.0; wrong-class or shifted
    predictions degrade it (reference val.py:299-323 pycocotools branch)."""
    import json

    from yolov5_obb_tpu.devkit.coco_eval import coco_eval_bbox

    gt = {
        "images": [{"id": 1, "file_name": "a.png", "height": 200, "width": 200},
                   {"id": 2, "file_name": "b.png", "height": 200, "width": 200}],
        "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 20], "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2, "bbox": [100, 100, 30, 30], "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1, "bbox": [50, 60, 20, 40], "iscrowd": 0},
        ],
    }

    def pred(img_stem, cid0, bbox_tl, score):
        x, y, w, h = bbox_tl
        return {"image_id": img_stem, "category_id": cid0,
                "bbox": [x + w / 2, y + h / 2, w, h], "score": score}

    perfect = [pred("a", 0, [10, 10, 40, 20], 0.9),
               pred("a", 1, [100, 100, 30, 30], 0.8),
               pred("b", 0, [50, 60, 20, 40], 0.95)]
    res = coco_eval_bbox(gt, perfect)
    assert res["map"] == pytest.approx(1.0, abs=1e-6)
    assert res["map50"] == pytest.approx(1.0, abs=1e-6)

    wrong_cls = [dict(p, category_id=1 - p["category_id"]) for p in perfect]
    res_w = coco_eval_bbox(gt, wrong_cls)
    assert res_w["map"] < 0.5

    shifted = [dict(p, bbox=[p["bbox"][0] + 3, p["bbox"][1] + 3,
                             p["bbox"][2], p["bbox"][3]]) for p in perfect]
    res_s = coco_eval_bbox(gt, shifted)
    assert res_s["map50"] > res_s["map"] >= 0.0
    assert res_s["map"] < res["map"]


@pytest.mark.parametrize("classnames", [["ship"], ["car", "airplane"]])
def test_evaluate_task1_other_datasets(tmp_path, classnames):
    """hrsc2016 (single 'ship' class) and ucasaod ('car'/'airplane') class
    lists through the parameterized evaluator (reference
    hrsc2016_evaluation.py:87 / ucasaod_evaluation.py:87): perfect
    detections → AP 1.0 per class."""
    rng = np.random.default_rng(42)
    anno = tmp_path / "labelTxt"
    det = tmp_path / "dets"
    anno.mkdir()
    det.mkdir()
    det_files = {c: [] for c in classnames}
    ids = []
    for k in range(3):
        img_id = f"IM{k:04d}"
        ids.append(img_id)
        lines = []
        for b in range(4):
            cx, cy = rng.uniform(100, 900, 2)
            l, s = rng.uniform(60, 120), rng.uniform(20, 50)
            t = rng.uniform(-np.pi / 2, np.pi / 2)
            poly = rbox2poly(np.array([[cx, cy, l, s, t]]))[0]
            cls = classnames[b % len(classnames)]
            lines.append(" ".join(f"{v:.1f}" for v in poly) + f" {cls} 0")
            det_files[cls].append(
                f"{img_id} {rng.uniform(0.5, 1.0):.3f} "
                + " ".join(f"{v:.1f}" for v in poly))
        (anno / f"{img_id}.txt").write_text("\n".join(lines))
    for c, rows in det_files.items():
        (det / f"Task1_{c}.txt").write_text("\n".join(rows))
    mean_ap, classaps = evaluate_task1(det, anno, ids, classnames)
    assert mean_ap == pytest.approx(1.0, abs=1e-6)
    for c in classnames:
        assert classaps[c] == pytest.approx(1.0, abs=1e-6)
