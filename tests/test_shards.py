"""Pre-augmented shard cache (--cache shards): build, replay, train smoke.

Reference counterpart: utils/datasets.py:496-514 caches *resized* images
only and still pays mosaic/affine/HSV per step; the shard cache moves the
whole augmentation offline (see yolov5_obb_tpu/data/shards.py).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="module")
def shard_pool(mini_dota_session, tmp_path_factory):
    from yolov5_obb_tpu.data.dota import DOTA_V1_NAMES, DotaDataset
    from yolov5_obb_tpu.data.shards import ShardDataset, write_shards
    from yolov5_obb_tpu.utils.general import load_hyp

    out = tmp_path_factory.mktemp("shards")
    ds = DotaDataset(
        mini_dota_session / "images", DOTA_V1_NAMES, img_size=128,
        hyp=load_hyp(None), augment=True, max_labels=16,
        cache_dir=out / "cache",
    )
    sdir = write_shards(ds, out / "pool", aug_epochs=3, seed=0,
                        shard_size=5, verbose=False)
    return ds, ShardDataset(sdir)


def test_shard_pool_layout(shard_pool):
    ds, sds = shard_pool
    assert len(sds) == 3 * len(ds)
    assert sds.n_source == len(ds)
    # row v*n+i replays source i with fixed shapes/dtypes
    for v in range(3):
        for i in (0, len(ds) - 1):
            s = sds.get_train_sample(v * len(ds) + i, None)
            assert s["image"].shape == (128, 128, 3)
            assert s["image"].dtype == np.uint8
            assert s["targets"].shape == (16, 186)
            assert s["targets"].dtype == np.float32
            assert s["target_mask"].shape == (16,)
            assert int(s["index"]) == i
    # variants of the same source are distinct augmentations
    a = sds.get_train_sample(0, None)["image"]
    b = sds.get_train_sample(len(ds), None)["image"]
    assert not np.array_equal(a, b)


def test_epoch_indices_cover_each_source_once(shard_pool):
    ds, sds = shard_pool
    idx = sds.epoch_indices(epoch=0, seed=0)
    assert len(idx) == sds.n_source
    assert sorted(i % sds.n_source for i in idx) == list(range(sds.n_source))
    assert all(0 <= i < len(sds) for i in idx)
    # different epochs draw different variant mixes (w.h.p.)
    idx2 = sds.epoch_indices(epoch=1, seed=0)
    assert not np.array_equal(np.sort(idx), np.sort(idx2))
    # image-weighted resampling indices pass through
    src = np.array([0, 0, 1])
    idx3 = sds.epoch_indices(epoch=0, seed=0, source_indices=src)
    assert sorted(i % sds.n_source for i in idx3) == [0, 0, 1]


def test_loader_over_shards(shard_pool):
    from yolov5_obb_tpu.data.loader import create_dataloader

    _, sds = shard_pool
    idx = sds.epoch_indices(epoch=0, seed=1)
    batches = list(create_dataloader(
        sds, 2, shuffle=False, augment=True, seed=0, num_epochs=1,
        indices=idx, drop_remainder=True))
    assert batches and batches[0].image.shape == (2, 128, 128, 3)
    assert batches[0].targets.shape == (2, 16, 186)


@pytest.mark.slow
def test_train_with_shard_cache(mini_dota_session, tmp_path):
    import train as train_cli

    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text(
        f"path: {mini_dota_session}\ntrain: images\nval: images\nnc: 15\n"
        "names: [plane, baseball-diamond, bridge, ground-track-field,\n"
        "        small-vehicle, large-vehicle, ship, tennis-court,\n"
        "        basketball-court, storage-tank, soccer-ball-field,\n"
        "        roundabout, harbor, swimming-pool, helicopter]\n"
    )
    opt = types.SimpleNamespace(
        cfg="yolov5n.yaml", data=str(data_yaml), hyp=None, weights="",
        epochs=2, batch_size=2, nominal_batch=64, imgsz=128, max_labels=16,
        workers=0, dtype="float32", seed=0, noval=True, nosave=False,
        val_images=None, save_period=-1, patience=100, linear_lr=False,
        image_weights=False, adam=False, resume="", log_interval=100,
        project=str(tmp_path / "runs/train"), name="exp", exist_ok=True,
        cache="shards", aug_epochs=2,
    )
    save_dir, _, _ = train_cli.run(opt)
    # the pool was built once and reused on epoch 2
    sdir = save_dir / "cache" / "shards"
    assert (sdir / "meta.json").exists()
    assert (save_dir / "results.csv").exists()
    lines = (save_dir / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3
