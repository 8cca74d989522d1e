"""Pre-augmented shard cache: replay training samples at memory bandwidth.

The reference's ``--cache disk`` saves *resized source images*
(reference utils/datasets.py:496-514) and still pays mosaic + warp + HSV
every step — ~38 ms/img per core at 1024px on this host
(tools/bench_train_pipeline.py), starving a 93 img/s device below ~4
cores.  This cache moves the augmentation offline instead: a pool of
``aug_epochs`` pre-augmented variants of every sample is generated once
(embarrassingly parallel across cores/machines) and packed into
memory-mappable ``.npy`` shards; the training loader then replays shuffled
variants with a plain memcpy per sample.

Like the reference's cache this trades augmentation freshness for
throughput: with a few pool epochs the variant cycle is long enough that
short-to-medium runs never replay an identical epoch (each epoch draws a
fresh variant of each source image).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def write_shards(dataset, out_dir, aug_epochs: int = 4, seed: int = 0,
                 shard_size: int = 64, verbose: bool = True) -> Path:
    """Generate ``aug_epochs`` augmented variants per sample into shards.

    Layout: ``meta.json`` + per-shard ``img_NNNN.npy`` (S,H,W,3 u8),
    ``tgt_NNNN.npy`` (S,M,186 f32), ``msk_NNNN.npy`` (S,M bool).
    Variant ``v`` of source ``i`` is row ``v * len(dataset) + i``.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(dataset)
    total = n * aug_epochs
    files = []
    buf_i, buf_t, buf_m = [], [], []
    shard = 0

    def flush():
        nonlocal shard
        if not buf_i:
            return
        np.save(out / f"img_{shard:04d}.npy", np.stack(buf_i))
        np.save(out / f"tgt_{shard:04d}.npy", np.stack(buf_t))
        np.save(out / f"msk_{shard:04d}.npy", np.stack(buf_m))
        files.append(len(buf_i))
        buf_i.clear(), buf_t.clear(), buf_m.clear()
        shard += 1

    rng = np.random.default_rng(seed)
    for v in range(aug_epochs):
        for i in range(n):
            s = dataset.get_train_sample(i, rng)
            buf_i.append(np.ascontiguousarray(s["image"]))
            buf_t.append(s["targets"])
            buf_m.append(s["target_mask"])
            if len(buf_i) >= shard_size:
                flush()
        if verbose:
            print(f"[shards] variant epoch {v + 1}/{aug_epochs} packed")
    flush()
    meta = dict(n_source=n, total=total, aug_epochs=aug_epochs,
                shard_sizes=files, seed=seed)
    (out / "meta.json").write_text(json.dumps(meta))
    return out


class ShardDataset:
    """Memory-mapped replay of a shard pool, loader-compatible
    (``get_train_sample(i, rng)`` like DotaDataset — rng unused, the
    augmentation already happened offline)."""

    def __init__(self, shard_dir):
        self.dir = Path(shard_dir)
        self.meta = json.loads((self.dir / "meta.json").read_text())
        self.n_source = int(self.meta["n_source"])
        self.aug_epochs = int(self.meta["aug_epochs"])
        sizes = self.meta["shard_sizes"]
        self._starts = np.cumsum([0] + sizes)
        self._mm = {}

    def __len__(self):
        return int(self.meta["total"])

    def _maps(self, shard: int):
        if shard not in self._mm:
            self._mm[shard] = tuple(
                np.load(self.dir / f"{p}_{shard:04d}.npy", mmap_mode="r")
                for p in ("img", "tgt", "msk")
            )
        return self._mm[shard]

    def get_train_sample(self, index: int, rng=None):
        shard = int(np.searchsorted(self._starts, index, side="right") - 1)
        row = index - int(self._starts[shard])
        img, tgt, msk = self._maps(shard)
        return {
            "image": np.asarray(img[row]),
            "targets": np.asarray(tgt[row]),
            "target_mask": np.asarray(msk[row]),
            "index": np.int32(index % self.n_source),
        }

    def epoch_indices(self, epoch: int, seed: int = 0,
                      source_indices=None) -> np.ndarray:
        """One epoch = a fresh variant of each source image (or of
        ``source_indices``, e.g. image-weighted resampling), shuffled."""
        rng = np.random.default_rng(seed + epoch)
        src = (np.arange(self.n_source) if source_indices is None
               else np.asarray(source_indices, np.int64))
        variants = rng.integers(0, self.aug_epochs, len(src))
        idx = variants * self.n_source + src
        rng.shuffle(idx)
        return idx
