"""Batched host→device data loading built on Grain.

Replaces the reference's torch DataLoader + worker processes + collate_fn
(utils/datasets.py:95-156): Grain gives multi-process prefetch; collation is
a fixed-shape stack (targets are already padded per-sample), so the device
feed never changes shape between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator

import numpy as np

from .dota import DotaDataset


@dataclasses.dataclass
class Batch:
    image: np.ndarray  # (B, H, W, 3) uint8 RGB
    targets: np.ndarray  # (B, M, 186) f32
    target_mask: np.ndarray  # (B, M) bool
    index: np.ndarray  # (B,) int32
    orig_hw: np.ndarray | None = None  # (B, 2) int32, eval only


def _stack(samples) -> Batch:
    keys = samples[0].keys()
    out = {k: np.stack([s[k] for s in samples]) for k in keys}
    return Batch(
        image=out["image"],
        targets=out["targets"],
        target_mask=out["target_mask"],
        index=out["index"],
        orig_hw=out.get("orig_hw"),
    )


def create_dataloader(
    dataset: DotaDataset,
    batch_size: int,
    shuffle: bool = True,
    augment: bool = True,
    seed: int = 0,
    num_workers: int = 0,
    num_epochs: int | None = None,
    drop_remainder: bool = True,
    indices=None,
    shard_index: int = 0,
    shard_count: int = 1,
) -> Iterator[Batch]:
    """Iterate fixed-shape batches.

    With ``num_workers > 0`` uses Grain multi-process prefetch; otherwise an
    in-process generator (useful for tests and small jobs).
    ``indices`` overrides the epoch's sample order (e.g. image-weighted
    resampling, reference train.py:278-281).
    ``shard_index``/``shard_count`` slice the epoch across training
    processes (multi-host data parallelism): every process runs the same
    seeded shuffle and takes the strided ``order[shard_index::shard_count]``
    slice — the reference's DistributedSampler semantics
    (utils/datasets.py:114).  ``batch_size`` is the PER-PROCESS size.
    """
    if indices is not None:
        indices = np.asarray(indices, np.int64)
    if num_workers > 0:
        import grain.python as gp

        ds = dataset

        remap = indices

        class _Sample(gp.RandomMapTransform):
            def random_map(self, i, rng: np.random.Generator):
                j = int(remap[int(i)]) if remap is not None else int(i)
                return (
                    ds.get_train_sample(j, rng)
                    if augment
                    else ds.get_eval_sample(j)
                )

        n_rec = len(indices) if indices is not None else len(dataset)
        source = gp.RangeDataSource(start=0, stop=n_rec, step=1)
        sampler = gp.IndexSampler(
            num_records=n_rec,
            shard_options=(
                gp.ShardOptions(shard_index=shard_index,
                                shard_count=shard_count,
                                drop_remainder=drop_remainder)
                if shard_count > 1 else gp.NoSharding()
            ),
            shuffle=shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        loader = gp.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[
                _Sample(),
                gp.Batch(batch_size=batch_size, drop_remainder=drop_remainder),
            ],
            worker_count=num_workers,
        )
        for b in loader:
            yield Batch(
                image=b["image"],
                targets=b["targets"],
                target_mask=b["target_mask"],
                index=b["index"],
                orig_hw=b.get("orig_hw"),
            )
        return

    # in-process path
    rng = np.random.default_rng(seed)
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = indices.copy() if indices is not None else np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        if shard_count > 1:
            order = order[shard_index::shard_count]
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            if drop_remainder and len(idxs) < batch_size:
                break
            samples = [
                dataset.get_train_sample(int(i), rng)
                if augment
                else dataset.get_eval_sample(int(i))
                for i in idxs
            ]
            yield _stack(samples)
        epoch += 1
