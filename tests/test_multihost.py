"""Multi-host (multi-process) training path.

The reference trains across machines via DDP (reference train.py:519-526,
docs/GetStart.md:60-63). Here: a real 2-process jax.distributed CPU cluster
runs the sharded train step (1 device per process, strided per-process data
slices — tests/multihost_worker.py) and its loss trajectory must equal the
single-process mesh(2) run on the same global batch: multi-host is pure
partitioning, no semantic change.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_loader_sharding_partitions_epoch(tmp_path, mini_dota_session):
    """Strided shards are disjoint and cover the epoch (DistributedSampler
    semantics, reference utils/datasets.py:114)."""
    from yolov5_obb_tpu.data.dota import DOTA_V1_NAMES, DotaDataset
    from yolov5_obb_tpu.data.loader import create_dataloader

    ds = DotaDataset(str(mini_dota_session), DOTA_V1_NAMES, img_size=64,
                     augment=False, max_labels=8, cache_dir=tmp_path / "c")
    seen = []
    for shard in range(2):
        for b in create_dataloader(ds, 2, shuffle=True, augment=False,
                                   seed=3, num_epochs=1, shard_index=shard,
                                   shard_count=2):
            seen.append(np.asarray(b.index))
    got = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(got, np.arange(len(ds)))


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    """Real 2-process jax.distributed run ≡ single-process mesh(2)."""
    port = _free_port()
    out = tmp_path / "losses.json"
    env = {
        **os.environ,
        "PYTHONPATH": REPO,  # drop the axon sitecustomize, keep the repo
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(out)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    multi = json.load(open(out))

    # single-process reference on a 2-device mesh, same global batch
    sys.path.insert(0, os.path.dirname(WORKER))
    from multihost_worker import run_steps

    from yolov5_obb_tpu.engine.trainer import make_mesh

    single = run_steps(make_mesh(2, platform="cpu"), local_slice=None)

    np.testing.assert_allclose(multi, single, rtol=2e-4, atol=2e-4)
