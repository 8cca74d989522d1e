"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit tests run on
8 virtual CPU devices instead (same XLA partitioner code paths).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The container's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu"; flip the default back to CPU for the unit suite
# (the TPU path is exercised by bench.py and the integration scripts).
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def build_mini_dota(root, n_images=4, n_boxes=5, hw=(340, 460), seed=7,
                    difficult_last=True):
    """Create a synthetic DOTA-format dataset (images/ + labelTxt/) on disk."""
    import cv2

    from yolov5_obb_tpu.data.dota import DOTA_V1_NAMES
    from yolov5_obb_tpu.ops.geometry import rbox2poly

    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir(exist_ok=True)
    (root / "labelTxt").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = hw
    for k in range(n_images):
        img = np.full((h, w, 3), 90, np.uint8)
        lines = ["imagesource:synthetic", "gsd:1.0"]
        for b in range(n_boxes):
            cx, cy = rng.uniform(60, w - 60), rng.uniform(60, h - 60)
            l, s = rng.uniform(40, 90), rng.uniform(18, 36)
            t = rng.uniform(-np.pi / 2, np.pi / 2)
            poly = rbox2poly(np.array([[cx, cy, l, s, t]]))[0]
            pts = poly.reshape(4, 2).astype(np.int32)
            cv2.fillPoly(img, [pts], color=tuple(int(v) for v in rng.integers(100, 255, 3)))
            name = DOTA_V1_NAMES[int(rng.integers(0, 15))]
            diff = "2" if (difficult_last and b == n_boxes - 1) else "0"
            lines.append(" ".join(f"{v:.1f}" for v in poly) + f" {name} {diff}")
        cv2.imwrite(str(root / "images" / f"im{k}.png"), img)
        (root / "labelTxt" / f"im{k}.txt").write_text("\n".join(lines))
    return root


@pytest.fixture(scope="session")
def mini_dota_session(tmp_path_factory):
    return build_mini_dota(tmp_path_factory.mktemp("dota_e2e"))
