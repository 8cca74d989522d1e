"""Export tests: StableHLO serialize/deserialize round trip on a tiny model."""

import types
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_stablehlo_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=64, batch_size=1, nc=3,
        include=["stablehlo"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    path = export_cli.export_stablehlo(fwd, opt, tmp_path)
    assert path.exists() and path.stat().st_size > 1000

    rehydrated = jexport.deserialize(path.read_bytes())
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    got = rehydrated.call(jnp.asarray(x))
    want = fwd(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_saved_model_export(tmp_path):
    import types

    import export as export_cli

    opt = types.SimpleNamespace(
        weights="", cfg="yolov5n.yaml", imgsz=64, batch_size=1, nc=3,
        include=["saved_model"], out=str(tmp_path),
    )
    fwd, variables, meta = export_cli.build_forward(opt)
    sm = export_cli.export_saved_model(fwd, opt, tmp_path)
    assert (Path(sm) / "saved_model.pb").exists()
