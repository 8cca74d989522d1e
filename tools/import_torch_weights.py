#!/usr/bin/env python
"""Convert a reference (torch) yolov5_obb state_dict to orbax deployment
weights for this framework. See yolov5_obb_tpu/utils/torch_import.py for the
state_dict dumping recipe and the key correspondence table."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sd", required=True, help="torch-saved state_dict (.pt)")
    p.add_argument("--cfg", required=True, help="model config yaml (must match)")
    p.add_argument("--nc", type=int, required=True)
    p.add_argument("--out", required=True, help="output orbax weights dir")
    p.add_argument("--names", nargs="+", default=None, help="class names")
    args = p.parse_args()

    from yolov5_obb_tpu.utils.checkpoint import save_weights
    from yolov5_obb_tpu.utils.torch_import import import_torch_checkpoint

    variables, model, meta = import_torch_checkpoint(args.sd, args.cfg, args.nc)
    save_weights(
        Path(args.out), variables["params"], variables["batch_stats"],
        {"cfg": args.cfg, "names": args.names, "source": str(args.sd)},
    )
    n = sum(v.size for v in __import__("jax").tree.leaves(variables["params"]))
    print(f"imported {n / 1e6:.2f} M params → {args.out}")


if __name__ == "__main__":
    main()
