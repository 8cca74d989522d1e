#!/usr/bin/env python
"""Scan run dirs for interrupted trainings and relaunch them
(reference utils/aws/resume.py:17-40, minus the DDP launcher — the pjit
trainer needs no multi-process launch).

Usage:
    python tools/auto_resume.py [--root runs/train] [--dry-run]

A run is resumable when it has a ``last`` checkpoint whose recorded epoch
is below the configured total (read from the run's saved opt metadata).
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def find_resumable(root):
    out = []
    for last in sorted(Path(root).glob("**/last")):
        meta_f = last / "meta.json"
        if not meta_f.exists():
            continue
        meta = json.loads(meta_f.read_text())
        out.append((last, meta))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="runs/train")
    p.add_argument("--epochs", type=int, default=300, help="target total epochs")
    p.add_argument("--data", required=False, help="dataset yaml (required to relaunch)")
    p.add_argument("--dry-run", action="store_true")
    a = p.parse_args()

    for last, meta in find_resumable(a.root):
        epoch = int(meta.get("epoch", -1))
        if epoch + 1 >= a.epochs:
            print(f"{last}: finished ({epoch + 1}/{a.epochs})")
            continue
        cmd = [
            sys.executable, "train.py",
            "--resume", str(last),
            "--cfg", meta.get("cfg", "yolov5m.yaml"),
            "--imgsz", str(meta.get("imgsz", 1024)),
            "--epochs", str(a.epochs),
            "--project", str(last.parent.parent),
            "--name", last.parent.name,
            "--exist-ok",
        ]
        if a.data:
            cmd += ["--data", a.data]
        print("resume:", " ".join(cmd))
        if not a.dry_run:
            if not a.data:
                print("  skipped (--data required to relaunch)")
                continue
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
