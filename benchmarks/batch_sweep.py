"""Sweep (batch, dtype) for the flagship train step to pick bench.py's
default configuration. Run from the repo root:

    python benchmarks/batch_sweep.py

Appends one JSON line per point to benchmarks/batch_sweep_results.json.
Each new (batch, dtype) is a fresh XLA program — the first run pays the
tunnel's load/compile phase; the persistent cache makes reruns fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_ours  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "batch_sweep_results.json")

POINTS = [
    # (batch, dtype, batch_tile) — round-4 x-in-kernel path, tile 36 (the
    # measured-best default; larger requests clamp per dtype via the
    # calibrated VMEM cap). Linearity-in-B is the claim under test.
    (64, "bfloat16", 36),
    (128, "bfloat16", 36),
    (256, "bfloat16", 36),
    (512, "bfloat16", 36),
    (1024, "bfloat16", 36),
    (128, "float32", 36),
    (512, "float32", 36),
]


def main():
    results = []
    for batch, dtype, tile in POINTS:
        t0 = time.time()
        try:
            clips = bench_ours(batch=batch, iters=50, warmup=8, dtype=dtype,
                               batch_tile=tile)
        except Exception as e:  # e.g. VMEM oversubscription at big tiles
            rec = {"batch": batch, "dtype": dtype, "batch_tile": tile,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results.append(rec)
            print(json.dumps(rec), flush=True)
            with open(OUT, "w") as f:
                json.dump(results, f, indent=2)
            continue
        rec = {"batch": batch, "dtype": dtype, "batch_tile": tile,
               "clips_per_s": round(clips, 1),
               "step_ms": round(1000.0 * batch / clips, 3),
               "wall_s": round(time.time() - t0, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
