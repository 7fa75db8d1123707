"""Two-parallelism-level scaling protocol (BASELINE.json north rule).

No real cluster exists in this sandbox, so per the driver's protocol
the same job runs at two local parallelism levels (default local[8] vs
local[32]) on the same input; we report throughput at both and the
core-normalized scaling efficiency:

    efficiency = (throughput_4N / throughput_N) / 4

Each level runs in its OWN subprocess (fresh JVM) so executor-thread
counts are honest. Results are appended to BENCH.md.

Usage: python tools/scaling_bench.py [sf_dir] [N] [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone


def run_level(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SCALE_MULT=os.environ.get("SPARK_GRAFT_SCALE_MULT", "60"),
               SPARK_GRAFT_ZMAX=os.environ.get("SPARK_GRAFT_ZMAX", "8"))
    # the protocol compares ONE physical plan at two parallelism levels;
    # pin the emission strategy so the auto per-shape switch (mvt.py
    # _auto_vector_emit would turn vectorized ON at local[8] only) can't
    # change the plan between levels. Explicit env still overrides.
    env.setdefault("SPARK_GRAFT_VECTOR_EMIT", "0")
    # same reasoning for fused low-zoom assembly: its default flips at
    # FUSED_LOW_MIN_CORES, which would compare different physical
    # plans across levels; pin to the legacy-low plan (the measured
    # winner at the protocol's 8/16-core levels)
    env.setdefault("SPARK_GRAFT_FUSED_LOW", "0")
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _best(runs):
    return min(runs, key=lambda r: r["queries"]["mvt_pipeline"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    # alternate levels to decorrelate from background noise on the box;
    # take best-of per level (standard practice on shared hardware)
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run_level(sf_dir, n))
        hi_runs.append(run_level(sf_dir, n * mult))
    lo = _best(lo_runs)
    hi = _best(hi_runs)

    tps_lo, tps_hi = lo["tiles_per_sec"], hi["tiles_per_sec"]
    eff_tiles = (tps_hi / tps_lo) / mult
    thr_lo, thr_hi = 1.0 / lo["value"], 1.0 / hi["value"]
    eff_total = (thr_hi / thr_lo) / mult

    report = {
        "sf_dir": sf_dir,
        "reps": reps,
        "all_pipeline_secs": {
            f"local[{n}]": [r["queries"]["mvt_pipeline"] for r in lo_runs],
            f"local[{n * mult}]": [r["queries"]["mvt_pipeline"] for r in hi_runs],
        },
        "levels": {f"local[{n}]": lo, f"local[{n * mult}]": hi},
        "tiles_per_sec": {f"local[{n}]": tps_lo, f"local[{n * mult}]": tps_hi},
        "scaling_efficiency_tiles": round(eff_tiles, 3),
        "scaling_efficiency_total_suite": round(eff_total, 3),
        "criterion": ">= 0.8 core-normalized (BASELINE.json)",
    }
    print(json.dumps(report, indent=2))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""
## Scaling run {stamp} — {sf_dir}

| level | suite total (s) | mvt pipeline (s) | tiles/sec |
|---|---|---|---|
| local[{n}] | {lo['value']} | {lo['queries']['mvt_pipeline']} | {tps_lo} |
| local[{n * mult}] | {hi['value']} | {hi['queries']['mvt_pipeline']} | {tps_hi} |

- core-normalized scaling efficiency (tiles/sec): **{eff_tiles:.3f}**
- core-normalized scaling efficiency (whole suite): **{eff_total:.3f}**
- criterion: >= 0.8 from N to {mult}N cores (BASELINE.json north rule;
  sandbox two-parallelism protocol — no real cluster available)
- caveat: at sf<=0.1 fixed per-job scheduling overhead dominates small
  stages, so local-mode efficiency understates cluster efficiency; the
  plan has no driver-side loops or collects on data paths (see
  BENCH.md notes).
"""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
