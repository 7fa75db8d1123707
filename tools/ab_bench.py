"""Round-6 A/B harness: run bench.py several times per env-config,
interleaved (A B A B ...), and report the per-query MIN per config —
the host's noisy-neighbor swings are multiplicative (BENCH.md), so
min-of-invocations is the fairest comparator. Not part of the bench.

Usage:
  python tools/ab_bench.py N 'NAME1=VAL1,NAME2=VAL2' 'NAME1=OTHER' ...
(first positional arg: invocations per config; remaining: env overlays;
an empty string means baseline env.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_once(env_overlay: dict) -> dict | None:
    env = dict(os.environ)
    env.update(env_overlay)
    p = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, env=env, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    sys.stderr.write(p.stderr[-2000:] + "\n")
    return None


def main():
    n = int(sys.argv[1])
    configs = []
    for spec in sys.argv[2:]:
        overlay = {}
        if spec:
            for kv in spec.split(","):
                k, v = kv.split("=", 1)
                overlay[k] = v
        configs.append((spec or "<baseline>", overlay))
    mins: dict[str, dict[str, float]] = {}
    vals: dict[str, list[float]] = {}
    for i in range(n):
        for name, overlay in configs:
            r = run_once(overlay)
            if r is None:
                print(f"[{name}] run {i}: FAILED", flush=True)
                continue
            q = r["queries"]
            cur = mins.setdefault(name, {})
            for k, v in q.items():
                cur[k] = min(cur.get(k, 1e9), v)
            vals.setdefault(name, []).append(r["value"])
            print(f"[{name}] run {i}: value={r['value']} "
                  + json.dumps(q), flush=True)
    print("==== per-query minima ====", flush=True)
    for name, cur in mins.items():
        total = round(sum(cur.values()), 3)
        print(f"[{name}] min_total={total} " + json.dumps(
            {k: round(v, 3) for k, v in cur.items()}), flush=True)


if __name__ == "__main__":
    main()
