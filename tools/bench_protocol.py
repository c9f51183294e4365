#!/usr/bin/env python
"""Round-8 bench protocol (VERDICT r07 "What's wrong" #2: best-of-session
is not a defensible headline). Runs N COLD full benches (fresh process per
run), logs a single-core phase probe and a 16-way parallel throughput probe
immediately before each run, and writes:

  <out>_run<i>.json   one per cold run (bench.py stdout + probes)
  <out>.json          the runs ranked by total, the MEDIAN run's parsed
                      bench line, and all probe readings

The probe pair distinguishes ambient multi-core throughput phases (single
core flat, parallel scaling degraded — the round-7 finding) from plain CPU
contention. Usage:
  python tools/bench_protocol.py --out BENCH_opt_r08_before [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    """Single-core loop time + 16-way parallel wall for the same loop."""
    src = "t0=__import__('time').time()\ns=0\nfor i in range(10_000_000): s+=i\nprint(__import__('time').time()-t0)"
    t0 = time.time()
    one = float(subprocess.run([sys.executable, "-c", src], capture_output=True,
                               text=True).stdout.strip())
    procs = [subprocess.Popen([sys.executable, "-c", src], stdout=subprocess.DEVNULL)
             for _ in range(16)]
    t0 = time.time()
    for p in procs:
        p.wait()
    par = time.time() - t0
    return {"single_core_10m_s": round(one, 3), "par16_wall_s": round(par, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    runs = []
    for i in range(1, args.runs + 1):
        pr = probe()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, cwd=ROOT,
        )
        wall = time.time() - t0
        line = proc.stdout.strip().splitlines()[-1]
        parsed = json.loads(line)
        rec = {"run": i, "probe": pr, "process_wall_s": round(wall, 1),
               "total_s": parsed["value"], "bench": parsed}
        with open(os.path.join(ROOT, f"{args.out}_run{i}.json"), "w") as fh:
            json.dump(rec, fh, indent=1)
        runs.append(rec)
        print(f"run {i}: total={parsed['value']}s probe={pr}", flush=True)

    by_total = sorted(runs, key=lambda r: r["total_s"])
    median = by_total[len(by_total) // 2]
    with open(os.path.join(ROOT, f"{args.out}.json"), "w") as fh:
        json.dump(
            {
                "protocol": f"median of {args.runs} cold runs (fresh process each), "
                            "phase probe before each",
                "totals_s": [r["total_s"] for r in runs],
                "probes": [r["probe"] for r in runs],
                "median_run": median["run"],
                "median_total_s": median["total_s"],
                "bench": median["bench"],
            },
            fh, indent=1,
        )
    print(f"median run {median['run']}: {median['total_s']}s -> {args.out}.json")


if __name__ == "__main__":
    main()
