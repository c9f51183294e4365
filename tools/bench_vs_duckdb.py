#!/usr/bin/env python
"""Per-query head-to-head: this engine (noop-sink wall, min of 2 timed
runs, DataFrame rebuilt per run so lazy checkpoints can't hide work) vs
single-node DuckDB executing the SAME query's oracle SQL (min of 2 warm
runs) over the same parquet. Prints one JSON line with totals + per-query
ratios and a summary table to stderr.

This is the BASELINE.md practical-baseline measurement (the reference
publishes no numbers; DuckDB on the same data is the strongest available
single-node baseline). Streaming queries are excluded (their wall time is
micro-batch machinery, not plan cost; DuckDB has no streaming analogue).

The DuckDB pass runs in a SEPARATE SUBPROCESS after the whole Spark phase
finishes: co-residency with a hot 100+ GiB Spark JVM was measured
inflating one DuckDB oracle 7.5x (42.2 s vs 5.6 s isolated — round-4
verdict), which corrupts the aggregate ratio in Spark's favor.

Usage: python tools/bench_vs_duckdb.py [--sf-dir /root/testdata/sf0.1]
       [--only name1,name2] [--protocol phased|interleaved] [--rounds 3]

`--protocol interleaved` alternates whole engine passes (Spark round,
DuckDB round, ...) and takes the min per query per engine across rounds —
the round-5 verdict's denominator-wobble check (DuckDB totals drifted
97.8-111.7 s across a day under the phased protocol; interleaving spreads
both engines across the same wall-clock window so background drift hits
both). DuckDB still runs in its own Spark-free subprocess each round.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_phase(sql_file: str, sf_dir: str, reps: int = 2) -> int:
    """Subprocess entry: time each oracle SQL in a Spark-free process
    (1 warm + min of ``reps`` timed runs)."""
    import duckdb

    with open(sql_file) as f:
        sqls: dict[str, str] = json.load(f)
    con = duckdb.connect()
    from datapipeline_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, float] = {}
    for name, sql in sqls.items():
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print(json.dumps(out))
    return 0


def _run_duck_round(oracles: dict, sf_dir: str, reps: int) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(oracles, f)
        sql_file = f.name
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--duck-phase", sql_file, "--sf-dir", sf_dir,
             "--duck-reps", str(reps)],
            capture_output=True, text=True, check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])
    finally:
        os.unlink(sql_file)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--protocol", choices=["phased", "interleaved"], default="phased")
    ap.add_argument("--rounds", type=int, default=3, help="interleaved rounds")
    ap.add_argument("--out", default=None, help="also write the JSON line to this file")
    ap.add_argument("--duck-phase", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--duck-reps", type=int, default=2, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.duck_phase:
        return duck_phase(args.duck_phase, args.sf_dir, args.duck_reps)

    import __spark_entry__ as entry
    import bench

    bench._use_production_hash()
    from datapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-vs-duckdb")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    # session warm-up (same rationale as bench.py): absorb JIT/codegen/
    # reader init so the first measured query isn't order-penalized
    for wname in ("q1_pricing_summary", "lag_lead", "semi_join_customers"):
        wfn = qs.get(wname)
        if wfn is not None:
            wfn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    names = [
        n for n in bench.HEADLINE
        if (not only or n in only)
        and qs.get(n) is not None
        and oracles.get(n) is not None
        and not n.startswith("streaming_")
    ]

    def spark_timed_run(name: str) -> tuple[float, float]:
        """(build_s, total_s) for one rebuilt-from-scratch timed run — a
        lazily-checkpointed subtree can never hide work across runs."""
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        build_s = time.time() - t0  # eager-checkpoint work lands here
        df.write.format("noop").mode("overwrite").save()
        total_s = time.time() - t0
        del df
        return build_s, total_s

    if args.protocol == "interleaved":
        # alternate WHOLE engine passes; min per query per engine across
        # rounds. Round 0 includes each query's first (warm) execution for
        # both engines — the min absorbs it.
        s_best: dict[str, float] = {n: float("inf") for n in names}
        b_best: dict[str, float] = {n: float("inf") for n in names}
        duck: dict[str, float] = {n: float("inf") for n in names}
        for r in range(args.rounds):
            for name in names:
                b, t = spark_timed_run(name)
                s_best[name] = min(s_best[name], t)
                b_best[name] = min(b_best[name], b)
            print(f"-- spark round {r} done", file=sys.stderr)
            d = _run_duck_round({n: oracles[n] for n in names}, args.sf_dir, reps=1)
            for n, v in d.items():
                duck[n] = min(duck[n], v)
            print(f"-- duckdb round {r} done", file=sys.stderr)
        spark_rows = [
            (n, round(s_best[n], 3), round(b_best[n], 3)) for n in names
        ]
    else:
        # ---- phase 1: Spark, every headline query ---------------------
        spark_rows = []
        for name in names:
            build_s, _ = spark_timed_run(name)  # warm (untimed for the min)
            best = min(spark_timed_run(name)[1] for _ in range(2))
            spark_rows.append((name, round(best, 3), round(build_s, 3)))
            print(f"{name:32s} spark {best:7.3f}s", file=sys.stderr)

        # ---- phase 2: DuckDB in its own process (no JVM co-residency) -
        duck = _run_duck_round(
            {n: oracles[n] for n, _, _ in spark_rows}, args.sf_dir, reps=2
        )

    rows = [(n, s, duck[n], b) for n, s, b in spark_rows]
    for name, s_best, d_best, _ in rows:
        print(
            f"{name:32s} spark {s_best:7.3f}s  duckdb {d_best:7.3f}s  "
            f"ratio {s_best / max(d_best, 1e-9):6.1f}x",
            file=sys.stderr,
        )

    s_tot = sum(r[1] for r in rows)
    d_tot = sum(r[2] for r in rows)
    b_tot = sum(r[3] for r in rows)
    out = {
        "metric": "spark_vs_duckdb",
        "sf_dir": args.sf_dir,
        "n_queries": len(rows),
        "spark_total_s": round(s_tot, 2),
        "duckdb_total_s": round(d_tot, 2),
        "aggregate_ratio": round(s_tot / max(d_tot, 1e-9), 2),
        "spark_build_total_s": round(b_tot, 2),
        "duckdb_isolated_process": True,
        "spark_timed_includes_build": True,
        "protocol": args.protocol,
        "rounds": args.rounds if args.protocol == "interleaved" else 2,
        "hash_mode": os.environ.get("SPARK_GRAFT_HASH_MODE", "oracle"),
        "queries": {
            n: {"spark": s, "duckdb": d, "build": b} for n, s, d, b in rows
        },
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
