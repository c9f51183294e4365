#!/usr/bin/env python
"""Per-query head-to-head: this engine (noop-sink wall, min of 2 warm runs)
vs single-node DuckDB executing the SAME query's oracle SQL (min of 2 warm
runs) over the same parquet. Prints one JSON line with totals + per-query
ratios and a summary table to stderr.

This is the BASELINE.md practical-baseline measurement (the reference
publishes no numbers; DuckDB on the same data is the strongest available
single-node baseline). Streaming queries are excluded (their wall time is
micro-batch machinery, not plan cost; DuckDB has no streaming analogue).

Usage: python tools/bench_vs_duckdb.py [--sf-dir /root/testdata/sf0.1]
       [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    import bench

    bench._use_production_hash()
    from datapipeline_spark.session import get_spark
    from datapipeline_spark.tables import TABLE_NAMES

    spark = get_spark(app_name="bench-vs-duckdb")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    rows = []
    for name in bench.HEADLINE:
        if only and name not in only:
            continue
        fn = qs.get(name)
        sql = oracles.get(name)
        if fn is None or sql is None or name.startswith("streaming_"):
            continue
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        build_s = round(time.time() - t0, 3)  # eager-checkpoint work lands here
        df.write.format("noop").mode("overwrite").save()  # warm
        s_best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            s_best = min(s_best, time.time() - t0)
        con.execute(sql).fetchall()  # warm
        d_best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            d_best = min(d_best, time.time() - t0)
        rows.append((name, round(s_best, 3), round(d_best, 3), build_s))
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
        "hash_mode": os.environ.get("SPARK_GRAFT_HASH_MODE", "oracle"),
        "queries": {
            n: {"spark": s, "duckdb": d, "build": b} for n, s, d, b in rows
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
