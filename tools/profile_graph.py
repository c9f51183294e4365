#!/usr/bin/env python
"""Profile the iterative graph family at sf0.1: where does the time go?

For each of bfs_parts / sssp_parts / communities_parts: time the edge
construction alone (materialized through noop), then the full query, and
report the Spark job count per run (statusTracker delta) — the verdict's
hypothesis is rounds x job floor; this measures it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "fast")

from pyspark.sql import functions as F  # noqa: E402

from datapipeline_spark.session import get_spark  # noqa: E402
from datapipeline_spark.queries_data import REGISTRY, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, build):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    after = len(tracker.getJobIdsForGroup(None) or [])
    return round(dt, 3), after - before


def edges_bfs(spark):
    from datapipeline_spark.operators.graph import cooccurrence_edges

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    return cooccurrence_edges(li, group_col="l_orderkey", item_col="l_partkey")


def edges_sssp(spark):
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    a = li.select(
        F.col("l_orderkey").alias("__o"),
        F.col("l_partkey").alias("src"),
        F.col("l_quantity").alias("qa"),
    )
    b = li.select(
        F.col("l_orderkey").alias("__o"),
        F.col("l_partkey").alias("dst"),
        F.col("l_quantity").alias("qb"),
    )
    return (
        a.join(b, "__o")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min((F.col("qa") + F.col("qb")).cast("long")).alias("w"))
    )


def edges_lpa(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    return cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")


def main() -> None:
    spark = get_spark()
    out = {}
    # warmup
    timed(spark, lambda: REGISTRY["bfs_parts"][0](spark, SF_DIR))
    for name, efn in [
        ("bfs_parts", edges_bfs),
        ("sssp_parts", edges_sssp),
        ("communities_parts", edges_lpa),
    ]:
        qfn = REGISTRY[name][0]
        e = [timed(spark, lambda: efn(spark)) for _ in range(3)]
        q = [timed(spark, lambda: qfn(spark, SF_DIR)) for _ in range(3)]
        out[name] = {
            "edges_s": min(t for t, _ in e),
            "edges_jobs": e[0][1],
            "full_s": min(t for t, _ in q),
            "full_jobs": q[0][1],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
