#!/usr/bin/env python
"""A/B the iterative graph family's remaining round tax: does turning off
AQE (one statically-planned job instead of per-stage materialization
passes) and/or an explicit broadcast hint on the per-round state beat the
current AQE-discovered plans?

Variants per query (all checked bit-identical to the registry output
before timing, exceptAll both ways):
  base        registry query as-is (AQE on, no hint)
  bcast       AQE on  + F.broadcast(state) in every round join
  noaqe       AQE off + F.broadcast(state) (static planner can't size an
              aggregated state table, so the hint is required — without it
              every round is a sort-merge join)
Min-of-3, variants alternating within one session so ambient drift hits
all arms equally.
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

from datapipeline_spark.queries_data import REGISTRY, load_table  # noqa: E402
from datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bfs_q(spark, bcast):
    from datapipeline_spark.operators.graph import bfs_distances, cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    pairs = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    d1 = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"), F.lit(0).cast("int").alias("dist"))
        .unionByName(
            pairs.filter(F.col("src") % 97 == 0).select(
                F.col("dst").alias("node"), F.lit(1).cast("int").alias("dist")
            )
        )
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    return bfs_distances(
        pairs, None, max_hops=3, initial=d1, initial_hops=1, bcast=bcast
    ).select(F.col("node").alias("p_partkey"), "dist")


def sssp_q(spark, bcast):
    from datapipeline_spark.operators.graph import sssp_distances

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.struct("l_partkey", "l_quantity")).alias("__it__")
    )
    pairs = (
        sets.select(F.explode("__it__").alias("x"), "__it__")
        .select("x", F.explode("__it__").alias("y"))
        .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("src"),
            F.col("y.l_partkey").alias("dst"),
            (F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long").alias("w"),
        )
    )
    d1 = (
        pairs.filter(F.col("src") % 500 == 0)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")
                    ),
                    F.struct(F.col("dst").alias("node"), F.col("w").alias("dist")),
                )
            ).alias("__r__")
        )
        .select("__r__.node", "__r__.dist")
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )
    return sssp_distances(
        pairs, None, rounds=3, initial=d1, initial_rounds=1, bcast=bcast
    ).select(F.col("node").alias("p_partkey"), "dist")


def lpa_q(spark, bcast):
    from datapipeline_spark.operators.graph import (
        cooccurrence_pairs,
        label_propagation,
    )

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    pairs = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    return label_propagation(pairs, rounds=4, bcast=bcast).select(
        F.col("node").alias("p_partkey"), F.col("community")
    )


def run(spark, build, aqe):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    try:
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def main():
    spark = get_spark()
    out = {}
    for name, body in (("bfs_parts", bfs_q), ("sssp_parts", sssp_q),
                       ("communities_parts", lpa_q)):
        base = REGISTRY[name][0](spark, SF_DIR)
        variants = {
            "base": (lambda s, n=name: REGISTRY[n][0](s, SF_DIR), True),
            "bcast": (lambda s, b=body: b(s, True), True),
            "noaqe": (lambda s, b=body: b(s, True), False),
        }
        # equality gate before timing
        for vn, (build, aqe) in variants.items():
            if vn == "base":
                continue
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            got = build(spark)
            a, b = got.exceptAll(base).count(), base.exceptAll(got).count()
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            assert a == 0 and b == 0, f"{name}/{vn} differs: +{a} -{b}"
        res = {vn: [] for vn in variants}
        for _ in range(3):
            for vn, (build, aqe) in variants.items():
                res[vn].append(run(spark, build, aqe))
        out[name] = {vn: round(min(ts), 3) for vn, ts in res.items()}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
