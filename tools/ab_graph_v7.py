#!/usr/bin/env python
"""v7: round 1 computed without the adjacency —
bfs/sssp: d1 rides one min-merge over (sources ∪ pairs-filtered relaxations),
which depends only on the order-sets stage, so AQE materializes it IN
PARALLEL with the adjacency build; rounds 2+ join adj as before.
lpa: l1(b) = array_min(N(b)) in-row (round-1 votes are all 1s, min-tie wins),
then 3 joined rounds."""
from __future__ import annotations

import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "fast")
from pyspark.sql import functions as F
from datapipeline_spark.session import get_spark
from datapipeline_spark.queries_data import REGISTRY, load_table
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, build, n=3):
    best = None; tracker = spark.sparkContext.statusTracker(); jobs=None
    for _ in range(n):
        before = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(tracker.getJobIdsForGroup(None) or []) - before
        best = dt if best is None else min(best, dt)
    return round(best, 3), jobs


def bfs_v7(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 7 == 0)
          .select("l_orderkey", "l_partkey"))
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("src"), "__it__")
             .select("src", F.explode("__it__").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    adj = pairs.groupBy(F.col("src").alias("__src__")).agg(
        F.collect_set("dst").alias("__dsts__"))
    d1 = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"), F.lit(0).cast("int").alias("dist"))
        .unionByName(
            pairs.filter(F.col("src") % 97 == 0)
            .select(F.col("dst").alias("node"), F.lit(1).cast("int").alias("dist")))
        .groupBy("node").agg(F.min("dist").alias("dist")))
    dist = d1
    for _ in range(2):
        relaxed = (dist.join(adj, dist["node"] == adj["__src__"])
                   .select(F.col("dist").alias("__d0__"),
                           F.explode("__dsts__").alias("node"))
                   .select("node", (F.col("__d0__") + F.lit(1)).cast("int").alias("dist")))
        dist = (dist.unionByName(relaxed).groupBy("node")
                .agg(F.min("dist").alias("dist")))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def sssp_v7(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey", "l_quantity"))
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.struct("l_partkey", "l_quantity")).alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("x"), "__it__")
             .select("x", F.explode("__it__").alias("y"))
             .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
             .select(F.col("x.l_partkey").alias("src"),
                     F.col("y.l_partkey").alias("dst"),
                     (F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long").alias("w")))
    adj = (pairs.select(F.col("src").alias("__src__"),
                        F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"))
           .groupBy("__src__").agg(F.collect_set("e").alias("__es__")))
    # d1 straight from the pair stream: sources (dist 0) + their one-edge
    # relaxations; the groupBy-min subsumes the per-(src,dst) edge min
    d1 = (pairs.filter(F.col("src") % 500 == 0)
          .select(F.explode(F.array(
              F.struct(F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")),
              F.struct(F.col("dst").alias("node"), F.col("w").alias("dist")))).alias("__r__"))
          .select("__r__.node", "__r__.dist")
          .groupBy("node").agg(F.min("dist").alias("dist")))
    dist = d1
    for _ in range(2):
        relaxed = (dist.join(adj, dist["node"] == adj["__src__"])
                   .select(F.col("dist").alias("__d0__"), F.explode("__es__").alias("e"))
                   .select(F.col("e.d").alias("node"),
                           (F.col("__d0__") + F.col("e.w")).alias("dist")))
        dist = (dist.unionByName(relaxed).groupBy("node")
                .agg(F.min("dist").alias("dist")))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def lpa_v7(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey"))
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("src"), "__it__")
             .select("src", F.explode("__it__").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    adj = (pairs.select(F.col("src").alias("a"), F.col("dst").alias("b"))
           .groupBy("a").agg(F.collect_set("b").alias("__bs__")))
    # round 1 in-row: all votes are singletons, min-tie wins => min neighbor
    labels = adj.select(F.col("a").alias("node"),
                        F.array_min("__bs__").alias("lab"))
    for r in range(2, 5):
        labels = (
            adj.join(labels, F.col("a") == F.col("node"))
            .select(F.explode("__bs__").alias("b"), "lab")
            .groupBy(F.col("b").alias("node"))
            .agg(F.mode(F.col("lab"), True).alias("lab")))
    return labels.select(
        F.col("node").alias("p_partkey"), F.col("lab").alias("community"))


def equal(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def main():
    spark = get_spark()
    out = {}
    for name, variant in [("bfs_parts", bfs_v7), ("sssp_parts", sssp_v7),
                          ("communities_parts", lpa_v7)]:
        base_fn = REGISTRY[name][0]
        ok = equal(base_fn(spark, SF_DIR), variant(spark))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "v7": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


main()
