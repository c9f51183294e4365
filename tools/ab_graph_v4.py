#!/usr/bin/env python
"""v4: v3 + shuffle_hash join hints — dist/labels are hash-partitioned on the
join key by the previous round's groupBy, adj by its own groupBy, so the
per-round join needs NO exchange and NO broadcast-materialization job."""
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


def bfs_v4(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 7 == 0)
          .select("l_orderkey", "l_partkey"))
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    adj = edges.groupBy(F.col("src").alias("__src__")).agg(
        F.collect_set("dst").alias("__dsts__"))
    sources = li.filter(F.col("l_partkey") % 97 == 0).select(
        F.col("l_partkey").alias("node"))
    dist = sources.distinct().withColumn("dist", F.lit(0).cast("int"))
    for _ in range(3):
        relaxed = (adj.join(dist.hint("shuffle_hash"), dist["node"] == adj["__src__"])
                   .select(F.col("dist").alias("__d0__"),
                           F.explode("__dsts__").alias("node"))
                   .select("node", (F.col("__d0__") + F.lit(1)).cast("int").alias("dist")))
        dist = (dist.unionByName(relaxed).groupBy("node")
                .agg(F.min("dist").alias("dist")))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def sssp_v4(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey", "l_quantity"))
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.struct("l_partkey", "l_quantity")).alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("x"), "__it__")
             .select("x", F.explode("__it__").alias("y"))
             .filter(F.col("x.l_partkey") != F.col("y.l_partkey")))
    edges = pairs.groupBy(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    ).agg(F.min((F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long")).alias("w"))
    adj = (edges.select(F.col("src").alias("__src__"),
                        F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"))
           .groupBy("__src__").agg(F.collect_set("e").alias("__es__")))
    dist = (adj.filter(F.col("__src__") % 500 == 0)
            .select(F.col("__src__").alias("node"))
            .withColumn("dist", F.lit(0).cast("long")))
    for _ in range(3):
        relaxed = (adj.join(dist.hint("shuffle_hash"), dist["node"] == adj["__src__"])
                   .select(F.col("dist").alias("__d0__"), F.explode("__es__").alias("e"))
                   .select(F.col("e.d").alias("node"),
                           (F.col("__d0__") + F.col("e.w")).alias("dist")))
        dist = (dist.unionByName(relaxed).groupBy("node")
                .agg(F.min("dist").alias("dist")))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def lpa_v4(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey"))
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    adj = (edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
           .groupBy("a").agg(F.collect_set("b").alias("__bs__")))
    labels = adj.select(F.col("a").alias("node")).withColumn("lab", F.col("node"))
    for r in range(1, 5):
        labels = (
            adj.join(labels.hint("shuffle_hash"), F.col("a") == F.col("node"))
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
    for name, variant in [("bfs_parts", bfs_v4), ("sssp_parts", sssp_v4),
                          ("communities_parts", lpa_v4)]:
        base_fn = REGISTRY[name][0]
        ok = equal(base_fn(spark, SF_DIR), variant(spark))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "v4": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


main()
