#!/usr/bin/env python
"""A/B variants for the iterative graph family's round tax (verdict r7 task 2).

Variants (each checked for FULL result equality against the current
implementation before timing):
  bfs:  v1 = cooccurrence_pairs (skip the distinct — adj collect_set dedups)
           + no per-hop isEmpty probes (fixed horizon)
           + no dist checkpoints (dist is a union of checkpointed frontiers)
  sssp: v1 = in-row edge pair generation (groupBy order + explode) instead of
           the self-join, edges lazily checkpointed ONCE in the query and
           consumed by both sources and adjacency
           + no per-round dist checkpoints (single consumption, 3 rounds)
  lpa:  v1 = no intermediate label checkpoints (single consumption, 4 rounds)
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


def timed(spark, build, n=3):
    best = None
    tracker = spark.sparkContext.statusTracker()
    jobs = None
    for _ in range(n):
        before = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = build(spark)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = len(tracker.getJobIdsForGroup(None) or []) - before
        best = dt if best is None else min(best, dt)
    return round(best, 3), jobs


# ---------------------------------------------------------------- bfs variant


def bfs_v1(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    sources = li.filter(F.col("l_partkey") % 97 == 0).select(
        F.col("l_partkey").alias("node")
    )
    adj = edges.groupBy(F.col("src").alias("__src__")).agg(
        F.collect_set("dst").alias("__dsts__")
    )
    adj = adj.localCheckpoint(eager=False)
    dist = sources.select("node").distinct().withColumn(
        "dist", F.lit(0).cast("int")
    )
    dist = dist.localCheckpoint(eager=False)
    frontier = dist
    for hop in range(1, 4):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["__src__"])
            .select(F.explode("__dsts__").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
        )
        nxt = nxt.localCheckpoint(eager=False)
        dist = dist.union(nxt)
        frontier = nxt
    return dist.select(F.col("node").alias("p_partkey"), "dist")


# --------------------------------------------------------------- sssp variant


def sssp_v1(spark):
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
    )
    edges = pairs.groupBy(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    ).agg(
        F.min((F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long")).alias("w")
    )
    edges = edges.localCheckpoint(eager=False)
    sources = (
        edges.filter(F.col("src") % 500 == 0)
        .select(F.col("src").alias("node"))
        .distinct()
    )
    adj = (
        edges.select(
            F.col("src").alias("__src__"),
            F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"),
        )
        .groupBy("__src__")
        .agg(F.collect_set("e").alias("__es__"))
    )
    adj = adj.localCheckpoint(eager=False)
    dist = sources.withColumn("dist", F.lit(0).cast("long"))
    for _ in range(3):
        relaxed = (
            dist.join(adj, dist["node"] == adj["__src__"])
            .select(F.col("dist").alias("__d0__"), F.explode("__es__").alias("e"))
            .select(
                F.col("e.d").alias("node"),
                (F.col("__d0__") + F.col("e.w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(F.col("node").alias("p_partkey"), "dist")


# ---------------------------------------------------------------- lpa variant


def lpa_v1(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .groupBy("a")
        .agg(F.collect_set("b").alias("__bs__"))
    )
    adj = adj.localCheckpoint(eager=False)
    labels = adj.select(F.col("a").alias("node")).withColumn("lab", F.col("node"))
    for r in range(1, 5):
        labels = (
            adj.join(labels, F.col("a") == F.col("node"))
            .select(F.explode("__bs__").alias("b"), "lab")
            .groupBy(F.col("b").alias("node"))
            .agg(F.mode(F.col("lab"), True).alias("lab"))
        )
    return labels.select(
        F.col("node").alias("p_partkey"), F.col("lab").alias("community")
    )


def equal(df_a, df_b) -> bool:
    a, b = df_a.exceptAll(df_b), df_b.exceptAll(df_a)
    return a.isEmpty() and b.isEmpty()


def main() -> None:
    spark = get_spark()
    out = {}
    for name, variant in [
        ("bfs_parts", bfs_v1),
        ("sssp_parts", sssp_v1),
        ("communities_parts", lpa_v1),
    ]:
        base_fn = REGISTRY[name][0]
        ok = equal(base_fn(spark, SF_DIR), variant(spark))
        base = timed(spark, lambda s: base_fn(s, SF_DIR))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "base": base, "variant": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("AB_V2") != "1":
    main()


# ------------------------------------------- v2: checkpoint-free (one action)


def bfs_v2(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    sources = li.filter(F.col("l_partkey") % 97 == 0).select(
        F.col("l_partkey").alias("node")
    )
    adj = edges.groupBy(F.col("src").alias("__src__")).agg(
        F.collect_set("dst").alias("__dsts__")
    )
    dist = sources.select("node").distinct().withColumn(
        "dist", F.lit(0).cast("int")
    )
    frontier = dist
    for hop in range(1, 4):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["__src__"])
            .select(F.explode("__dsts__").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
        )
        dist = dist.union(nxt)
        frontier = nxt
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def sssp_v2(spark):
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
    )
    edges = pairs.groupBy(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    ).agg(
        F.min((F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long")).alias("w")
    )
    sources = (
        edges.filter(F.col("src") % 500 == 0)
        .select(F.col("src").alias("node"))
        .distinct()
    )
    adj = (
        edges.select(
            F.col("src").alias("__src__"),
            F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"),
        )
        .groupBy("__src__")
        .agg(F.collect_set("e").alias("__es__"))
    )
    dist = sources.withColumn("dist", F.lit(0).cast("long"))
    for _ in range(3):
        relaxed = (
            dist.join(adj, dist["node"] == adj["__src__"])
            .select(F.col("dist").alias("__d0__"), F.explode("__es__").alias("e"))
            .select(
                F.col("e.d").alias("node"),
                (F.col("__d0__") + F.col("e.w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def lpa_v2(spark):
    from datapipeline_spark.operators.graph import cooccurrence_pairs

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = cooccurrence_pairs(li, group_col="l_orderkey", item_col="l_partkey")
    adj = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .groupBy("a")
        .agg(F.collect_set("b").alias("__bs__"))
    )
    labels = adj.select(F.col("a").alias("node")).withColumn("lab", F.col("node"))
    for r in range(1, 5):
        labels = (
            adj.join(labels, F.col("a") == F.col("node"))
            .select(F.explode("__bs__").alias("b"), "lab")
            .groupBy(F.col("b").alias("node"))
            .agg(F.mode(F.col("lab"), True).alias("lab"))
        )
    return labels.select(
        F.col("node").alias("p_partkey"), F.col("lab").alias("community")
    )


def main2() -> None:
    spark = get_spark()
    out = {}
    for name, variant in [
        ("bfs_parts", bfs_v2),
        ("sssp_parts", sssp_v2),
        ("communities_parts", lpa_v2),
    ]:
        base_fn = REGISTRY[name][0]
        ok = equal(base_fn(spark, SF_DIR), variant(spark))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "v2": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("AB_V2") == "1":
    main2()
