#!/usr/bin/env python
"""sssp v5: repartition(src) once, both aggregations ride it (HashPartitioning
subset-satisfies both clusterings). v6: drop the per-(src,dst) min — the
round min-merge subsumes it; adjacency = ONE groupBy(src) over raw pairs."""
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


def _pairs(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey", "l_quantity"))
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.struct("l_partkey", "l_quantity")).alias("__it__"))
    return (sets.select(F.explode("__it__").alias("x"), "__it__")
            .select("x", F.explode("__it__").alias("y"))
            .filter(F.col("x.l_partkey") != F.col("y.l_partkey"))
            .select(F.col("x.l_partkey").alias("src"),
                    F.col("y.l_partkey").alias("dst"),
                    (F.col("x.l_quantity") + F.col("y.l_quantity")).cast("long").alias("w")))


def _rounds(adj, dist):
    for _ in range(3):
        relaxed = (dist.join(adj, dist["node"] == adj["__src__"])
                   .select(F.col("dist").alias("__d0__"), F.explode("__es__").alias("e"))
                   .select(F.col("e.d").alias("node"),
                           (F.col("__d0__") + F.col("e.w")).alias("dist")))
        dist = (dist.unionByName(relaxed).groupBy("node")
                .agg(F.min("dist").alias("dist")))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def sssp_v5(spark):
    pairs = _pairs(spark).repartition(F.col("src"))
    edges = pairs.groupBy("src", "dst").agg(F.min("w").alias("w"))
    adj = (edges.select(F.col("src").alias("__src__"),
                        F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"))
           .groupBy("__src__").agg(F.collect_set("e").alias("__es__")))
    dist = (adj.filter(F.col("__src__") % 500 == 0)
            .select(F.col("__src__").alias("node"))
            .withColumn("dist", F.lit(0).cast("long")))
    return _rounds(adj, dist)


def sssp_v6(spark):
    pairs = _pairs(spark)
    adj = (pairs.select(F.col("src").alias("__src__"),
                        F.struct(F.col("dst").alias("d"), F.col("w").alias("w")).alias("e"))
           .groupBy("__src__").agg(F.collect_set("e").alias("__es__")))
    dist = (adj.filter(F.col("__src__") % 500 == 0)
            .select(F.col("__src__").alias("node"))
            .withColumn("dist", F.lit(0).cast("long")))
    return _rounds(adj, dist)


def equal(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def main():
    spark = get_spark()
    base_fn = REGISTRY["sssp_parts"][0]
    base = base_fn(spark, SF_DIR)
    out = {}
    for name, variant in [("v5", sssp_v5), ("v6", sssp_v6)]:
        ok = equal(base, variant(spark))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "t": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


main()
