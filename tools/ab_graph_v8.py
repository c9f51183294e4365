#!/usr/bin/env python
"""v8: pull-based in-row rounds. The previous round's (node -> dist/lab)
table is gathered into a ONE-ROW map (tiny: node-count-sized) and
broadcast-crossJoined onto the adjacency; each round is then a narrow
per-row expression (no shuffle at all). LPA's per-node vote becomes an
in-row run-length mode over the sorted mapped neighbor labels."""
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


MODE_EXPR = """
aggregate(
  array_sort(transform(__bs__, x -> element_at(__lmap__, x))),
  named_struct('prev', CAST(NULL AS BIGINT), 'run', 0,
               'best', CAST(NULL AS BIGINT), 'bestrun', 0),
  (a, x) -> named_struct(
     'prev', x,
     'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1),
     'best', IF(IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1) > a.bestrun,
                x, a.best),
     'bestrun', greatest(IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1),
                         a.bestrun)),
  a -> a.best)
"""


def lpa_v8(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 5 == 0)
          .select("l_orderkey", "l_partkey"))
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("src"), "__it__")
             .select("src", F.explode("__it__").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    adj = (pairs.select(F.col("src").alias("a"), F.col("dst").alias("b"))
           .groupBy("a").agg(F.collect_set("b").alias("__bs__")))
    adj = adj.localCheckpoint(eager=False)
    # round 1 in-row: min neighbor
    labels = adj.select(F.col("a").alias("node"),
                        F.array_min("__bs__").cast("long").alias("lab"))
    for r in range(2, 5):
        lmap = labels.agg(F.map_from_entries(
            F.collect_list(F.struct("node", "lab"))).alias("__lmap__"))
        labels = (adj.crossJoin(F.broadcast(lmap))
                  .select(F.col("a").alias("node"),
                          F.expr(MODE_EXPR).alias("lab")))
    return labels.select(
        F.col("node").alias("p_partkey"), F.col("lab").alias("community"))


def bfs_v8(spark):
    li = (load_table(spark, SF_DIR, "lineitem")
          .filter(F.col("l_orderkey") % 7 == 0)
          .select("l_orderkey", "l_partkey"))
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("__it__"))
    pairs = (sets.select(F.explode("__it__").alias("src"), "__it__")
             .select("src", F.explode("__it__").alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    adj = pairs.groupBy(F.col("src").alias("__src__")).agg(
        F.collect_set("dst").alias("__dsts__"))
    adj = adj.localCheckpoint(eager=False)
    d1 = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"), F.lit(0).cast("int").alias("dist"))
        .unionByName(
            pairs.filter(F.col("src") % 97 == 0)
            .select(F.col("dst").alias("node"), F.lit(1).cast("int").alias("dist")))
        .groupBy("node").agg(F.min("dist").alias("dist")))
    d1 = d1.localCheckpoint(eager=False)
    dist = d1
    for _ in range(2):
        dmap = dist.agg(F.map_from_entries(
            F.collect_list(F.struct("node", "dist"))).alias("__dmap__"))
        dist = (adj.crossJoin(F.broadcast(dmap))
                .select(F.col("__src__").alias("node"),
                        F.expr("""least(element_at(__dmap__, __src__),
                                  array_min(filter(transform(__dsts__,
                                     x -> element_at(__dmap__, x) + 1),
                                     v -> v IS NOT NULL)))""").alias("dist"))
                .filter(F.col("dist").isNotNull()))
    # isolated sources (no adjacency row) keep their initial distance
    isolated = d1.join(adj.select(F.col("__src__").alias("node")), "node",
                       "left_anti")
    return dist.unionByName(isolated).select(
        F.col("node").alias("p_partkey"), "dist")


def sssp_v8(spark):
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
    adj = adj.localCheckpoint(eager=False)
    d1 = (pairs.filter(F.col("src") % 500 == 0)
          .select(F.explode(F.array(
              F.struct(F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")),
              F.struct(F.col("dst").alias("node"), F.col("w").alias("dist")))).alias("__r__"))
          .select("__r__.node", "__r__.dist")
          .groupBy("node").agg(F.min("dist").alias("dist")))
    dist = d1
    for _ in range(2):
        dmap = dist.agg(F.map_from_entries(
            F.collect_list(F.struct("node", "dist"))).alias("__dmap__"))
        dist = (adj.crossJoin(F.broadcast(dmap))
                .select(F.col("__src__").alias("node"),
                        F.expr("""least(element_at(__dmap__, __src__),
                                  array_min(filter(transform(__es__,
                                     e -> element_at(__dmap__, e.d) + e.w),
                                     v -> v IS NOT NULL)))""").alias("dist"))
                .filter(F.col("dist").isNotNull()))
    return dist.select(F.col("node").alias("p_partkey"), "dist")


def equal(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def main():
    spark = get_spark()
    out = {}
    for name, variant in [("bfs_parts", bfs_v8), ("sssp_parts", sssp_v8),
                          ("communities_parts", lpa_v8)]:
        base_fn = REGISTRY[name][0]
        ok = equal(base_fn(spark, SF_DIR), variant(spark))
        var = timed(spark, variant)
        out[name] = {"equal": ok, "v8": var}
        print(name, out[name], flush=True)
    print(json.dumps(out))


main()
