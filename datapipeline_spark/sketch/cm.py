"""Count-Min sketch as a DataFrame aggregate.

The classic streaming frequency sketch (Cormode & Muthukrishnan 2005)
expressed Spark-first: the sketch IS a tiny DataFrame of ``depth x width``
counter cells produced by ONE map-side-combined aggregation over the
stream, and a point query is a broadcast join + min. Everything is
deterministic — the hash rows are seeded sha256 prefixes (the same
cross-engine hash contract as dataset/split.py) — so estimates are exactly
reproducible in any engine, which is what makes the sketch oracle-checkable
(the estimate is data-dependent but not order- or partition-dependent).

Guarantees: estimate >= true count always (counters only overcount on
collisions); with width w and depth d, the overestimate exceeds 2N/w with
probability at most (1/2)^d over the hash choice.

Scale posture: the shuffle carries at most ``depth x width`` cells per map
task regardless of input rows — this is the sketch whose entire point is
that its size is INDEPENDENT of the 100 TB it summarizes. Estimation
broadcasts the finished sketch (a few KB) back onto whatever key set needs
frequencies.

Reference gap: the reference engine has no sketches at all (nearest
neighbor is CoverageStatsAccumulator, an exact counter —
src/datapipeline/pipelines/dataset/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(col, seed: int, width: int):
    """Deterministic bucket for hash row ``seed``: 52-bit sha256 prefix of
    'cm{seed}|{key}' mod width — identical arithmetic in Spark and ANSI SQL."""
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(f"cm{seed}|"), col.cast("string")), 256), 1, 13
        ),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def build_cm_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """One aggregation pass -> sketch DataFrame (j int, bucket int, c long).

    Each input row increments one cell per hash row; rows with the same
    (j, bucket) merge associatively, so partial aggregation does the heavy
    lifting map-side and the shuffle is bounded by depth x width cells.

    Batch inputs hash each DISTINCT key once (round-7 opt, guide §2
    decide-with-small-rows): the per-key frequency is one narrow
    map-side-combined aggregate, the depth sha256+conv chains run on the
    distinct-key table only, and cells sum the frequencies — identical
    cell counts (Σ_rows f(key) = Σ_keys freq·f(key)) for a hash cost
    proportional to the key cardinality instead of the stream length.
    Streaming inputs keep the single-aggregation form (a chained
    stateful aggregate is not expressible in complete mode); the final
    cells are byte-identical either way, which is what keeps the batch
    SQL an exact oracle for the streaming query."""
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cell(F.col(key_col), j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    if df.isStreaming:
        return (
            df.select(F.explode(rows).alias("cell"))
            .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__f__"))
    return (
        per_key.select(F.explode(rows).alias("cell"), "__f__")
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("__f__").cast("long").alias("c"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    out: str = "est",
) -> DataFrame:
    """Point-query every row of ``keys``: ``out`` = min over hash rows of the
    matching counter. The sketch is broadcast (depth x width rows); missing
    cells count 0 (key never seen)."""
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cell(F.col(key_col), j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    exploded = keys.select(key_col, F.explode(rows).alias("cell")).select(
        key_col, F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket")
    )
    return (
        exploded.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .fillna(0, ["c"])
        .groupBy(key_col)
        .agg(F.min("c").alias(out))
    )


def cm_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame, out: str = "est"
) -> DataFrame:
    """Inner-product / equi-join-size estimate from two sketches built with
    the SAME (depth, width, seeds): ``min over hash rows j of
    sum_bucket a.c * b.c`` (Cormode & Muthukrishnan 2005 §4.2). Always an
    OVERestimate of ``sum_k f_a(k) * f_b(k)`` — the exact row count of the
    equi-join — since collisions only add cross terms.

    This is the query planner's classic cardinality-estimation primitive:
    both sketches are a few KB regardless of input size, so estimating a
    100 TB x 100 TB join costs two bounded-shuffle aggregation passes plus
    this depth x width join — never the join itself. Products accumulate in
    DECIMAL(38) (two petabyte-scale counters can multiply past bigint);
    the returned scalar is cast to bigint, valid while the true estimate
    fits (document: est < 9.2e18)."""
    a = sketch_a.select(
        "j", "bucket", F.col("c").cast("decimal(38,0)").alias("ca")
    )
    b = sketch_b.select(
        "j", "bucket", F.col("c").cast("decimal(38,0)").alias("cb")
    )
    per_row = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("long").alias(out))
