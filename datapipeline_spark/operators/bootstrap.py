"""Deterministic Poisson bootstrap — confidence intervals without a
random number generator.

The Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
massive data streams" — the Google large-scale resampling recipe)
replaces multinomial resampling with an independent Poisson(1) weight
per (row, replicate), which needs NO global coordination: each row
decides its own weight in every replicate from a hash — exactly the
map-side, partition-invariant shape a 1000-executor bootstrap needs.

Determinism: the md5-48bit hash runs ONCE per row; each replicate b then
derives its uniform by a multiplicative scramble of that row entropy —
``u = (h·(2b+1)) mod (2³¹−1) mod 1e6`` — i.e. replicate streams are
distinct multiplicative permutations of the row hash (a 2-universal-style
family). This trades perfect cross-replicate independence for a 100×
hash-cost cut (md5 per (row, replicate) dominated the wall at B=100);
within a replicate — where Poisson-bootstrap validity lives — rows remain
hash-independent. The uniform inverts through the Poisson(1) CDF as
integer micro-thresholds (computed once from math.exp and embedded as
literals in BOTH engines — the minhash-constants convention; libm never
runs inside a query). Replicate means are exact integer DIV; the CI
bounds are exact order statistics over the B-row replicate table.

Cost: a B-fold explode feeding a map-side partial aggregate keyed by
replicate — shuffle mass is B rows per partition, never B × data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_spark.dedup.minhash import hash48


def poisson_cdf_micros(max_k: int = 8) -> list[int]:
    """Cumulative Poisson(1) probabilities as floor-micro integers,
    k = 0..max_k (weights above max_k truncate to max_k + 1 — beyond
    1e-6 mass). Python-side constant generation; embedded as literals."""
    out, c, p = [], 0.0, math.exp(-1.0)
    for k in range(max_k + 1):
        c += p
        out.append(int(c * 1_000_000))
        p = p / (k + 1)
    return out


def poisson_weight(u_micros: F.Column, thresholds: list[int]) -> F.Column:
    """Map a uniform in [0, 1e6) to a Poisson(1) draw via the embedded
    CDF thresholds."""
    w = F.lit(len(thresholds))
    for k in reversed(range(len(thresholds))):
        w = F.when(u_micros < F.lit(thresholds[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicates: int = 100,
    lo_pct: int = 2,
    hi_pct: int = 97,
) -> DataFrame:
    """One-row exact bootstrap summary of the mean of integral
    ``value_col``: the point estimate, and the [lo_pct, hi_pct] percentile
    interval over ``n_replicates`` Poisson-bootstrap replicate means.
    Percentiles are ceil-rank order statistics over the tiny replicate
    table; every number is integer-exact and partitioning-independent."""
    th = poisson_cdf_micros()
    hashed = df.select(
        (hash48(F.col(key_col).cast("string")) % F.lit(2147483647)).alias(
            "h"
        ),
        F.col(value_col).cast("long").alias("v"),
    )
    rows = hashed.select(
        "h",
        "v",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_replicates) - 1))
        ).alias("b"),
    )
    u = (F.col("h") * (F.col("b") * 2 + 1)) % F.lit(2147483647) % F.lit(
        1_000_000
    )
    weighted = rows.select("b", "v", poisson_weight(u, th).alias("w"))
    reps = weighted.groupBy("b").agg(
        F.sum(F.col("w") * F.col("v")).cast("long").alias("ws"),
        F.sum("w").cast("long").alias("wn"),
    ).select(
        "b",
        F.when(F.col("wn") > 0, F.expr("ws DIV wn")).cast("long").alias("mean_b"),
    )
    point = df.agg(
        F.sum(F.col(value_col).cast("long")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(F.expr("s DIV n").alias("mean_point"), "n")
    # exact order statistics over the B-row replicate table (the
    # unpartitioned sort is over n_replicates rows — constant-size)
    from pyspark.sql import Window

    ranked = reps.withColumn(
        "rnk", F.row_number().over(Window.orderBy("mean_b", "b"))
    ).withColumn("nb", F.lit(int(n_replicates)))
    ci = ranked.agg(
        F.expr(
            f"CAST(min(CASE WHEN rnk >= ({lo_pct} * nb + 99) DIV 100 "
            "THEN mean_b END) AS BIGINT)"
        ).alias("ci_lo"),
        F.expr(
            f"CAST(min(CASE WHEN rnk >= ({hi_pct} * nb + 99) DIV 100 "
            "THEN mean_b END) AS BIGINT)"
        ).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    return point.join(F.broadcast(ci))
