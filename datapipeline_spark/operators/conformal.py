"""Split-conformal prediction intervals — distribution-free forecast
uncertainty from held-out residuals (Vovk et al.; the calibration step
every production forecaster ships with).

Per series: one-step-ahead Holt residuals r_t = y_t − (l_{t−1} + b_{t−1})
form the calibration scores; the interval half-width is the
ceil((n+1)·α)-th smallest |r| — a SELECTED value, not arithmetic, so
although the Holt levels are doubles the output is bit-exact
cross-engine (selection order over bit-identical doubles is total; the
repo's Holt fold is bit-exact at α=β=½ by construction). When the
ceil-rank exceeds n (tiny calibration sets) coverage is unachievable and
the half-width is NULL — disclosed, never a silent max.

Scale shape: the Holt fold is the existing one-aggregate-per-series
operator; residual scoring is one lag window; the quantile is a
group-bounded rank selection. Nothing global.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapipeline_spark.operators.holt import holt_running


def conformal_holt_interval(
    df: DataFrame,
    key_cols: Sequence[str],
    y_col: str,
    order_cols: Sequence[str],
    coverage_pct: int = 90,
) -> DataFrame:
    """One row per series: calibration-score count and the split-conformal
    half-width at ``coverage_pct`` (the ceil((n+1)·pct/100)-th smallest
    absolute one-step Holt residual; NULL when n is too small for the
    requested coverage)."""
    run = holt_running(
        df, y_col, key_cols, order_by=order_cols,
        level_out="__l__", trend_out="__b__",
    )
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    pred = F.lag(F.col("__l__")).over(w) + F.lag(F.col("__b__")).over(w)
    scored = (
        run.withColumn("__pred__", pred)
        .filter(F.col("__pred__").isNotNull())
        .select(
            *key_cols,
            F.abs(F.col(y_col).cast("double") - F.col("__pred__")).alias(
                "score"
            ),
        )
    )
    wr = Window.partitionBy(*key_cols).orderBy("score")
    wg = Window.partitionBy(*key_cols)
    ranked = scored.withColumn("i", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wg)
    )
    want = F.expr(f"CAST(((n + 1) * {int(coverage_pct)} + 99) DIV 100 AS BIGINT)")
    return (
        ranked.groupBy(*key_cols)
        .agg(
            F.max("n").cast("long").alias("n_cal"),
            F.max(F.when(F.col("i") == want, F.col("score"))).alias(
                "q_halfwidth"
            ),
        )
    )
