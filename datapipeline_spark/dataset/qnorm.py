"""Quantile normalization — map every group's values onto the GLOBAL
value distribution (the microarray-era preprocessing staple, Bolstad
2003, reborn as an ML feature transform: per-segment signals become
comparable by replacing each value with the global value at the same
relative rank).

Exact rank arithmetic, never interpolation: a row at within-group rank r
of n maps to the global order statistic at position ceil(r·N/n) — all
integers, engine-exact. The global ranked lookup table is built by the
two-phase bucketed VALUE rank (operators/rank.bucketed_value_rank — no
single-task global sort); within-group ranks are group-keyed windows
(bounded by group size); the final step is one equi-join on the computed
position. Ties break by a caller-named unique column so every rank is
total — the determinism contract every oracle here rides.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapipeline_spark.operators.rank import bucketed_value_rank


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak: Sequence[str],
) -> DataFrame:
    """Add ``qnorm`` = the global order statistic at this row's
    group-relative rank. ``value_col`` must be an exact integer column;
    ``tiebreak`` must make (value, *tiebreak) unique."""
    ranked_global = bucketed_value_rank(df, value_col, list(tiebreak)).select(
        F.col("pos").alias("__gpos__"),
        F.col(value_col).alias("qnorm"),
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__nt__"))
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), *[F.col(c) for c in tiebreak]
    )
    wn = Window.partitionBy(group_col)
    with_rank = (
        df.withColumn("__r__", F.row_number().over(w))
        .withColumn("__n__", F.count(F.lit(1)).over(wn))
        .crossJoin(F.broadcast(total))  # 1-row total, lazy — never a count()
    )
    pos = F.expr("(__r__ * __nt__ + __n__ - 1) DIV __n__")
    return (
        with_rank.withColumn("__gpos__", pos)
        .join(ranked_global, "__gpos__")
        .drop("__r__", "__n__", "__nt__", "__gpos__")
    )
