"""Slowly-changing-dimension history building (lakehouse SCD Type-2 — no
reference analogue: the reference rebuilds artifacts from scratch,
src/datapipeline/artifacts/, and never tracks attribute validity over time).

Semantics: consecutive equal values of `attr` (per key, in the given total
order) collapse into one validity interval [valid_from, valid_to) with
valid_to = the next interval's valid_from and NULL marking the current row.
Timestamps are moved, never computed, so results are bit-exact across
engines and partitionings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attr: str,
    time_col: str = "time",
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Gaps-and-islands SCD2: lag-compare marks changes, a running change
    count assigns run ids, one run-level aggregate takes each interval's
    start and row count, and lead() closes the intervals.

    ONE shuffle for everything: the lag, the running sum, the
    (keys, run_id) aggregate, and the interval lead all accept the
    hashpartitioning(keys) exchange — Spark's clustering requirement for
    (keys, run_id) is satisfied by partitioning on the keys alone.
    """
    keys = list(keys)
    order_cols = list(order_cols) if order_cols else [time_col]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    chg = (~F.lag(attr).over(w).eqNullSafe(F.col(attr))).cast("int")
    runs = df.withColumn("__chg__", chg).withColumn(
        "__run__",
        F.sum("__chg__").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = runs.groupBy(*keys, "__run__").agg(
        F.min(attr).alias(attr),
        F.min(time_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy(*keys).orderBy("__run__")
    return hist.select(
        *keys,
        attr,
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.lead("valid_from").over(wl).isNull().alias("is_current"),
        "n_events",
    )
