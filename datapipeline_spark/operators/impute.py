"""Group-mode aggregation and mode-based null imputation.

``group_mode`` is the most-frequent-value aggregate (SQL's MODE() but
with a DETERMINISTIC tie-break — ties resolve to the largest value, so
results are engine- and partition-stable, unlike engines' arbitrary-pick
MODE). ``impute_mode`` is the classic categorical-imputation transform:
replace nulls with their group's mode — the fill family's cross-sectional
cousin (operators/window.py fill/forward_fill impute from a row's own
history; this imputes from the group's distribution).

Plan: one (group, value)-keyed count, one max_by over the counted table
(both map-side combinable), and for imputation one group-keyed join back.
Nothing wider than (group, value) is ever a shuffle key. Reference
parity: the reference has no imputation (its fill is trailing-window
only, transforms/stream/fill.py) — beyond-reference operator.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out: str = "mode",
    count_col: str = "mode_count",
) -> DataFrame:
    """One row per group: the most frequent non-null value (ties → the
    LARGEST value, a total deterministic order) and its count."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt__"))
    )
    return counts.groupBy(*group_cols).agg(
        F.max_by(
            F.col(value_col), F.struct(F.col("__cnt__"), F.col(value_col))
        ).alias(out),
        F.max(F.struct(F.col("__cnt__"), F.col(value_col)))["__cnt__"]
        .cast("long")
        .alias(count_col),
    )


def impute_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out: str | None = None,
) -> DataFrame:
    """Fill nulls in ``value_col`` with the group's mode (in place, or
    into ``out`` when given). Groups whose values are ALL null stay
    null — there is nothing to learn from."""
    target = out or value_col
    modes = group_mode(df, group_cols, value_col, out="__mode__").select(
        *group_cols, "__mode__"
    )
    return (
        df.join(modes, list(group_cols), "left")
        .withColumn(target, F.coalesce(F.col(value_col), F.col("__mode__")))
        .drop("__mode__")
    )
