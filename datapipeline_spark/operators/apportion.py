"""Largest-remainder apportionment — exact integer budget allocation.

Distribute an integer budget across groups proportionally to weights so
the allocations are integers AND sum exactly to the budget (Hamilton's
method): every group gets ``floor(budget * w / W)``, and the leftover
units go one each to the groups with the largest remainders
(deterministic tie-break on the group key). The training-data use is
exact token/sample budget allocation across corpus sources — the
integer-exact companion to token_budget_mixture's hash-ordered fill; the
general use is any "make the rounded shares sum to 100%" report.

Everything is integer arithmetic: quota = (budget*w) DIV W, remainder =
(budget*w) MOD W — engine-exact in DECIMAL(38)/HUGEINT. The remainder
ranking runs on the AGGREGATED group table (one row per group), so the
rank window is the tiny-table pattern, never a per-row sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apportion(
    weights: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    budget: int,
    out: str = "allocated",
) -> DataFrame:
    """One row per group with the integer allocation. ``weights`` may
    carry several rows per group (they are summed first); weights must be
    non-negative integers (scale floats to integer units upstream, per
    the repo's cents convention)."""
    budget = int(budget)  # interpolated into SQL exprs — never a raw string
    g = weights.groupBy(*group_cols).agg(
        F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("__w__")
    )
    tot = g.agg(F.sum("__w__").alias("__tot__"))
    quotas = g.crossJoin(F.broadcast(tot)).select(
        *group_cols,
        F.col("__w__").cast("long").alias("weight"),
        F.expr(f"CAST(({budget} * __w__) DIV __tot__ AS BIGINT)").alias("__q__"),
        F.expr(f"CAST(({budget} * __w__) % __tot__ AS DECIMAL(38,0))").alias(
            "__r__"
        ),
    )
    # leftover units = budget - sum of floors; rank remainders on the tiny
    # per-group table (deterministic tie-break: the group key)
    leftover = quotas.agg(
        (F.lit(int(budget)) - F.sum("__q__")).cast("long").alias("__left__")
    )
    w = Window.orderBy(F.desc("__r__"), *[F.asc(c) for c in group_cols])
    return (
        quotas.crossJoin(F.broadcast(leftover))
        .withColumn("__rank__", F.row_number().over(w))
        .select(
            *group_cols,
            "weight",
            (
                F.col("__q__")
                + F.when(F.col("__rank__") <= F.col("__left__"), 1).otherwise(0)
            )
            .cast("long")
            .alias(out),
        )
    )
