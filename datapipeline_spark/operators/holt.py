"""Holt linear-trend (double exponential) smoothing — per-series level +
trend state and h-step forecast.

The sequential recurrence (Holt 1957):

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}      l_1 = y_1, b_1 = 0

is a true left fold — no window identity exists (unlike cusum's
prefix-sum−running-min form) — so it runs as a JVM-side ``aggregate``
lambda over the per-series sorted array (the ewma machinery's fold,
carried one struct field wider). State per series is two doubles; the
array is one series long (the per-key sequence contract that bounds
`sequence`/`winnowing` too). At the default α=β=½ every multiply is an
exact power-of-two scaling and every add is IEEE-correctly-rounded, so
the fold is bit-identical in any engine that folds left in the same
expression order — the property the recursive-CTE DuckDB oracle replays
step for step (same guarantee ewma's oracle rides; other α/β are
engine-parity-accurate only to rounding-order ulps).

Forecast: ŷ_{T+h} = l_T + h·b_T (one multiply + one add — also exact-
deterministic). Output is ONE row per series (final state), so result
cardinality is the key count, never the row count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    y_col: str,
    order_cols: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 3,
) -> DataFrame:
    """Fold Holt's level/trend recurrence over each series (ordered by
    ``order_cols`` — must be a total order within a key) and return one
    row per key: observation count, final level and trend, and the
    ``horizon``-step-ahead linear forecast."""
    a = F.lit(float(alpha))
    b = F.lit(float(beta))
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                F.col(y_col).cast("double").alias("y"),
            )
        )
    )
    df2 = df.groupBy(*key_cols).agg(arr.alias("__arr__"))
    init = F.struct(
        F.element_at(F.col("__arr__"), 1)["y"].alias("l"),
        F.lit(0.0).alias("b"),
    )
    rest = F.slice(F.col("__arr__"), 2, F.size(F.col("__arr__")) - 1)

    def step(acc, x):
        # l' appears in both fields; the repeated subtree evaluates
        # identically (deterministic IEEE), matching the oracle's inline
        # recomputation bit for bit
        l_new = a * x["y"] + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (b * (l_new - acc["l"]) + (F.lit(1.0) - b) * acc["b"]).alias("b"),
        )

    state = F.aggregate(rest, init, step)
    return df2.select(
        *key_cols,
        F.size("__arr__").cast("long").alias("n_obs"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + F.lit(float(horizon)) * state["b"]).alias(
            f"forecast_{horizon}"
        ),
    )


def holt_running(
    df: DataFrame,
    field: str,
    partition_by: Sequence[str],
    order_by: Sequence[str] = ("time",),
    alpha: float = 0.5,
    beta: float = 0.5,
    level_out: str = "holt_level",
    trend_out: str = "holt_trend",
) -> DataFrame:
    """Per-ROW Holt state: every row gains the (level, trend) the fold has
    reached at that row — the batch twin of streaming holt_stream's
    per-event emission (identical IEEE operation order, so the two are
    bit-equal at α=β=½). One aggregate collects each series (the per-key
    sequence contract that bounds `sequence`/ewma also bounds this), the
    fold carries growing level/trend arrays, one explode restores rows.
    Array append is a copy per step — O(n²) per key in the series length,
    the same cost class as the rolling collect_list frames; series length
    is bounded by the sequence contract, not corpus size."""
    a = F.lit(float(alpha))
    b = F.lit(float(beta))
    row = F.struct(*[F.col(c) for c in df.columns])
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_by)],
                row.alias("r"),
            )
        )
    )
    g = df.groupBy(*partition_by).agg(arr.alias("__arr__"))
    init = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(0.0).alias("b"),
        F.array().cast("array<double>").alias("ls"),
        F.array().cast("array<double>").alias("bs"),
    )

    def step(acc, x):
        y = x["r"][field].cast("double")
        l_new = F.when(acc["l"].isNull(), y).otherwise(
            a * y + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        )
        b_new = F.when(acc["l"].isNull(), F.lit(0.0)).otherwise(
            b * (l_new - acc["l"]) + (F.lit(1.0) - b) * acc["b"]
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.array_append(acc["ls"], l_new).alias("ls"),
            F.array_append(acc["bs"], b_new).alias("bs"),
        )

    st = F.aggregate(F.col("__arr__"), init, step)
    z = g.select(
        F.explode(
            F.arrays_zip(
                F.transform(F.col("__arr__"), lambda x: x["r"]).alias("r"),
                st["ls"].alias("lv"),
                st["bs"].alias("tr"),
            )
        ).alias("z")
    )
    return z.select(
        *[F.col(f"z.r.{c}").alias(c) for c in df.columns],
        F.col("z.lv").alias(level_out),
        F.col("z.tr").alias(trend_out),
    )
