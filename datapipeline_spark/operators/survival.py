"""Survival analysis: life table + Kaplan-Meier estimator.

Churn/retention's principled form (Kaplan-Meier 1958): given per-subject
durations with right-censoring flags, the life table gives, at every
observed duration t, the number still at risk, the events (churns) at t,
and the censored exits at t; the KM curve is the running product of
``(n_risk − d) / n_risk``.

Scale shape: one aggregation collapses subjects to the (duration, event)
contingency — bounded by the DURATION DOMAIN (days of a product's life),
not subjects — and the at-risk counts come from a reverse prefix sum over
that tiny aggregated table (the markov/prefix tiny-table contract; for an
unbounded duration domain route it through the two-phase bucketed scan).
The registry entry emits the LIFE TABLE only — pure exact integers, so it
hash-matches the oracle; the survival product is a float chain
(``F.product`` over the sorted tiny table) kept in the operator and
pinned by a pytest differential against a hand-rolled KM, the same
discipline that keeps libm out of oracles elsewhere.

Reference gap: the reference has no survival surface (closest is nothing
— retention grids in this repo are the empirical cousin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def life_table(df: DataFrame, duration_col: str, event_col: str) -> DataFrame:
    """Per observed duration t: (t, n_risk, d_events, c_censored).

    ``duration_col`` must be exact integer units (days); ``event_col`` is
    1 for an observed event (churn), 0 for right-censored. ``n_risk`` at
    t counts subjects with duration >= t (standard convention: exits at t
    are still at risk at t)."""
    cell = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("d_events"),
        F.sum(F.when(F.col(event_col) == 1, 0).otherwise(1))
        .cast("long")
        .alias("c_censored"),
    )
    # reverse prefix over the aggregated duration table (tiny-table window)
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    return cell.withColumn(
        "n_risk", F.sum(F.col("d_events") + F.col("c_censored")).over(w)
    ).select("t", "n_risk", "d_events", "c_censored")


def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str, out: str = "survival"
) -> DataFrame:
    """Life table + the KM survival estimate S(t) = Π_{t' <= t, d>0}
    (n_risk − d)/n_risk — a float running product over the sorted tiny
    table (deterministic within an engine; differential-tested, not
    oracle'd)."""
    lt = life_table(df, duration_col, event_col)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    factor = F.when(
        F.col("d_events") > 0,
        (F.col("n_risk") - F.col("d_events")).cast("double")
        / F.col("n_risk").cast("double"),
    ).otherwise(F.lit(1.0))
    return lt.withColumn(out, F.product(factor).over(w))
