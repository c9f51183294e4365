"""Declarative data-quality expectations (Delta Live Tables' expect /
expect_or_drop / expect_or_fail shape — generalizes the reference's
hard-coded fail-fast contracts (alignment/engine.py:56-65 duplicate keys,
transforms/utils.py:11-28 Inf rejection) into user-declared rules).

Each expectation is a boolean SQL expression evaluated per row. Actions:
- "warn": violations are only counted (report);
- "drop": violating rows are filtered out;
- "fail": any violation aborts the job (raise_error at first touch).

The report is ONE aggregate pass regardless of rule count — every rule
becomes a conditional sum in the same map-side-combinable aggregate, then a
stack() unpivot of the single result row. No per-rule scans, no shuffles
beyond the one global aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    expr: str  # boolean SQL, True = row passes
    action: Literal["warn", "drop", "fail"] = "warn"


def expectation_report(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """(rule, action, n_rows, n_violations, violation_ppm) — one row per
    rule, from a single aggregate pass over the input.

    NULL convention (matches enforcement): a row whose expr evaluates to
    NULL is a VIOLATION — the same rows `apply_expectations` drops for a
    drop rule / raises on for a fail rule (DLT semantics: only expr = TRUE
    passes). Counted as `when(expr, 0).otherwise(1)` so NULL lands in the
    violation bucket.
    """
    exps = list(expectations)
    if not exps:
        return df.sparkSession.createDataFrame(
            [],
            "rule string, action string, n_rows bigint, n_violations bigint,"
            " violation_ppm bigint",
        )
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, e in enumerate(exps):
        aggs.append(
            F.sum(F.when(F.expr(e.expr), 0).otherwise(1)).alias(f"__v{i}__")
        )
    row = df.agg(*aggs)
    # unpivot via typed literals (no SQL interpolation: rule names with
    # quotes can't break parsing, and the row count stays literal-safe)
    unpivoted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(e.name).alias("rule"),
                    F.lit(e.action).alias("action"),
                    F.col(f"__v{i}__").alias("n_violations"),
                )
                for i, e in enumerate(exps)
            ]
        )
    ).alias("r")
    return row.select(F.col("__n__").alias("n_rows"), unpivoted).select(
        F.col("r.rule").alias("rule"),
        F.col("r.action").alias("action"),
        F.col("n_rows"),
        F.col("r.n_violations").alias("n_violations"),
    ).select(
        "rule",
        "action",
        "n_rows",
        "n_violations",
        # exact integer ppm: violations * 1e6 DIV rows — no float rounding
        F.expr("CAST((n_violations * 1000000) DIV greatest(n_rows, 1) AS BIGINT)").alias(
            "violation_ppm"
        ),
    )


def apply_expectations(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """Enforce the rules on the stream itself: drop-rule violations are
    filtered; a fail-rule violation raises at evaluation time (lazy, like
    every engine contract — surfaces on first action); warn rules pass
    rows through untouched (count them with expectation_report)."""
    out = df
    for e in expectations:
        cond = F.expr(e.expr)
        if e.action == "drop":
            out = out.filter(cond)
        elif e.action == "fail":
            out = out.filter(
                F.when(cond, F.lit(True)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(f"expectation {e.name!r} violated: "),
                            F.lit(e.expr),
                        )
                    )
                )
            )
    return out
