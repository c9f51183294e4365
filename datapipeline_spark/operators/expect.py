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
    rule, from a single aggregate pass over the input."""
    exps = list(expectations)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, e in enumerate(exps):
        aggs.append(
            F.sum(F.when(~F.expr(e.expr), 1).otherwise(0)).alias(f"__v{i}__")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{e.name}', '{e.action}', __v{i}__" for i, e in enumerate(exps)
    )
    return row.select(
        F.expr(
            f"stack({len(exps)}, {stack_args}) AS (rule, action, n_violations)"
        ),
        F.col("__n__").alias("n_rows"),
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
