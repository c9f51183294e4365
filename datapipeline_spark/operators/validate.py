"""Fail-fast data-contract validation (SURVEY.md §4 custom work item 4).

The reference raises mid-iteration on duplicate keys, order violations,
infinity, and partition-type drift (alignment/engine.py:56-65,
broadcast.py:24-36, transforms/utils.py:11-28). A lazy engine cannot raise
"mid-stream", so contracts become explicit **validation actions** — cheap
aggregate jobs run before writes — plus `raise_error` column guards for the
strict in-plan variants.

All checks are single-pass aggregates: at 100 TB each costs one scan (or
piggybacks the shuffle the downstream op needs anyway).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIME = "time"


class ContractViolation(ValueError):
    pass


def check_unique_keys(
    df: DataFrame, keys: Sequence[str], context: str = "stream"
) -> None:
    """Duplicate `(partition, time)` keys are an error (alignment/engine.py:
    56-65)."""
    dup = (
        df.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ContractViolation(
            f"{context}: duplicate key {tuple(dup[0])[:-1]!r} (x{dup[0]['count']})"
        )


def check_no_infinity(
    df: DataFrame, columns: Sequence[str], context: str = "stream"
) -> None:
    """Infinity is rejected everywhere (domain/value.py:6-14)."""
    conds = [
        F.sum(
            (F.col(c).cast("double") == float("inf")).cast("int")
            + (F.col(c).cast("double") == float("-inf")).cast("int")
        ).alias(c)
        for c in columns
    ]
    row = df.agg(*conds).first()
    bad = [c for c in columns if (row[c] or 0) > 0]
    if bad:
        raise ContractViolation(f"{context}: infinite values in columns {bad}")


def check_required_time(df: DataFrame, context: str = "stream") -> None:
    """Every record must carry a (tz-aware) time (pipelines/stream/
    pipeline.py:146-184); in Spark null time is the violation."""
    n = df.filter(F.col(TIME).isNull()).limit(1).count()
    if n:
        raise ContractViolation(f"{context}: record with null time")


def validate_stream(
    df: DataFrame,
    partition_by: Sequence[str] = (),
    numeric_columns: Sequence[str] | None = None,
    unique: bool = True,
    context: str = "stream",
) -> DataFrame:
    """Run the full contract bundle; returns `df` unchanged for chaining.

    One aggregate job per check — run before writes when reference-parity
    error behavior is wanted (the plan itself stays lazy otherwise).
    """
    check_required_time(df, context)
    if unique:
        check_unique_keys(df, [*partition_by, TIME], context)
    if numeric_columns is None:
        numeric_columns = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("double", "float")
        ]
    if numeric_columns:
        check_no_infinity(df, numeric_columns, context)
    return df
