"""Missing-value canon (reference src/datapipeline/domain/value.py:6-38).

- `None` is the one missing value; NaN normalizes to null.
- Infinity is rejected (raise) everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def nan_to_null(col: Column | str) -> Column:
    """NaN → null for float columns (domain/value.py:9-11)."""
    c = _as_col(col)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def no_infinity(col: Column | str, context: str = "value") -> Column:
    """Pass the value through, raising at execution time on ±Inf.

    The reference raises `ValueError("Infinite values are not allowed")`
    (domain/value.py:12-14); in a lazy engine this becomes a `raise_error`
    branch evaluated inside codegen — zero cost on the no-error path.
    """
    c = _as_col(col)
    return F.when(
        c.isin(float("inf"), float("-inf")),
        F.raise_error(F.lit(f"Infinite values are not allowed in {context}")),
    ).otherwise(c)


def normalize_floats(df: DataFrame, *cols: str) -> DataFrame:
    """Apply the full canon (NaN→null, Inf→error) to float columns."""
    out = df
    for name in cols:
        out = out.withColumn(name, no_infinity(nan_to_null(name), name))
    return out
