"""Standard scaler artifacts: fit (per id, optionally per fold) + apply.

Reference: Welford streaming mean/var with std clamped to ≥1e-12
(transforms/vector/scaler.py:13-79); folded fit uses ONLY that fold's train
rows — leakage-proof by construction (operations/artifacts/scaler.py:87-129).

Spark shape: fit = one groupBy aggregate (Spark's var_pop is a single-pass
merged moment computation — the distributed generalization of Welford);
apply = broadcast join of the tiny stats table + column arithmetic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPSILON = 1e-12


def fit_scaler(
    long_df: DataFrame,
    id_col: str = "series_id",
    value_col: str = "value",
    fold_col: str | None = None,
    train_filter=None,
) -> DataFrame:
    """Stats per (fold?, id): mean, std (pop, clamped ≥ε), count of non-null.

    `train_filter`: boolean Column selecting the rows statistics may see
    (e.g. label == 'train'); everything else is excluded BEFORE aggregation,
    so validation/test values cannot influence the fit (leakage test in
    tests/test_dataset_layer.py).
    """
    df = long_df if train_filter is None else long_df.filter(train_filter)
    keys = ([fold_col] if fold_col else []) + [id_col]
    return df.groupBy(*keys).agg(
        F.avg(value_col).alias("mean"),
        F.greatest(F.stddev_pop(value_col), F.lit(EPSILON)).alias("std"),
        F.count(value_col).alias("n_obs"),
    )


def apply_scaler(
    df: DataFrame,
    stats: DataFrame,
    columns: Sequence[str],
    id_col: str = "series_id",
    fold_col: str | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Standardize wide columns: (x − mean)/std, null passthrough; arrays
    elementwise (reference transforms/vector/scaler.py:82-175).

    `stats` rows are keyed by id (+fold). Stats are collected to a literal
    map (they are tiny by definition) → pure column arithmetic, no join in
    the hot path, exactly like the reference's in-memory artifact lookup.
    """
    keys = ([fold_col] if fold_col else []) + [id_col, "mean", "std"]
    rows = stats.select(*keys).collect()

    def lookup(fold, sid):
        for r in rows:
            if sid == r[id_col] and (fold_col is None or r[fold_col] == fold):
                return r["mean"], r["std"]
        return None

    out = df
    if fold_col is None:
        for c in columns:
            ms = lookup(None, c)
            if ms is None:
                continue
            mean, std = ms
            expr = (F.col(c) - F.lit(mean)) / F.lit(std)
            if dict(df.dtypes)[c].startswith("array"):
                expr = F.transform(F.col(c), lambda x: (x - F.lit(mean)) / F.lit(std))
            if round_digits is not None:
                expr = (
                    F.round(expr, round_digits)
                    if not dict(df.dtypes)[c].startswith("array")
                    else F.transform(expr, lambda x: F.round(x, round_digits))
                )
            out = out.withColumn(c, expr)
        return out

    folds = sorted({r[fold_col] for r in rows})
    for c in columns:
        expr = F.col(c)
        scaled = None
        for fold in folds:
            ms = lookup(fold, c)
            if ms is None:
                continue
            mean, std = ms
            branch = (F.col(c) - F.lit(mean)) / F.lit(std)
            if round_digits is not None:
                branch = F.round(branch, round_digits)
            cond = F.col(fold_col) == F.lit(fold)
            scaled = F.when(cond, branch) if scaled is None else scaled.when(cond, branch)
        if scaled is not None:
            out = out.withColumn(c, scaled.otherwise(expr))
    return out
