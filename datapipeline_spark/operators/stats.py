"""Grouped Spearman rank correlation — monotonic-association analytics the
reference's linear pipeline has no analogue for (its statistics stop at the
Welford scaler, src/datapipeline/pipelines/dataset/scaler.py).

Spearman = Pearson on fractional ranks. Implemented Spark-first with the
repo's exact-integer discipline so the result is cross-engine
deterministic and oracle-checkable:

- fractional (average) ranks are carried DOUBLED — ``2*rank_min + ties - 1``
  — which is always an exact bigint (scaling both variables by 2 leaves
  correlation unchanged), so every per-group sum (Σx, Σy, Σx², Σy², Σxy)
  is exact integer arithmetic, order- and partition-invariant;
- the Pearson combination ``(nΣxy - ΣxΣy) / sqrt(nΣx² - (Σx)²) /
  sqrt(nΣy² - (Σy)²)`` runs in decimal(38,0) (HUGEINT on the oracle side)
  — products of 10^16-scale sums stay exact — and only then drops to
  double for sqrt/divide; sqrt is IEEE-correctly-rounded (unlike libm
  ln/exp), so the final rounded value hash-matches the SQL oracle.

Plan shape: one hash exchange on the group key feeds two in-partition
sorts (ranks for x and y; the tie counts ride the same sorts), then one
map-side-combined aggregate. No joins, no collects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def _rank2(groups: Sequence[str], col: str) -> F.Column:
    """Doubled fractional rank: 2*rank + ties - 1 (exact bigint)."""
    w = Window.partitionBy(*groups).orderBy(col)
    t = Window.partitionBy(*groups, col)
    return (2 * F.rank().over(w) + F.count(F.lit(1)).over(t) - 1).cast("long")


def spearman_corr(
    df: DataFrame, x: str, y: str, groups: Sequence[str] = (), out: str = "spearman"
) -> DataFrame:
    """Per-group Spearman rank correlation of ``x`` vs ``y`` (average ranks
    for ties). Output: groups + (n, <out>), corr rounded to 6 decimals."""
    gx = list(groups)
    d = df.select(*gx, _rank2(gx, x).alias("rx"), _rank2(gx, y).alias("ry"))
    a = d.groupBy(*gx).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = [
        F.col(c).cast(_D) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    ]
    num = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    # a constant column (zero rank variance) leaves correlation undefined:
    # NULL, not a divide-by-zero (ANSI) or NaN
    corr = F.when(
        (vx == 0) | (vy == 0), F.lit(None).cast("double")
    ).otherwise(F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6))
    return a.select(*gx, F.col("n"), corr.alias(out))


def hhi(
    df: DataFrame, value: str, groups: Sequence[str] = (), out: str = "hhi"
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group: sum of squared
    value shares, in (1/n, 1]. ``value`` must be an exact-integer column
    (cents — the repo-wide convention): HHI = Σv² / (Σv)² is then a ratio
    of exact decimal(38,0) sums, and the single double division is
    IEEE-deterministic, so the rounded index hash-matches a SQL oracle.
    One aggregation; no sort."""
    gx = list(groups)
    a = df.groupBy(*gx).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value).cast(_D)).alias("sv"),
        F.sum((F.col(value).cast(_D) * F.col(value).cast(_D))).alias("svv"),
    )
    ratio = F.col("svv").cast("double") / (F.col("sv") * F.col("sv")).cast("double")
    return a.select(
        *gx,
        F.col("n"),
        F.when(F.col("sv") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(ratio, 6))
        .alias(out),
    )


def gini(
    df: DataFrame, value: str, groups: Sequence[str] = (), out: str = "gini"
) -> DataFrame:
    """Gini inequality coefficient per group via the sorted-rank identity
    G = Σ(2i - n - 1)·v_i / (n·Σv), i ascending by value. Tie-order
    invariant (equal values make the block's coefficient sum independent
    of order within the block), so row_number over the value alone is
    deterministic. With integer ``value`` every sum is exact in
    decimal(38,0) and the one double division is IEEE-deterministic.
    One exchange + in-partition sort + one aggregate."""
    gx = list(groups)
    w = Window.partitionBy(*gx).orderBy(value)
    d = df.select(*gx, F.col(value).cast(_D).alias("v"), F.row_number().over(w).alias("i"))
    a = d.groupBy(*gx).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * (2 * F.col("i").cast(_D))).alias("s2iv"),
    )
    n = F.col("n").cast(_D)
    num = (F.col("s2iv") - (n + 1) * F.col("sv")).cast("double")
    den = (n * F.col("sv")).cast("double")
    return a.select(
        *gx,
        F.col("n"),
        F.when(F.col("sv") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 6))
        .alias(out),
    )
