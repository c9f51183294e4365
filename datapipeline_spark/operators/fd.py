"""Functional-dependency discovery — column-pair determinism profiling.

For each ordered column pair (A → B): does A determine B, and how nearly?
The data-profiling primitive behind schema inference, key detection, and
normalization advice (Papenbrock 2015's FD-discovery benchmark family;
the reference's profiling stops at per-column stats —
operators/profile.py parity note). g3-style strength: the minimum number
of rows to delete for the FD to hold exactly = ``n - Σ_groups max-class
size``; here the simpler and more common violation count: rows whose A-
group carries more than one distinct B.

All pairs are profiled in ONE pass: every row explodes to its (pair_id,
a_value, b_value) triples, one (pair, a)-keyed aggregation counts rows
and distinct Bs per determinant group, one (pair)-keyed rollup sums
violations. Shuffle mass is rows x pairs — the explode is the honest
cost of single-pass profiling (pairs is len(cols)^2, pick the candidate
columns); nothing is ever keyed wider than (pair, a_value), and the
output is len(cols)^2 rows of exact integers (strength in ppm by integer
division — engine-exact).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile every ordered pair of ``cols``. Returns one row per
    (determinant, dependent): distinct determinant values, exact FD flag,
    violating-row count, and held-fraction in ppm. Null values are one
    more domain value (two nulls agree), matching SQL GROUP BY."""
    # The pair tag rides BOTH full-data exchanges (the (pair, av, bv)
    # dedup and the (pair, av) group rollup), so it is shuffled rows ×
    # pairs times: carry it as ONE int pair_id instead of two column-name
    # strings (~20 bytes/row narrower keys that also hash/compare cheaper
    # — guide §2.3), and map the id back to (det, dep) in the final
    # len(cols)² -row projection where it costs nothing.
    pairs = []
    names = []
    for a in cols:
        for b in cols:
            if a != b:
                pid = len(names)
                names.append((a, b))
                pairs.append(
                    F.struct(
                        F.lit(pid).cast("int").alias("pid"),
                        F.col(a).cast("string").alias("av"),
                        # null is one more domain value (two nulls agree);
                        # countDistinct would silently drop it
                        F.coalesce(F.col(b).cast("string"), F.lit("␀")).alias(
                            "bv"
                        ),
                    )
                )
    exploded = df.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.pid", "p.av", "p.bv"
    )
    groups = exploded.groupBy("pid", "av").agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.countDistinct("bv").cast("long").alias("n_dep"),
    )
    det_of = F.element_at(
        F.array(*[F.lit(a) for a, _ in names]), F.col("pid") + 1
    ).alias("det")
    dep_of = F.element_at(
        F.array(*[F.lit(b) for _, b in names]), F.col("pid") + 1
    ).alias("dep")
    return (
        groups.groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("det_groups"),
            F.sum("rows").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("n_dep") > 1, F.col("rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("violating_rows"),
        )
        .select(
            det_of,
            dep_of,
            "det_groups",
            "n_rows",
            "violating_rows",
            F.expr(
                "CAST(CASE WHEN violating_rows > 0 THEN 0 ELSE 1 END AS INT)"
            ).alias("holds"),
            F.expr(
                "CAST(((n_rows - violating_rows) * 1000000) DIV n_rows AS BIGINT)"
            ).alias("held_ppm"),
        )
    )
