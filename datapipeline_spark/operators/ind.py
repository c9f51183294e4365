"""Inclusion-dependency discovery — foreign-key-candidate profiling.

For each candidate (dependent column ⊆ referenced column): how many of
the dependent's distinct values appear in the referenced column? The
containment profile behind FK detection, join-path inference, and schema
reverse-engineering (the IND half of the Papenbrock profiling family;
``operators/fd.py`` covers the FD half — the reference's profiling stops
at per-column stats, see operators/profile.py parity note).

Scale posture: each side is reduced to its DISTINCT value set FIRST
(map-side-combinable hash aggregates — shuffle mass is distinct values,
never rows), then one value-keyed left join per candidate counts
containment. Candidate pairs are independent single-key joins unioned at
the end; nothing is ever keyed wider than one value column, and the
output is one exact-integer row per candidate. Containment strength in
ppm by integer division — engine-exact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (label_dependent, df_dependent, col_dependent,
#  label_referenced, df_referenced, col_referenced)
IndCandidate = tuple[str, DataFrame, str, str, DataFrame, str]


def ind_profile(candidates: Sequence[IndCandidate]) -> DataFrame:
    """Profile every candidate inclusion dependency. Returns one row per
    candidate: distinct non-null dependent values, how many are contained
    in the referenced column, exact-inclusion flag, and contained-fraction
    in ppm (integer division; NULL dependents are ignored, per SQL FK
    semantics where NULL trivially satisfies the constraint)."""
    outs = []
    for dep_label, dep_df, dep_col, ref_label, ref_df, ref_col in candidates:
        d = (
            dep_df.select(F.col(dep_col).cast("string").alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        r = (
            ref_df.select(F.col(ref_col).cast("string").alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
            .withColumn("__hit__", F.lit(1))
        )
        outs.append(
            d.join(r, "k", "left").agg(
                F.lit(f"{dep_label}.{dep_col}").alias("dependent"),
                F.lit(f"{ref_label}.{ref_col}").alias("referenced"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.count("__hit__").cast("long").alias("n_contained"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "dependent",
        "referenced",
        "n_distinct",
        "n_contained",
        F.when(F.col("n_distinct") == F.col("n_contained"), 1)
        .otherwise(0)
        .cast("int")
        .alias("holds"),
        F.when(
            F.col("n_distinct") > 0,
            F.expr("(n_contained * 1000000) DIV n_distinct"),
        )
        .otherwise(F.lit(None))
        .cast("long")
        .alias("contained_ppm"),
    )
