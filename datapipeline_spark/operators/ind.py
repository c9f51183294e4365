"""Inclusion-dependency discovery — foreign-key-candidate profiling.

For each candidate (dependent column ⊆ referenced column): how many of
the dependent's distinct values appear in the referenced column? The
containment profile behind FK detection, join-path inference, and schema
reverse-engineering (the IND half of the Papenbrock profiling family;
``operators/fd.py`` covers the FD half — the reference's profiling stops
at per-column stats, see operators/profile.py parity note).

Scale posture: ALL candidates share one two-shuffle plan. Every side is
tagged (candidate ordinal, value, is_dep/is_ref) and unioned; a single
(candidate, value) max-aggregate collapses duplicates map-side (shuffle
mass is distinct values per side, never rows — same mass as per-pair
distinct-joins), and the containment identity |D ∩ R| = Σ d·r over the
collapsed flags replaces every join: n_distinct = Σ d, n_contained =
Σ d·r. Six candidates cost 2 exchanges total instead of 18 (a
distinct+distinct+join per pair), and the plan shape is independent of
the candidate count. Containment strength in ppm by integer division —
engine-exact.
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
    sides = []
    labels = []
    for i, (dep_label, dep_df, dep_col, ref_label, ref_df, ref_col) in enumerate(
        candidates
    ):
        labels.append((i, f"{dep_label}.{dep_col}", f"{ref_label}.{ref_col}"))
        # selectExpr strings instead of per-column F.lit/F.col chains: each
        # Column op is a Py4J round-trip and this loop runs 2x per
        # candidate — the string form cut ind_profile's construction time
        # roughly in half (the bloom-bitmap fix generalized). Column names
        # are user-supplied and interpolated inside backticks, so embedded
        # backticks must be doubled (the quoted-identifier escape) — a name
        # containing ` would otherwise break parsing or splice expression
        # text (round-7 ADVICE); dotted names stay literal this way too.
        dq = dep_col.replace("`", "``")
        rq = ref_col.replace("`", "``")
        sides.append(
            dep_df.selectExpr(
                f"{i} AS cand",
                f"CAST(`{dq}` AS STRING) AS k",
                "1 AS d",
                "0 AS r",
            ).where("k IS NOT NULL")
        )
        sides.append(
            ref_df.selectExpr(
                f"{i} AS cand",
                f"CAST(`{rq}` AS STRING) AS k",
                "0 AS d",
                "1 AS r",
            ).where("k IS NOT NULL")
        )
    tagged = sides[0]
    for s in sides[1:]:
        tagged = tagged.unionByName(s)
    per_value = tagged.groupBy("cand", "k").agg(
        F.max("d").alias("d"), F.max("r").alias("r")
    )
    per_cand = per_value.groupBy("cand").agg(
        F.sum("d").cast("long").alias("n_distinct"),
        F.sum(F.col("d") * F.col("r")).cast("long").alias("n_contained"),
    )
    spark = candidates[0][1].sparkSession
    lab = spark.createDataFrame(labels, "cand int, dependent string, referenced string")
    # Left join from the label skeleton: a candidate whose dependent AND
    # referenced sides are all-NULL must still report a (0, 0) row, which
    # the groupBy alone would drop.
    out = (
        lab.join(F.broadcast(per_cand), "cand", "left")
        .select(
            "dependent",
            "referenced",
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("n_contained", F.lit(0)).cast("long").alias("n_contained"),
        )
    )
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
