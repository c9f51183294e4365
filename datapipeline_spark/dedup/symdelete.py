"""Symmetric-delete (SymSpell-style) edit-distance join, k <= 2.

EXACT all-pairs levenshtein join via deletion neighborhoods: if
lev(a, b) <= k then a and b share at least one common string obtainable
by deleting at most k characters from each (take an optimal alignment
and delete the characters touched by the edits) — so candidates are the
equi-join of the ≤k-deletion variant sets, then bounded levenshtein
removes false positives. Same output as the naive blocked self-join,
which therefore remains the oracle verbatim.

Complementary to dedup/passjoin.py (segment pigeonhole, any k): PassJoin
keys candidates on positional SEGMENTS and degrades to quadratic when
strings share long constant regions (every "Customer#…" name shares its
slot-0 segment with every other); deletion variants keep the FULL
discriminating content in the join key, so low-entropy shared prefixes
don't collide — the right tool for short entity fields (names, SKUs,
addresses). Cost is C(L,k) variants per string (L=18, k=2 → ≤172):
linear in rows with a constant factor, the standard spell-index trade.
Variant generation is pure JVM higher-order functions; no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: str = "__s__", k: int = 2) -> Column:
    """Array of all distinct strings from deleting <= k chars of `s`
    (SQL column name), k in {1, 2}."""
    if k not in (1, 2):
        raise ValueError("symmetric-delete join supports k in {1, 2}")
    one = (
        f"transform(sequence(1, length({s})),"
        f" i -> concat(substring({s}, 1, i - 1), substring({s}, i + 1, length({s}))))"
    )
    parts = [f"array({s})", one]
    if k == 2:
        two = (
            f"CASE WHEN length({s}) >= 2 THEN flatten(transform(sequence(1, length({s}) - 1),"
            f" i -> transform(sequence(i + 1, length({s})),"
            f" j -> concat(substring({s}, 1, i - 1),"
            f" substring({s}, i + 1, j - i - 1),"
            f" substring({s}, j + 1, length({s}))))))"
            f" ELSE array() END"
        )
        parts.append(two)
    return F.expr(f"array_distinct(concat({', '.join(parts)}))")


def deletion_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 2,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """All pairs (id_a < id_b) within a block with levenshtein <= k
    (k in {1, 2}). Output: ``block_cols + (id_a, id_b, dist)`` — exactly
    the naive ``a JOIN b ON block AND id_a < id_b WHERE lev <= k``.

    Plan: one explode to (block, variant, id), then IN-ROW pair generation
    per (block, variant) bucket (one collect_set groupBy + (i < j)
    explode — the basket-pair pattern, functions/pairs.py) instead of a
    variant-keyed self-equi-join: the exploded variant stream is consumed
    ONCE, one exchange feeds the pair stream, and no join ever keys on the
    variant alone. Candidate volume is still Σ bucket², with buckets sized
    by how many strings share a full deletion variant (tiny unless the
    strings genuinely collide); distinct id pairs then rejoin the original
    strings for bounded-levenshtein verification.
    """
    bc = list(block_cols)
    base = df.select(
        *bc, F.col(id_col).alias("__id__"), F.col(str_col).alias("__s__")
    )
    # NULL block keys can never match under the naive join's equality
    # semantics (NULL = NULL is not true), but GROUP BY treats NULLs as
    # one group — without this filter the NULL block would generate
    # candidate pairs that only disappear because the verification
    # re-join happens to null-drop them (round-7 ADVICE: a refactor of
    # that join to coalesce-keyed or in-row form would silently change
    # NULL-block results). Drop them at the source instead.
    for c in bc:
        base = base.filter(F.col(c).isNotNull())
    exploded = base.select(
        *bc, "__id__", F.explode(deletion_variants("__s__", k)).alias("__v__")
    )
    buckets = exploded.groupBy(*bc, "__v__").agg(
        F.sort_array(F.collect_set("__id__")).alias("__ids__")
    )
    ms = F.col("__ids__")
    cand = (
        buckets.filter(F.size(ms) >= 2)
        .select(*bc, ms, F.posexplode(ms).alias("__i__", "id_a"))
        .select(
            *bc,
            "id_a",
            F.explode(
                F.slice(ms, F.col("__i__") + F.lit(2), F.size(ms))
            ).alias("id_b"),
        )
        .distinct()
    )
    strs = base
    return (
        cand.join(
            strs.withColumnsRenamed({"__id__": "id_a", "__s__": "__sa__"}),
            [*bc, "id_a"],
        )
        .join(
            strs.withColumnsRenamed({"__id__": "id_b", "__s__": "__sb__"}),
            [*bc, "id_b"],
        )
        .withColumn("dist", F.levenshtein("__sa__", "__sb__", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select(*bc, "id_a", "id_b", "dist")
    )
