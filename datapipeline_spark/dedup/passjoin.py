"""PassJoin — exact edit-distance self-join via segment pigeonhole
(Li, Deng & Feng, "PassJoin: A Partition-based Method for Similarity
Joins", VLDB 2011).

The scale-correct form of blocked fuzzy matching: a naive block join
compares O(Σ block²) pairs, which is quadratic in block size and falls
over the moment blocks grow with the data (measured 53x on a 10x scale
rehearsal). PassJoin is EXACT — same output as the naive join — with
candidate volume linear in rows:

- every string of length L is partitioned into ``k+1`` segments (even
  split, deterministic layout); if edit_distance(a, b) <= k, at least one
  of a's segments survives the <= k edits untouched, and its aligned copy
  appears in b as a contiguous substring whose start is displaced by at
  most the net insertions/deletions before it — i.e. by at most k;
- so the probe side generates, for each candidate partner length
  L in [len(b)-k, len(b)+k] and each segment slot, the substrings of b at
  the slot's position shifted by -k..k, and candidates are the exact
  equi-join (partner_len, slot, substring) == (len(a), slot, segment) —
  ≤ (2k+1)·(k+1)·(2k+1) probe rows per string, a constant;
- candidates dedupe to id pairs and are verified with the engine's
  bounded levenshtein. No false negatives (pigeonhole), false positives
  removed by verification ⇒ bit-identical to the naive blocked join, so
  the naive SQL remains the oracle.

Strings shorter than ``k+1`` characters cannot be segmented (an empty
segment would match everywhere); they route through a tiny brute-force
branch joined only against strings of length <= 2k+1 — a bounded set by
construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 2,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """All pairs (id_a < id_b) within a block with levenshtein <= k.

    Output: ``block_cols + (id_a, id_b, dist)``. Exactly equal to the
    naive ``a JOIN b ON block AND a.id < b.id WHERE lev(a,b) <= k`` —
    which is therefore its oracle — at O(n) candidate volume instead of
    O(Σ block²).
    """
    bc = list(block_cols)
    base = df.select(
        *bc, F.col(id_col).alias("__id__"), F.col(str_col).alias("__s__")
    ).withColumn("__L__", F.length("__s__"))

    long_side = base.filter(F.col("__L__") >= k + 1)
    short_side = base.filter(F.col("__L__") < k + 1)

    # ---- segment layout for length L, slot i (0-based), k+1 slots:
    #   q = L div (k+1), r = L mod (k+1)
    #   len_i = q + (i >= k+1-r), start_i (0-based) = i*q + max(0, i-(k+1-r))
    def seg_expr(L: str, i: str) -> tuple[str, str]:
        q = f"({L} DIV {k + 1})"
        r = f"({L} % {k + 1})"
        ln = f"({q} + (CASE WHEN {i} >= {k + 1} - {r} THEN 1 ELSE 0 END))"
        st = f"({i} * {q} + GREATEST(0, {i} - ({k + 1} - {r})))"
        return st, ln

    st, ln = seg_expr("__L__", "i")
    indexed = long_side.select(
        *bc,
        "__id__",
        "__s__",
        "__L__",
        F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
    ).select(
        *bc,
        F.col("__id__").alias("id_a"),
        F.col("__L__").alias("pl"),
        "i",
        F.expr(f"substring(__s__, {st} + 1, {ln})").alias("seg"),
    )

    # probe side: for each partner length pl in [L-k, L+k] (>= k+1), each
    # slot, each shift d in [-k, k]: the substring of __s__ at the
    # partner-layout position + d. Generated as one exploded struct array.
    stp, lnp = seg_expr("pl", "i")
    probe = (
        base.select(
            *bc,
            "__id__",
            "__s__",
            "__L__",
            F.explode(F.sequence(F.col("__L__") - k, F.col("__L__") + k)).alias("pl"),
        )
        .filter(F.col("pl") >= k + 1)
        .select(
            *bc,
            "__id__",
            "__s__",
            "__L__",
            "pl",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
        )
        .select(
            *bc,
            "__id__",
            "__L__",
            "pl",
            "i",
            F.explode(F.sequence(F.lit(-k), F.lit(k))).alias("d"),
            F.col("__s__"),
        )
        .withColumn("__p__", F.expr(f"{stp} + d"))
        .filter(
            (F.col("__p__") >= 0)
            & (F.col("__p__") + F.expr(lnp) <= F.col("__L__"))
        )
        .select(
            *bc,
            F.col("__id__").alias("id_b"),
            "pl",
            "i",
            F.expr(f"substring(__s__, __p__ + 1, {lnp})").alias("seg"),
        )
    )

    cand = (
        indexed.join(probe, [*bc, "pl", "i", "seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            *bc,
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )

    strs = base.select(*bc, F.col("__id__"), F.col("__s__"))
    verified = (
        cand.join(
            strs.withColumnsRenamed({"__id__": "id_a", "__s__": "__sa__"}), [*bc, "id_a"]
        )
        .join(
            strs.withColumnsRenamed({"__id__": "id_b", "__s__": "__sb__"}), [*bc, "id_b"]
        )
        .withColumn("dist", F.levenshtein("__sa__", "__sb__", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select(*bc, "id_a", "id_b", "dist")
    )

    # short strings (< k+1 chars): brute within block against partners of
    # length <= 2k+1 only (|len diff| <= k bounds the partner set)
    partners = base.filter(F.col("__L__") <= 2 * k + 1)
    a = short_side.select(
        *bc, F.col("__id__").alias("id_a"), F.col("__s__").alias("__sa__")
    )
    b = partners.select(
        *bc, F.col("__id__").alias("id_b"), F.col("__s__").alias("__sb__")
    )
    brute = (
        a.join(b, bc)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("__sa__", "__sb__", k).cast("long"))
        .filter(F.col("dist") >= 0)
        .select(*bc, "id_a", "id_b", "dist")
    )
    # the brute branch overlaps `verified` when a short string's partner is
    # long-side-indexed AND probed; union+distinct keeps pairs unique
    return verified.unionByName(brute).distinct()
