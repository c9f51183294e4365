"""Deterministic negative sampling for contrastive training pairs.

A (user, item) interaction table becomes k candidate negatives per
positive — the standard construction for implicit-feedback recommenders
and contrastive objectives (word2vec-style negative sampling, Mikolov
2013, under a uniform proposal). The reference engine has no sampling
surface beyond its preview limit (SURVEY §2.4); this is a beyond-reference
training-data operator.

Derandomized the repo's corpus-sampling way: candidate item
``H(seed|user|item|i) mod n_items`` with H the 52-bit sha256-prefix
integer (the same cross-engine hash contract as dataset/split.py and
sketch/cm.py), so the sample is reproducible across engines, runs, and
partition layouts, and SQL-oracle-exact.

Accidental hits (a drawn candidate the user actually interacted with) are
LABELED, not resampled: rejection loops have data-dependent depth and
break the fixed-row-count contract (exactly k rows per positive) that
downstream batch assembly wants. Training code drops or down-weights
``is_positive = 1`` rows — at LLM-corpus item cardinalities the hit rate
is ~|user history| / n_items, vanishing.

Scale: candidate generation is a pure map stage (explode k structs); the
labeling is one (user, item)-keyed left join against the distinct
positives — the same shuffle family as the input. Nothing is keyed wider,
nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h(seed: str, *cols):
    """52-bit sha256-prefix integer of 'seed|c1|c2|...' — identical
    arithmetic in Spark and ANSI SQL (see sketch/cm.py _cell)."""
    parts = [F.lit(seed)]
    for c in cols:
        parts += [F.lit("|"), c.cast("string")]
    return F.conv(F.substring(F.sha2(F.concat(*parts), 256), 1, 13), 16, 10).cast(
        "long"
    )


def negative_samples(
    positives: DataFrame,
    user_col: str,
    item_col: str,
    n_items,
    k: int = 3,
    seed: str = "neg",
) -> DataFrame:
    """k deterministic uniform candidate negatives per positive pair.

    ``n_items`` is a Column/int giving the dense item-id domain size
    (items are 0..n_items-1; pass the broadcast max+1 for a contiguous key
    space). Emits (user, pos_item, draw, neg_item, is_positive) with
    exactly k rows per input row; ``is_positive`` marks accidental hits
    against the user's OWN distinct positives.
    """
    n = n_items if isinstance(n_items, Column) else F.lit(int(n_items))
    u, it = F.col(user_col), F.col(item_col)
    draws = F.array(
        *[
            F.struct(
                F.lit(i).alias("draw"),
                (_h(seed, u, it, F.lit(i)) % n).alias("neg_item"),
            )
            for i in range(k)
        ]
    )
    cand = positives.select(
        u.alias("user"),
        it.alias("pos_item"),
        F.explode(draws).alias("d"),
    ).select("user", "pos_item", F.col("d.draw").alias("draw"), "d.neg_item")
    seen = positives.select(
        u.alias("user"), it.alias("neg_item"), F.lit(1).alias("__hit__")
    ).distinct()
    return (
        cand.join(seen, ["user", "neg_item"], "left")
        .withColumn("is_positive", F.coalesce(F.col("__hit__"), F.lit(0)))
        .drop("__hit__")
    )
