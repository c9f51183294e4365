"""Rendezvous (highest-random-weight) shard placement — deterministic
data-placement planning plus the resharding-movement audit.

Rendezvous hashing (Thaler & Ravishankar 1996, the consistent-placement
scheme behind most modern shard routers): a key lands on the shard whose
per-(key, shard) score is highest, so ADDING a shard moves exactly the
keys the new shard now wins — an expected 1/(S+1) of the data — and
nothing else reshuffles. That minimal-movement property is the whole
point at 100 TB, and this operator makes it an auditable query instead
of a whitepaper claim.

Scores are true per-(key, shard) hashes — balance needs JOINT
independence across shards, which no single-hash scramble family gives
(a multiplicative variant was measured 1.8× off-uniform: linear score
families share order structure across shards). S hashes per row is the
honest cost and S is small by definition. The argmax is an in-row array
fold: no explode, no shuffle beyond the final per-shard count.

Dual-mode hashing (functions/hashing.py): ``oracle`` (default) scores
with md5-48bit prefixes an ANSI-SQL oracle replays row-exactly; ``fast``
scores with per-(key, shard) xxhash64 — same placement law and balance
(pinned by test), codegen-native cost. Placements DIFFER between modes
(different hash family); pick one per table and stick to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_spark.functions.hashing import keyed_hash48


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    out: str = "shard",
    hash_mode: str | None = None,
) -> DataFrame:
    """Add ``out`` = the rendezvous shard (0-based) for each row's key.
    First-max wins on score ties — array_position is 1-based and
    first-match in both engines, so assignment is total and replayable."""
    k = F.col(key_col).cast("string")
    mode = hash_mode
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_shards) - 1)),
        lambda s: keyed_hash48(k, s, mode),
    )
    return df.withColumn(
        out,
        (F.array_position(scores, F.array_max(scores)) - 1).cast("long"),
    )


def resharding_report(
    df: DataFrame,
    key_col: str,
    n_before: int,
    n_after: int,
    hash_mode: str | None = None,
) -> DataFrame:
    """Per-shard movement audit for scaling ``n_before`` → ``n_after``
    shards: rows per shard under each layout and how many rows MOVED IN
    from a different old shard. Rendezvous guarantees moved_in ≈ 0 for
    surviving shards and ≈ N/n_after for each new one — the invariant a
    placement migration plan is costed on."""
    a = rendezvous_assign(df, key_col, n_before, out="s_before", hash_mode=hash_mode)
    ab = rendezvous_assign(a, key_col, n_after, out="s_after", hash_mode=hash_mode)
    per_before = ab.groupBy(F.col("s_before").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    per_after = ab.groupBy(F.col("s_after").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum((F.col("s_before") != F.col("s_after")).cast("long"))
        .cast("long")
        .alias("moved_in"),
    )
    return (
        per_before.join(per_after, "shard", "full")
        .select(
            "shard",
            F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("moved_in", F.lit(0)).cast("long").alias("moved_in"),
        )
    )
