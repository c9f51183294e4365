"""Distributed global rank without a single-partition window.

``row_number() OVER (ORDER BY key)`` collapses to ONE task in any engine —
the classic scale cliff for "assign a global training-example position".
When the leading sort key is a uniform hash, the fix is structural:

1. bucket = top bits of the hash → buckets are a monotone PREFIX of the
   total (hash, tiebreak) order;
2. phase 1: count rows per bucket (tiny aggregate), cumulative offsets over
   the ≤``n_buckets`` rows (bounded global window), broadcast;
3. phase 2: rank WITHIN each bucket (partitioned window) + bucket offset.

Identical output to the naive global window, but the heavy sort runs on
1/n_buckets of the data per partition and scales with executors. Companion
to the same two-phase shape in text/pack.py (token offsets).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_global_rank(
    df: DataFrame,
    hash_col: str,
    tiebreak: Sequence[str],
    out: str = "pos",
    hash_bits: int = 52,
    bucket_bits: int = 8,
) -> DataFrame:
    """Add ``out`` = 1-based global rank by ``(hash_col, *tiebreak)``.

    ``hash_col`` must be a non-negative integer column with values below
    ``2**hash_bits`` (uniformly distributed for balanced buckets — e.g. the
    48/52-bit md5/sha prefixes used throughout the query registry). The top
    ``bucket_bits`` bits form the distribution buckets.
    """
    shift = hash_bits - bucket_bits
    if shift <= 0:
        raise ValueError("hash_bits must exceed bucket_bits")
    b = df.withColumn("__bucket__", F.shiftright(F.col(hash_col), shift).cast("int"))
    counts = b.groupBy("__bucket__").agg(F.count(F.lit(1)).alias("__c__"))
    # global window on ≤2**bucket_bits aggregate rows — intentional, bounded
    w_off = Window.orderBy("__bucket__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off__", F.coalesce(F.sum("__c__").over(w_off), F.lit(0))
    ).select("__bucket__", "__off__")
    w_in = Window.partitionBy("__bucket__").orderBy(hash_col, *tiebreak)
    return (
        b.join(F.broadcast(offsets), "__bucket__")
        .withColumn(out, (F.col("__off__") + F.row_number().over(w_in)).cast("long"))
        .drop("__bucket__", "__off__")
    )


def reservoir_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    id_cols: Sequence[str],
    n: int,
    seed: str = "rsv",
    out: str | None = None,
) -> DataFrame:
    """Deterministic uniform sample of ``n`` rows per key — the batch twin
    of per-key reservoir sampling (Vitter 1985), derandomized the corpus-
    sampling way (hash-order selection, same contract as the md5-membership
    sampling in the corpus queries): keep the ``n`` rows whose seeded md5
    over ``id_cols`` sorts first within the key.

    Same-sized-uniform-sample guarantees without RNG state: reproducible
    across engines/runs/partitionings, refreshable (a re-run on grown data
    keeps previously chosen rows iff they still rank in the top n), and
    SQL-oracle-exact. Scale: one keyed shuffle; Spark plans the per-key
    top-n as WindowGroupLimit, so only n candidate rows per key per map
    task cross the wire — never the full key group.

    ``id_cols`` must uniquely identify rows within a key (total order, no
    rank ties). ``out`` optionally keeps the 1-based rank column.
    """
    h = F.md5(
        F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in id_cols])
    )
    w = Window.partitionBy(*key_cols).orderBy(h)
    rank = out or "__rsv__"
    res = df.withColumn(rank, F.row_number().over(w)).filter(F.col(rank) <= n)
    return res if out else res.drop(rank)
