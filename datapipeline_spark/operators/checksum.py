"""Order-independent bucketed table checksums: verify two copies of a
table are identical WITHOUT moving either copy.

The 100 TB problem: after a migration/replication/engine swap you need
"are these tables equal?" — but collecting or joining 100 TB to compare is
absurd. Per-table, this computes a handful of bucket rows (count + two
independent content digests each); equality of the tiny checksum tables is
overwhelming evidence of row-level equality, and a mismatched bucket
narrows any diff to 1/n_buckets of the data. Everything is one map-side-
combined aggregation; nothing is ever sorted, collected, or joined.

Determinism contract: the per-row digest is the repo's engine-neutral
48-bit md5 of a '|'-joined canonical string (callers pass columns already
canonicalized — ints/strings/dates; doubles must be pre-scaled to integer
units, the repo-wide convention, because float→string formatting is NOT
engine-portable). Aggregation channels are order- and partition-invariant
and exactly reproducible in ANSI SQL:

- ``n_rows``        plain count
- ``hash_sum``      sum of row digests mod the Mersenne prime 2^61-1,
                    accumulated in decimal(38,0)/HUGEINT so ~10^12 rows of
                    48-bit digests cannot overflow before the reduction
- ``hash_xor``      bit_xor of row digests (independent failure mode: the
                    modular sum misses nothing a cancellation-prone xor
                    misses, and vice versa)

Duplicate-row sensitivity: xor cancels even multiplicities, but the sum
channel and count both move, so duplicates are still detected.

Reference gap: the reference has no table-comparison tooling at all; its
closest concept is the golden-file test harness (docs/testing.md).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE61 = (1 << 61) - 1


def row_digest(cols: Sequence) -> F.Column:
    """48-bit md5 digest of the '|'-joined canonical columns."""
    joined = F.concat_ws("|", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 12), 16, 10).cast("long")


def table_checksum(
    df: DataFrame, cols: Sequence, n_buckets: int = 256
) -> DataFrame:
    """(bucket, n_rows, hash_sum, hash_xor) — at most n_buckets rows."""
    h = row_digest(cols)
    return (
        df.select(h.alias("__h"))
        .groupBy(F.pmod(F.col("__h"), F.lit(n_buckets)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.pmod(F.sum(F.col("__h").cast("decimal(38,0)")), F.lit(MERSENNE61))
            .cast("long")
            .alias("hash_sum"),
            F.bit_xor("__h").alias("hash_xor"),
        )
    )
