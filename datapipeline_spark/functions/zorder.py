"""Z-order (Morton) keys for multi-column data layout.

Sorting files by a single column gives min/max data skipping on that column
only; interleaving the bits of two columns gives a curve where both columns
stay locally clustered, so parquet row-group min/max stats prune on EITHER
predicate (the idea behind Delta's OPTIMIZE ZORDER BY / Iceberg sort
orders). This engine applies it at write time: ``df.sortWithinPartitions(
zorder_key(x, y))`` before a parquet write yields row groups whose stat
ranges are tight on both dimensions; no read-path change is needed —
Spark's parquet filter pushdown uses the stats automatically.

Pure 64-bit integer bit arithmetic (the classic spread-bits sequence), so
the key is deterministic and identical in any engine — the SQL rendering
``zorder_sql`` is used by the DuckDB oracle verbatim.

Inputs must be non-negative and < 2**31 (each contributes 31 bits; the
interleaved key fills 62 bits, keeping the sign bit clear). Bucket or
offset real values into that range first (e.g. days-since-epoch, hashed
ids, quantized floats).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# spread-bits masks: after each (shift, mask) step the 31 input bits occupy
# every other position of the 62-bit result
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_col(c: Column) -> Column:
    x = c.cast("long")
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Morton-interleave two non-negative <2**31 integer columns."""
    return _spread_col(a).bitwiseOR(F.shiftleft(_spread_col(b), 1))


def _spread_sql(expr: str) -> str:
    x = f"CAST({expr} AS BIGINT)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_sql(a: str, b: str) -> str:
    """ANSI-SQL rendering of :func:`zorder_key` (used by DuckDB oracles)."""
    return f"({_spread_sql(a)} | ({_spread_sql(b)} << 1))"
