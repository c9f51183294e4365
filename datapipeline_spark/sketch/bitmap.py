"""Bitmap-exact distinct counting over sliding windows — the EXACT
companion to the HLL sliding sketch (sketch/hll.hll_sliding_merge).

When the key domain is bounded and dense-ish (user ids, product ids —
the roaring-bitmap regime), per-day presence compresses to 63-bit words:
``word = id DIV 63, bit = id MOD 63`` (63, not 64 — the sign bit never
participates, so the arithmetic is identical in any signed-bigint
engine). Each (day, word) row is a ``bit_or`` aggregate; a trailing
window is the same fan-out merge as the HLL variant with ``bit_or``
replacing register-max, and the exact distinct count is one
``bit_count`` sum. State per day is domain/63 words — for 10M users
~160k longs, still thousands of times smaller than the raw rows — and
EXACT where HLL is an estimate. The two operators bracket the standard
production trade: bitmap-exact while the domain fits, sketch beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def presence_bitmap(
    df: DataFrame, day_col: str, id_col: str
) -> DataFrame:
    """Per-(day, word) presence bitmap of non-negative integer ids."""
    return (
        df.select(
            F.col(day_col).alias("day"),
            F.expr(f"CAST({id_col} DIV 63 AS BIGINT)").alias("word"),
            F.expr(
                f"shiftleft(1L, CAST({id_col} % 63 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def sliding_distinct_exact(
    df: DataFrame, day_col: str, id_col: str, window_days: int = 7
) -> DataFrame:
    """Exact distinct ids per day over the trailing ``window_days`` days:
    per-day bitmaps, fan-out merge (each (day, word) row serves the
    window_days target days — bitmap-sized, never row-sized), one
    ``bit_or`` per (target day, word), one popcount sum per day."""
    bm = presence_bitmap(df, day_col, id_col)
    days = bm.select("day").distinct()
    contrib = bm.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.lit(int(window_days) - 1)))
    ).withColumn("day", F.expr("day + make_interval(0, 0, 0, __i, 0, 0, 0)"))
    merged = (
        contrib.join(days, "day", "left_semi")
        .groupBy("day", "word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    return merged.groupBy("day").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_distinct_exact")
    )
