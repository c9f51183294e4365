"""SimHash near-duplicate fingerprints (Charikar 2002, as deployed in
Manku et al., WWW 2007 for web-scale dedup).

Each token hashes to `bits` bits; per bit position the ±1 votes of all
tokens are summed; the sign pattern is the fingerprint. Near-duplicates
differ in few bits (hamming distance).

Shape: explode tokens ×  bit positions → two-level aggregation. All integer
arithmetic on engine-neutral md5-derived hashes → bit-identical in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_spark.dedup.minhash import hash48


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash bigint). Tokens weighted by multiplicity."""
    tokens = df.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    hashed = tokens.withColumn("h", hash48(F.col("tok")))
    bit_votes = (
        hashed.select(id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("i"))
        # shiftright() requires a literal count — use the SQL operator form
        .withColumn("vote", F.expr("CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END"))
        .groupBy(id_col, "i")
        .agg(F.sum("vote").alias("s"))
    )
    return bit_votes.groupBy(id_col).agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END")).alias(
            "simhash"
        )
    )


def hamming_distance(col_a, col_b) -> F.Column:
    """Popcount of XOR — Spark's bit_count is JVM-side."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def simhash_near_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, prefix_bits: int = 8
) -> DataFrame:
    """Candidate pairs by identical high-`prefix_bits` block (cheap LSH-style
    blocking), verified by full hamming distance ≤ `max_hamming`."""
    block = F.shiftright(F.col("simhash"), 32 - prefix_bits)
    s = sig.withColumn("block", block)
    a = s.select(F.col("block"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = s.select(F.col("block"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming_distance(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
