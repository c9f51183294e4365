"""Feature hashing (the "hashing trick", Weinberger et al. 2009): map a
token stream to a FIXED-dimension sparse feature space with no vocabulary
pass at all.

Why it matters at 100 TB: tf-idf/bag-of-words pipelines need a global
vocabulary (an extra aggregation + a broadcast that grows with corpus
size); the hashing trick needs neither — feature index is a pure function
of the token, so featurization is ONE map-side projection plus one
aggregation on (doc, index), and the model dimension is fixed up front
regardless of corpus growth. Signed hashing (a second hash bit gives each
token a ±1 sign) makes collision noise zero-mean, the standard correction.

Determinism contract: index and sign both derive from the repo's 48-bit
md5 contract, so the sparse (doc_id, feature_idx, weight) triples are
exactly reproducible in ANSI SQL — the oracle replays the full
featurization. Tokenization is the corpus-wide whitespace convention
(text/analysis.py:34).

Reference gap: the reference has no featurization beyond its numeric
scaler (src/datapipeline/pipelines/dataset/scaler.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1 << 18,
) -> DataFrame:
    """(id, feature_idx, weight): signed-hash term frequencies in a
    ``dim``-dimensional space. weight = sum over tokens hashing to the
    index of ±1 (sign from an independent hash bit) — exact integers."""
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 12), 16, 10).cast("long")
    exploded = df.select(F.col(id_col), tok).select(
        id_col,
        F.pmod(h, F.lit(dim)).cast("long").alias("feature_idx"),
        # sign bit from a hash region independent of the index bits
        F.when(F.shiftright(h, 40).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
        .cast("long")
        .alias("sign"),
    )
    return (
        exploded.groupBy(id_col, "feature_idx")
        .agg(F.sum("sign").alias("weight"))
        .filter(F.col("weight") != 0)
    )
