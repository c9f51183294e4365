"""Exact deduplication: content-hash group-by.

At 100 TB this is the cheapest dedup pass: one map (hash) + one shuffle on
the 128-bit digest with map-side partial aggregation. Skew-free by
construction (hashes are uniform) unless true duplicate groups are huge, in
which case AQE skew-join handling splits them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic md5 content fingerprint."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", keep: str = "min"
) -> DataFrame:
    """One row per distinct content: representative id (min/max), group size.

    Returns (fingerprint, rep_id, n_dupes); join back on fingerprint to
    filter the corpus.
    """
    rep = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        text_fingerprints(df, text_col)
        .groupBy("fingerprint")
        .agg(rep.alias("rep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )
