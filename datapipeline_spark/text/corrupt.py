"""T5-style span corruption — deterministic masked (input, target) pair
generation for denoising-objective pretraining.

Each whitespace token is masked by an engine-neutral coin: the md5-48bit
hash of ``doc_id|position`` modulo 100 against the corruption rate, so
the mask pattern is a pure function of the data (reproducible across
runs, engines, and partitionings — the property every deterministic
sampler in this repo rides). Consecutive masked tokens collapse to ONE
sentinel per span (the T5 recipe, Raffel et al. 2020 §3.1.4): the input
keeps unmasked text with ``<extra_id_k>`` markers; the target is the
inverse — each sentinel followed by the tokens it hides, closed by a
final sentinel.

Span identity is the gaps-and-islands rank-difference trick (position −
running-masked-count is constant exactly along a masked run — the same
identity as longest_activity_streak / SCD2). All windows are doc-keyed
and bounded by document length; the rebuild is one ordered string
aggregation per document. No Python in the plan — token explode, hash,
windows, and string assembly are all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapipeline_spark.dedup.minhash import hash48


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_pct: int = 15,
) -> DataFrame:
    """Produce one (input_text, target_text) denoising pair per document:
    ``rate_pct``% of tokens masked by the deterministic hash coin,
    consecutive masks merged into numbered sentinel spans. Returns
    (id, n_tokens, n_masked, n_spans, input_text, target_text)."""
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "p0", "tok"
            ),
        )
        .filter(F.col("tok") != "")
        .select("id", (F.col("p0") + 1).alias("pos"), "tok")
    )
    coin = hash48(
        F.concat(F.col("id").cast("string"), F.lit("|"), F.col("pos").cast("string"))
    )
    toks = toks.withColumn("m", (coin % 100 < F.lit(rate_pct)).cast("int"))
    w = Window.partitionBy("id").orderBy("pos")
    toks = toks.withColumn("mrank", F.sum("m").over(w)).withColumn(
        "island", F.when(F.col("m") == 1, F.col("pos") - F.col("mrank"))
    )
    # the tokenize+hash+island subtree is consumed twice (the span
    # numbering branch and the join's probe side) — one lazy checkpoint so
    # it tokenizes and windows once (the plan otherwise carried two full
    # scan→explode→window copies, one under the broadcast)
    toks = toks.localCheckpoint(eager=False)
    # span numbering: dense rank of islands among this doc's masked rows
    wspan = Window.partitionBy("id").orderBy("island")
    spans = (
        toks.filter(F.col("m") == 1)
        .select("id", "pos", "island")
        .withColumn("span", F.dense_rank().over(wspan) - 1)
    )
    t = toks.join(spans.select("id", "pos", "span"), ["id", "pos"], "left")
    first_of_span = (F.col("m") == 1) & (
        F.coalesce(F.lag("m").over(w), F.lit(0)) == 0
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("span").cast("string"), F.lit(">")
    )
    t = t.withColumn(
        "in_piece",
        F.when(F.col("m") == 0, F.col("tok")).when(first_of_span, sentinel),
    ).withColumn(
        "tgt_piece",
        F.when(
            F.col("m") == 1,
            F.when(
                first_of_span, F.concat(sentinel, F.lit(" "), F.col("tok"))
            ).otherwise(F.col("tok")),
        ),
    )

    def joined(piece: str) -> F.Column:
        arr = F.array_sort(
            F.collect_list(
                F.when(
                    F.col(piece).isNotNull(),
                    F.struct(F.col("pos"), F.col(piece).alias("s")),
                )
            )
        )
        return F.array_join(F.transform(arr, lambda x: x["s"]), " ")

    out = t.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("m").cast("long").alias("n_masked"),
        F.countDistinct("span").cast("long").alias("n_spans"),
        joined("in_piece").alias("input_text"),
        joined("tgt_piece").alias("tgt_body"),
    )
    closing = F.concat(
        F.lit("<extra_id_"), F.col("n_spans").cast("string"), F.lit(">")
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "n_masked",
        "n_spans",
        "input_text",
        F.when(F.col("n_spans") == 0, closing)
        .otherwise(F.concat(F.col("tgt_body"), F.lit(" "), closing))
        .alias("target_text"),
    )
