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

Shape: per-row (map-only, round-7 opt). Every output column is a pure
function of ONE document's token array, so nothing shuffles: one in-row
pass (an ``aggregate`` HOF) walks the tokens in position order carrying
(previous mask, counts, span number, input text, target text) — the
explode → two doc-keyed windows → span join → ordered string aggregation
of the previous shape computed the same left-to-right recurrence through
four exchanges. Masking, span numbering (count of span STARTS so far —
identical to the old dense_rank over gaps-and-islands, both number spans
1..k in position order), and string assembly are all JVM expressions; the
md5 coin and every piece of output text are byte-identical to the old
plan and to the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_spark.dedup.minhash import HASH_HEX_LEN


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
    # (pos, tok, m) per kept token, positions assigned over the RAW split
    # array (1-based) BEFORE empty tokens drop — the coin hashes the same
    # `id|pos` strings the exploded form did.
    km = f"""
    filter(
      transform(split(trim({text_col}), '\\\\s+'),
        (t, i0) -> named_struct(
          'tok', t,
          'm', CASE WHEN CAST(conv(substring(md5(concat(
                      CAST({id_col} AS STRING), '|', CAST(i0 + 1 AS STRING))),
                      1, {HASH_HEX_LEN}), 16, 10) AS BIGINT) % 100 < {rate_pct}
               THEN 1 ELSE 0 END)),
      x -> x.tok <> '')
    """
    # One O(n) fold in position order. Accumulator: (prev mask, n_tokens,
    # n_masked, n_spans, input_text, target_text). A span STARTS at m=1
    # with prev=0; its number is the count of starts before it — exactly
    # the old dense_rank() - 1 over islands, which also numbers spans in
    # position order. Piece-by-piece string appends joined by single
    # spaces == the old array_join(collect_list(piece), ' ') in pos order.
    agg = f"""
    aggregate(
      {km},
      named_struct('prev', 0, 'cnt', CAST(0 AS BIGINT),
                   'nmask', CAST(0 AS BIGINT), 'nsp', CAST(0 AS BIGINT),
                   'inp', '', 'tgt', ''),
      (a, x) -> named_struct(
        'prev', x.m,
        'cnt', a.cnt + 1,
        'nmask', a.nmask + x.m,
        'nsp', a.nsp + CASE WHEN x.m = 1 AND a.prev = 0 THEN 1 ELSE 0 END,
        'inp', CASE
          WHEN x.m = 0 THEN
            CASE WHEN a.inp = '' THEN x.tok
                 ELSE concat(a.inp, ' ', x.tok) END
          WHEN a.prev = 0 THEN
            CASE WHEN a.inp = ''
                 THEN concat('<extra_id_', CAST(a.nsp AS STRING), '>')
                 ELSE concat(a.inp, ' <extra_id_', CAST(a.nsp AS STRING), '>')
            END
          ELSE a.inp END,
        'tgt', CASE
          WHEN x.m = 0 THEN a.tgt
          WHEN a.prev = 0 THEN
            CASE WHEN a.tgt = ''
                 THEN concat('<extra_id_', CAST(a.nsp AS STRING), '> ', x.tok)
                 ELSE concat(a.tgt, ' <extra_id_', CAST(a.nsp AS STRING),
                             '> ', x.tok)
            END
          ELSE concat(a.tgt, ' ', x.tok) END))
    """
    # The old explode dropped documents with no non-empty token entirely.
    # The gate is a CHEAP independent predicate on the raw text (not
    # `__s__.cnt > 0`: predicate pushdown would substitute the whole
    # md5-laden aggregate into the filter and evaluate it twice per row).
    has_tok = F.expr(f"exists(split(trim({text_col}), '\\\\s+'), t -> t <> '')")
    out = df.filter(has_tok).select(F.col(id_col), F.expr(agg).alias("__s__"))
    return out.select(
        F.col(id_col),
        F.col("__s__.cnt").alias("n_tokens"),
        F.col("__s__.nmask").alias("n_masked"),
        F.col("__s__.nsp").alias("n_spans"),
        F.col("__s__.inp").alias("input_text"),
        F.when(
            F.col("__s__.nsp") == 0, F.lit("<extra_id_0>")
        )
        .otherwise(
            F.concat(
                F.col("__s__.tgt"),
                F.lit(" <extra_id_"),
                F.col("__s__.nsp").cast("string"),
                F.lit(">"),
            )
        )
        .alias("target_text"),
    )
