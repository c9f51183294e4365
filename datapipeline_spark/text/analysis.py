"""Text-analysis operators for LLM training-data pipelines.

All hot-path computation is built-in column expressions (JVM, whole-stage
codegen); only the winnowing fingerprint drops to an Arrow-batched
mapInPandas. Designed so every per-document statistic is one narrow
projection — no shuffle at all until an aggregation is requested, which is
what lets these run on a 100 TB documents table as a pure map stage.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny deterministic stopword marker sets (ASCII only, by design: the
#: heuristic must be reproducible in any engine, incl. the SQL oracle).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "les", "des", "et", "un"],
}


#: BPE-ish pretokenizer regex (GPT-2 style, but lookahead-free so the same
#: pattern runs under Java regex AND RE2/DuckDB): contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def _words(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def bpe_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """Subword-proxy token count: number of BPE-style pretokenizer matches.
    Whole-stage-codegen JVM regex — a pure map stage at any scale."""
    return df.withColumn(
        out,
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
        ).cast("long"),
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document surface statistics: chars, tokens, distinct tokens,
    type-token ratio, mean token length. Pure projection — map-only."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_chars = F.length(F.col(text_col))
    distinct_tokens = F.size(F.array_distinct(w))
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "n_distinct_tokens": distinct_tokens.cast("long"),
            "ttr": F.round(distinct_tokens / n_tokens, 6),
            "mean_token_len": F.round(
                F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")) / n_tokens, 6
            ),
        }
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free language-ID heuristic: marker-stopword hit rate per
    language; prediction = argmax with deterministic tie order (marker
    insertion order). Columns: score_<lang>… + pred_lang."""
    w = _words(text_col)
    out = df
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(w, lambda x: F.array_contains(arr, x)))
        out = out.withColumn(f"score_{lang}", F.round(hits / F.size(w), 6))
    scores = [F.col(f"score_{lang}") for lang in LANG_MARKERS]
    best = F.greatest(*scores)
    pred = F.lit(None).cast("string")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(F.col(f"score_{lang}") >= best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic in [0,1]: length saturation, lexical
    diversity, and alphabetic-character ratio (a cheap boilerplate/noise
    proxy). Weights mirror common web-corpus filters."""
    w = _words(text_col)
    n_tokens = F.size(w)
    distinct_ratio = F.size(F.array_distinct(w)) / n_tokens
    len_sat = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")) / F.length(F.col(text_col))
    )
    q = 0.3 * len_sat + 0.3 * distinct_ratio + 0.4 * alpha_ratio
    return df.withColumn("quality", F.round(q, 6))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 filters): fraction of tokens taken
    by the most frequent word / bigram, and the fraction of bigram/trigram
    instances that are repeats. High values flag boilerplate and degenerate
    machine-generated text.

    Shape at scale: one explode + groupBy((id, gram)) per n-gram order —
    shuffles are keyed by (doc, gram) so they spread evenly; the per-doc
    reduction is a tiny second aggregate. No Python in the path.
    A melt-fused single-shuffle variant (one (id, order, gram) stream,
    pivoted back) was built and A/B'd in round 4: it scans the input once
    instead of three times but measured ~0.6 s SLOWER at sf0.1 — the
    three per-order subtrees here are independent and Spark runs their
    stages CONCURRENTLY inside one job, which beats the fused plan's
    serialized 3x-mass exchange until the scan itself dominates.
    """
    w = _words(text_col)
    d = df.select(id_col, w.alias("w"))

    def gram_counts(n: int):
        if n == 1:
            g = F.col("w")
        else:
            # guard: sequence(1, size-k) reverses when size <= k
            g = F.when(
                F.size("w") >= n,
                F.expr(
                    f"transform(sequence(1, size(w) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {n})))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        return (
            d.select(id_col, F.explode(g).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
        )

    dup = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
    uni = gram_counts(1).agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_word_frac"))
    bi = gram_counts(2).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
        F.round(dup / F.sum("c"), 6).alias("dup_bigram_frac"),
    )
    tri = gram_counts(3).agg(F.round(dup / F.sum("c"), 6).alias("dup_trigram_frac"))
    return uni.join(bi, id_col).join(tri, id_col)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    polynomial rolling hash over k-grams, keep the min hash of each sliding
    window (rightmost on ties) → sparse position-robust fingerprint set.

    Arrow-batched mapInPandas: documents are independent, so this
    parallelizes perfectly across partitions, and within a document the
    whole state machine is closed-form — k-gram hash = Σ ord(ch_j) ·
    B^(k-1-j) mod M (the rolling recurrence telescopes to this), window
    pick = rightmost min, emission = pick changed vs the previous window —
    so the per-document kernel is pure vectorized numpy (no per-character
    Python; ~50× over the rolling-loop form this replaced, bit-identical
    output pinned by the SQL oracle and test_winnow_* goldens).
    Output: (id, fingerprint bigint, pos int).
    """
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    B, M = 257, (1 << 31) - 1
    out_schema = f"{id_col} long, fingerprint long, pos int"
    # B^(k-1-j) mod M for j in 0..k-1; products code*pow < 2^21 * 2^31 and
    # the k-term sum of residues < k * 2^31 both fit comfortably in int64.
    powvec = np.array([pow(B, k - 1 - j, M) for j in range(k)], dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, poss = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                s = text or ""
                if len(s) < k:
                    continue
                # UTF-32-LE words ARE the code points, i.e. ord() per char.
                codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                grams = sliding_window_view(codes.astype(np.int64), k)
                hashes = (grams * powvec % M).sum(axis=1) % M
                if hashes.size < window:
                    continue
                wins = sliding_window_view(hashes, window)
                mval = wins.min(axis=1)
                # rightmost min: first min of the reversed window, flipped back
                mpos = (
                    np.arange(wins.shape[0], dtype=np.int64)
                    + window
                    - 1
                    - wins[:, ::-1].argmin(axis=1)
                )
                keep = np.empty(wins.shape[0], dtype=bool)
                keep[0] = True
                keep[1:] = (mval[1:] != mval[:-1]) | (mpos[1:] != mpos[:-1])
                ids.append(np.full(int(keep.sum()), doc_id, dtype=np.int64))
                fps.append(mval[keep])
                poss.append(mpos[keep])
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "fingerprint": np.concatenate(fps),
                        "pos": np.concatenate(poss).astype(np.int32),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        id_col: np.array([], dtype=np.int64),
                        "fingerprint": np.array([], dtype=np.int64),
                        "pos": np.array([], dtype=np.int32),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
