from datapipeline_spark.text.analysis import (
    BPE_PATTERN,
    LANG_MARKERS,
    bpe_token_count,
    lang_scores,
    quality_score,
    text_stats,
    winnow_fingerprints,
)

__all__ = ["BPE_PATTERN", "LANG_MARKERS", "bpe_token_count", "lang_scores", "quality_score", "text_stats", "winnow_fingerprints"]
