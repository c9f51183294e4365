from datapipeline_spark.text.analysis import (
    LANG_MARKERS,
    lang_scores,
    quality_score,
    text_stats,
    winnow_fingerprints,
)

__all__ = ["LANG_MARKERS", "lang_scores", "quality_score", "text_stats", "winnow_fingerprints"]
