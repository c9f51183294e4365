from datapipeline_spark.text.analysis import (
    BPE_PATTERN,
    LANG_MARKERS,
    bpe_token_count,
    lang_scores,
    quality_score,
    repetition_signals,
    text_stats,
    winnow_fingerprints,
)
from datapipeline_spark.text.chunk import chunk_documents
from datapipeline_spark.text.features import hashed_features
from datapipeline_spark.text.index import bm25_scores, build_inverted_index
from datapipeline_spark.text.pack import pack_sequences
from datapipeline_spark.text.clean import (
    EMAIL_PATTERN,
    HTML_ENTITIES,
    HTML_TAG_PATTERN,
    PHONE_PATTERN,
    URL_PATTERN,
    clean_text,
    clean_text_col,
    mask_pii,
    normalize_whitespace,
    strip_html,
    unescape_entities,
)

__all__ = [
    "bm25_scores",
    "build_inverted_index",
    "BPE_PATTERN",
    "LANG_MARKERS",
    "bpe_token_count",
    "lang_scores",
    "quality_score",
    "repetition_signals",
    "text_stats",
    "winnow_fingerprints",
    "chunk_documents",
    "pack_sequences",
    "EMAIL_PATTERN",
    "HTML_ENTITIES",
    "HTML_TAG_PATTERN",
    "PHONE_PATTERN",
    "URL_PATTERN",
    "clean_text",
    "hashed_features",
    "clean_text_col",
    "mask_pii",
    "normalize_whitespace",
    "strip_html",
    "unescape_entities",
]
