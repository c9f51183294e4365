"""Corpus text-cleaning operators for LLM training-data preparation.

Web-corpus preprocessing as pure JVM column expressions (whole-stage
codegen): HTML tag stripping, entity unescaping, PII masking (email / URL /
phone), and whitespace normalization. Every pattern is lookahead-free so the
SAME regex runs under Java regex (Spark) and RE2 (DuckDB oracle) — cross-
engine determinism is a design constraint, not an accident.

At 100 TB this whole stage is one narrow projection: no shuffle, no Python,
no UDF — it fuses into the scan's codegen stage and runs at I/O speed.

Reference scope note: mr-lovalova/datapipeline has no text surface at all
(SURVEY.md §2.9 — "no string function library"); this module is part of the
beyond-reference training-data layer, like text/analysis.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tag stripper: any <...> run without a closing-bracket inside. Replaced
#: with a space so `<p>a</p><p>b</p>` doesn't fuse words across tags.
HTML_TAG_PATTERN = r"<[^>]*>"

#: Literal HTML entities unescaped after tag stripping (strip-then-unescape:
#: escaped markup stays literal text instead of becoming strippable tags).
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; → &lt; (double-escape) not <
]

#: PII masks, applied in order (emails before URLs: an email never matches
#: the URL pattern, but masking order is part of the public contract).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_MASKS: list[tuple[str, str]] = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (URL_PATTERN, "<URL>"),
    (PHONE_PATTERN, "<PHONE>"),
]

WS_PATTERN = r"\s+"


def strip_html(col: Column) -> Column:
    """Drop HTML/XML tags, leaving a space in their place."""
    return F.regexp_replace(col, HTML_TAG_PATTERN, " ")


def unescape_entities(col: Column) -> Column:
    """Unescape the common literal HTML entities (chained literal replace —
    no regex engine involved, byte-identical in any engine)."""
    for entity, plain in HTML_ENTITIES:
        col = F.replace(col, F.lit(entity), F.lit(plain))
    return col


def mask_pii(col: Column) -> Column:
    """Replace emails, URLs, and NANP-style phone numbers with typed
    placeholder tokens (<EMAIL>, <URL>, <PHONE>)."""
    for pattern, token in PII_MASKS:
        col = F.regexp_replace(col, pattern, token)
    return col


def normalize_whitespace(col: Column) -> Column:
    """Collapse all whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(col, WS_PATTERN, " "))


def clean_text_col(col: Column) -> Column:
    """The full cleaning composition, in contract order:
    strip tags → mask PII → unescape entities → normalize whitespace."""
    return normalize_whitespace(unescape_entities(mask_pii(strip_html(col))))


def clean_text(
    df: DataFrame, text_col: str = "text", out: str = "text_clean"
) -> DataFrame:
    """Append the cleaned text column. Pure projection — map-only at any
    scale; fuses with the parquet scan under whole-stage codegen."""
    return df.withColumn(out, clean_text_col(F.col(text_col)))
