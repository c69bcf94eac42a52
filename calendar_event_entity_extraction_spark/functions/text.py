"""Text-analysis primitives for a large-scale training-data pipeline.

All pure Column expressions (no UDFs): token counting, quality scoring,
heuristic language ID, document fingerprinting. Each is portable to plain
SQL so the driver's DuckDB oracle can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "on", "for",
    "with", "that", "this", "it", "as", "at", "by", "from", "or",
]

PUNCT_RE = r"[.,!?;:]"


def token_count_col(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """A BPE-ish token estimate: word pieces + digits + punctuation, via a
    tokenizer-style regex (letters runs, digit runs, single non-space
    symbols). Upper-bounds subword counts without a vocab."""
    pieces = F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|\d+|[^\sA-Za-z\d])"), 1)
    return F.size(pieces)


def punct_count_col(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))


def stopword_hits_col(text: Column, stopwords: list[str] | None = None) -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def quality_struct(text: Column) -> list[Column]:
    """Length / punctuation / stopword quality signals (rounded so float
    ratios hash-compare across engines)."""
    n_tok = token_count_col(text)
    return [
        F.length(text).alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        punct_count_col(text).alias("n_punct"),
        F.round(punct_count_col(text) / F.greatest(F.length(text), F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(
            stopword_hits_col(text) / F.greatest(n_tok, F.lit(1)), 6
        ).alias("stopword_ratio"),
    ]


def lang_id_col(text: Column, en_threshold: float = 0.1) -> Column:
    """Heuristic language ID: English iff stopword token ratio clears the
    threshold. (A real system uses char n-gram profiles; the Spark-side
    plumbing — narrow, codegen'd, no shuffle — is identical.)"""
    ratio = stopword_hits_col(text) / F.greatest(token_count_col(text), F.lit(1))
    return F.when(ratio >= en_threshold, F.lit("en")).otherwise(F.lit("other"))


def fingerprint_col(text: Column, bits_hex: int = 16) -> Column:
    """Stable 64-bit-equivalent document fingerprint: md5 prefix of the
    whitespace-normalized lowercase text (content-defined, portable)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, bits_hex)
