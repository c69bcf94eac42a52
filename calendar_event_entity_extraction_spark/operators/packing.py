"""Deterministic sequence packing: assemble documents into fixed
token-budget packs (training-batch assembly for LLM pipelines).

The standard GPT-style packing discipline — concatenate documents in a
stable order, cut at every ``budget`` tokens — expressed as ONE window
cumulative sum. A global order would serialize onto one partition, so
documents are first sharded by a portable multiplicative hash
(``splits.mixed_bucket_col``) and packed within shards: at 100 TB, shards ≈
O(cores) gives embarrassingly parallel packing with no global sort, and
(shard, pack_id) is the stable batch key. Deterministic: no RNG, stable
(shard, doc_id) ordering, identical in plain SQL (oracle-checked).

Semantics: ``pack_id = floor(tokens_before / budget)`` where
``tokens_before`` is the sum of token counts of all earlier docs in the
shard — a document whose span crosses a budget boundary belongs to the
pack it STARTS in (concat-then-chunk convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_col
from .splits import mixed_bucket_col


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
    shards: int = 8,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *carry_cols, shard, n_tokens, pack_id) — token-budget pack
    assignment; ``carry_cols`` pass through untouched (e.g. split labels in
    a composite curation pipeline).

    One narrow pass (token count + shard hash) and one window aggregate
    partitioned on ``shard`` — a single shuffle, no global ordering.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in carry_cols],
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        # mixed (double-round) hash: the shard count defaults to a power of
        # two, where the single-multiply Knuth bucket degenerates to
        # key % shards (KNUTH ≡ 1 mod 8) and would correlate shards with any
        # doc_id-mod structure in the corpus
        mixed_bucket_col(F.col(id_col), shards).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn(
        "pack_id", F.floor(tokens_before / F.lit(budget)).cast("long")
    )
