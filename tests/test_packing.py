"""Sequence-packing semantics: stable shards, concat-then-chunk pack ids."""

import pytest
from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_ids_are_contiguous_and_monotone(docs):
    out = pack_sequences(docs, budget=40, shards=4).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        last_pack = 0
        for r in rows:
            assert r["pack_id"] == cum // 40, r
            assert r["pack_id"] >= last_pack  # monotone within shard
            last_pack = r["pack_id"]
            cum += r["n_tokens"]


def test_pack_token_sum_bounded(docs):
    # every pack's token sum < budget + max_doc_tokens (a doc that crosses
    # a boundary belongs to the pack it starts in)
    out = pack_sequences(docs, budget=40, shards=4)
    max_doc = 11
    sums = (
        out.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert all(r["s"] < 40 + max_doc for r in sums)


def test_packing_stable_under_repartition(docs):
    a = sorted(map(tuple, pack_sequences(docs, budget=40, shards=4).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13), budget=40, shards=4).collect())
    )
    assert a == b
