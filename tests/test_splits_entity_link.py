"""Hash splits, leakage anti-join, entity pools + salted aggregation."""

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.operators import (
    canonicalize_events,
    extract_events,
    events_to_triples,
)
from calendar_event_entity_extraction_spark.operators.entity_link import (
    build_entity_pools,
    link_entities,
    pool_as_dict,
    salted_count,
)
from calendar_event_entity_extraction_spark.operators.splits import (
    assign_split,
    deterministic_sample,
    drop_split_leakage,
)
from calendar_event_entity_extraction_spark.synth import keys_df, transcripts_from_keys


def _triples(spark, n=1500):
    tr = transcripts_from_keys(keys_df(spark, n))
    return events_to_triples(canonicalize_events(extract_events(tr)))


def test_salted_count_equals_plain_count(spark):
    t = _triples(spark).filter(F.col("pred") == "attendee").select(
        F.col("obj").alias("name")
    ).cache()
    salted = {r["name"]: r["cnt"] for r in salted_count(t, "name").collect()}
    plain = {r["name"]: r["count"] for r in t.groupBy("name").count().collect()}
    assert salted == plain


def test_entity_pool_topk_and_linking(spark):
    tr = _triples(spark).cache()
    pool = build_entity_pools(tr, "attendee", top_k=10).cache()
    assert pool.count() == 10
    cnts = [r["cnt"] for r in pool.collect()]
    assert cnts == sorted(cnts, reverse=True)
    d = pool_as_dict(pool)
    assert len(d) == 10

    linked = link_entities(tr, pool, "attendee")
    att = linked.filter(F.col("pred") == "attendee")
    in_pool = att.filter(F.col("obj").isin(*d.keys()))
    assert (
        in_pool.filter(F.col("entity_rank").isNull()).count() == 0
    )
    out_pool = att.filter(~F.col("obj").isin(*d.keys()))
    assert out_pool.filter(F.col("entity_rank").isNotNull()).count() == 0
    # non-attendee triples never link
    assert (
        linked.filter((F.col("pred") != "attendee") & F.col("entity_rank").isNotNull()).count()
        == 0
    )


def test_split_assignment_deterministic_and_disjoint(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    s1 = assign_split(df, "k")
    s2 = assign_split(df, "k")
    assert s1.exceptAll(s2).count() == 0
    frac = {
        r["split"]: r["count"] for r in s1.groupBy("split").count().collect()
    }
    assert 0.6 < frac["train"] / 5000 < 0.8
    assert 0.1 < frac["eval"] / 5000 < 0.2


def test_leakage_anti_join_drops_shared_signatures(spark):
    rows = [
        (0, "shared text", "train"),
        (1, "  SHARED   text ", "eval"),   # same signature as train → dropped
        (2, "unique eval", "eval"),
        (3, "shared text", "test"),        # in train → dropped
        (4, "unique eval", "test"),        # in eval → dropped
        (5, "unique test", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    kept = {r["doc_id"] for r in drop_split_leakage(df).collect()}
    assert kept == {0, 2, 5}


def test_deterministic_sample_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = [r["k"] for r in deterministic_sample(df, "k", 50).collect()]
    b = [r["k"] for r in deterministic_sample(df, "k", 50).collect()]
    assert a == b and len(a) == 50
