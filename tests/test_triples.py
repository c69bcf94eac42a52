"""Triple explode / rebuild round-trip and the per-turn text invariant."""

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.operators import (
    canonicalize_events,
    extract_events,
    events_to_triples,
)
from calendar_event_entity_extraction_spark.operators.triples import triples_to_events
from calendar_event_entity_extraction_spark.synth import keys_df, transcripts_from_keys

N = 2000


def test_triples_roundtrip(spark):
    keys = keys_df(spark, N)
    ev = canonicalize_events(extract_events(transcripts_from_keys(keys))).cache()
    back = triples_to_events(events_to_triples(ev))
    cols = ["conv_id", "turn_idx", "action", "date", "time", "attendees",
            "location", "duration", "recurrence", "notes"]
    a = ev.select(cols)
    b = back.select(cols)
    from calendar_event_entity_extraction_spark.synth.grammar import has_second_event

    n_events = N + sum(1 for k in range(N) if has_second_event(k))
    assert a.count() == b.count() == n_events
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_triples_pred_subset_equals_filtered_full(spark):
    """`preds=` pruning must yield exactly the full triple set filtered to
    those predicates — for a list pred (attendee, with obj_idx ordering),
    a scalar pred (location), and a mixed subset."""
    from calendar_event_entity_extraction_spark.operators.triples import (
        extract_triples,
    )

    keys = keys_df(spark, 500)
    tr = transcripts_from_keys(keys)
    full = extract_triples(tr).cache()
    for preds in (["attendee"], ["location"], ["attendee", "duration"]):
        sub = extract_triples(tr, preds=preds)
        want = full.filter(F.col("pred").isin(preds))
        assert sub.exceptAll(want).count() == 0
        assert want.exceptAll(sub).count() == 0
    full.unpersist()


def test_triples_pred_pruning_drops_unused_extractors(spark):
    """Plan pin: with ``preds=["attendee"]`` the recurrence extractor (its
    vocabulary regex contains 'biweekly', which appears nowhere else in the
    extraction expressions) must be PRUNED from the physical plan; the full
    triple plan must still carry it."""
    from calendar_event_entity_extraction_spark.operators.triples import (
        extract_triples,
    )

    tr = transcripts_from_keys(keys_df(spark, 50))
    pruned = extract_triples(tr, preds=["attendee"])
    full = extract_triples(tr)
    p = pruned._jdf.queryExecution().executedPlan().toString()
    f = full._jdf.queryExecution().executedPlan().toString()
    assert "biweekly" not in p
    assert "biweekly" in f


def test_per_turn_text_equality_invariant(spark):
    """input_hint invariant: per-turn text is preserved end-to-end under
    stable (conv_id, turn_idx) ordering."""
    keys = keys_df(spark, N)
    tr = transcripts_from_keys(keys).cache()
    ev = extract_events(tr)
    j = ev.alias("e").join(
        tr.alias("t"), ["conv_id", "turn_idx"], "inner"
    )
    assert j.filter(F.col("e.text") != F.col("t.text")).count() == 0
    # stable ordering: sorting twice yields identical sequences
    a = [r["text"] for r in tr.orderBy("conv_id", "turn_idx").limit(500).collect()]
    b = [r["text"] for r in tr.orderBy("conv_id", "turn_idx").limit(500).collect()]
    assert a == b


def test_event_id_stable_hash(spark):
    keys = keys_df(spark, 100)
    ev = extract_events(transcripts_from_keys(keys))
    expected = ev.select(
        "event_id", F.xxhash64("conv_id", "turn_idx").alias("h")
    )
    assert expected.filter(F.col("event_id") != F.col("h")).count() == 0
