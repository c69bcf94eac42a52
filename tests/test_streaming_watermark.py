"""Watermarked windowed aggregation over the streaming extraction: late
windows emit once the watermark passes them (append mode)."""

import datetime as dt

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.schemas import TRANSCRIPT_SCHEMA
from calendar_event_entity_extraction_spark.streaming.extract_stream import (
    streaming_extract,
    windowed_event_counts,
)


def _req(conv, turn, ts):
    return (conv, turn, "user", "Team sync on 10/05/2024 at 4pm.", None, ts)


def test_watermarked_window_counts(spark, tmp_path):
    base = str(tmp_path / "wm_in")
    h0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    # batch 1: three events inside hour 0, one in hour 1
    b1 = [
        _req("a", 0, h0 + dt.timedelta(minutes=5)),
        _req("b", 0, h0 + dt.timedelta(minutes=25)),
        _req("c", 0, h0 + dt.timedelta(minutes=45)),
        _req("d", 0, h0 + dt.timedelta(hours=1, minutes=10)),
    ]
    # batch 2: event far in the future — advances the watermark past hour 1
    b2 = [_req("e", 0, h0 + dt.timedelta(hours=9))]
    spark.createDataFrame(b1, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(base)
    spark.createDataFrame(b2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(base)

    ev = streaming_extract(spark, base)
    agg = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    # hour-0 and hour-1 windows closed by the advanced watermark
    assert rows.get(h0) == 3
    assert rows.get(h0 + dt.timedelta(hours=1)) == 1
    # the hour-9 window is still open (watermark hasn't passed it) → absent
    assert h0 + dt.timedelta(hours=9) not in rows


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from calendar_event_entity_extraction_spark.streaming.extract_stream import (
        streaming_dedup_events,
    )

    base = str(tmp_path / "dedup_in")
    h0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        _req("a", 0, h0),
        _req("a", 1, h0 + dt.timedelta(minutes=1)),  # echo of the same event
        _req("b", 0, h0 + dt.timedelta(minutes=2)),
    ]
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(base)

    ev = streaming_extract(spark, base).drop("attendees")
    dd = streaming_dedup_events(ev)
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT conv_id, turn_idx FROM dedup_stream").collect()
    got = {(r["conv_id"], r["turn_idx"]) for r in out}
    # the echo (a, 1) deduplicates against (a, 0); first arrival wins
    assert got == {("a", 0), ("b", 0)}, got


def test_streaming_curate_gates_and_dedup(spark, tmp_path):
    """The curation gates run unchanged under readStream (stateless maps),
    and exact dedup holds across micro-batches with bounded state: the
    duplicate text in batch 2 is dropped, the short/degenerate docs never
    pass the gates."""
    import datetime as dt

    from calendar_event_entity_extraction_spark.streaming.extract_stream import (
        streaming_curate,
    )

    base = str(tmp_path / "curate_in")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    good = "a perfectly ordinary document with more than ten whitespace tokens inside"
    other = "another reasonable document body that easily clears every quality gate here"
    schema = "doc_id long, text string, ts timestamp"
    b1 = [
        (1, good, t0),
        (2, "too short", t0),                      # fails min_tokens
        (3, "x " * 40 + "x", t0),                  # fails repetition gates
    ]
    b2 = [
        (4, good, t0 + dt.timedelta(minutes=10)),  # duplicate of doc 1
        (5, other, t0 + dt.timedelta(minutes=20)),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(base)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(base)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(base)
    )
    out = streaming_curate(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curate_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM curate_out").collect())
    assert kept == [1, 5], kept
