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
