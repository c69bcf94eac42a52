"""Multi-event conversations: distinct events in one conversation must NOT
merge; co-referent repeats must. (The fixture has one request + optional
echo per conversation; this pins the general case.)"""

import datetime as dt

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.operators import (
    canonicalize_events,
    extract_events,
    events_to_triples,
)
from calendar_event_entity_extraction_spark.schemas import TRANSCRIPT_SCHEMA

T0 = dt.datetime(2024, 1, 1)

ROWS = [
    # conversation with THREE distinct events + one echo of the first
    ("c1", 0, "user", "Team sync on 10/05/2024 at 4pm with Alice.", None, T0),
    ("c1", 1, "assistant", "Booked it.", None, T0),
    ("c1", 2, "user", "Budget review on 11/05/2024 at 9:00 am in room 12.", None, T0),
    ("c1", 3, "user", "Team sync on 10/05/2024 at 4pm with Alice.", None, T0),  # echo
    ("c1", 4, "user", "Standup on 10/05/2024 at 9:30 am.", None, T0),  # same date, diff time
    # second conversation with the SAME event text — must stay separate
    ("c2", 0, "user", "Team sync on 10/05/2024 at 4pm with Alice.", None, T0),
]


def test_distinct_events_survive_and_echoes_merge(spark):
    df = spark.createDataFrame(ROWS, TRANSCRIPT_SCHEMA)
    ev = canonicalize_events(extract_events(df)).cache()
    got = {(r["conv_id"], r["turn_idx"]): r for r in ev.collect()}
    # c1: three canonical events (turns 0, 2, 4); the echo at turn 3 merged
    assert set(got) == {("c1", 0), ("c1", 2), ("c1", 4), ("c2", 0)}
    assert got[("c1", 0)]["action"] == "Team sync"
    assert got[("c1", 2)]["location"] == "room 12"
    assert got[("c1", 4)]["time"] == "9:30 AM"
    # identical event text in different conversations keeps distinct ids
    assert got[("c1", 0)]["event_id"] != got[("c2", 0)]["event_id"]

    triples = events_to_triples(ev)
    per_event = (
        triples.groupBy("conv_id", "turn_idx").count().collect()
    )
    assert all(r["count"] >= 3 for r in per_event)  # action/date/time minimum
