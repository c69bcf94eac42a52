"""Events → (event_id, pred, obj, obj_idx) triples.

The reference's per-row 8-key JSON object (``augmentation/utils.py:8``)
becomes triple rows; the list-valued ``attendees`` field explodes into
multiple ``attendee`` triples whose ``obj_idx`` preserves text order so the
original ordered list is reconstructable (SURVEY.md §1.4).

Narrow stage: a union of projections + one posexplode; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALAR_PREDS = ["action", "date", "time", "location", "duration", "recurrence", "notes"]

SLIM_EVENT_COLS = [
    "event_id", "conv_id", "turn_idx",
    "action", "date", "time", "attendees",
    "location", "duration", "recurrence", "notes",
]


def extract_triples(transcripts: DataFrame) -> DataFrame:
    """Fused transcripts → triples path: projects away text/ts/tool BEFORE
    the canonicalize shuffle (min_by's struct blocks Catalyst's own column
    pruning there), roughly halving the shuffle payload."""
    from .canonicalize import canonicalize_events
    from .extract import extract_events

    slim = extract_events(transcripts).select(*SLIM_EVENT_COLS)
    return events_to_triples(canonicalize_events(slim))


def events_to_triples(events: DataFrame) -> DataFrame:
    """Single-pass explode: scalar fields and the attendee list are merged
    into ONE struct array per event before the explode, so the upstream plan
    (scan → extract → canonicalize exchange) executes exactly once — a
    union of two projections would re-run it per branch."""
    key = ["event_id", "conv_id", "turn_idx"]
    scalar_arr = F.array(
        *[
            F.struct(
                F.lit(p).alias("pred"),
                F.col(p).alias("obj"),
                F.lit(0).alias("obj_idx"),
            )
            for p in SCALAR_PREDS
        ]
    )
    att_arr = F.coalesce(
        F.transform(
            F.col("attendees"),
            lambda x, i: F.struct(
                F.lit("attendee").alias("pred"),
                x.alias("obj"),
                i.cast("int").alias("obj_idx"),
            ),
        ),
        F.array().cast("array<struct<pred:string,obj:string,obj_idx:int>>"),
    )
    all_arr = F.filter(
        F.concat(scalar_arr, att_arr), lambda s: s["obj"].isNotNull()
    )
    return events.select(*key, F.explode(all_arr).alias("t")).select(
        *key, "t.pred", "t.obj", "t.obj_idx"
    )


def triples_to_events(triples: DataFrame) -> DataFrame:
    """Inverse: rebuild the 8-field event rows from triples (attendee order
    restored via obj_idx). One shuffle on event_id."""
    return (
        triples.groupBy("event_id", "conv_id", "turn_idx")
        .agg(
            *[
                F.max(F.when(F.col("pred") == p, F.col("obj"))).alias(p)
                for p in SCALAR_PREDS
            ],
            F.when(
                F.count(F.when(F.col("pred") == "attendee", 1)) > 0,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("pred") == "attendee",
                                F.struct("obj_idx", "obj"),
                            )
                        )
                    ),
                    lambda s: s["obj"],
                ),
            ).alias("attendees"),
        )
        .select(
            "event_id", "conv_id", "turn_idx", "action", "date", "time",
            "attendees", "location", "duration", "recurrence", "notes",
        )
    )
