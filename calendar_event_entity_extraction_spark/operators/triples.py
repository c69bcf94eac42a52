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


def events_to_triples(events: DataFrame) -> DataFrame:
    key = ["event_id", "conv_id", "turn_idx"]
    scalar = events.select(
        *key,
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("pred"),
                            F.col(p).alias("obj"),
                            F.lit(0).alias("obj_idx"),
                        )
                        for p in SCALAR_PREDS
                    ]
                ),
                lambda s: s["obj"].isNotNull(),
            )
        ).alias("t"),
    ).select(*key, "t.pred", "t.obj", "t.obj_idx")

    att = (
        events.filter(F.col("attendees").isNotNull())
        .select(*key, F.posexplode("attendees").alias("obj_idx", "obj"))
        .select(*key, F.lit("attendee").alias("pred"), "obj", "obj_idx")
    )
    return scalar.unionByName(att)


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
