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


def extract_triples(
    transcripts: DataFrame, preds: list[str] | None = None
) -> DataFrame:
    """Fused transcripts → triples path: projects away text/ts/tool BEFORE
    the canonicalize shuffle (min_by's struct blocks Catalyst's own column
    pruning there), roughly halving the shuffle payload.

    ``preds`` restricts which predicates are emitted; the slim projection
    then drops the unneeded field columns so Catalyst prunes their
    extraction expressions entirely (the merge key action/date/time is
    always extracted — canonicalization needs it). The entity-pool queries
    use this: counting attendees never pays for location/duration/
    recurrence/notes normalization."""
    from .canonicalize import canonicalize_events
    from .extract import extract_events

    if preds is None:
        slim_cols = SLIM_EVENT_COLS
    else:
        need = {"event_id", "conv_id", "turn_idx", "action", "date", "time"}
        need |= {p for p in preds if p in SCALAR_PREDS}
        if "attendee" in preds:
            need.add("attendees")
        slim_cols = [c for c in SLIM_EVENT_COLS if c in need]
    slim = extract_events(transcripts).select(*slim_cols)
    return events_to_triples(canonicalize_events(slim), preds=preds)


_TRIPLE_STRUCT = "array<struct<pred:string,obj:string,obj_idx:int>>"


def events_to_triples(
    events: DataFrame, preds: list[str] | None = None
) -> DataFrame:
    """Single-pass explode: scalar fields and the attendee list are merged
    into struct rows so the upstream plan (scan → extract → canonicalize
    exchange) executes exactly once — a union of two projections would
    re-run it per branch.

    Physical shape: two codegen'd Generate stages. The first
    ``posexplode_outer(attendees)`` yields one row per attendee (or one
    null row); the second explodes a per-row struct array that carries the
    scalar predicates ONLY on the first attendee row. The former
    single-explode form built the array with higher-order
    ``transform``/``filter`` — CodegenFallback, so the ENTIRE array
    construction (10 struct allocs × interpreted per-field eval) ran
    interpreted per event (perf lessons #10/#13); here every expression is
    inside WholeStageCodegen and the null-obj filter is a row-level
    codegen filter above the explode.

    ``preds`` (optional) emits only the named predicates — combined with a
    slim upstream projection this prunes unused extractors.
    """
    key = ["event_id", "conv_id", "turn_idx"]
    scalars = [p for p in SCALAR_PREDS if preds is None or p in preds]
    with_att = (preds is None or "attendee" in preds) and (
        "attendees" in events.columns
    )

    if with_att:
        e = events.select(
            *key, *scalars, F.posexplode_outer("attendees").alias("_ai", "_a")
        )
        first = F.col("_ai").isNull() | (F.col("_ai") == 0)
        att_arr = F.when(
            F.col("_a").isNotNull(),
            F.array(
                F.struct(
                    F.lit("attendee").alias("pred"),
                    F.col("_a").alias("obj"),
                    F.col("_ai").cast("int").alias("obj_idx"),
                )
            ),
        ).otherwise(F.array().cast(_TRIPLE_STRUCT))
    else:
        e = events.select(*key, *scalars)
        first = F.lit(True)
        att_arr = F.array().cast(_TRIPLE_STRUCT)

    scalar_arr = F.when(
        first,
        F.array(
            *[
                F.struct(
                    F.lit(p).alias("pred"),
                    F.col(p).alias("obj"),
                    F.lit(0).alias("obj_idx"),
                )
                for p in scalars
            ]
        )
        if scalars
        else F.array().cast(_TRIPLE_STRUCT),
    ).otherwise(F.array().cast(_TRIPLE_STRUCT))

    return (
        e.select(*key, F.explode(F.concat(scalar_arr, att_arr)).alias("t"))
        .filter(F.col("t.obj").isNotNull())
        .select(*key, "t.pred", "t.obj", "t.obj_idx")
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
