"""Driver-facing query catalog.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB oracle SQL string (see ``__spark_entry__.py``). For the
KG-construction queries the oracle computes *gold* directly from the grammar
key, while Spark renders the transcript text and runs the real extraction
pipeline — a hash match therefore proves extraction P/R = 1.0 on the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.canonicalize import canonicalize_events
from .operators.extract import extract_events
from .synth.oracle import (
    GOLD_FIELDS,
    gold_augment_sql,
    gold_dataset_analysis_sql,
    gold_entity_pool_sql,
    gold_eval_metrics_canonical_sql,
    gold_eval_metrics_sql,
    gold_events_sql,
    gold_location_pool_sql,
    gold_triples_sql,
)
from .synth.transcripts import materialized_transcripts


def canonical_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pipeline: synth transcripts (scaled by the sf's orders
    table, generated once and cached as parquet) → detect → extract →
    canonicalize."""
    tr = materialized_transcripts(spark, sf_dir)
    return canonicalize_events(extract_events(tr))


def q_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = canonical_events(spark, sf_dir)
    return ev.select(
        "conv_id",
        "turn_idx",
        "action",
        "date",
        "time",
        F.array_join("attendees", "|").alias("attendees"),
        "location",
        "duration",
        "recurrence",
        "notes",
    )


def _field_query(field: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return q_events_extract(spark, sf_dir).select("conv_id", "turn_idx", field)

    return q


def q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.triples import extract_triples

    tr = extract_triples(materialized_transcripts(spark, sf_dir))
    return tr.select("conv_id", "turn_idx", "pred", "obj", "obj_idx")


def q_entity_pool_attendees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attendee pool count over pred-pruned triples: ``preds=["attendee"]``
    drops the location/duration/recurrence/notes extractors from the plan
    entirely (only the canonicalize merge key action/date/time is still
    normalized) — the pool never pays for fields it doesn't count."""
    from .operators.triples import extract_triples

    tr = extract_triples(
        materialized_transcripts(spark, sf_dir), preds=["attendee"]
    )
    return (
        tr.filter(F.col("pred") == "attendee")
        .groupBy(F.col("obj").alias("name"))
        .agg(F.count("*").alias("cnt"))
    )


def q_entity_pool_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location entity pool via the skew-safe salted two-phase aggregate
    (hot mediums like "Zoom" are ~28% of reference locations)."""
    from .operators.entity_link import salted_count
    from .operators.triples import extract_triples

    tr = extract_triples(
        materialized_transcripts(spark, sf_dir), preds=["location"]
    )
    loc = tr.filter(F.col("pred") == "location").select(
        "conv_id", "turn_idx", F.col("obj").alias("name")
    )
    return salted_count(
        loc, "name", salt_cols=["conv_id", "turn_idx", "name"]
    ).select("name", "cnt")


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference compute_metrics semantics (src/evaluate_finetuned.py:48-99)
    on a controlled perturbation: predictions = extraction with location
    clobbered on keys k%10==3, gold = unperturbed extraction. All compared
    outputs are exact BIGINT numerator/denominator pairs (never floats).

    Single-pass: pred is a deterministic perturbation of gold with the same
    unique ``(conv_id, turn_idx)`` key (one event per turn by construction),
    so the reference's positional ``zip(predictions, targets)`` — a
    full-outer self-join in Spark — is identity pairing. Both column
    families are derived in ONE projection of ONE extraction lineage; the
    plan has exactly one transcript scan and zero joins (pinned by
    ``tests/test_driver_contract.py``), halving the dominant extract cost
    at scale vs the former two-lineage join with identical BIGINT counts."""
    from .operators.metrics import FIELDS, field_metrics_counts_paired

    ev = canonical_events(spark, sf_dir)
    k = F.substring("conv_id", 6, 20).cast("long")
    p_loc = F.when(F.pmod(k, 10) == 3, F.lit("PERTURBED")).otherwise(
        F.col("location")
    )
    paired = ev.select(
        *[F.col(f).alias(f"g_{f}") for f in FIELDS],
        *[
            (p_loc if f == "location" else F.col(f)).alias(f"p_{f}")
            for f in FIELDS
        ],
    )
    return field_metrics_counts_paired(paired)


def q_eval_metrics_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ALTERNATIVE metric module (src/metrics.py:9-40:
    canonicalize strip+lower, json_valid, canonical micro-F1/exact-match)
    on a three-way controlled perturbation: location clobbered on k%10==3
    (a REAL mismatch under both metric semantics), action UPPERCASED on
    k%10==7 and time whitespace-padded on k%10==1 (raw-`==` mismatches
    that canonicalization must FORGIVE — the two semantics provably differ
    on this fixture, which is what pins the canonical path). The padding
    deliberately includes TAB and NEWLINE: Python str.strip() removes the
    whole whitespace class, so a canonicalizer built on space-only F.trim
    would fail this oracle (round-3 advice — metrics._strip_ws).

    Single-pass like :func:`q_eval_metrics`: pred/gold derived in ONE
    projection of ONE extraction lineage (identity pairing — unique
    per-turn key), one transcript scan, zero joins."""
    from .operators.metrics import (
        FIELDS,
        field_metrics_canonical_counts_paired,
    )

    ev = canonical_events(spark, sf_dir)
    k = F.substring("conv_id", 6, 20).cast("long")
    perturb = {
        "location": F.when(F.pmod(k, 10) == 3, F.lit("PERTURBED")).otherwise(
            F.col("location")
        ),
        "action": F.when(F.pmod(k, 10) == 7, F.upper(F.col("action"))).otherwise(
            F.col("action")
        ),
        "time": F.when(
            F.pmod(k, 10) == 1,
            F.concat(F.lit("\t "), F.col("time"), F.lit(" \n")),
        ).otherwise(F.col("time")),
    }
    paired = ev.select(
        *[F.col(f).alias(f"g_{f}") for f in FIELDS],
        *[perturb.get(f, F.col(f)).alias(f"p_{f}") for f in FIELDS],
    )
    return field_metrics_canonical_counts_paired(paired)


# augmentation swap pools — deliberately disjoint from the grammar's NAMES /
# location vocab so whole-word rewrites can't collide with other text tokens
AUG_ATT_POOL = ["Zara", "Vikram", "Priya", "Diego", "Yuki"]
AUG_LOC_POOL = ["Innovation Lab", "Harbor View", "Studio Nine"]


def q_augment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 swap_entities_with_pools (augmentation/augmentors.py:16-39) as a
    driver query: extract → swap every attendee + the location for keyed
    pool members → verify the TEXT rewrite by probing each swapped mention
    in the rewritten text (att_in_text must equal the attendee count)."""
    from .operators.augment import swap_entities_with_pools

    ev = canonical_events(spark, sf_dir)
    k0 = F.substring("conv_id", 6, 20).cast("long")
    t = F.col("turn_idx").cast("long")
    sw = swap_entities_with_pools(
        ev,
        AUG_ATT_POOL,
        AUG_LOC_POOL,
        att_idx_fn=lambda i: F.pmod(
            k0 * 7 + t * 31 + i.cast("long") * 11, F.lit(len(AUG_ATT_POOL))
        ),
        loc_idx=F.pmod(k0 * 13 + t * 31 + 5, F.lit(len(AUG_LOC_POOL))),
    )
    text = F.col("text")
    att_hits = F.size(
        F.filter(
            F.coalesce(F.col("attendees"), F.array().cast("array<string>")),
            lambda a: F.instr(text, a) > 0,
        )
    ).cast("long")
    loc_hit = (
        F.when(
            F.col("location").isNotNull() & (F.instr(text, F.col("location")) > 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return sw.select(
        "conv_id",
        "turn_idx",
        F.array_join("attendees", "|").alias("attendees"),
        "location",
        att_hits.alias("att_in_text"),
        loc_hit.alias("loc_in_text"),
    )


def q_dataset_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 analyze_dataset (src/prepare_assignment_data.py:64-102): per-field
    fill counts over the extracted events, one aggregate pass."""
    from .schemas import TARGET_KEYS

    ev = canonical_events(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("n_rows"),
        *[
            F.count(F.when(F.col(k).isNotNull(), 1)).alias(f"{k}_nonnull")
            for k in TARGET_KEYS
        ],
    )






def kg_queries() -> dict:
    qs = {
        "events_extract": q_events_extract,
        "triples": q_triples,
        "entity_pool_attendees": q_entity_pool_attendees,
        "entity_pool_locations": q_entity_pool_locations,
        "eval_metrics": q_eval_metrics,
        "eval_metrics_canonical": q_eval_metrics_canonical,
        "dataset_analysis": q_dataset_analysis,
        "augment_pipeline": q_augment_pipeline,
    }
    for f in GOLD_FIELDS:
        qs[f"extract_{f}"] = _field_query(f)
    return qs


def kg_oracles() -> dict:
    oracles = {
        "events_extract": gold_events_sql(),
        "triples": gold_triples_sql(),
        "entity_pool_attendees": gold_entity_pool_sql(),
        "entity_pool_locations": gold_location_pool_sql(),
        "eval_metrics": gold_eval_metrics_sql(),
        "eval_metrics_canonical": gold_eval_metrics_canonical_sql(),
        "dataset_analysis": gold_dataset_analysis_sql(),
        "augment_pipeline": gold_augment_sql(AUG_ATT_POOL, AUG_LOC_POOL),
    }
    for f in GOLD_FIELDS:
        oracles[f"extract_{f}"] = gold_events_sql([f])
    return oracles
