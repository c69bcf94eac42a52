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
from .operators.triples import events_to_triples
from .synth.oracle import (
    GOLD_FIELDS,
    gold_entity_pool_sql,
    gold_events_sql,
    gold_triples_sql,
)
from .synth.transcripts import keys_from_orders, transcripts_from_keys


def canonical_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pipeline: synth transcripts (scaled by the sf's orders
    table) → detect → extract → canonicalize."""
    keys = keys_from_orders(spark, sf_dir)
    return canonicalize_events(extract_events(transcripts_from_keys(keys)))


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
    tr = events_to_triples(canonical_events(spark, sf_dir))
    return tr.select("conv_id", "turn_idx", "pred", "obj", "obj_idx")


def q_entity_pool_attendees(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = events_to_triples(canonical_events(spark, sf_dir))
    return (
        tr.filter(F.col("pred") == "attendee")
        .groupBy(F.col("obj").alias("name"))
        .agg(F.count("*").alias("cnt"))
    )


def kg_queries() -> dict:
    qs = {
        "events_extract": q_events_extract,
        "triples": q_triples,
        "entity_pool_attendees": q_entity_pool_attendees,
    }
    for f in GOLD_FIELDS:
        qs[f"extract_{f}"] = _field_query(f)
    return qs


def kg_oracles() -> dict:
    oracles = {
        "events_extract": gold_events_sql(),
        "triples": gold_triples_sql(),
        "entity_pool_attendees": gold_entity_pool_sql(),
    }
    for f in GOLD_FIELDS:
        oracles[f"extract_{f}"] = gold_events_sql([f])
    return oracles
