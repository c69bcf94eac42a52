"""The extraction core: transcripts → 8-field calendar events.

Replaces the reference's learned extractor (LoRA SmolLM-360M greedy decode,
``src/evaluate_finetuned.py:23-46``) with deterministic, declarative Column
expressions derived from the measured annotation semantics (SURVEY.md §1.2)
and the generator grammar (§2.6 G1-G12). All expressions are JVM-side regex /
string builtins → whole-stage codegen, narrow (no shuffle), fully parallel.

Mention detection: a user turn is a calendar request iff it contains both a
date mention and a time mention (the reference's corpus has date and time in
every gold row, §1.2: null rate 0% for both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_norm import (
    MONTH_ALT,
    date_norm_col,
    duration_norm_col,
    time_norm_col,
)

# default medium dictionary (reference MEDIUMS, faker_synth.py:21);
# at run time this can be replaced by a broadcast top-k dictionary built by
# entity_link.build_entity_pools.
DEFAULT_MEDIUMS = ["Zoom", "Google Meet", "Teams", "Skype", "Webex", "Slack huddle"]

REC_ALT = (
    "biweekly|weekly|monthly|daily|quarterly|annual|"
    "Biweekly|Weekly|Monthly|Daily|Quarterly|Annual"
)
REC_RE = rf"\b({REC_ALT})\b"

NAME = r"[A-Z][a-z]+"
# "with A, B and C" / "w/ A & B" (reference: with=336, w/=160 of 596 rows)
WITH_RE = rf"\b(?:with|w/) ({NAME}(?:(?:, | & | and ){NAME})*)"
# bare post-time name list ("Status check 2024-02-09 10:30 am James, Mia") —
# anchored to the tail of a time mention (optionally a timezone tag) so date
# digits can't false-trigger
BARE_RE = (
    rf"(?:\d ?[apAP][mM]|:[0-5]\d|\bnoon)(?: \([A-Z]{{2,4}}\))? "
    rf"({NAME}(?:, {NAME})*)"
)

_CLAUSE = r" for | lasting | on | at | in | with | w/ | via | over | starting "
PHYS_LOC_RE = (
    rf"\b(?:at|in) (?!\d|noon\b)([A-Za-z][A-Za-z0-9 ]*?)(?={_CLAUSE}|[.,]|$)"
)

NOTE_RE = r"\. Note: (.+)\.$"

ACTION_RE = (
    rf"^(?:(?:{REC_ALT}) )?(.+?)"
    rf"(?={_CLAUSE}| \d| (?:{MONTH_ALT})\b| (?:today|tomorrow|day after)\b)"
)


def _ne(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


def action_col(text: Column) -> Column:
    raw = _ne(F.regexp_extract(text, ACTION_RE, 1))
    # the reference's gold expands "mtg" → "meeting" (SURVEY §1.2 action row)
    return F.regexp_replace(raw, r"\bmtg\b", "meeting")


def attendees_col(text: Column) -> Column:
    """Ordered attendee list (text order preserved); null when absent,
    never an empty list (reference: attendees never [])."""
    phrase = F.coalesce(
        _ne(F.regexp_extract(text, WITH_RE, 1)),
        _ne(F.regexp_extract(text, BARE_RE, 1)),
    )
    arr = F.split(F.regexp_replace(phrase, r"(, | & | and )", "|"), r"\|")
    return F.when(phrase.isNotNull(), arr)


def location_col(text: Column, mediums: list[str] | None = None) -> Column:
    """Verbatim location substring: virtual-medium dictionary match
    ("on Zoom", "via Google Meet") else physical "at/in X" phrase."""
    med_alt = "|".join(mediums or DEFAULT_MEDIUMS)
    med = _ne(F.regexp_extract(text, rf"\b(?:on|via|over) ({med_alt})\b", 1))
    phys = _ne(F.regexp_extract(text, PHYS_LOC_RE, 1))
    return F.coalesce(med, phys)


def recurrence_col(text: Column) -> Column:
    return _ne(F.regexp_extract(text, REC_RE, 1))


def notes_col(text: Column) -> Column:
    return _ne(F.regexp_extract(text, NOTE_RE, 1))


def extract_events(
    transcripts: DataFrame, mediums: list[str] | None = None
) -> DataFrame:
    """transcripts → one row per detected calendar request with the 8 fields.

    Narrow map-only stage: filter + projections, no shuffle. Keeps
    (conv_id, turn_idx, text, ts) so downstream canonicalization and the
    per-turn text-equality invariant hold.
    """
    text = F.col("text")
    date_c = date_norm_col(text)
    time_c = time_norm_col(text)
    return (
        transcripts.withColumn("date", date_c)
        .withColumn("time", time_c)
        .filter(
            (F.col("role") == "user")
            & F.col("date").isNotNull()
            & F.col("time").isNotNull()
        )
        .withColumn("event_id", F.xxhash64(F.col("conv_id"), F.col("turn_idx")))
        .withColumn("action", action_col(text))
        .withColumn("attendees", attendees_col(text))
        .withColumn("location", location_col(text, mediums))
        .withColumn("duration", duration_norm_col(text))
        .withColumn("recurrence", recurrence_col(text))
        .withColumn("notes", notes_col(text))
        .select(
            "event_id", "conv_id", "turn_idx", "text", "ts",
            "action", "date", "time", "attendees", "location",
            "duration", "recurrence", "notes",
        )
    )
