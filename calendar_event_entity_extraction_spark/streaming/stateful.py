"""Custom stateful streaming operator: cross-batch event canonicalization.

The batch canonicalizer (operators/canonicalize.py) merges co-referent
events with a hash aggregate; under continuous ingest the echo of an event
can arrive in a *later micro-batch*, so the merge needs keyed state across
batches: ``applyInPandasWithState`` keyed by (conv_id, action, date, time).

Streaming semantics (append mode — no retraction): the FIRST arrival of an
event key is emitted; later co-referent arrivals are dropped. When ingest
order follows turn order (the transcripts table is written in turn order),
this equals the batch result; out-of-order echoes still collapse to one
emission per key, just possibly a later turn_idx.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MERGE_KEY = ["conv_id", "action", "date", "time"]

OUT_SCHEMA = (
    "conv_id string, action string, date string, time string, "
    "turn_idx int, event_id long"
)
STATE_SCHEMA = "emitted_turn int"


def _dedup_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted in a previous batch — drain and drop
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        row = pdf.loc[pdf["turn_idx"].idxmin()]
        if best is None or row["turn_idx"] < best["turn_idx"]:
            best = row
    if best is None:
        return
    state.update((int(best["turn_idx"]),))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "action": key[1],
                "date": key[2],
                "time": key[3],
                "turn_idx": int(best["turn_idx"]),
                "event_id": int(best["event_id"]),
            }
        ]
    )


def canonicalize_events_stateful(events: DataFrame) -> DataFrame:
    """Streaming events frame → first-arrival-canonical events.

    One stateful shuffle on the merge key; state is one int per live event
    key (bounded by distinct events, evictable with a timeout in a real
    deployment).
    """
    return events.groupBy(*MERGE_KEY).applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
