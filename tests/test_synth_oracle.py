"""Pin the DuckDB gold-SQL renderer to the Python grammar spec.

If these two independent implementations of the modular grammar diverge, the
driver's oracle comparisons become meaningless — this test catches that
before the driver does."""

import duckdb
import pandas as pd

from calendar_event_entity_extraction_spark.synth.grammar import (
    event_spec,
    gold_rows_for_key,
    has_second_event,
    second_key,
)
from calendar_event_entity_extraction_spark.synth.oracle import (
    gold_entity_pool_sql,
    gold_events_sql,
)

N = 3000


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT range AS o_orderkey FROM range({N})")
    return con.execute(sql).fetchdf()


def _py_gold_rows():
    rows = []
    for k in range(N):
        for conv_id, turn, s in gold_rows_for_key(k):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn,
                    "action": s.action,
                    "date": s.date,
                    "time": s.time,
                    "attendees": "|".join(s.attendees) if s.attendees else None,
                    "location": s.location,
                    "duration": s.duration,
                    "recurrence": s.recurrence,
                    "notes": s.notes,
                }
            )
    return rows


def test_gold_sql_matches_python_spec():
    keys = ["conv_id", "turn_idx"]
    dk = _duck(gold_events_sql()).sort_values(keys).reset_index(drop=True)
    py = pd.DataFrame(_py_gold_rows()).sort_values(keys).reset_index(drop=True)
    assert len(dk) == len(py) > N  # second events present
    dk = dk[py.columns].astype(str)
    assert dk.equals(py.astype(str)), pd.concat(
        [py.astype(str), dk], keys=["py", "duck"]
    ).head(20)


def test_second_events_are_never_coreferent():
    for k in range(N):
        if has_second_event(k):
            assert event_spec(second_key(k)).action != event_spec(k).action


def test_entity_pool_sql_matches_python_spec():
    dk = _duck(gold_entity_pool_sql())
    from collections import Counter

    c = Counter()
    for k in range(N):
        for _, _, s in gold_rows_for_key(k):
            for name in s.attendees or []:
                c[name] += 1
    got = dict(zip(dk["name"], dk["cnt"]))
    assert got == dict(c)
