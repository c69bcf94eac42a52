"""Pin the DuckDB gold-SQL renderer to the Python grammar spec.

If these two independent implementations of the modular grammar diverge, the
driver's oracle comparisons become meaningless — this test catches that
before the driver does."""

import duckdb
import pandas as pd

from calendar_event_entity_extraction_spark.synth.grammar import event_spec
from calendar_event_entity_extraction_spark.synth.oracle import (
    gold_events_sql,
    gold_entity_pool_sql,
)

N = 3000


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT range AS o_orderkey FROM range({N})")
    return con.execute(sql).fetchdf()


def test_gold_sql_matches_python_spec():
    dk = _duck(gold_events_sql()).sort_values("conv_id").reset_index(drop=True)
    rows = []
    for k in range(N):
        s = event_spec(k)
        rows.append(
            {
                "conv_id": f"conv-{k}",
                "turn_idx": s.req_turn,
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
    py = pd.DataFrame(rows).sort_values("conv_id").reset_index(drop=True)
    dk = dk[py.columns].astype(str)
    assert dk.equals(py.astype(str)), pd.concat(
        [py.astype(str), dk], keys=["py", "duck"]
    ).head(20)


def test_entity_pool_sql_matches_python_spec():
    dk = _duck(gold_entity_pool_sql())
    from collections import Counter

    c = Counter()
    for k in range(N):
        for name in event_spec(k).attendees or []:
            c[name] += 1
    got = dict(zip(dk["name"], dk["cnt"]))
    assert got == dict(c)
