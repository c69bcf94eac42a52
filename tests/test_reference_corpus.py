"""The reference-parity gate: run the extractor over the reference's OWN
held-out splits and assert field accuracies (compute_metrics semantics:
raw ==, null==null, ordered-list equality).

The residual gap to 1.0 is measured annotation noise — identical surface
forms carry conflicting golds in the corpus (e.g. "1hr" → "1hr" ×49 vs
"1 hour" ×10; mid-text ISO dates keep 89 / convert 29). For comparison, the
reference's own fine-tuned model scores ≈0.97 mean on its first 30 test rows
(results/comparison_evaluation.json)."""

import json
import os

import pytest

REF_SPLITS = "/root/reference/data/splits"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_SPLITS), reason="reference corpus not available"
)

FIELDS = ["action", "date", "time", "attendees", "location", "duration", "recurrence", "notes"]
PREFIX = "Extract calendar information from: "
SUFFIX = "\nCalendar JSON:"


def _load(name):
    rows = []
    for i, line in enumerate(open(f"{REF_SPLITS}/{name}.jsonl")):
        d = json.loads(line)
        rows.append(
            (f"{name}{i}", d["prompt"][len(PREFIX):-len(SUFFIX)], json.loads(d["completion"]))
        )
    return rows


@pytest.fixture(scope="module")
def pools(spark):
    from calendar_event_entity_extraction_spark.operators.extract import build_lexicons

    train = spark.createDataFrame([(t,) for _, t, _ in _load("train")], "text string")
    return build_lexicons(train)


def _accuracies(spark, rows, pools):
    from calendar_event_entity_extraction_spark.operators.extract import extract_events

    tr = spark.createDataFrame(
        [(c, 0, "user", t, None, None) for c, t, _ in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    pred = {
        r["conv_id"]: r
        for r in extract_events(tr, name_pool=pools[0], location_pool=pools[1]).collect()
    }
    acc = {f: 0 for f in FIELDS}
    for c, t, gold in rows:
        p = pred.get(c)
        if p is None:
            continue  # undetected scores 0 on every field (compute_metrics)
        for f in FIELDS:
            pv = list(p[f]) if (f == "attendees" and p[f] is not None) else p[f]
            if pv == gold.get(f):
                acc[f] += 1
    return {f: acc[f] / len(rows) for f in FIELDS}


# floors sit ~1 point under the measured 0.984 eval / 0.981 test means so
# the gate locks in the late-round-2 parity gains (reference model ≈0.971)
@pytest.mark.parametrize("split,mean_floor", [("eval", 0.97), ("test", 0.97)])
def test_reference_heldout_parity(spark, pools, split, mean_floor):
    acc = _accuracies(spark, _load(split), pools)
    mean = sum(acc.values()) / len(acc)
    assert mean >= mean_floor, acc
    for f in FIELDS:
        assert acc[f] >= 0.90, (f, acc)
    # date/time must clear the 0.95 bar outright
    assert acc["date"] >= 0.95 and acc["time"] >= 0.95, acc
