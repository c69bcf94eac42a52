"""Dev loop: score the extractor against the reference's own splits.

Usage: python scripts/eval_reference_corpus.py [train|eval|test|raw] [field]
Prints per-field accuracy (compute_metrics semantics) + failure samples.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from calendar_event_entity_extraction_spark.functions.prompts import (  # noqa: E402
    EVAL_PREFIX,
    EVAL_SUFFIX,
)
from calendar_event_entity_extraction_spark.operators.extract import (  # noqa: E402
    extract_events,
)
from calendar_event_entity_extraction_spark.session import get_spark  # noqa: E402

FIELDS = ["action", "date", "time", "attendees", "location", "duration", "recurrence", "notes"]


def load_split(name: str):
    rows = []
    if name == "raw":
        for i, line in enumerate(open("/root/reference/data/raw/event_text_mapping.jsonl")):
            d = json.loads(line)
            rows.append((f"r{i}", d["event_text"], d["output"]))
    else:
        for i, line in enumerate(open(f"/root/reference/data/splits/{name}.jsonl")):
            d = json.loads(line)
            text = d["prompt"][len(EVAL_PREFIX):-len(EVAL_SUFFIX)]
            rows.append((f"{name}{i}", text, json.loads(d["completion"])))
    return rows


def evaluate(spark, rows, show_field=None, show_n=12, pools=None):
    tr = spark.createDataFrame(
        [(c, 0, "user", t, None, None) for c, t, _ in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    name_pool, loc_pool = pools or (None, None)
    pred = {
        r["conv_id"]: r
        for r in extract_events(
            tr, name_pool=name_pool, location_pool=loc_pool
        ).collect()
    }
    n = len(rows)
    acc = {f: 0 for f in FIELDS}
    bad = {f: [] for f in FIELDS}
    undetected = 0
    for c, t, gold in rows:
        p = pred.get(c)
        if p is None:
            # compute_metrics semantics: an undetected event scores 0 on
            # EVERY field (never credit for null-vs-null)
            undetected += 1
            for f in FIELDS:
                bad[f].append((t, "<undetected>", gold.get(f)))
            continue
        for f in FIELDS:
            pv = list(p[f]) if (f == "attendees" and p[f] is not None) else p[f]
            gv = gold.get(f)
            if pv == gv:
                acc[f] += 1
            else:
                bad[f].append((t, pv, gv))
    print(f"n={n} undetected={undetected}")
    exact = n - len({id(b) for f in FIELDS for b in bad[f]})
    for f in FIELDS:
        print(f"  {f}: {acc[f] / n:.3f}")
    print(f"  mean: {sum(acc.values()) / (8 * n):.3f}")
    if show_field:
        for b in bad[show_field][:show_n]:
            print("   ", b)
    return acc


if __name__ == "__main__":
    # flags are parsed out BEFORE positionals bind ("--pools" must never
    # land in the show_field slot)
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    split = pos[0] if len(pos) > 0 else "train"
    field = pos[1] if len(pos) > 1 else None
    spark = get_spark(cores=8, shuffle_partitions=8)
    pools = None
    if "--pools" in flags:
        from calendar_event_entity_extraction_spark.operators.extract import (
            build_lexicons,
        )

        train = spark.createDataFrame(
            [(t,) for _, t, _ in load_split("train")], "text string"
        )
        pools = build_lexicons(train)
        print(f"pools: {len(pools[0])} names, {len(pools[1])} locations")
    evaluate(spark, load_split(split), field, pools=pools)
    spark.stop()
