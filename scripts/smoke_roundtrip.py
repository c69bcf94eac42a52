"""Dev smoke: generate transcripts for keys 0..N, extract, diff vs gold."""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.session import get_spark
from calendar_event_entity_extraction_spark.synth import (
    gold_events,
    keys_df,
    transcripts_from_keys,
)
from calendar_event_entity_extraction_spark.operators import (
    canonicalize_events,
    extract_events,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
spark = get_spark(cores=8, shuffle_partitions=8)
keys = keys_df(spark, N)
tr = transcripts_from_keys(keys)
ext = canonicalize_events(extract_events(tr))
gold = gold_events(keys)

FIELDS = ["action", "date", "time", "attendees", "location", "duration", "recurrence", "notes"]
g = gold.select("conv_id", "turn_idx", *[F.col(f).alias(f"g_{f}") for f in FIELDS])
j = ext.join(g, ["conv_id", "turn_idx"], "full_outer")

n_gold, n_ext = gold.count(), ext.count()
print(f"gold={n_gold} extracted={n_ext}")

bad_any = None
for f in FIELDS:
    mism = j.filter(~(F.col(f).eqNullSafe(F.col(f"g_{f}"))))
    c = mism.count()
    print(f"{f}: mismatches={c}")
    if c and bad_any is None:
        bad_any = mism.select("conv_id", "turn_idx", "text", f, f"g_{f}")
if bad_any is not None:
    bad_any.show(20, truncate=False)
spark.stop()
