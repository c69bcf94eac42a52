"""Batch-equivalence harness for the streaming curation path.

The grading driver runs BATCH queries only, so the streaming engine was
previously pytest-visible only. This module drives the actual Structured
Streaming engine to completion against a static fixture (file source →
`streaming_curate` gates + bounded-state dedup → parquet sink, availableNow
trigger) and returns the sink as a batch DataFrame — making batch/streaming
parity a hash-compared driver row.

Determinism contract: the output is the set of kept text FINGERPRINTS.
`dropDuplicatesWithinWatermark` keeps the first arrival per key, and which
duplicate arrives first depends on micro-batch file order — an engine
detail — so doc_ids are not compared; the key set is arrival-order
invariant. Event times are synthesized from doc_id (key arithmetic, no
now()/RNG — CLAUDE.md invariant 3) with a spread strictly smaller than the
watermark delay, so no state is evicted mid-stream and every gated
fingerprint yields exactly one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint_col
from ..streaming.extract_stream import streaming_curate

# fixed epoch base for synthesized event times (2023-11-14T22:13:20Z);
# arbitrary but pinned — determinism, not wall-clock
_TS_BASE = 1_700_000_000


def run_streaming_curate_batch(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str,
    n_input_files: int = 4,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Materialize ``docs`` as a multi-file streaming source, run the
    curation gates + watermarked dedup through the streaming engine to
    completion, and return the kept fingerprint set as a batch frame.

    ``n_input_files`` > ``max_files_per_trigger`` forces MULTIPLE
    micro-batches, so the dedup state machine is exercised ACROSS batches
    (a single-batch run would degenerate to a plain dropDuplicates).
    """
    in_dir = f"{workdir}/in"
    out_dir = f"{workdir}/out"
    ck_dir = f"{workdir}/ck"

    ts = F.timestamp_seconds(F.lit(_TS_BASE) + F.pmod(F.col("doc_id"), F.lit(3600)))
    src = docs.withColumn("ts", ts)
    src.repartition(n_input_files).write.mode("overwrite").parquet(in_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    curated = streaming_curate(stream, ts_col="ts", watermark="24 hours").select(
        fingerprint_col(F.col("text")).alias("fp")
    )
    q = (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select("fp")
