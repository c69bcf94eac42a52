"""Spark-side deterministic transcripts fixture generator.

Expands a DataFrame of integer keys into the transcripts table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json ``input_hint``)
using the pure-function grammar in :mod:`.grammar`. Generation runs
distributed via Arrow-batched ``mapInPandas`` (this is test scaffolding, not
the engine hot path — the engine itself never runs per-row Python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TRANSCRIPT_SCHEMA
from .grammar import event_spec, turns_for_key

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("action", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("attendees", T.ArrayType(T.StringType()), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("recurrence", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)


def keys_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Keys 0..n-1, evenly partitioned (range scan — no shuffle)."""
    return spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism).withColumnRenamed("id", "k")


def keys_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys derived from the driver's orders table so fixture size scales
    with the sf; column-pruned scan of o_orderkey only."""
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("k"))
    )


def transcripts_from_keys(keys: DataFrame) -> DataFrame:
    """keys(k bigint) → transcripts rows; ~2-6 turns per conversation."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                rows.extend(turns_for_key(int(k)))
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return keys.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def materialized_transcripts(
    spark: SparkSession, sf_dir: str, cache_root: str = "/tmp/cees_bench"
) -> DataFrame:
    """Transcripts fixture for an sf dir, generated once and cached as
    parquet (generation is Python scaffolding; the engine reads columnar).
    Size scales with the sf's orders table; content is deterministic."""
    import os

    from .grammar import GRAMMAR_VERSION

    n_keys = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    base = os.path.basename(sf_dir.rstrip("/"))
    path = f"{cache_root}/transcripts_v{GRAMMAR_VERSION}_{base}_{n_keys}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        keys = keys_from_orders(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism * 2
        )
        transcripts_from_keys(keys).write.mode("overwrite").parquet(path)
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def gold_events(keys: DataFrame) -> DataFrame:
    """keys(k bigint) → gold 8-field events, one row per conversation.

    Used by the pytest P/R gate (SURVEY.md §5) — the extractor's output is
    compared field-by-field against this with raw ``==`` semantics
    (null == null correct), per ``src/evaluate_finetuned.py:48-99``.
    """

    from .grammar import gold_rows_for_key

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                for conv_id, turn, s in gold_rows_for_key(int(k)):
                    rows.append(
                        (
                            conv_id, turn, s.action, s.date, s.time,
                            s.attendees, s.location, s.duration,
                            s.recurrence, s.notes,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "action", "date", "time",
                    "attendees", "location", "duration", "recurrence", "notes",
                ],
            )

    return keys.mapInPandas(gen, schema=GOLD_SCHEMA)
