"""Schema-enforced table readers.

The reference reads row-oriented JSONL with inference and in-memory lists
(``augmentation/utils.py:11-18``); here every scan is a lazy, schema-pinned
columnar read — predicate pushdown and column pruning come free from
Catalyst. Iceberg is the target catalog on a real cluster; this container
has no Iceberg jars, so the reader falls back to Parquet with the same
layout (a partitioned directory per table) behind an import-try, per the
environment constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TRANSCRIPT_SCHEMA


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read an Iceberg table if the catalog is on the classpath, else the
    Parquet directory with the same layout."""
    if path.startswith("iceberg://") and _iceberg_available(spark):
        return spark.read.format("iceberg").load(path[len("iceberg://"):])
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return read_table(spark, path, TRANSCRIPT_SCHEMA)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """Schema-pinned CSV scan (never inferSchema in a pipeline — one extra
    full pass and non-deterministic typing)."""
    return spark.read.schema(schema).option("header", header).csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Reference S1 (read_jsonl): PERMISSIVE schema-pinned JSON scan; blank
    lines are dropped by the reader."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference S2 (write_jsonl) — for edge-compatibility only; internal
    tables are always columnar."""
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table — the Parquet analog of Iceberg's
    ``bucket(N, col)`` partition transform (SCALE.md input layout): rows are
    hash-co-located by ``bucket_col`` at WRITE time, so an equi-join (or
    aggregation) of two tables bucketed the same way plans with NO Exchange
    on either side — the shuffle is paid once at ingest instead of per
    query. At 100 TB this is the difference between re-shuffling the fact
    table for every keyed join and never shuffling it at all."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(name)
