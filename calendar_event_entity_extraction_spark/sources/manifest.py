"""Per-stage lineage manifests + checkpoint-based resume.

The `north_rule` requires batch-with-resume: each pipeline stage writes its
output table plus a ``_lineage.json`` manifest recording the input
fingerprint, row count, per-partition row counts, and config. On restart a
stage whose manifest exists and whose input fingerprint still matches is
skipped and its output re-read — the analog of the reference's HF
``checkpoint-*`` dirs (``simple_output/checkpoint-277``), but content-
addressed instead of step-numbered.

Per-partition metrics are collected with ``spark_partition_id()`` grouping —
an executor-side aggregation, not a driver loop.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 — used in both writers

MANIFEST_NAME = "_lineage.json"


def partition_metrics(df: DataFrame) -> list[dict]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition": r["pid"], "rows": r["rows"]} for r in rows]


# footer-walk cutoff: below this many files the driver reads parquet
# footers directly (~1 ms each); above it the distributed aggregation wins
_FOOTER_WALK_MAX_FILES = 256


def written_partition_metrics(spark: SparkSession, path: str) -> list[dict]:
    """Per-partition row counts of a JUST-WRITTEN stage (round-6): for the
    common small-output case, read the parquet FOOTERS driver-side (row
    counts are manifest metadata — no Spark job, no data scan) with one
    entry per file, which is exactly the read-partition granularity at
    these sizes. Falls back to the executor-side
    ``spark_partition_id``-grouped aggregation when the stage wrote more
    than ``_FOOTER_WALK_MAX_FILES`` files — at cluster scale a driver loop
    over every file is the anti-pattern the original design avoided, and
    the distributed count reads only footer-backed metadata columns
    anyway. Contract unchanged: ≥1 entries whose rows sum to the stage
    total (pinned by tests/test_pipeline_resume.py)."""
    import glob

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if files and len(files) <= _FOOTER_WALK_MAX_FILES:
        try:
            import pyarrow.parquet as pq

            return [
                {"partition": i, "rows": pq.ParquetFile(f).metadata.num_rows}
                for i, f in enumerate(files)
            ]
        except Exception:
            pass
    return partition_metrics(spark.read.parquet(path))


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    input_fingerprint: str,
    partition_by: list[str] | None = None,
    config: dict | None = None,
) -> dict:
    """Write a stage output (Parquet, optionally partitioned) + manifest."""
    path = os.path.join(out_dir, stage)
    if partition_by:
        # hash-distribute by the partition columns before a partitioned
        # write (guide §6, the write.distribution-mode=hash analog): an
        # unshuffled write emits up to tasks × values files — measured 96
        # tiny files for the 8-pred edges stage at sf0.1 — while one
        # exchange makes it one file per partition value. The known trade
        # (a single giant partition value serializes into one task) is the
        # standard one; callers with that shape pass partition_by=None and
        # lay out the data themselves.
        df = df.repartition(*[F.col(c) for c in partition_by])
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    # footer-backed metrics: no post-write Spark job for small outputs
    parts = written_partition_metrics(spark, path)
    manifest = {
        "stage": stage,
        "input_fingerprint": input_fingerprint,
        "rows": sum(p["rows"] for p in parts),
        "partitions": parts,
        "partition_by": partition_by or [],
        "config": config or {},
        "written_at": datetime.now(timezone.utc).isoformat(),
        "schema": written.schema.simpleString(),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_manifest(out_dir: str, stage: str) -> dict | None:
    p = os.path.join(out_dir, stage, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_is_complete(out_dir: str, stage: str, input_fingerprint: str) -> bool:
    m = read_manifest(out_dir, stage)
    return (
        m is not None
        and m.get("input_fingerprint") == input_fingerprint
        and m.get("complete", True)
    )


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, stage))


def write_stage_partitioned_resumable(
    df: DataFrame,
    out_dir: str,
    stage: str,
    input_fingerprint: str,
    partition_col: str,
) -> dict:
    """Partition-level checkpointing: partitions recorded as done in the
    manifest are skipped; everything pending is written by ONE Spark job
    with dynamic partition overwrite + ``partitionBy`` — all pending
    partitions write in parallel (never a sequential per-value driver loop,
    which would serialize the stage into V back-to-back jobs and re-scan the
    input per value). Dynamic overwrite replaces only the partitions present
    in the pending data, so already-done hive directories are untouched.

    Resume safety: the dynamic-overwrite job commit is atomic per job — a
    kill mid-job leaves only staging dirs, never a half partition — so the
    committed hive-style directory listing IS the ground truth; the manifest
    mirrors it for bookkeeping. Partition values must be path-safe (hive dir
    names are the resume key). (`_lineage.json` starts with '_' so Spark's
    partition discovery ignores it when the stage is read back.)"""
    import shutil

    path = os.path.join(out_dir, stage)
    m = read_manifest(out_dir, stage)
    if not m or m.get("input_fingerprint") != input_fingerprint or m.get(
        "partition_by"
    ) != [partition_col]:
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        m = {
            "stage": stage,
            "input_fingerprint": input_fingerprint,
            "partition_by": [partition_col],
            "partitions_done": [],
            "complete": False,
        }
        write_manifest(out_dir, stage, m)

    done = sorted(set(m["partitions_done"]))
    pending = df
    if done:
        pending = df.filter(~F.col(partition_col).cast("string").isin(done))

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # same §6 write-distribution as write_stage: one exchange, one file
        # per pending partition value instead of tasks × values tiny files
        pending.repartition(F.col(partition_col)).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    prefix = f"{partition_col}="
    m["partitions_done"] = sorted(
        d[len(prefix):] for d in os.listdir(path) if d.startswith(prefix)
    )

    written = spark.read.parquet(path)
    parts = written_partition_metrics(spark, path)
    m.update(
        {
            "complete": True,
            "rows": sum(p["rows"] for p in parts),
            "partitions": parts,
            "written_at": datetime.now(timezone.utc).isoformat(),
            "schema": written.schema.simpleString(),
        }
    )
    write_manifest(out_dir, stage, m)
    return m


def write_manifest(out_dir: str, stage: str, manifest: dict) -> None:
    os.makedirs(os.path.join(out_dir, stage), exist_ok=True)
    with open(os.path.join(out_dir, stage, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
