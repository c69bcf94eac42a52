"""Partition-level checkpoint resume: a stage killed mid-write restarts by
writing ONLY the missing partitions (north_rule per-partition lineage)."""

import json
import os

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.sources import manifest as mf


def _df(spark):
    return spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4], i * 10) for i in range(400)],
        "id long, pred string, val long",
    )


def test_partition_level_resume(spark, tmp_path):
    out = str(tmp_path)
    df = _df(spark)
    fp = "fp-1"

    # simulate a kill after two partitions: pre-seed a partial manifest +
    # the two written partition dirs
    m1 = mf.write_stage_partitioned_resumable(
        df.filter(F.col("pred").isin("a", "b")), out, "edges", fp, "pred"
    )
    partial = mf.read_manifest(out, "edges")
    partial["partitions_done"] = ["a", "b"]
    partial["complete"] = False
    mf.write_manifest(out, "edges", partial)
    a_mtime = os.path.getmtime(os.path.join(out, "edges", "pred=a"))

    # resume with the full input: only c and d get written
    m2 = mf.write_stage_partitioned_resumable(df, out, "edges", fp, "pred")
    assert m2["complete"] and sorted(m2["partitions_done"]) == ["a", "b", "c", "d"]
    assert os.path.getmtime(os.path.join(out, "edges", "pred=a")) == a_mtime
    back = spark.read.parquet(os.path.join(out, "edges"))
    assert back.count() == 400
    assert back.select("pred").distinct().count() == 4

    # changed input fingerprint → full rebuild
    m3 = mf.write_stage_partitioned_resumable(df, out, "edges", "fp-2", "pred")
    assert m3["input_fingerprint"] == "fp-2" and m3["complete"]


def test_manifest_partition_metrics_sum_to_rows(spark, tmp_path):
    out = str(tmp_path)
    m = mf.write_stage_partitioned_resumable(_df(spark), out, "s", "fp", "pred")
    assert sum(p["rows"] for p in m["partitions"]) == m["rows"] == 400
