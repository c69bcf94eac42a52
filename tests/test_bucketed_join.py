"""Bucketed co-located join: two tables bucketed on the same key join with
ZERO Exchange nodes — the storage-partitioned-join story of SCALE.md,
asserted at the physical-plan level."""

import re

from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.sources.tables import (
    write_bucketed_table,
)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/warehouse'"
    )
    a = spark.range(10_000).select(
        F.col("id").alias("event_id"), (F.col("id") % 97).alias("x")
    )
    b = spark.range(5_000).select(
        F.col("id").alias("event_id"), (F.col("id") % 13).alias("y")
    )
    write_bucketed_table(a, "bdemo.ev_a", "event_id", 8, sort_col="event_id")
    write_bucketed_table(b, "bdemo.ev_b", "event_id", 8, sort_col="event_id")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bdemo.ev_a").join(spark.table("bdemo.ev_b"), "event_id")
        assert _exchanges(j) == 0, "bucketed equi-join must not shuffle"
        assert j.count() == 5_000
        # the same join on unbucketed frames shuffles both sides
        assert _exchanges(a.join(b, "event_id")) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bdemo.ev_a")
        spark.sql("DROP TABLE IF EXISTS bdemo.ev_b")
        spark.sql("DROP DATABASE IF EXISTS bdemo")
