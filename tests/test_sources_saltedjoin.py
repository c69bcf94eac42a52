"""CSV/ORC source round-trips + salted skew-join correctness + bucketed
co-located join (Exchange-free on the bucketed side)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from calendar_event_entity_extraction_spark.operators.entity_link import salted_join
from calendar_event_entity_extraction_spark.sources.tables import (
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b quoted", 1.5), (2, None, -0.25), (3, "ünïcode", 0.0)], SCHEMA
    )
    p_csv, p_orc = str(tmp_path / "c"), str(tmp_path / "o")
    write_csv(df, p_csv)
    write_orc(df, p_orc)
    assert read_csv(spark, p_csv, SCHEMA).exceptAll(df).count() == 0
    assert read_orc(spark, p_orc, SCHEMA).exceptAll(df).count() == 0


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of the big side is key 0
    big = spark.createDataFrame(
        [(i, 0 if i % 10 != 0 else i % 7) for i in range(5000)], "row long, k long"
    )
    small = spark.createDataFrame([(i, f"v{i}") for i in range(7)], "k long, v string")
    plain = big.join(small, "k").select("row", "k", "v")
    salted = salted_join(big, small, "k").select("row", "k", "v")
    assert plain.count() == salted.count() == 5000
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_bucketed_join_avoids_exchange_on_bucketed_side(spark, tmp_path):
    import shutil
    import uuid

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    db = "db_bucketed_" + uuid.uuid4().hex[:8]
    try:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        df = spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
            f"{db}.bucketed_t"
        )
        t = spark.table(f"{db}.bucketed_t")
        joined = t.alias("a").join(t.alias("b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {db}.bucketed_t")
        spark.sql(f"DROP DATABASE IF EXISTS {db}")
        shutil.rmtree(f"spark-warehouse/{db}.db", ignore_errors=True)
