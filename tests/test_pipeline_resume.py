"""End-to-end pipeline + checkpoint/resume idempotence (SURVEY.md §7.2 #9)."""

import pytest
from pyspark.sql import functions as F

from calendar_event_entity_extraction_spark.plans.pipeline import run_pipeline
from calendar_event_entity_extraction_spark.synth import keys_df, transcripts_from_keys

N = 800


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kg_out"))




def _n_events(n):
    from calendar_event_entity_extraction_spark.synth.grammar import has_second_event

    return n + sum(1 for k in range(n) if has_second_event(k))


def test_pipeline_runs_and_materializes_graph(spark, out_dir):
    tr = transcripts_from_keys(keys_df(spark, N))
    m = run_pipeline(spark, tr, out_dir)
    assert set(m) == {"events", "triples", "entity_pools", "edges", "nodes"}
    assert m["events"]["rows"] == _n_events(N)
    edges = spark.read.parquet(f"{out_dir}/edges")
    nodes = spark.read.parquet(f"{out_dir}/nodes")
    # edge table partitioned by pred on disk
    assert edges.select("pred").distinct().count() >= 7
    # linked attendee edges got an entity_rank from the broadcast pool
    linked = edges.filter(
        (F.col("pred") == "attendee") & F.col("entity_rank").isNotNull()
    )
    assert linked.count() == edges.filter(F.col("pred") == "attendee").count()
    assert nodes.filter(F.col("kind") == "event").count() == _n_events(N)
    # per-partition lineage metrics present
    assert len(m["edges"]["partitions"]) >= 1
    assert sum(p["rows"] for p in m["edges"]["partitions"]) == m["edges"]["rows"]


def test_resume_skips_completed_stages(spark, out_dir):
    tr = transcripts_from_keys(keys_df(spark, N))
    m2 = run_pipeline(spark, tr, out_dir, resume=True)
    assert all(man.get("resumed") for man in m2.values()), {
        k: v.get("resumed") for k, v in m2.items()
    }


def test_resume_recomputes_on_input_change(spark, out_dir):
    tr2 = transcripts_from_keys(keys_df(spark, N + 50))
    m3 = run_pipeline(spark, tr2, out_dir, resume=True)
    assert not any(man.get("resumed") for man in m3.values())
    assert m3["events"]["rows"] == _n_events(N + 50)
