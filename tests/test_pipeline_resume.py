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


def test_edge_table_partition_pruning(spark, out_dir):
    """A ``pred``-filtered read of the pipeline's edge table must scan ONLY
    that partition's files (round-4 verdict #5: the provable half of the
    Iceberg-catalog story without catalog jars). Proven physically via the
    scan's executed metrics — ``numPartitions`` = 1 of the ≥7 on disk and
    ``numFiles`` = exactly the files under ``pred=attendee/`` — not just by
    the PartitionFilters string."""
    import glob
    import os

    edges_path = f"{out_dir}/edges"
    q = spark.read.parquet(edges_path).filter(F.col("pred") == "attendee").select(
        "event_id", "obj"
    )
    q.collect()
    plan_str = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str and "attendee" in plan_str

    def leaves(node):
        n = node.children().size()
        return (
            [node]
            if n == 0
            else [x for i in range(n) for x in leaves(node.children().apply(i))]
        )

    scans = [
        leaf
        for leaf in leaves(q._jdf.queryExecution().executedPlan())
        if "Scan" in leaf.nodeName()
    ]
    assert len(scans) == 1
    metrics = {}
    it = scans[0].metrics().iterator()
    while it.hasNext():
        kv = it.next()
        metrics[kv._1()] = kv._2().value()
    n_partitions_on_disk = len(glob.glob(os.path.join(edges_path, "pred=*")))
    attendee_files = glob.glob(
        os.path.join(edges_path, "pred=attendee", "*.parquet")
    )
    assert n_partitions_on_disk >= 7
    assert metrics["numPartitions"] == 1
    assert metrics["numFiles"] == len(attendee_files) > 0
