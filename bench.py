"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", "extra": {"triples_per_sec", ...}}.

The transcripts fixture is materialized to parquet once per (sf, size) in
/tmp (generation is test scaffolding, excluded from timing); the timed
region is the engine itself: scan → extract → canonicalize → triples.

``--throughput-only`` runs just the triple-extraction throughput measurement
(used by scripts/bench_scaling.py at two parallelism levels).

``--curation-only`` runs the shuffle-heavy ``curate_full`` composite (quality
gates → dedup → LSH band join → connected components → sample → split → pack)
over a replicated documents fixture — the scaling job whose middle is actual
exchanges, not narrow codegen, so N→4N efficiency exercises the shuffle path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _md5_burn(mb: int) -> str:
    import hashlib

    block = b"x" * (1 << 20)
    h = hashlib.md5()
    for _ in range(mb):
        h.update(block)
    return h.hexdigest()


def host_cpu_probe(n_procs: int = 8, mb_per_proc: int = 256) -> float:
    """Pure-CPU host calibration: wall seconds for ``n_procs`` processes to
    each md5-hash ``mb_per_proc`` MB. No JVM, no Spark — the number tracks
    the host's raw compute throughput, so bench JSONs from different VMs
    can be NORMALIZED instead of explained after the fact (BENCH.md round-2
    cross-VM disclosure: identical code measured 3-5x apart across a VM
    swap). Recorded as ``extra.host_factor_sec``; divide query seconds by
    (host_factor_sec / a reference probe) to compare across hosts."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(n_procs) as p:
        p.map(_md5_burn, [mb_per_proc] * n_procs)
    return time.time() - t0


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def materialize_transcripts(spark, sf_dir: str) -> str:
    """Write the deterministic transcripts fixture once. With
    ``SPARK_GRAFT_KEYS=N`` the fixture is N synthetic conversations from a
    range scan (used by the scaling harness for a compute-bound job);
    otherwise it scales with the sf's orders table."""
    from calendar_event_entity_extraction_spark.synth import (
        keys_df,
        transcripts_from_keys,
    )
    from calendar_event_entity_extraction_spark.synth.transcripts import (
        materialized_transcripts,
    )

    from calendar_event_entity_extraction_spark.synth.grammar import (
        GRAMMAR_VERSION,
    )

    n_override = os.environ.get("SPARK_GRAFT_KEYS")
    if n_override:
        n = int(n_override)
        path = f"/tmp/cees_bench/transcripts_v{GRAMMAR_VERSION}_keys_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            transcripts_from_keys(keys_df(spark, n, 128)).write.mode(
                "overwrite"
            ).parquet(path)
        return path

    materialized_transcripts(spark, sf_dir)
    n_keys = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    base = os.path.basename(sf_dir.rstrip("/"))
    return f"/tmp/cees_bench/transcripts_v{GRAMMAR_VERSION}_{base}_{n_keys}"


def materialize_scaled_docs(spark, sf_dir: str, factor: int) -> str:
    """Replicate the sf documents table ``factor``× with every token
    prefixed by a per-copy tag (``c{i}_``). Token-prefixing is a bijection on
    the vocabulary, so WITHIN a copy the shingle/Jaccard structure of the
    original corpus is preserved exactly (near-dup pairs scale linearly with
    the factor), while ACROSS copies no shingle is shared — exact dedup keeps
    everything and the LSH band join never goes quadratic in the factor.
    Written once per (sf, factor); generation is untimed scaffolding."""
    from pyspark.sql import functions as F

    base = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/cees_bench/docs_scaled_v2_{factor}_{base}"  # v2: data-derived id stride
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # offset derived from the data, not a guessed constant: a fixed 1M
        # stride would silently collide ids at sf1+ (≥1M docs) and corrupt
        # the dedup/CC/pair semantics of the scaling benchmark
        stride = docs.agg(F.max("doc_id")).first()[0] + 1
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        scaled = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(stride)).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                r"(\S+)",
                F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_$1")),
            ).alias("text"),
            "lang",
        )
        scaled.repartition(32).write.mode("overwrite").parquet(path)
    return path


def time_curation_throughput(spark, docs_path: str) -> dict:
    from pyspark.sql import functions as F

    from calendar_event_entity_extraction_spark.plans.curate import curate_full

    weights = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.75, "zh": 0.6}

    def build(i: int):
        # fresh logical plan per run (see time_extraction_throughput)
        d = spark.read.parquet(docs_path).filter(F.length("text") > F.lit(-1 - i))
        # bucket_cap=64 is the 100-TB configuration (hot LSH buckets bounded)
        return curate_full(d, weights, seed=11, bucket_cap=64)

    n_docs = spark.read.parquet(docs_path).count()
    build(99).count()  # untimed C2-promotion pass at full volume
    best, n_kept = None, 0
    for i in range(2):
        t0 = time.time()
        n_kept = build(i).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return {
        "seconds": best,
        "n_docs": n_docs,
        "n_kept": n_kept,
        "docs_per_sec": n_docs / best,
    }


def time_extraction_throughput(spark, tr_path: str) -> dict:
    from pyspark.sql import functions as F

    from calendar_event_entity_extraction_spark.operators.triples import (
        extract_triples,
    )
    from calendar_event_entity_extraction_spark.schemas import TRANSCRIPT_SCHEMA

    def build(i: int):
        # fresh logical plan per run (the trivially-true varying filter
        # defeats AQE materialized-stage reuse without changing results)
        tr = (
            spark.read.schema(TRANSCRIPT_SCHEMA)
            .parquet(tr_path)
            .filter(F.length("text") > F.lit(-1 - i))
        )
        return extract_triples(tr)

    # one UNTIMED full-scale pass: C2 promotes the extraction codegen only
    # after real row volume — a limited warmup slice leaves the first timed
    # run 2-10x slower than steady state (measured on this host)
    build(99).count()
    best, n_triples = None, 0
    for i in range(2):  # best-of-2: shields against transient host load
        t0 = time.time()
        n_triples = build(i).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return {
        "seconds": best,
        "n_triples": n_triples,
        "triples_per_sec": n_triples / best,
    }


def main() -> None:
    throughput_only = "--throughput-only" in sys.argv
    curation_only = "--curation-only" in sys.argv

    # host calibration BEFORE the JVM exists (solo CPU, nothing contending)
    host_factor = round(host_cpu_probe(), 3)

    from calendar_event_entity_extraction_spark.session import get_spark

    # pin JVM background threads to the simulated core count — a real N-core
    # executor has N-proportional GC/JIT threads; without this, small
    # parallelism levels borrow the idle host cores and scaling numbers lie
    n = int(CPUS)
    spark = get_spark(
        app_name="cees-bench",
        cores=CPUS,
        extra_conf={
            # merged with session.DEFAULT_DRIVER_JAVA_OPTS (locale + IPv4)
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(n, 1)} "
                f"-XX:CICompilerCount={max(2, min(4, n))}"
            )
        },
    )
    queries: dict[str, float] = {}
    if curation_only:
        factor = int(os.environ.get("SPARK_GRAFT_CURATION_FACTOR", "30"))
        docs_path = materialize_scaled_docs(spark, SF_DIR, factor)
        cur = time_curation_throughput(spark, docs_path)
        queries["curation_full_scaled"] = round(cur["seconds"], 3)
        result = {
            # value/unit are ELAPSED SECONDS (docs/sec is extra.docs_per_sec)
            "metric": "curate_full elapsed sec (shuffle-heavy composite)",
            "value": round(cur["seconds"], 3),
            "unit": "sec",
            "queries": queries,
            "sf": _sf_from_dir(SF_DIR),
            "extra": {
                "docs_per_sec": round(cur["docs_per_sec"], 1),
                "n_docs": cur["n_docs"],
                "n_kept": cur["n_kept"],
                "cpus": int(CPUS),
                "host_factor_sec": host_factor,
            },
        }
        print(json.dumps(result))
        spark.stop()
        return

    tr_path = materialize_transcripts(spark, SF_DIR)

    # JVM/codegen warmup happens inside time_extraction_throughput: its
    # first full-scale pass is untimed, which JIT-promotes the extraction
    # codegen at real row volume before anything is measured
    if throughput_only:
        thr = time_extraction_throughput(spark, tr_path)
        queries["triple_extraction"] = round(thr["seconds"], 3)
        extra = {
            "triples_per_sec": round(thr["triples_per_sec"], 1),
            "n_triples": thr["n_triples"],
            "cpus": int(CPUS),
            "host_factor_sec": host_factor,
        }

    if not throughput_only:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "entry", os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        headline = [
            "events_extract",
            "triples",
            "entity_pool_attendees",
            "entity_pool_locations",
            "eval_metrics",
            "augment_pipeline",
            "dedup_exact",
            "dup_spans",
            "minhash_neardup",
            "neardup_clusters",
            "curation_full",
            "simhash",
            "multimodal_features",
            "multimodal_decode",
            "text_stats",
            "mixture_sample",
            "repetition_stats",
            "pii_scrub",
            "vocab_topk",
            "decontaminate",
            "embedding_quantize",
            "ann_topk",
            "ann_lsh_topk",
            "ann_ivf_topk",
            "hash_split",
            "split_leakage_anti",
            "pricing_summary",
            "topk_orders_per_customer",
            "customer_geo_rollup",
            "sessionization",
        ]
        # SPARK_GRAFT_QUERIES=a,b,c restricts the run to a subset (used by
        # the sf10 scale probes, where the by-design-quadratic rows would
        # dominate the wall clock); include the pseudo-names
        # full_pipeline_materialize / triple_extraction to keep those blocks
        subset = os.environ.get("SPARK_GRAFT_QUERIES")
        want = (
            {s.strip() for s in subset.split(",") if s.strip()}
            if subset
            else None
        )
        if want is not None:
            headline = [n for n in headline if n in want]
        qmap = entry.queries()
        for name in headline:
            # one UNTIMED promotion pass, then best-of-2 timed — FRESH
            # logical plan per run (qmap[name] rebuilds the DataFrame, so no
            # AQE stage reuse). The untimed pass is not optional politeness:
            # each query carries UNIQUE codegen units (its own aggregate /
            # generate stages) that C2-promote only while it runs, and
            # min-of-2 RACES that promotion — measured on identical code,
            # q_triples reads 4.5 s after its units are promoted but 9.8 s
            # cold-first in a fresh JVM (round-4 "triples regression"
            # diagnosis, BENCH.md). The min of two post-promotion runs is
            # the honest steady-state figure (same policy as
            # time_extraction_throughput's full-scale untimed pass).
            qmap[name](spark, SF_DIR).count()
            best = None
            for _ in range(2):
                t0 = time.time()
                qmap[name](spark, SF_DIR).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            queries[name] = round(best, 3)

        # full graph materialization (write-inclusive), resumed-from-clean.
        # Same promotion policy as the query loop: this row was the only
        # one timed cold-first and read 19-20 s where the post-promotion
        # steady state is 9.5-11.7 s (solo 3-rep profile, round 5) — the
        # untimed pass promotes the pipeline's unique codegen + write path.
        if want is None or "full_pipeline_materialize" in want:
            from calendar_event_entity_extraction_spark.plans.pipeline import (
                run_pipeline,
            )
            import shutil

            out = "/tmp/cees_bench/pipeline_out"
            shutil.rmtree(out, ignore_errors=True)
            run_pipeline(spark, spark.read.parquet(tr_path), out, resume=False)
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            run_pipeline(spark, spark.read.parquet(tr_path), out, resume=False)
            queries["full_pipeline_materialize"] = round(time.time() - t0, 3)

        # headline throughput measured LAST: by now the JVM has seen every
        # codegen unit at volume many times, so this is true steady state —
        # measured first, the same count reads 2-4x slower even after a
        # full-scale warm pass (C2 promotion lags) and under-reports the
        # engine, not the host
        extra = {"cpus": int(CPUS), "host_factor_sec": host_factor}
        if want is None or "triple_extraction" in want:
            thr = time_extraction_throughput(spark, tr_path)
            queries["triple_extraction"] = round(thr["seconds"], 3)
            extra["triples_per_sec"] = round(thr["triples_per_sec"], 1)
            extra["n_triples"] = thr["n_triples"]

    result = {
        "metric": "triples/sec extraction throughput (field-level P/R>=0.95 gate in pytest)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "extra": extra,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
