"""Skew-torture bench (round-4 verdict #3): prove the capped/bucketed paths
hold under deliberate pathological skew, with per-TASK evidence.

Fixture (deterministic, derived from sf0.1, written once to /tmp):
* documents replicated 30x (150k docs); every doc_id % 5 == 0 (20% of the
  corpus) REWRITTEN as one shared 40-token boilerplate plus a 3-token unique
  tail -> one hot LSH bucket family of ~30k mutual near-dups (pairwise
  Jaccard ~0.79 >= 0.6). SURVEY §7.4's real-world analog: Zoom at 28% of
  reference locations.
* events replicated 100x (10M rows); every event_id % 5 == 0 remapped to
  ONE hot user (2M events on a single as-of key — at 10x both strategies
  finished in <0.5 s and no stage was heavy enough for task-skew to
  register). The fixture spans 30 days, so the bucketed strategy runs with
  bucket_seconds=86400 (~30 time buckets per key — "pick bucket_seconds so
  the densest bucket fits one task").

Runs at local[8] with the Spark event log enabled; afterwards the log is
parsed into per-stage task-duration tables (jobGroup -> stages -> median/max
task ms). Done-bar: no stage of an ENGINEERED path (capped curation,
bucketed as-of) with median task >= 200 ms has max > 4x median; the PLAIN
as-of window on the same input is run as the contrast and is expected to
show the straggler the bucketed path removes.

Also measures the bucket_cap recall trade on the hot cluster:
* capped-only: hot-pair recall ~C(cap,2)/C(30k,2) and ~all overflow members
  silently SURVIVE dedup;
* capped + overflow_star: every hot member reaches the hub representative
  (linear pairs), so the cluster fully collapses — n_kept drops by ~|hot|-1.

Prints ONE JSON line; human-readable stage tables go to stderr.
Solo-run rule applies (never concurrently with another JVM).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVT_DIR = "/tmp/cees_skew_evt"

BOILER = (
    "terms of service apply to every account holder and usage must comply "
    "with the policy framework described in section nine including data "
    "retention privacy obligations third party disclosures and the binding "
    "arbitration clause governing disputes between provider and customer"
)  # 40 distinct tokens


def materialize_skew(spark):
    from pyspark.sql import functions as F

    base = os.path.basename(SF_DIR.rstrip("/"))
    docs_path = f"/tmp/cees_bench/docs_skew_v1_{base}"
    ev_path = f"/tmp/cees_bench/events_skew_v2_{base}"  # v2: 100x replication
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        stride = docs.agg(F.max("doc_id")).first()[0] + 1
        copies = spark.range(30).select(F.col("id").alias("copy"))
        scaled = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(stride)).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(\S+)",
                F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_$1")),
            ).alias("text"),
            "lang",
        )
        skewed = scaled.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(BOILER),
                    F.lit(" tail"), F.col("doc_id").cast("string"),
                    F.lit(" t"), (F.col("doc_id") % 89).cast("string"),
                    F.lit(" u"), (F.col("doc_id") % 97).cast("string"),
                ),
            ).otherwise(F.col("text")),
        )
        skewed.repartition(16).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(os.path.join(ev_path, "_SUCCESS")):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_id", "user_id", "ts"
        )
        stride = ev.agg(F.max("event_id")).first()[0] + 1
        # 100x (10M rows, hot key = 2M): at 10x both as-of strategies finish
        # in <0.5 s at local[8] — no stage is heavy enough for task-skew to
        # register. 2M events on ONE key is where the plain window's
        # single-partition sort becomes a visible straggler.
        copies = spark.range(100).select(F.col("id").alias("copy"))
        scaled = ev.crossJoin(copies).select(
            (F.col("event_id") + F.col("copy") * F.lit(stride)).alias("event_id"),
            "user_id", "ts",
        )
        skewed = scaled.withColumn(
            "user_id",
            F.when(F.col("event_id") % 5 == 0, F.lit(7)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.repartition(16).write.mode("overwrite").parquet(ev_path)
    return docs_path, ev_path


def _event_files(path: str) -> list[str]:
    """A Spark 4 event log is either one file or a rolling
    ``eventlog_v2_<app>/`` directory of ``events_<n>_...`` part files."""
    if os.path.isdir(path):
        return sorted(
            f for f in glob.glob(os.path.join(path, "events_*"))
            if os.path.isfile(f) and not f.endswith(".crc")
        )
    return [path]


def parse_event_log(path: str) -> dict:
    """event-log JSON -> {jobGroup: [(stage_name, n_tasks, med_ms, max_ms)]}"""
    stage_group: dict[int, str] = {}
    stage_name: dict[int, str] = {}
    durs: dict[int, list[int]] = {}
    for part in _event_files(path):
        if part.endswith(".zstd"):
            # Spark 4 rolls + zstd-compresses event logs by default
            import io

            import pyarrow as pa

            with pa.CompressedInputStream(
                pa.OSFile(part, "rb"), "zstd"
            ) as raw:
                _parse_lines(
                    io.TextIOWrapper(io.BytesIO(raw.read())),
                    stage_group, stage_name, durs,
                )
        else:
            with open(part) as f:
                _parse_lines(f, stage_group, stage_name, durs)
    out: dict[str, list] = {}
    for sid, ds in sorted(durs.items()):
        ds = sorted(ds)
        med = ds[len(ds) // 2]
        out.setdefault(stage_group.get(sid, "?"), []).append(
            (f"s{sid}:{stage_name.get(sid, '?')[:40]}", len(ds), med, ds[-1])
        )
    return out


def _parse_lines(f, stage_group, stage_name, durs):
    for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "?")
                for si in ev.get("Stage Infos", []):
                    stage_group[si["Stage ID"]] = grp
                    stage_name[si["Stage ID"]] = si.get("Stage Name", "?")
            elif e == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                if ti.get("Failed") or ti.get("Killed"):
                    continue
                sid = ev.get("Stage ID")
                durs.setdefault(sid, []).append(
                    ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                )


def straggler_ratio(stages, min_median_ms=200):
    """Worst max/median task time over stages heavy enough to matter."""
    worst = 0.0
    for _name, n, med, mx in stages:
        if n >= 4 and med >= min_median_ms:
            worst = max(worst, mx / med)
    return round(worst, 2)


def main() -> None:
    # --sections=curate,recall,asof (default all) — each section is
    # independently re-runnable; fixtures materialize once in /tmp
    sections = {"curate", "recall", "asof"}
    for a in sys.argv[1:]:
        if a.startswith("--sections="):
            sections = set(a.split("=", 1)[1].split(","))
    os.makedirs(EVT_DIR, exist_ok=True)
    for old in glob.glob(f"{EVT_DIR}/*"):
        shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)

    from calendar_event_entity_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="cees-skew",
        cores=8,
        shuffle_partitions=8,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVT_DIR}",
            "spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=8 -XX:CICompilerCount=3",
        },
    )
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    from calendar_event_entity_extraction_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )
    from calendar_event_entity_extraction_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from calendar_event_entity_extraction_spark.plans.curate import curate_full

    docs_path, ev_path = materialize_skew(spark)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    n_hot = docs.filter(F.col("doc_id") % 5 == 0).count()
    result: dict = {"n_docs": n_docs, "n_hot_docs": n_hot}

    weights = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.75, "zh": 0.6}

    if "curate" in sections:
        # A) curation composite, capped (the engineered 100-TB path)
        sc.setJobGroup("curate_capped", "curate_full bucket_cap=64 on skewed docs")
        t0 = time.time()
        result["curate_capped_kept"] = curate_full(
            docs, weights, seed=11, bucket_cap=64
        ).count()
        result["curate_capped_sec"] = round(time.time() - t0, 2)

        # A') same with overflow_star: hot cluster must fully collapse
        sc.setJobGroup("curate_star", "curate_full cap=64 + overflow_star")
        t0 = time.time()
        result["curate_star_kept"] = curate_full(
            docs, weights, seed=11, bucket_cap=64, overflow_star=True
        ).count()
        result["curate_star_sec"] = round(time.time() - t0, 2)

    if "recall" in sections:
        # B) recall of the hot cluster under the cap
        hot = F.col("id_a") % 5 == 0
        hot_b = F.col("id_b") % 5 == 0
        sc.setJobGroup("recall_capped", "hot-pair recall, cap only")
        pairs_capped = minhash_near_duplicates(
            docs, "doc_id", "text", bucket_cap=64
        ).filter(hot & hot_b)
        ids_capped = (
            pairs_capped.select(F.explode(F.array("id_a", "id_b")).alias("i"))
            .distinct()
            .count()
        )
        n_pairs_capped = pairs_capped.count()
        sc.setJobGroup("recall_star", "hot membership recall, cap + star")
        pairs_star = minhash_near_duplicates(
            docs, "doc_id", "text", bucket_cap=64, overflow_star=True
        ).filter(hot & hot_b)
        ids_star = (
            pairs_star.select(F.explode(F.array("id_a", "id_b")).alias("i"))
            .distinct()
            .count()
        )
        true_pairs = n_hot * (n_hot - 1) // 2
        result.update(
            hot_true_pairs=true_pairs,
            hot_pairs_capped=n_pairs_capped,
            hot_pair_recall_capped=round(n_pairs_capped / true_pairs, 6),
            hot_member_recall_capped=round(ids_capped / n_hot, 4),
            hot_member_recall_star=round(ids_star / n_hot, 4),
        )

    if "asof" in sections:
        # C) as-of join: plain window (contrast) vs bucketed (engineered).
        # One untimed promotion pass per strategy, then a timed fresh plan
        # (bench.py's C2-promotion policy).
        ev = spark.read.parquet(ev_path)
        result["n_events"] = ev.count()
        result["n_hot_events"] = ev.filter(F.col("user_id") == 7).count()
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_custkey", "o_orderdate", "o_orderkey"
        )
        kw = dict(
            left_key="user_id", right_key="o_custkey", left_ts="ts",
            right_ts="o_orderdate", payload="o_orderkey", out_col="latest",
        )

        def force(df):
            # a bare count() lets ColumnPruning DROP the Window operator
            # (nothing references the as-of output) — measured 0.46 s for
            # 10M rows, i.e. a union+count, not the join. Aggregate OVER the
            # payload column so the full as-of computation must run, and
            # checksum it so plain/bucketed are verified value-identical.
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.count(kw["out_col"]).alias("n_matched"),
                F.sum(F.crc32(F.col(kw["out_col"]).cast("string"))).alias("chk"),
            ).first()
            return r["n"], r["n_matched"], r["chk"]

        force(asof_join(ev, o, **kw))  # untimed promotion
        sc.setJobGroup("asof_plain", "plain union+window as-of on skewed events")
        t0 = time.time()
        plain = force(asof_join(ev, o, **kw))
        result["asof_plain_sec"] = round(time.time() - t0, 2)
        force(asof_join_bucketed(ev, o, bucket_seconds=86400, **kw))
        sc.setJobGroup("asof_bucketed", "bucketed as-of, bucket_seconds=1d")
        t0 = time.time()
        bucketed = force(asof_join_bucketed(ev, o, bucket_seconds=86400, **kw))
        result["asof_bucketed_sec"] = round(time.time() - t0, 2)
        assert plain == bucketed and plain[0] == result["n_events"], (
            plain, bucketed,
        )
        result["asof_matched"] = plain[1]

    spark.stop()
    time.sleep(2)  # let the event log flush

    logs = sorted(glob.glob(f"{EVT_DIR}/*"), key=os.path.getmtime)
    groups = parse_event_log(logs[-1])
    grp_names = []
    if "curate" in sections:
        grp_names += ["curate_capped", "curate_star"]
    if "recall" in sections:
        grp_names += ["recall_capped", "recall_star"]
    if "asof" in sections:
        grp_names += ["asof_plain", "asof_bucketed"]
    for grp in grp_names:
        stages = groups.get(grp, [])
        result[f"straggler_{grp}"] = straggler_ratio(stages)
        print(f"--- {grp} ---", file=sys.stderr)
        for name, n, med, mx in stages:
            flag = " <-- straggler" if n >= 4 and med >= 200 and mx > 4 * med else ""
            print(
                f"  {name:46s} tasks={n:4d} med={med:6d}ms max={mx:7d}ms{flag}",
                file=sys.stderr,
            )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
