"""ANN scaling demonstration (round-5 sf1 analysis).

The sf0.1→sf1 ratio table flags `ann_topk` (31×) and `ann_ivf_topk`
(13.4×) as super-linear for 10× data. Neither is a hidden bug — both are
COST-MODEL consequences this script measures directly:

* brute-force scores n_queries × N pairs; with n_queries ∝ N (every 41st
  vector) that is quadratic — it exists as the exact, oracle-checkable
  recall baseline, never the scale path.
* the registry IVF row pins n_centroids=16 for oracle replicability, so
  per-query candidates are N/16 ∝ N — quadratic again, just 16× cheaper.
* production IVF scales the cell count with the corpus (the classic
  balance point n_cells ∝ √N equalizes the per-query assignment cost
  O(n_cells) against the per-query scan cost O(n_probe·N/n_cells), giving
  O(√N) per query instead of O(N)).

This script times ivf_topk at sf0.1 (2k vectors) and sf1 (20k) under the
fixed-16-cell registry config and under √N cells, reporting ms/query so
the per-query growth — 10× data → ~10× for fixed cells, ~√10≈3.2× for
scaled cells — is visible directly. Prints one JSON line.

Solo-run rule applies. sf1 dir comes from scripts/make_scaled_sf.py.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from calendar_event_entity_extraction_spark.operators.similarity import (
        ivf_topk,
    )
    from calendar_event_entity_extraction_spark.session import get_spark

    spark = get_spark(app_name="cees-ann-scaling", cores=32)
    out: dict = {}
    for label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/tmp/cees_testdata/sf1"),
    ):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") % 41 == 0)
        n_q = queries.count()
        sqrt_cells = max(16, int(math.sqrt(n)))
        for cfg, cells in (("fixed16", 16), ("sqrtN", sqrt_cells)):
            def build(i: int):
                e = emb.filter(F.length(F.col("vec_id").cast("string")) > -1 - i)
                return ivf_topk(e, queries, k=5, n_centroids=cells, n_probe=4)

            build(99).count()  # untimed promotion pass
            best = None
            for i in range(2):
                t0 = time.time()
                build(i).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out[f"{label}_{cfg}"] = {
                "n": n,
                "n_queries": n_q,
                "n_cells": cells,
                "sec": round(best, 2),
                "ms_per_query": round(1000 * best / n_q, 1),
            }
    for cfg in ("fixed16", "sqrtN"):
        out[f"per_query_growth_{cfg}"] = round(
            out[f"sf1_{cfg}"]["ms_per_query"]
            / out[f"sf0.1_{cfg}"]["ms_per_query"],
            2,
        )
    print(json.dumps(out))
    spark.stop()


def main_lsh() -> None:
    """LSH analog (round-5 sf10 analysis): the registry row's FIXED 4
    planes give 16 buckets forever — bucket size ∝ N, queries ∝ N, so
    candidate pairs ∝ N²/16 (measured in the sf10 bench: 5.45 s at 200k
    vectors → 453 s at 2M… i.e. 20k → 200k embeddings, ratio 83 for 10×
    data). `planes="auto"` sizes planes = ⌈log2(N/target_bucket)⌉ so the
    expected bucket stays ~target and total cost scales ~linearly. This
    measures fixed4 vs auto at sf1 and auto at sf10 (fixed4@sf10 is the
    453 s bench row — not re-paid here)."""
    from pyspark.sql import functions as F

    from calendar_event_entity_extraction_spark.operators.similarity import (
        lsh_topk,
    )
    from calendar_event_entity_extraction_spark.session import get_spark

    spark = get_spark(app_name="cees-lsh-scaling", cores=32)
    out: dict = {}
    cases = [
        ("sf1_fixed4", "/tmp/cees_testdata/sf1", 4),
        ("sf1_auto", "/tmp/cees_testdata/sf1", "auto"),
        ("sf10_auto", "/tmp/cees_testdata/sf10", "auto"),
    ]
    for label, sf_dir, planes in cases:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        dims = len(emb.select("embedding").first()[0])
        queries = emb.filter(F.col("vec_id") % 41 == 0)
        n_q = queries.count()

        def build(i: int):
            e = emb.filter(F.length(F.col("vec_id").cast("string")) > -1 - i)
            return lsh_topk(e, queries, dims=dims, k=5, planes=planes)

        build(99).count()  # untimed promotion pass
        best = None
        for i in range(2):
            t0 = time.time()
            build(i).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[label] = {
            "n": n,
            "n_queries": n_q,
            "planes": planes,
            "sec": round(best, 2),
            "ms_per_query": round(1000 * best / n_q, 1),
        }
    out["per_query_growth_auto_sf1_to_sf10"] = round(
        out["sf10_auto"]["ms_per_query"] / out["sf1_auto"]["ms_per_query"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main_lsh() if "--lsh" in sys.argv else main()
