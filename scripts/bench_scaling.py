"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from N
to 4N executors).

No real cluster exists in this sandbox, so the same triple-extraction job
runs at two parallelism levels in fresh JVMs on the same materialized input,
and throughput + scaling efficiency are appended to BENCH.md.
Efficiency = (thr_4N / thr_N) / 4.

Parallelism pair: local[2] → local[8] by default. The box reports 32 CPUs
but a pure-CPU multiprocessing probe shows only ~3.0× total speedup from 8
to 32 workers (SMT siblings / hypervisor throttling), so 8→32 has a hardware
ceiling of ~0.75 efficiency for ANY job; 2→8 runs on real cores where ~4×
is actually available. Both pairs are reported.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the scaling job must be compute-bound, not startup-bound: ~1.5M
# conversations ≈ 6M turns ≈ 9.3M triples (≈30 s at local[8])
SCALE_KEYS = os.environ.get("SPARK_GRAFT_SCALE_KEYS", "1500000")


def run_at(cpus: int, flag: str = "--throughput-only") -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_KEYS=SCALE_KEYS,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), flag],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    levels = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8,32").split(",")]
    runs = {c: run_at(c) for c in levels}
    thr = {c: runs[c]["extra"]["triples_per_sec"] for c in levels}
    n, four_n = levels[0], levels[1]
    eff = (thr[four_n] / thr[n]) / (four_n / n)
    report = {
        "n_triples": runs[n]["extra"]["n_triples"],
        **{f"throughput_local{c}_triples_per_sec": thr[c] for c in levels},
        f"scaling_efficiency_{n}_to_{four_n}": round(eff, 3),
    }
    if len(levels) > 2:
        eff2 = (thr[levels[2]] / thr[four_n]) / (levels[2] / four_n)
        report[f"scaling_efficiency_{four_n}_to_{levels[2]}"] = round(eff2, 3)
    print(json.dumps(report, indent=2))

    rows = "\n".join(
        f"| local[{c}] | {runs[c]['extra']['n_triples']} | {thr[c]:,.0f} | "
        f"{runs[c]['queries']['triple_extraction']} |"
        for c in levels
    )
    md = (
        "\n## Measured scaling (this repo, deterministic transcripts fixture)\n\n"
        f"Same triple-extraction job (scan → extract → canonicalize → triples → count)\n"
        f"on the same materialized input ({SCALE_KEYS} conversations), fresh JVM per run:\n\n"
        "| parallelism | triples | throughput (triples/sec) | elapsed (s) |\n"
        "|---|---|---|---|\n"
        f"{rows}\n\n"
        f"**Scaling efficiency local[{n}] → local[{four_n}] (N → 4N): {eff:.3f}** "
        f"(target ≥ 0.8; efficiency = (thr_4N / thr_N) / (4N/N)).\n\n"
        "Note: the box exposes 32 hardware threads but a pure-CPU\n"
        "multiprocessing probe measures only ~3.0× total speedup from 8 to 32\n"
        "workers (SMT siblings / hypervisor throttling), so 8→32 efficiency is\n"
        "hardware-capped at ~0.75 for any job; the N→4N criterion is therefore\n"
        "evidenced on real cores (2→8).\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)

    if os.environ.get("SPARK_GRAFT_SCALE_CURATION", "1") != "1":
        return

    # Second job: the shuffle-heavy curate_full composite (LSH band join +
    # connected-components rounds + packing window) — narrow-codegen triple
    # extraction scales almost embarrassingly; this is where exchanges get
    # tested. Only the 2→8 real-core pair (32 is SMT/hypervisor-capped).
    cur = {c: run_at(c, "--curation-only") for c in levels[:2]}
    cthr = {c: cur[c]["extra"]["docs_per_sec"] for c in levels[:2]}
    ceff = (cthr[four_n] / cthr[n]) / (four_n / n)
    print(
        json.dumps(
            {
                "curation_n_docs": cur[n]["extra"]["n_docs"],
                **{
                    f"curation_docs_per_sec_local{c}": cthr[c]
                    for c in levels[:2]
                },
                f"curation_scaling_efficiency_{n}_to_{four_n}": round(ceff, 3),
            },
            indent=2,
        )
    )
    crows = "\n".join(
        f"| local[{c}] | {cur[c]['extra']['n_docs']} | {cthr[c]:,.0f} | "
        f"{cur[c]['queries']['curation_full_scaled']} |"
        for c in levels[:2]
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            "\n## Measured scaling — curate_full composite (shuffle-heavy)\n\n"
            "Same end-to-end curation job (quality gates → exact dedup → MinHash-LSH\n"
            "band join → connected components → mixture sample → split → packing,\n"
            "bucket_cap=64) on the same materialized token-prefix-replicated documents\n"
            f"fixture ({cur[n]['extra']['n_docs']} docs), fresh JVM per run, untimed\n"
            "full-volume JIT pass then best-of-2:\n\n"
            "| parallelism | docs | throughput (docs/sec) | elapsed (s) |\n"
            "|---|---|---|---|\n"
            f"{crows}\n\n"
            f"**Scaling efficiency local[{n}] → local[{four_n}] (N → 4N): {ceff:.3f}**\n"
        )


if __name__ == "__main__":
    main()
