"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from N
to 4N executors).

No real cluster exists in this sandbox, so the same triple-extraction job
runs at two parallelism levels — local[8] and local[32] — in fresh JVMs on
the same materialized input, and throughput + scaling efficiency are
appended to BENCH.md. Efficiency = (thr_32 / thr_8) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--throughput-only"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    r8 = run_at(8)
    r32 = run_at(32)
    t8 = r8["extra"]["triples_per_sec"]
    t32 = r32["extra"]["triples_per_sec"]
    eff = (t32 / t8) / 4.0
    report = {
        "sf": r8["sf"],
        "n_triples": r8["extra"]["n_triples"],
        "throughput_local8_triples_per_sec": t8,
        "throughput_local32_triples_per_sec": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    md = (
        "\n## Measured scaling (this repo, deterministic transcripts fixture)\n\n"
        f"Same triple-extraction job (scan → extract → canonicalize → triples → count)\n"
        f"on the same materialized input at sf={r8['sf']}, fresh JVM per run:\n\n"
        "| parallelism | triples | throughput (triples/sec) | elapsed (s) |\n"
        "|---|---|---|---|\n"
        f"| local[8]  | {r8['extra']['n_triples']} | {t8:,.0f} | {r8['queries']['triple_extraction']} |\n"
        f"| local[32] | {r32['extra']['n_triples']} | {t32:,.0f} | {r32['queries']['triple_extraction']} |\n\n"
        f"**Scaling efficiency 8 → 32 cores (N → 4N): {eff:.3f}** "
        f"(target ≥ 0.8; efficiency = (thr_4N / thr_N) / 4).\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
