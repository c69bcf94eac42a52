"""Deterministic data-mixture sampling (domain/language reweighting).

LLM corpora are assembled from heterogeneous sources with target mixture
weights (e.g. up-weight books, down-weight crawl). At 100 TB the sampler
must be a NARROW, RNG-free filter: `rand()` re-rolls on task retry and
changes the corpus between runs (CLAUDE.md invariant #3), and any
shuffle-based sampler (window row_number per stratum) serializes hot
strata. Here each row keeps iff a portable multiplicative hash of its key
lands under the stratum's threshold — one filter, pushes down to the scan,
identical in plain SQL, stable under retries/repartitioning.

The hash is the same Knuth scheme as `splits.bucket_col` but SEEDED (key +
seed pre-reduction) so mixture sampling decorrelates from split
assignment — without the seed, `pmod(h, 100)` (splits) and
`pmod(h, 10**6)` (mixture) share low-order structure and the sampled
corpus would skew across train/eval/test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .splits import KNUTH, MOD


def seeded_frac_col(key: Column, seed: int, granularity: int = 1_000_000) -> Column:
    """Uniform-ish value in [0, granularity) from (key, seed); ANSI-safe
    (pre-pmod keeps the product inside int64)."""
    reduced = F.pmod(key.cast("long") + F.lit(seed), F.lit(MOD))
    return F.pmod(reduced * F.lit(KNUTH), F.lit(granularity))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 11,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Keep each row of stratum s with probability ``weights[s]`` (strata
    absent from ``weights`` are dropped). The weight map becomes a literal
    JVM-side `create_map` — no join, no shuffle, whole-stage codegen."""
    pairs = [
        c
        for k, w in sorted(weights.items())
        for c in (F.lit(k), F.lit(int(round(w * granularity))))
    ]
    # try_element_at, not element_at: ANSI mode (Spark 4 default) makes
    # element_at THROW on a stratum absent from the weight map
    thresh = F.try_element_at(F.create_map(*pairs), F.col(strata_col))
    keep = seeded_frac_col(F.col(key_col), seed, granularity) < F.coalesce(
        thresh, F.lit(0)
    )
    return df.filter(keep)
