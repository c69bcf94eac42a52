"""Deterministic data-mixture sampling (domain/language reweighting).

LLM corpora are assembled from heterogeneous sources with target mixture
weights (e.g. up-weight books, down-weight crawl). At 100 TB the sampler
must be a NARROW, RNG-free filter: `rand()` re-rolls on task retry and
changes the corpus between runs (CLAUDE.md invariant #3), and any
shuffle-based sampler (window row_number per stratum) serializes hot
strata. Here each row keeps iff a portable multiplicative hash of its key
lands under the stratum's threshold — one filter, pushes down to the scan,
identical in plain SQL, stable under retries/repartitioning.

The hash is the Knuth scheme of `splits.bucket_col`, SEEDED and then
REMIXED through a second multiply-mod-prime round: a single multiply would
leave `frac % 100` an affine shift of the split bucket (both reduce the
same product; 100 divides 10**6), so mixture keeps/drops would correlate
with train/eval/test whenever a threshold isn't a multiple of 100. The
intermediate reduction mod the PRIME 1e9+7 between the two multiplies
breaks that low-order affinity — `frac % 100` is no longer a function of
the split bucket alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .splits import KNUTH, MOD


def seeded_frac_col(key: Column, seed: int, granularity: int = 1_000_000) -> Column:
    """Uniform-ish value in [0, granularity) from (key, seed). ANSI-safe:
    the key is reduced mod the prime BEFORE the seed add and each multiply
    (every product stays < 1e9+7 × 2.7e9 < int64 max even for keys near
    Long.MAX). Two multiply-mod rounds (see module docstring) decorrelate
    the fraction from `splits.bucket_col`'s single-round bucket."""
    reduced = F.pmod(F.pmod(key.cast("long"), F.lit(MOD)) + F.lit(seed), F.lit(MOD))
    mixed = F.pmod(reduced * F.lit(KNUTH), F.lit(MOD))
    return F.pmod(mixed * F.lit(KNUTH), F.lit(granularity))


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
