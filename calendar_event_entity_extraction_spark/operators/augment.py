"""The reference's augmentation operators, Spark-first.

* J1 ``swap_entities_with_pools`` (``augmentation/augmentors.py:16-39``):
  replace each attendee/location mention with a deterministic pool member;
  text rewritten via whole-word case-insensitive regexp. The reference uses
  ``random.choice``; at scale randomness must be retry-stable, so the
  replacement is keyed on ``xxhash64(row key, mention, seed)``.
* template render (``augmentation/renderers.py:7-12``): re-render the gold
  fields through a fixed sentence template — pure concat exprs.
* A2 ``analyze_dataset`` (``src/prepare_assignment_data.py:64-102``):
  fill-rate / length statistics as a single aggregate.
* O2 deterministic shuffle (``augmentation/main.py:154-156``): seeded-hash
  ordering instead of in-memory ``random.shuffle``.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TARGET_KEYS


def pick_pool_member(pool: list[str], key: Column, seed: int = 42) -> Column:
    """Deterministic 'random.choice': pool[ xxhash64(key, seed) % len ]."""
    arr = F.array(*[F.lit(p) for p in pool])
    idx = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(len(pool))).cast("int")
    return F.element_at(arr, idx + 1)


def replace_whole_word_ci(text: Column, src: Column, dst: Column) -> Column:
    """Whole-word case-insensitive replace (augmentors.py:9-13
    ``replace_substrings``): regexp built per row; special chars escaped
    JVM-side with a literal-quoting wrapper."""
    pattern = F.concat(F.lit(r"(?i)\b\Q"), src, F.lit(r"\E\b"))
    return F.regexp_replace(text, pattern, dst)


def swap_location_with_pool(
    df: DataFrame,
    pool: list[str],
    text_col: str = "text",
    seed: int = 42,
    idx: Column | None = None,
) -> DataFrame:
    """J1 location half (``swap_entities_with_pools``, augmentors.py:31-35):
    swap the location mention for a pool member and rewrite the text
    consistently; rows without a location pass through. ``idx`` overrides
    the pool index (0-based Column) for engine-portable keyed arithmetic."""
    if idx is None:
        key = F.concat_ws("|", F.col("conv_id"), F.col("turn_idx").cast("string"))
        new_loc = pick_pool_member(pool, key, seed)
    else:
        new_loc = F.element_at(F.array(*[F.lit(p) for p in pool]), idx.cast("int") + 1)
    has = F.col("location").isNotNull()
    return df.withColumn(
        text_col,
        F.when(has, replace_whole_word_ci(F.col(text_col), F.col("location"), new_loc))
        .otherwise(F.col(text_col)),
    ).withColumn("location", F.when(has, new_loc).otherwise(F.col("location")))


def swap_attendees_with_pool(
    df: DataFrame,
    pool: list[str],
    text_col: str = "text",
    seed: int = 44,
    idx_fn=None,
) -> DataFrame:
    """J1 attendee half (``swap_entities_with_pools``, augmentors.py:22-30):
    every attendee mention is independently swapped for a pool member and
    the text rewritten whole-word case-insensitively, exactly like the
    reference's per-name ``random.choice`` + ``replace_substrings`` — but
    keyed deterministically so the augmentation is retry/partitioning-stable.

    ``idx_fn(i) -> Column`` maps the attendee's list position to a 0-based
    pool index (row context via closure); default keys on
    xxhash64(conv_id|turn_idx, i, seed). Replacements apply sequentially in
    list order (the reference iterates its mapping dict the same way).
    """
    arr = F.array(*[F.lit(p) for p in pool])
    if idx_fn is None:
        def idx_fn(i):  # noqa: E306
            key = F.concat_ws(
                "|", F.col("conv_id"), F.col("turn_idx").cast("string")
            )
            return F.pmod(F.xxhash64(key, i, F.lit(seed)), F.lit(len(pool)))

    new_atts = F.transform(
        F.col("attendees"),
        lambda _, i: F.element_at(arr, idx_fn(i).cast("int") + 1),
    )
    pairs = F.zip_with(
        F.col("attendees"),
        new_atts,
        lambda old, new: F.struct(old.alias("src"), new.alias("dst")),
    )
    rewritten = F.aggregate(
        pairs,
        F.col(text_col),
        lambda acc, p: replace_whole_word_ci(acc, p["src"], p["dst"]),
    )
    has = F.col("attendees").isNotNull() & (F.size("attendees") > 0)
    return df.withColumn(
        text_col, F.when(has, rewritten).otherwise(F.col(text_col))
    ).withColumn("attendees", F.when(has, new_atts).otherwise(F.col("attendees")))


def swap_entities_with_pools(
    df: DataFrame,
    att_pool: list[str],
    loc_pool: list[str],
    text_col: str = "text",
    att_idx_fn=None,
    loc_idx: Column | None = None,
) -> DataFrame:
    """Full J1 ``swap_entities_with_pools`` (augmentors.py:16-39): attendees
    first, then location, text rewritten consistently by both halves."""
    out = swap_attendees_with_pool(df, att_pool, text_col, idx_fn=att_idx_fn)
    return swap_location_with_pool(out, loc_pool, text_col, idx=loc_idx)


RENDER_TEMPLATES = [
    # renderers.py:7-12 — four sentence shapes over the gold fields
    "{action} on {date} at {time}",
    "{action} at {time} on {date}",
    "Schedule {action} for {date} {time}",
    "{action} — {date}, {time}",
]


def render_template_col(seed_key: Column, seed: int = 43) -> Column:
    """Candidate-B augmentation: re-render gold through a deterministic
    template choice (text-only; gold unchanged)."""
    idx = F.pmod(F.xxhash64(seed_key, F.lit(seed)), F.lit(len(RENDER_TEMPLATES)))
    out = None
    for i, t in enumerate(RENDER_TEMPLATES):
        body = t.replace("{action}", "%s").replace("{date}", "%s").replace("{time}", "%s")
        order = [m for m in _re.findall(r"\{(\w+)\}", t)]
        expr = F.format_string(body, *[F.col(c) for c in order])
        out = expr if out is None else F.when(idx == i, expr).otherwise(out)
    return out


def analyze_dataset(events: DataFrame) -> DataFrame:
    """A2: non-null fill counts per field + text length stats, one pass."""
    aggs = [F.count("*").alias("n_rows")]
    for k in TARGET_KEYS:
        aggs.append(
            F.count(F.when(F.col(k).isNotNull(), 1)).alias(f"{k}_nonnull")
        )
    aggs += [
        F.min(F.length("text")).alias("text_len_min"),
        F.max(F.length("text")).alias("text_len_max"),
    ]
    return events.agg(*aggs)


def deterministic_shuffle(df: DataFrame, key_cols: list[str], seed: int) -> DataFrame:
    """O2: seeded pseudo-shuffle — global order by seeded hash of the row
    key; stable under retries/partitioning, unlike random.shuffle."""
    return df.orderBy(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)))
