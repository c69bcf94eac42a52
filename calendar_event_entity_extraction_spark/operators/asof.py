"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row (key, ts) find the right row with the greatest
right_ts <= ts for the same key. Implemented as the classic union+window
technique: tag both sides, sort within key by (ts, side, tiebreak), and
carry the last non-null right payload forward with
``last(ignorenulls)`` over an unbounded-preceding window.

Physical shape: ONE shuffle+sort on the key — no range-explosion join, no
per-group Python (``pd.merge_asof`` via applyInPandas is the fallback only
when the payload is too wide to union). Ties: a right row at exactly
left.ts matches (<= semantics); equal right timestamps break to the
largest tiebreak column, deterministically.

SKEW: :func:`asof_join` runs one task per key value — a hot key (a
boilerplate user with millions of rows) lands in ONE sorted window task,
and AQE cannot split window partitions. :func:`asof_join_bucketed` is the
skew-hardened variant: it windows on (key, coarse-time-bucket) and carries
the last payload of every preceding bucket in via one small bucket-level
window, so a hot key's rows split across its time buckets. Identical
results by construction (same oracle row pins both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    right_key: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """left + one column: the ``payload`` of the latest right row at or
    before the left row's timestamp (null if none)."""
    right_key = right_key or left_key
    out_col = out_col or payload
    l_tag = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right.schema[payload].dataType).alias("_pl"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r_tag = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.col(payload).alias("_pl"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_pl")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        l_tag.unionByName(r_tag)
        .withColumn("_asof", F.last("_pl", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return merged.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_asof").alias(out_col),
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    right_key: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """The WIDE-PAYLOAD fallback: cogrouped ``applyInPandas`` running
    ``pd.merge_asof`` per key group. Identical semantics to
    :func:`asof_join` (backward, <=, equal-right-ts ties to max payload —
    merge_asof keeps the LAST row in (ts, payload) sort order, which IS the
    max-payload rule; pinned by the shared oracle row).

    When to pick it: the union+window paths carry the whole left row
    through the shuffle as one struct — fine for slim rows, wasteful when
    the RIGHT side has many columns to attach (the union would widen every
    row by the full payload struct). Here each side shuffles only itself,
    and the per-group pandas join attaches any number of columns at Arrow
    speed. Trade: per-group Python (Arrow-batched), and a hot key still
    lands in one group — combine with time-bucketing upstream if both
    problems coexist."""
    import pandas as pd

    right_key = right_key or left_key
    out_col = out_col or payload
    # merge_asof requires a common ordered dtype: timestamps on both sides
    l_cast = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r_slim = right.select(
        F.col(right_key).alias("_rk"),
        F.col(right_ts).cast("timestamp").alias("_rts"),
        F.col(payload).alias("_pl"),
    )
    # a FRESH StructType — StructType.add would mutate the DataFrame's
    # cached schema object and make pyspark's cogroup machinery see a
    # phantom column on l_cast itself
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(l_cast.schema.fields)
        + [T.StructField(out_col, right.schema[payload].dataType, True)]
    )
    left_cols = list(left.columns)
    # unmatched rows surface as NaN in a float column; an integral payload
    # must go back through pandas' NULLABLE integer dtype or the Arrow
    # conversion to LongType rejects the NaNs
    int_payload = right.schema[payload].dataType.simpleString() in (
        "bigint", "int", "smallint", "tinyint",
    )

    def fn(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=[*left_cols, out_col])
        l_sorted = l_pdf.sort_values(left_ts, kind="mergesort")
        r_sorted = r_pdf.sort_values(["_rts", "_pl"], kind="mergesort")
        m = pd.merge_asof(
            l_sorted,
            r_sorted[["_rts", "_pl"]],
            left_on=left_ts,
            right_on="_rts",
            direction="backward",
            allow_exact_matches=True,
        )
        m[out_col] = m["_pl"].astype("Int64") if int_payload else m["_pl"]
        return m[[*left_cols, out_col]]

    return (
        l_cast.groupBy(left_key)
        .cogroup(r_slim.groupBy("_rk"))
        .applyInPandas(fn, schema=out_schema)
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    right_key: str | None = None,
    out_col: str | None = None,
    bucket_seconds: int = 30 * 86400,
) -> DataFrame:
    """Skew-hardened :func:`asof_join`: identical output, but the big window
    partitions on (key, floor(epoch/``bucket_seconds``)) instead of the key
    alone, so a hot key's rows split across its time buckets.

    Mechanics: (1) per (key, bucket), the LAST right payload is one
    map-side-combining aggregate (max of the (ts, payload) struct — the
    same (ts, tiebreak) order the plain window uses); (2) a bucket-level
    window per key (rows = #buckets, not #events) turns those into
    carry-in payloads for every later bucket; (3) each carry becomes a
    synthetic right row sorted BEFORE everything in its bucket (sentinel
    sort column — no fabricated timestamps), and the final
    last-non-null window runs per (key, bucket). A real right row at or
    before the left row overrides the carry exactly as the plain window
    would; ties at equal right_ts resolve to the max payload on both paths.

    Trade: three extra small exchanges (bucket aggregate + bucket window +
    the carry union) buy bounded window-partition size — the difference
    between a straggler task and an even stage at 100 TB. Pick
    ``bucket_seconds`` so a hot key's densest bucket fits one task.
    """
    right_key = right_key or left_key
    out_col = out_col or payload
    pl_t = right.schema[payload].dataType
    l_tag = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(pl_t).alias("_pl"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    row_t = l_tag.schema["_row"].dataType
    r_tag = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.col(payload).alias("_pl"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(row_t).alias("_row"),
    )
    u = l_tag.unionByName(r_tag)
    ts_t = u.schema["_ts"].dataType
    u = u.withColumn(
        "_b",
        F.floor(F.col("_ts").cast("timestamp").cast("double") / F.lit(bucket_seconds)),
    ).withColumn("_sent", F.lit(1))

    # last right payload per (key, bucket): max over the same (ts, payload)
    # order the plain window sorts by
    last_in_bucket = (
        u.filter(F.col("_side") == 0)
        .groupBy("_k", "_b")
        .agg(F.max(F.struct("_ts", "_pl")).alias("_m"))
    )
    # every (key, bucket) that exists on either side gets a carry-in: the
    # max bucket-last over all PRECEDING buckets (monotone ts ⇒ struct max
    # = latest). Bucket-level rows only — this window is tiny.
    all_buckets = u.select("_k", "_b").distinct()
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        all_buckets.join(last_in_bucket, ["_k", "_b"], "left")
        .withColumn("_carry", F.max("_m").over(w_prev))
        .filter(F.col("_carry").isNotNull())
        .select(
            "_k",
            "_b",
            F.lit(None).cast(ts_t).alias("_ts"),
            F.col("_carry._pl").alias("_pl"),
            F.lit(-1).alias("_side"),
            F.lit(None).cast(row_t).alias("_row"),
            F.lit(0).alias("_sent"),  # sorts before every real row
        )
    )
    w = (
        Window.partitionBy("_k", "_b")
        .orderBy("_sent", "_ts", "_side", "_pl")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        u.unionByName(carries)
        .withColumn("_asof", F.last("_pl", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return merged.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        F.col("_asof").alias(out_col),
    )
