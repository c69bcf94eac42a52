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
