"""Schema enforcement for the 8-key event struct (reference P1/P2).

* ``canonicalize_output`` (``augmentation/utils.py:28-33``): project any row
  to exactly the 8 target keys, missing ⇒ null.
* ``ensure_schema`` / empty-string→null (``src/validate_json.py:8-9``,
  ``src/data.py:13-14``, ``augmentation/augmentors.py:51-61``): "" and
  whitespace-only values become JSON null; attendees [] becomes null.

Pure Column expressions; applied at DataFrame boundaries so every internal
table carries the closed schema with explicit nulls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TARGET_KEYS

STRING_KEYS = [k for k in TARGET_KEYS if k != "attendees"]


def blank_to_null(c: Column) -> Column:
    return F.when(F.trim(c) == "", None).otherwise(c)


def empty_list_to_null(c: Column) -> Column:
    return F.when(F.size(c) > 0, c)


def enforce_event_schema(df: DataFrame) -> DataFrame:
    """Ensure all 8 keys exist with the right types and null conventions;
    extra columns are preserved, missing target keys materialize as null."""
    out = df
    for k in STRING_KEYS:
        col = F.col(k).cast("string") if k in df.columns else F.lit(None).cast("string")
        out = out.withColumn(k, blank_to_null(col))
    att = (
        F.col("attendees").cast("array<string>")
        if "attendees" in df.columns
        else F.lit(None).cast("array<string>")
    )
    out = out.withColumn(
        "attendees",
        empty_list_to_null(F.filter(att, lambda x: blank_to_null(x).isNotNull())),
    )
    return out


def event_struct_col() -> Column:
    """The canonical ordered 8-key struct (for JSON serialization and the
    sorted-keys dedup signature — keys are emitted in TARGET_KEYS order)."""
    return F.struct(*[F.col(k).alias(k) for k in TARGET_KEYS])
