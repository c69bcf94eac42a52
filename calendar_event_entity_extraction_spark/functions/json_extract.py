"""First-JSON-object extraction + safe parse (reference P7).

``src/infer.py:22-48`` does a brace-depth scan for the first balanced
``{...}`` then ``json.loads`` (null on failure). Two implementations:

* ``first_json_object_col`` — pure Column regex for objects nested at most
  one level (covers every reference output: the 8-key object is flat), then
  ``from_json`` with the closed schema. JVM-side, codegen.
* ``first_json_object_depthscan`` — exact depth-scan parity via an
  Arrow-batched pandas UDF, for arbitrarily nested payloads.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENT_STRUCT

# first {...} allowing one nesting level (the reference's outputs are flat)
_FLAT_OBJ_RE = r"(\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\})"


def first_json_object_col(text: Column) -> Column:
    return F.nullif(F.regexp_extract(text, _FLAT_OBJ_RE, 1), F.lit(""))


def parse_event_json_col(text: Column) -> Column:
    """text → typed 8-field struct (null fields on parse failure, matching
    safe_json_load's null-on-failure contract)."""
    return F.from_json(first_json_object_col(text), EVENT_STRUCT)


@F.pandas_udf(T.StringType())
def first_json_object_depthscan(s: pd.Series) -> pd.Series:
    """Exact reference semantics: scan to the first '{', track depth,
    return the first balanced object; None if unbalanced/absent."""

    def scan(t):
        if t is None:
            return None
        start = t.find("{")
        if start < 0:
            return None
        depth = 0
        for i in range(start, len(t)):
            ch = t[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return t[start : i + 1]
        return None

    return s.map(scan)
