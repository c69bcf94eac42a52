"""Co-referent event canonicalization within a conversation.

The reference has no multi-turn notion (one sentence per example); the
`north_rule` requires merging co-referent events within a ``conv_id`` using
window functions over stable ``(conv_id, turn_idx)`` ordering: events in the
same conversation with identical normalized (action, date, time) are the same
real-world event — the earliest turn wins and keeps its ``event_id``.

Physical shape: one shuffle on the merge key. We window over
``(conv_id, action, date, time)`` ordered by ``turn_idx`` — equivalent to a
per-conversation window but with higher key cardinality, so hot conversations
don't skew a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonicalize_events(events: DataFrame) -> DataFrame:
    """Keep the lowest-turn_idx event per (conv_id, action, date, time)."""
    w = Window.partitionBy("conv_id", "action", "date", "time").orderBy("turn_idx")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
