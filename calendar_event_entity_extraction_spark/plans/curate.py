"""Training-data curation pipeline: the composition a 100 TB corpus
actually runs — quality gate → exact dedup (first-wins) → hash split.

Every stage is a narrow Column expression or one shuffle; the whole plan is
one DAG (no intermediate actions), so Catalyst fuses the quality gate into
the scan and the dedup shuffle is the only exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_count_col, token_count_col
from ..operators.dedup import dedup_first_wins
from ..operators.splits import assign_split


def curate_documents(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_punct_per_100_chars: int = 10,
) -> DataFrame:
    """documents(doc_id, text) → curated rows + split label.

    Quality thresholds use integer arithmetic only (punct per 100 chars
    instead of a float ratio) so the result is engine-exact.
    """
    n_tok = token_count_col(F.col("text"))
    n_punct = punct_count_col(F.col("text"))
    ok = (
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (n_punct * 100 <= F.length("text") * max_punct_per_100_chars)
    )
    kept = docs.filter(ok)
    deduped = dedup_first_wins(kept, ["text"], "doc_id")
    return assign_split(deduped, "doc_id").select("doc_id", "split")
