"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

For the KG-construction queries the oracle computes *gold* fields directly
from the grammar key (pure SQL modular arithmetic) while the Spark side
renders the transcript text and runs the real extraction pipeline — a hash
match proves field-level extraction P/R = 1.0 on the fixture.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG extraction pipeline on sf0.001."""
    from calendar_event_entity_extraction_spark.queries import q_events_extract

    return q_events_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from calendar_event_entity_extraction_spark.docs_queries import docs_queries
    from calendar_event_entity_extraction_spark.queries import kg_queries
    from calendar_event_entity_extraction_spark.relational_queries import (
        relational_queries,
    )

    return {**kg_queries(), **docs_queries(), **relational_queries()}


def oracle_sql() -> dict[str, str]:
    from calendar_event_entity_extraction_spark.docs_queries import docs_oracles
    from calendar_event_entity_extraction_spark.queries import kg_oracles
    from calendar_event_entity_extraction_spark.relational_queries import (
        relational_oracles,
    )

    return {**kg_oracles(), **docs_oracles(), **relational_oracles()}
