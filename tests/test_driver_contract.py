"""Driver-contract pins (CLAUDE.md invariant 2 / 2b + registry budget).

Round-3 lessons encoded as tests:
* the driver grades at most 50 registry entries (it recorded exactly 50 of
  52, silently dropping the two registered last) — the registry must never
  exceed 50;
* the driver's canonicalizer sorts RAW pandas columns, so array/map-typed
  output columns crash it (`unhashable type: 'list'`) — every registered
  query must return scalar-only columns;
* every queries() key needs an oracle_sql() key (and no orphan oracles);
* de-registered redundant variants (extra_oracle_pairs) must still
  hash-match their oracles — coverage without driver rows.
"""

import importlib.util

import duckdb
import pytest
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

DRIVER_ROW_CAP = 50


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_within_driver_cap_and_key_parity():
    entry = _entry()
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert len(qs) <= DRIVER_ROW_CAP, (
        f"{len(qs)} registered queries — the driver grades only the first "
        f"{DRIVER_ROW_CAP}; trim or merge (round-3 asof lesson)"
    )
    missing = set(qs) - set(os_)
    orphans = set(os_) - set(qs)
    assert not missing, f"queries without oracle: {sorted(missing)}"
    assert not orphans, f"oracles without query: {sorted(orphans)}"


def _assert_scalar_only(schema: T.StructType, name: str):
    for f in schema.fields:
        assert not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — the driver's "
            "canonicalizer sorts raw pandas columns and dies on non-scalar "
            "cells (invariant 2b; round-3 embedding_quantize failure)"
        )


def test_all_registered_outputs_are_scalar_columns(spark):
    entry = _entry()
    for name, fn in entry.queries().items():
        if name == "streaming_curate_equiv":
            # runs a real streaming job; schema is a single string column by
            # construction — asserted separately to keep this test fast
            continue
        _assert_scalar_only(fn(spark, SF_DIR).schema, name)


def test_streaming_equiv_output_is_scalar(spark):
    from calendar_event_entity_extraction_spark.docs_queries import (
        q_streaming_curate_equiv,
    )

    df = q_streaming_curate_equiv(spark, SF_DIR)
    _assert_scalar_only(df.schema, "streaming_curate_equiv")
    assert df.columns == ["fp"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _extra_pair_names():
    from calendar_event_entity_extraction_spark.docs_queries import (
        extra_oracle_pairs,
    )

    return sorted(extra_oracle_pairs())


@pytest.mark.parametrize("name", _extra_pair_names())
def test_extra_pairs_still_hash_match(spark, name):
    """De-registered variants keep full oracle-equality coverage here —
    enumerated from extra_oracle_pairs() so a newly displaced registry row
    (e.g. minhash_signatures, moved for dup_spans) cannot silently lose
    its oracle check."""
    from calendar_event_entity_extraction_spark.docs_queries import (
        extra_oracle_pairs,
    )

    fn, osql = extra_oracle_pairs()[name]
    sp = fn(spark, SF_DIR).toPandas()
    dk = _duck(osql)
    cols = sorted(sp.columns)
    assert cols == sorted(dk.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True).astype(str)
    dk = dk[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(sp) == len(dk) and sp.equals(dk)


@pytest.mark.parametrize("qname", ["q_eval_metrics", "q_eval_metrics_canonical"])
def test_eval_metrics_is_single_pass(spark, qname):
    """Round-4 verdict #4: the eval-metric queries must derive pred and gold
    in ONE projection of ONE extraction lineage — exactly one transcript
    scan, zero joins in the physical plan (the former two-lineage
    formulation executed the extraction subtree twice)."""
    import calendar_event_entity_extraction_spark.queries as Q

    df = getattr(Q, qname)(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans == 1, f"{qname}: {n_scans} parquet scans (want 1)\n{plan}"
    assert "Join" not in plan, f"{qname}: plan contains a join\n{plan}"
