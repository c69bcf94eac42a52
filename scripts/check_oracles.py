"""Dev harness replicating the driver's oracle comparison:
run Spark query and DuckDB oracle at a given sf, compare row-count, schema
names, and order-insensitive values."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def compare(name, sdf, osql):
    sp = sdf.toPandas()
    dk = duck_run(osql)
    ok = True
    if len(sp) != len(dk):
        print(f"  ROWS MISMATCH spark={len(sp)} duck={len(dk)}")
        ok = False
    scols, dcols = sorted(sp.columns), sorted(dk.columns)
    if scols != dcols:
        print(f"  SCHEMA MISMATCH {scols} vs {dcols}")
        return False
    # replicate the DRIVER's canonicalization: sort RAW columns first
    # (array/map-typed cells are unhashable in pandas sort_values and must
    # crash HERE, not at the driver — round-3 embedding_quantize lesson;
    # CLAUDE.md invariant 2b), stringify only for the value compare
    sp = sp[scols].sort_values(scols).reset_index(drop=True).astype(str)
    dk = dk[scols].sort_values(scols).reset_index(drop=True).astype(str)
    if ok and not sp.equals(dk):
        diff = (sp != dk).any(axis=1)
        print(f"  VALUE MISMATCH rows={diff.sum()}")
        print("  spark:", sp[diff].head(5).to_dict("records"))
        print("  duck :", dk[diff].head(5).to_dict("records"))
        ok = False
    print(f"{name}: {'OK' if ok else 'FAIL'} ({len(sp)} rows)")
    return ok


if __name__ == "__main__":
    from calendar_event_entity_extraction_spark.session import get_spark
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = get_spark(cores=8, shuffle_partitions=8)
    qs, os_ = entry.queries(), entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in os_:
            print(f"{name}: (no oracle — rows-only) rows={fn(spark, SF_DIR).count()}")
            continue
        try:
            if not compare(name, fn(spark, SF_DIR), os_[name]):
                fails += 1
        except Exception as e:
            print(f"{name}: ERROR {e}")
            fails += 1
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    spark.stop()
    sys.exit(1 if fails else 0)
