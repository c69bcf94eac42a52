"""Materialize a scaled synthetic sf directory (round-4 verdict #2).

The sandbox testdata stops at sf0.1, where 19 of the 31 headline queries
finish under 2.5 s — pure JVM/job overhead, plan differences invisible. This
script replicates sf0.1 ``factor``x into ``/tmp/cees_testdata/sf{X}`` with
STRUCTURE-PRESERVING key arithmetic, so the same 31 bench queries run
unmodified at 10x the rows and the sf0.1 -> sf1 time ratio exposes any
hidden super-linear stage:

* fact/dim keys shift by ``copy * (max(key)+1)`` — data-derived stride (no
  collisions at any sf), FK joins (orders->customer, lineitem->part/supplier)
  land on exactly one copy's rows, so join fan-out per key is UNCHANGED and
  per-key group sizes stay constant (work scales in rows, not in key width).
* documents text gets the per-copy token-prefix bijection (same trick as
  bench.materialize_scaled_docs): within a copy the shingle/Jaccard/near-dup
  structure of the original corpus is preserved exactly; across copies no
  shingle is shared, so dedup/LSH candidate pairs scale linearly with factor
  and the band join cannot go quadratic in the factor.
* embeddings rotate each vector by a per-copy cyclic shift — a rigid
  permutation of coordinates, so all intra-copy cosine distances (and thus
  top-k neighbor structure and per-query candidate counts) are preserved
  exactly while copies don't collapse onto identical points.
* region/nation copy through untouched (true dimensions; the reference
  schema fixes them at 5/25 rows at every sf, same as TPC-H).

Transcripts are NOT written here: the bench derives them from the scaled
orders table (materialize_transcripts keys on orders count), so extraction
queries scale automatically.

Usage: python scripts/make_scaled_sf.py [src_dir] [factor] [dst_dir]
Defaults: /root/testdata/sf0.1 10 /tmp/cees_testdata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def scale_dir(spark, src: str, factor: int, dst: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(dst, "_DONE")):
        print(f"{dst} already materialized", file=sys.stderr)
        return
    os.makedirs(dst, exist_ok=True)

    def stride(df, key):
        return df.agg(F.max(key)).first()[0] + 1

    def copies():
        return spark.range(factor).select(F.col("id").alias("copy"))

    strides: dict[str, int] = {}
    # key strides first (orders needs customer's, lineitem needs part's...)
    for tbl, key in [
        ("customer", "c_custkey"), ("part", "p_partkey"),
        ("supplier", "s_suppkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[tbl] = stride(spark.read.parquet(f"{src}/{tbl}.parquet"), key)

    def shift(col, tbl):
        return (F.col(col) + F.col("copy") * F.lit(strides[tbl])).alias(col)

    def write(df, name, parts=16):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"  {name}: done", file=sys.stderr)

    for name in ("region", "nation"):
        write(spark.read.parquet(f"{src}/{name}.parquet"), name, parts=1)

    c = spark.read.parquet(f"{src}/customer.parquet").crossJoin(copies())
    write(c.select(shift("c_custkey", "customer"), "c_name", "c_nationkey",
                   "c_acctbal", "c_mktsegment"), "customer")

    p = spark.read.parquet(f"{src}/part.parquet").crossJoin(copies())
    write(p.select(shift("p_partkey", "part"), "p_name", "p_brand",
                   "p_type", "p_size", "p_retailprice"), "part")

    s = spark.read.parquet(f"{src}/supplier.parquet").crossJoin(copies())
    write(s.select(shift("s_suppkey", "supplier"), "s_name", "s_nationkey",
                   "s_acctbal"), "supplier", parts=2)

    o = spark.read.parquet(f"{src}/orders.parquet").crossJoin(copies())
    write(o.select(shift("o_orderkey", "orders"), shift("o_custkey", "customer"),
                   "o_orderstatus", "o_totalprice", "o_orderdate",
                   "o_orderpriority"), "orders")

    li = spark.read.parquet(f"{src}/lineitem.parquet").crossJoin(copies())
    write(li.select(shift("l_orderkey", "orders"), shift("l_partkey", "part"),
                    shift("l_suppkey", "supplier"), "l_linenumber",
                    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"),
          "lineitem", parts=32)

    ev = spark.read.parquet(f"{src}/events.parquet").crossJoin(copies())
    write(ev.select(shift("event_id", "events"), "ts",
                    shift("user_id", "customer"), "event_type", "value",
                    "props"), "events")

    d = spark.read.parquet(f"{src}/documents.parquet").crossJoin(copies())
    text = F.when(F.col("copy") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"), r"(\S+)",
            F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_$1")),
        )
    )
    write(
        d.select(shift("doc_id", "documents"), text.alias("text"), "lang",
                 "source").withColumn("n_chars", F.length("text")),
        "documents",
    )

    e = spark.read.parquet(f"{src}/embeddings.parquet").crossJoin(copies())
    dim = F.size("embedding")
    rotated = F.expr(
        "transform(embedding, (x, i) -> "
        "element_at(embedding, int((i + copy) % size(embedding)) + 1))"
    )
    _ = dim  # doc: rotation uses size() inline
    write(
        e.select(shift("vec_id", "embeddings"),
                 rotated.alias("embedding").cast("array<float>"), "label"),
        "embeddings", parts=4,
    )

    open(os.path.join(dst, "_DONE"), "w").close()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/cees_testdata/sf1"

    from calendar_event_entity_extraction_spark.session import get_spark

    spark = get_spark(app_name="cees-make-sf", cores=8, shuffle_partitions=16)
    scale_dir(spark, src, factor, dst)
    spark.stop()


if __name__ == "__main__":
    main()
