"""Structural invariants of the sf-scaling generator (scripts/make_scaled_sf.py).

The sf1 bench fixture is only meaningful if replication preserves the
original's relational structure: data-derived key strides (no collisions),
FK joins landing inside one copy (per-key fan-out unchanged), the documents
token-prefix bijection (near-dup structure linear in the factor), and the
embeddings cyclic rotation (a rigid permutation — intra-copy cosine
geometry preserved exactly).
"""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/scripts")

SRC = "/root/testdata/sf0.001"
FACTOR = 2


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    from make_scaled_sf import scale_dir

    dst = str(tmp_path_factory.mktemp("sfx") / "sf0.002")
    scale_dir(spark, SRC, FACTOR, dst)
    return dst


def test_row_counts_and_key_uniqueness(spark, scaled):
    for tbl, key in [
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"), ("lineitem", None),
    ]:
        src_n = spark.read.parquet(f"{SRC}/{tbl}.parquet").count()
        out = spark.read.parquet(f"{scaled}/{tbl}.parquet")
        assert out.count() == src_n * FACTOR, tbl
        if key:
            assert out.select(key).distinct().count() == src_n * FACTOR, tbl
    # true dimensions copy through untouched
    for tbl in ("region", "nation"):
        assert (
            spark.read.parquet(f"{scaled}/{tbl}.parquet").count()
            == spark.read.parquet(f"{SRC}/{tbl}.parquet").count()
        )


def test_fk_fanout_preserved(spark, scaled):
    """Every order resolves to exactly one customer, and the per-customer
    order-count distribution is the source distribution duplicated —
    per-key group sizes must NOT grow with the factor."""
    o = spark.read.parquet(f"{scaled}/orders.parquet")
    c = spark.read.parquet(f"{scaled}/customer.parquet")
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0

    src_hist = sorted(
        r["n"] for r in spark.read.parquet(f"{SRC}/orders.parquet")
        .groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    )
    out_hist = sorted(
        r["n"] for r in o.groupBy("o_custkey").agg(F.count("*").alias("n"))
        .collect()
    )
    assert out_hist == sorted(src_hist * FACTOR)


def test_documents_prefix_bijection(spark, scaled):
    """Copy 0 is byte-identical to the source; the other copies share NO
    token with the source vocabulary (so no cross-copy shingle can ever
    match — dedup work scales linearly in the factor)."""
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    out = spark.read.parquet(f"{scaled}/documents.parquet")
    n_src = src.count()
    # copy 0 byte-identical: semi-join on (doc_id, text) keeps all of copy 0
    assert (
        out.join(src, ["doc_id", "text"], "left_semi").count() == n_src
    )
    tok = lambda c: F.explode(F.split(c, r"\s+"))  # noqa: E731
    v0 = set(
        r["t"] for r in src.select(tok("text").alias("t")).distinct().collect()
    )
    v1 = set(
        r["t"]
        for r in out.join(src, "doc_id", "left_anti")
        .select(tok("text").alias("t")).distinct().collect()
    )
    assert v0 and v1 and not (v0 & v1)


def test_embeddings_rotation_rigid(spark, scaled):
    """Rotation preserves the vector's multiset of components (norms and
    all intra-copy dot products are invariant under a shared cyclic shift)
    and copy 0 is identical to the source."""
    src = spark.read.parquet(f"{SRC}/embeddings.parquet")
    out = spark.read.parquet(f"{scaled}/embeddings.parquet")
    n_src = src.count()
    stride = src.agg(F.max("vec_id")).first()[0] + 1
    rows = (
        out.withColumn("orig", F.col("vec_id") % stride)
        .join(src.select(F.col("vec_id").alias("orig"),
                         F.col("embedding").alias("e_src")), "orig")
        .select(
            (F.col("vec_id") >= stride).alias("is_copy"),
            F.col("embedding").eqNullSafe(F.col("e_src")).alias("same"),
            F.array_sort("embedding").eqNullSafe(
                F.array_sort("e_src")).alias("same_multiset"),
        )
    )
    agg = rows.agg(
        F.count(F.when(~F.col("is_copy") & F.col("same"), 1)).alias("id0"),
        F.count(F.when(F.col("is_copy") & ~F.col("same_multiset"), 1)).alias(
            "bad"
        ),
        F.count(F.when(F.col("is_copy") & F.col("same"), 1)).alias("collide"),
    ).first()
    assert agg["id0"] == n_src  # copy 0 untouched
    assert agg["bad"] == 0  # rigid permutation per copy
    # rotation by 1 must actually move components for non-constant vectors
    assert agg["collide"] < n_src // 10
