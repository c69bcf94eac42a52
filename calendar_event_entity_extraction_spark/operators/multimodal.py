"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (the container ships no image/audio libs): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (shape + checksum derived from the bytes) exercises the real
Spark plumbing — schema, partitioning, UDF signature, Arrow batch shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "feat array<float>"
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic fake feature vector: 8 floats from the md5 digest."""
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    With ``fake=False`` this is where a real decoder (PIL/libav) plugs in —
    the Spark-side contract is identical.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding needs image/audio libs not present in this "
            "environment; pass fake=True for the deterministic stub decoder"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feat": pdf["payload"].map(_fake_decode),
                }
            )
            yield out

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated key bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
        ).alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(30).alias("n_frames"),
        ).alias("meta"),
    )
    return df
