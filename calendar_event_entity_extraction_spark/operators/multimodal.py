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


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Kernel contract is BATCH-LEVEL, never per-element pandas ``.map``: the
    kernel receives one Arrow batch as columnar arrays and must return
    columnar arrays, doing its numeric work in vectorized numpy/pandas ops
    (a real decoder does its unavoidable per-item C call — PIL decode,
    libav demux — then post-processes the whole batch as one ndarray).
    The fake path demonstrates the shape: lengths via the vectorized
    ``.str.len()``, one digest pass per batch whose bytes are featurized by
    a single numpy reshape/divide over the entire batch.

    With ``fake=False`` this is where a real decoder plugs in — the
    Spark-side contract is identical.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding needs image/audio libs not present in this "
            "environment; pass fake=True for the deterministic stub decoder"
        )

    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"].fillna(b"")
            # the only per-item step (analog of a decoder's C call); its
            # digest is computed once and reused for checksum AND features
            digests = [hashlib.md5(b).digest() for b in payload]
            if digests:
                raw = np.frombuffer(
                    b"".join(d[:8] for d in digests), dtype=np.uint8
                ).reshape(-1, 8)
                feats = list((raw / np.float32(255.0)).astype("float32"))
            else:
                feats = []
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payload.str.len().astype("int64"),
                    "checksum": [d.hex() for d in digests],
                    "feat": feats,
                }
            )

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
