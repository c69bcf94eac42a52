"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Two decode layers:

* :func:`decode_media_features` — REAL pure-stdlib codecs, no media libs
  needed: a RIFF/WAVE PCM parser (``struct`` header unpack + numpy int16
  frame math) and a binary-PPM (P6) parser. These actually parse the byte
  layouts; a malformed payload raises. The matching
  ``synth_wav_hex_col`` / ``synth_ppm_hex_col`` builders construct valid
  payloads as pure Column expressions (hex → unhex), so both engines can
  derive the expected features from the generating key — the
  ``multimodal_decode`` oracle row pins decode correctness end to end.
* :func:`extract_features` — the generic featurize plumbing for formats
  whose codecs genuinely need external libs (JPEG, MP3, video): the
  deterministic ``fake=True`` kernel exercises schema/batching/binary
  round-trip (oracle row ``multimodal_features``); ``fake=False`` remains
  the documented plug-in point and raises until a real codec is wired.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
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
            "generic featurize with fake=False is the plug-in point for "
            "codecs that need external libs (JPEG/MP3/video) — none ship in "
            "this environment. REAL stdlib decoding exists for RIFF/WAVE "
            "and binary PPM via decode_media_features; pass fake=True here "
            "for the deterministic stub kernel"
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


# ------------------------------------------------------------ real codecs

DECODE_SCHEMA = (
    "media_id long, kind string, sample_rate long, n_samples long, "
    "sum_abs_amplitude long, width long, height long, "
    "sum_r long, sum_g long, sum_b long"
)


def _byte_hex(b: Column) -> Column:
    return F.format_string("%02x", b.cast("int"))


def _le_hex(v: Column, n_bytes: int) -> Column:
    """Little-endian hex of an unsigned integer column, ``n_bytes`` wide."""
    return F.concat(
        *[
            _byte_hex(F.shiftright(v.cast("long"), 8 * i).bitwiseAND(F.lit(255)))
            for i in range(n_bytes)
        ]
    )


def synth_wav_hex_col(k: Column) -> Column:
    """A VALID 16-bit mono PCM RIFF/WAVE payload as a hex Column expression,
    fully determined by the key: sample_rate = 8000 + (k%3)*4000,
    n_samples = 4 + k%8, sample_i = signed16((k*31 + i*17) % 65536).
    Both engines can therefore derive the decoded features from k alone."""
    sr = (F.lit(8000) + F.pmod(k, 3) * 4000).cast("long")
    ns = (F.lit(4) + F.pmod(k, 8)).cast("long")
    data_bytes = ns * 2
    samples = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (ns - 1).cast("int")),
            lambda i: _le_hex(F.pmod(k * 31 + i.cast("long") * 17, 65536), 2),
        ),
        "",
    )
    return F.concat(
        F.lit(b"RIFF".hex()),
        _le_hex(F.lit(36).cast("long") + data_bytes, 4),
        F.lit(b"WAVEfmt ".hex()),
        F.lit(struct.pack("<IHH", 16, 1, 1).hex()),  # fmt size, PCM, mono
        _le_hex(sr, 4),
        _le_hex(sr * 2, 4),  # byte rate = sr * block_align(2)
        F.lit(struct.pack("<HH", 2, 16).hex()),  # block align, bits
        F.lit(b"data".hex()),
        _le_hex(data_bytes, 4),
        samples,
    )


def synth_ppm_hex_col(k: Column) -> Column:
    """A VALID binary PPM (P6) payload as a hex Column expression: width =
    2 + k%3, height = 2, maxval 255, pixel byte j = (k + j*7) % 256."""
    w = (F.lit(2) + F.pmod(k, 3)).cast("long")
    n_px_bytes = w * 2 * 3
    pixels = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_px_bytes - 1).cast("int")),
            lambda j: _byte_hex(F.pmod(k + j.cast("long") * 7, 256)),
        ),
        "",
    )
    return F.concat(
        F.lit(b"P6\n".hex()),
        _byte_hex(F.lit(48) + w),  # single-digit width as ASCII
        F.lit(b" 2\n255\n".hex()),
        pixels,
    )


def _parse_wav(b: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_samples, sum_abs_amplitude) from a RIFF/WAVE PCM
    payload — a real header parse, raises on malformed bytes."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE" or b[12:16] != b"fmt ":
        raise ValueError("not a RIFF/WAVE payload")
    audio_fmt, n_ch, sr, _byte_rate, _block, bits = struct.unpack_from("<HHIIHH", b, 20)
    if audio_fmt != 1 or n_ch != 1 or bits != 16 or b[36:40] != b"data":
        raise ValueError("unsupported WAV layout (need 16-bit mono PCM)")
    nb = struct.unpack_from("<I", b, 40)[0]
    s = np.frombuffer(b, dtype="<i2", offset=44, count=nb // 2)
    return sr, len(s), int(np.abs(s.astype(np.int64)).sum())


def _parse_ppm(b: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, sum_r, sum_g, sum_b) from a binary PPM (P6) payload.
    Token-wise header scan (never a whitespace split over the raster, whose
    bytes may themselves be whitespace)."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = (
        np.frombuffer(b, dtype=np.uint8, offset=pos, count=w * h * 3)
        .astype(np.int64)
        .reshape(-1, 3)
    )
    return w, h, int(px[:, 0].sum()), int(px[:, 1].sum()), int(px[:, 2].sum())


def decode_media_features(media: DataFrame) -> DataFrame:
    """REAL decode over (media_id, kind ∈ {wav, ppm}, payload binary) via
    Arrow-batched ``mapInPandas``. The per-item header parse is the
    unavoidable decoder call (the analog of PIL/libav); the numeric frame
    work is vectorized numpy per payload. Integer-exact outputs only
    (sums, counts, rates) so the oracle compare is float-free."""

    cols = [
        "media_id", "kind", "sample_rate", "n_samples", "sum_abs_amplitude",
        "width", "height", "sum_r", "sum_g", "sum_b",
    ]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {c: [] for c in cols}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                row = dict.fromkeys(cols)
                row["media_id"], row["kind"] = mid, kind
                b = bytes(payload)
                if kind == "wav":
                    sr, ns, amp = _parse_wav(b)
                    row.update(sample_rate=sr, n_samples=ns, sum_abs_amplitude=amp)
                elif kind == "ppm":
                    w, h, r, g, bl = _parse_ppm(b)
                    row.update(width=w, height=h, sum_r=r, sum_g=g, sum_b=bl)
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
                for c in cols:
                    out[c].append(row[c])
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema=DECODE_SCHEMA)


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
