"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension.  The engine treats media as ``BinaryType`` payloads
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBS: ``decode=\"fake\"`` produces a deterministic fake
(seeded from the payload hash) with the real schema and batch shape;
``decode=\"strict\"`` raises NotImplementedError.  The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as st

__all__ = [
    "IMAGE_META_SCHEMA", "image_table_schema", "attach_media_metadata",
    "decode_images", "resize_images", "sample_video_frames",
    "extract_audio_features",
]

IMAGE_META_SCHEMA = st.StructType([
    st.StructField("format", st.StringType()),
    st.StructField("width", st.IntegerType()),
    st.StructField("height", st.IntegerType()),
    st.StructField("channels", st.IntegerType()),
])

_DECODED_SCHEMA = st.StructType([
    st.StructField("media_id", st.LongType()),
    st.StructField("width", st.IntegerType()),
    st.StructField("height", st.IntegerType()),
    st.StructField("channels", st.IntegerType()),
    st.StructField("pixels", st.BinaryType()),  # H*W*C raw bytes
])


def image_table_schema() -> st.StructType:
    """Canonical multimodal table: id + binary payload + typed metadata."""
    return st.StructType([
        st.StructField("media_id", st.LongType(), False),
        st.StructField("payload", st.BinaryType(), True),
        st.StructField("meta", IMAGE_META_SCHEMA, True),
    ])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap header metadata natively (magic-byte sniffing on the
    binary prefix — no decode, no Python)."""
    head = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("47494638"), "gif")
        .when(head.startswith("52494646"), "riff")
        .otherwise("unknown")
    )
    return df.withColumn("sniffed_format", fmt).withColumn(
        "payload_bytes", F.length(F.col(payload_col)).cast("long")
    )


def _fake_pixels(payload: bytes, w: int, h: int, c: int) -> bytes:
    """Deterministic fake decode: repeatable bytes seeded by payload hash."""
    seed = hashlib.sha256(payload or b"").digest()
    need = w * h * c
    return (seed * (need // len(seed) + 1))[:need]


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode: str = "fake",
    width: int = 8,
    height: int = 8,
    channels: int = 3,
) -> DataFrame:
    """Decode binary payloads → pixel buffers via Arrow-batched mapInPandas.

    Real pipeline shape: batches stream through Arrow; each Python worker
    holds one batch, never the partition.  ``decode='strict'`` raises (no
    codec libs in this container); ``decode='fake'`` emits deterministic
    bytes with the production schema.
    """
    if decode not in ("fake", "strict"):
        raise ValueError("decode must be 'fake' or 'strict'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode == "strict":
                raise NotImplementedError(
                    "image codecs are not available in this environment; "
                    "install PIL/libjpeg and swap _fake_pixels for a real decoder"
                )
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "width": width,
                "height": height,
                "channels": channels,
                "pixels": [
                    _fake_pixels(p if p is not None else b"", width, height, channels)
                    for p in pdf[payload_col]
                ],
            })
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, _DECODED_SCHEMA)


def resize_images(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel buffers (mapInPandas).

    Stub-backed (operates on fake pixels) but the batch plumbing, schema and
    row-count contract are production-shaped.
    """
    schema = _DECODED_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                w, h, c = int(r["width"]), int(r["height"]), int(r["channels"])
                src = r["pixels"]
                out = bytearray()
                for y in range(out_h):
                    sy = min(h - 1, y * h // out_h)
                    for x in range(out_w):
                        sx = min(w - 1, x * w // out_w)
                        base = (sy * w + sx) * c
                        out += src[base:base + c]
                rows.append((r["media_id"], out_w, out_h, c, bytes(out)))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "channels", "pixels"])

    return decoded.mapInPandas(batches, schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index.

    The frame *decode* is stubbed (deterministic fake), but the fan-out
    shape (media → frames) and schema match a real ffmpeg-backed kernel.
    """
    schema = st.StructType([
        st.StructField("media_id", st.LongType()),
        st.StructField("frame_index", st.IntegerType()),
        st.StructField("frame", st.BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col] or b""
                for j in range(max_frames):
                    idx = j * every_n
                    rows.append(
                        (r[id_col], idx, _fake_pixels(payload + bytes([j]), 8, 8, 3))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame"])

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 16,
) -> DataFrame:
    """Audio feature extraction plumbing (MFCC-shaped output, fake values)."""
    schema = st.StructType([
        st.StructField("media_id", st.LongType()),
        st.StructField("features", st.ArrayType(st.DoubleType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                h = hashlib.sha256(p or b"").digest()
                feats.append([b / 255.0 for b in h[:n_features]])
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, schema)
