"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension.  The engine treats media as ``BinaryType`` payloads
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.

Codec availability is probed per Python worker: ``decode=\"real\"`` uses
PIL when importable (raises otherwise), ``decode=\"auto\"`` uses PIL when
importable and falls back to the deterministic fake, ``decode=\"fake\"``
always produces the deterministic fake (seeded from the payload hash, real
schema and batch shape), ``decode=\"strict\"`` raises NotImplementedError.
This container ships no codec libs, so CI exercises the fake path and a
skip-unless-PIL test covers the real one; the Spark-side plumbing —
schemas, Arrow batch iteration, partition sizing — is identical either way.
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


def _pil_image_module():
    """Probe for PIL inside the worker; None when unavailable."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dep, worker-side

        return Image
    except ImportError:
        return None


def _real_decode(Image, payload: bytes, channels: int):
    """PIL decode → (width, height, channels, raw bytes); native size.
    Corrupt/empty/NULL payloads return an all-None row instead of killing
    the task — on real crawl corpora broken images are routine, and one
    bad row must not abort a 100 TB job."""
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        img = img.convert("RGB" if channels == 3 else "L")
        w, h = img.size
        return w, h, channels, img.tobytes()
    except Exception:
        return None, None, None, None


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
    holds one batch, never the partition.  Modes:

    - ``'real'``  — PIL decode at native size; ImportError without PIL.
      Undecodable payloads yield NULL dims/pixels (see ``_real_decode``).
    - ``'auto'``  — PIL when the worker can import it, else the fake.
    - ``'fake'``  — deterministic payload-hash pixels, fixed ``width`` ×
      ``height`` × ``channels`` (production schema, no codec needed).
    - ``'strict'`` — always raise: use to assert codecs exist in the env.
    """
    if decode not in ("fake", "strict", "real", "auto"):
        raise ValueError("decode must be 'fake', 'strict', 'real' or 'auto'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image_module() if decode in ("real", "auto") else None
        if decode == "real" and Image is None:
            raise ImportError(
                "decode='real' requires PIL in the executor environment"
            )
        for pdf in it:
            if decode == "strict":
                raise NotImplementedError(
                    "image codecs are not available in this environment; "
                    "install PIL/libjpeg or use decode='fake'/'auto'"
                )
            if Image is not None:
                rows = []
                for mid, p in zip(pdf[id_col], pdf[payload_col]):
                    w, h, c, px = _real_decode(Image, p or b"", channels)
                    rows.append((mid, w, h, c, px))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "channels", "pixels"],
                )
                continue
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": width,
                "height": height,
                "channels": channels,
                "pixels": [
                    _fake_pixels(p if p is not None else b"", width, height, channels)
                    for p in pdf[payload_col]
                ],
            })

    return df.select(id_col, payload_col).mapInPandas(batches, _DECODED_SCHEMA)


def resize_images(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize over decoded pixel buffers (mapInPandas).

    numpy-vectorized per image: reshape to (H, W, C) and fancy-index with
    precomputed source rows/cols — no per-pixel Python loop.  Works on real
    and fake pixel buffers alike (the kernel only sees bytes + dims).

    Rows the decoder could not decode (NULL dims/pixels — see
    ``_real_decode``) pass through as all-None rows rather than crashing
    the kernel, preserving the one-bad-row-must-not-abort contract end
    to end.
    """
    import numpy as np

    schema = _DECODED_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, w, h, c, src in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["channels"], pdf["pixels"],
            ):
                if src is None or pd.isna(w) or pd.isna(h) or pd.isna(c):
                    rows.append((mid, None, None, None, None))
                    continue
                w, h, c = int(w), int(h), int(c)
                img = np.frombuffer(src, dtype=np.uint8).reshape(h, w, c)
                sy = np.minimum(h - 1, np.arange(out_h) * h // out_h)
                sx = np.minimum(w - 1, np.arange(out_w) * w // out_w)
                out = img[sy[:, None], sx[None, :], :]
                rows.append((mid, out_w, out_h, c, out.tobytes()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "pixels"],
            )

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
