"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension.  The engine treats media as ``BinaryType`` payloads
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.

Codec availability is probed per Python worker: ``decode=\"real\"`` uses
PIL when importable and otherwise a stdlib-only PNG decoder (zlib
inflate + scanline unfiltering — no codec libs needed), so the real
path is exercisable in codec-free containers; payloads no codec can
handle (e.g. JPEG without PIL, corrupt bytes) yield all-None rows.
``decode=\"auto\"`` uses PIL when importable and falls back to the
deterministic fake, ``decode=\"fake\"`` always produces the
deterministic fake (seeded from the payload hash, real schema and
batch shape), ``decode=\"strict\"`` raises NotImplementedError.  The
Spark-side plumbing — schemas, Arrow batch iteration, partition
sizing — is identical on every path.
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
    "extract_audio_features", "audio_format_report",
    "probe_audio_metadata", "probe_video_metadata",
    "png_encode", "wav_encode", "avi_mjpeg_encode", "vp8l_encode",
    "flac_encode", "mkv_encode_meta",
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


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG writer (8-bit gray/RGB/RGBA, filter 0, one
    IDAT).  The inverse fixture for :func:`_png_decode` and a codec-free
    thumbnail sink — every chunk CRC'd per the spec, readable by any
    viewer."""
    import struct
    import zlib

    if channels not in (1, 3, 4):
        raise ValueError(
            f"png_encode: unsupported channels={channels} "
            "(supported: 1=gray, 3=RGB, 4=RGBA; gray+alpha=2 is not)"
        )
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"png_encode: pixel buffer is {len(pixels)} bytes, expected "
            f"{width}*{height}*{channels} = {width * height * channels}"
            " — a short buffer would silently emit a corrupt PNG"
        )
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    raw = b"".join(
        b"\x00" + pixels[y * width * channels : (y + 1) * width * channels]
        for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )



def _rgb_to_luma(px):
    """PIL's exact RGB→L fixed-point (ImagingConvert.c: ``L24(rgb) >>
    16`` with L24 = R*19595 + G*38470 + B*7471, truncating) — NOT a
    */1000 integer formula, which diverges from PIL on some triples
    (e.g. RGB(6,215,0): 127 vs 128); bit-parity keeps pixel hashes
    identical whether a worker decodes via PIL or a stdlib fallback,
    so mixed-environment clusters stay deterministic.  (H, W, 3)
    uint8 → (H, W, 1) uint8."""
    import numpy as np

    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471) >> 16).astype(np.uint8)[
        :, :, None
    ]


def _png_unfilter(raw, h: int, stride: int, bpp: int):
    """Undo PNG scanline filters 0-4 over ``h`` rows of ``stride`` bytes
    (``bpp`` = bytes per complete pixel — the spec's left-predictor
    distance, so the same code serves 8- and 16-bit samples).  Returns
    an (h, stride) uint8 array, or None on an unknown filter byte."""
    import numpy as np

    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: per-byte-lane running sum (mod 256)
            cur = line
            for k in range(bpp):
                cur[k::bpp] = np.cumsum(cur[k::bpp], dtype=np.uint64) % 256
        elif f == 2:  # Up
            cur = line + prev
        elif f == 3:  # Average — sequential in x, vectorized per pixel
            # the a-predictor (left pixel) is a prefix dependency, so
            # iterate pixels (w steps) not bytes (w*bpp steps), with
            # the bpp byte lanes as one int32 vector op per step
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            for px0 in range(0, stride, bpp):
                sl = slice(px0, px0 + bpp)
                a = (cur[sl] + (a + pv[sl]) // 2) & 0xFF
                cur[sl] = a
            cur = cur.astype(np.uint8)
        elif f == 4:  # Paeth — sequential in x, vectorized per pixel
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            c = np.zeros(bpp, dtype=np.int32)
            for px0 in range(0, stride, bpp):
                sl = slice(px0, px0 + bpp)
                b = pv[sl]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = (cur[sl] + pred) & 0xFF
                cur[sl] = a
                c = b
            cur = cur.astype(np.uint8)
        else:
            return None
        img[y] = cur
        prev = img[y]
    return img


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_decode(payload: bytes, channels: int):
    """Stdlib-only PNG decode → (width, height, channels, raw bytes).

    zlib inflate + scanline unfiltering (filters 0-4 per the PNG spec);
    supports 8- and 16-bit depth (16-bit samples scale to 8 by high
    byte, PIL's behavior), color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), and both non-interlaced and Adam7
    layouts (round 6 closed the 16-bit/Adam7 gaps).  Sub-byte depths
    (1/2/4-bit) and anything malformed return the all-None row, same
    contract as the PIL path.  Channel conversion matches PIL: alpha
    dropped, gray replicated to RGB, RGB→L via PIL's exact fixed-point
    formula.
    """
    import struct
    import zlib

    import numpy as np

    try:
        if not payload or payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None, None, None, None
        pos, w = 8, None
        idat, plte = [], None
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                return None, None, None, None  # truncated
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if (
                    depth not in (8, 16)
                    or interlace not in (0, 1)
                    or comp != 0
                    or filt != 0
                ):
                    return None, None, None, None
                nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
                if nch is None or (depth == 16 and ctype == 3):
                    return None, None, None, None  # 16-bit palette illegal
            elif tag == b"PLTE":
                plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln  # len + tag + body + crc
        if w is None or not idat:
            return None, None, None, None
        raw = zlib.decompress(b"".join(idat))
        bpp = nch * (depth // 8)
        if interlace == 0:
            stride = w * bpp
            if len(raw) != h * (stride + 1):
                return None, None, None, None
            img = _png_unfilter(raw, h, stride, bpp)
            if img is None:
                return None, None, None, None
            full = img.reshape(h, w, bpp)
        else:  # Adam7: seven independently-filtered sub-images
            full = np.zeros((h, w, bpp), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx if w > x0 else 0
                ph = (h - y0 + dy - 1) // dy if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                stride = pw * bpp
                size = ph * (stride + 1)
                if off + size > len(raw):
                    return None, None, None, None
                sub = _png_unfilter(raw[off : off + size], ph, stride, bpp)
                if sub is None:
                    return None, None, None, None
                off += size
                full[np.ix_(y0 + dy * np.arange(ph), x0 + dx * np.arange(pw))] = (
                    sub.reshape(ph, pw, bpp)
                )
            if off != len(raw):
                return None, None, None, None
        if depth == 16:
            # big-endian u16 → high byte (PIL's 16→8 scaling)
            px = full.reshape(h, w, nch, 2)[:, :, :, 0]
        else:
            px = full.reshape(h, w, nch)
        if ctype == 3:  # palette lookup → RGB
            if plte is None:
                return None, None, None, None
            px = plte[px[:, :, 0]]
            nch = 3
        if nch == 2:  # gray+alpha → gray (alpha dropped, as PIL convert)
            px, nch = px[:, :, :1], 1
        elif nch == 4:  # RGBA → RGB
            px, nch = px[:, :, :3], 3
        if channels == 3 and nch == 1:
            px = np.repeat(px, 3, axis=2)
        elif channels == 1 and nch == 3:
            px = _rgb_to_luma(px)
        return int(w), int(h), channels, px.astype(np.uint8).tobytes()
    except Exception:
        return None, None, None, None


# --- stdlib baseline JPEG codec (round 7) ------------------------------------
# The largest real-corpus decode gap after the round-6 PNG closer: web
# crawl corpora are majority JPEG, and without PIL on the workers every
# JPEG row was a no-decoder NULL.  Scope per the round-6 verdict:
# BASELINE SEQUENTIAL (SOF0/SOF1, Huffman, 8-bit); round 7b extended
# the decoder to PROGRESSIVE (SOF2 — spectral selection + successive
# approximation), since real web JPEGs are majority-progressive.
# Arithmetic coding, hierarchical, and 12-bit stay NULL with the
# documented per-row degrade (reference parity anchor: the Object
# escape hatch's per-row degrade philosophy,
# /root/reference/bertrand/types/object.py:10-42).
# Unlike PNG, bit-parity with PIL is NOT a meaningful target here:
# libjpeg's islow integer IDCT and fancy chroma upsampling are
# implementation choices the JPEG standard explicitly leaves open, so
# independent decoders legitimately differ by ±1-2 LSB.  Correctness is
# gated by round-tripping against the paired baseline ENCODER below
# (quality=100 ⇒ unit quant tables ⇒ the only loss is YCbCr+DCT
# rounding, bounded in tests) plus structural hand-built vectors.

# zigzag scan order (JPEG spec Figure A.6), as (row, col) flat indices
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Annex K.1/K.2 typical quantization tables (zigzag order is NOT applied
# here — these are in natural row order, zigzagged at segment-write time)
_JPEG_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]


def _jpeg_build_codes(bits, values):
    """Spec C.2 code assignment: canonical codes in length order.
    Returns {(length, code): symbol} for decode and
    {symbol: (code, length)} for encode."""
    dec, enc = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


# decode LUT cache keyed by the DHT payload: a symbol decode is one
# 16-bit peek + one list index.  Nearly every real JPEG ships the Annex
# K tables, so across a corpus the (65k-slot) build cost is paid once
# per worker, not once per image.
_JPEG_LUT_CACHE: dict = {}


def _jpeg_fast_lut(bits: tuple, values: tuple):
    got = _JPEG_LUT_CACHE.get((bits, values))
    if got is not None:
        return got
    import numpy as np

    sym = np.full(65536, -1, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = values[k]
            ln[base : base + span] = length
            code += 1
            k += 1
        code <<= 1
    got = (sym.tolist(), ln.tolist())
    if len(_JPEG_LUT_CACHE) < 64:  # bound the per-worker cache
        _JPEG_LUT_CACHE[(bits, values)] = got
    return got


def _dct_matrix():
    import numpy as np

    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) * np.sqrt(0.25)
    C[0, :] *= 1 / np.sqrt(2)
    return C  # orthonormal: F = C @ f @ C.T, f = C.T @ F @ C


def _jpeg_decode(payload: bytes, channels: int):
    """Stdlib-only JPEG decode → (w, h, channels, raw bytes).

    Supports baseline + extended sequential (SOF0/SOF1) AND
    progressive (SOF2) — spectral selection, successive approximation
    (DC/AC first + refinement passes, EOB runs), 8-bit precision, 1-
    and 3-component frames, sampling factors up to 2×2 (4:4:4 / 4:2:2
    / 4:2:0), restart intervals in any scan, and multi-scan sequential
    files.  ONE scan decoder serves every mode: a baseline scan is the
    (Ss=0, Se=63, Ah=Al=0) special case of the progressive
    coefficient-band decoder (spec G.1.2 figures G.2/G.7 — the
    refinement-pass bit protocol follows the interoperable libjpeg
    ordering: symbol, sign, then buffered correction bits in scan
    order).  Single-component scans are NON-interleaved per A.2.2
    (raster over the component's own block grid, sampling factors
    ignored).  Chroma upsampling is nearest-neighbor (sample
    replication).  Arithmetic coding, hierarchical, lossless, and
    12-bit return the all-None row — the per-row degrade contract."""
    import struct

    import numpy as np

    try:
        if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
            return None, None, None, None
        pos = 2
        L = len(payload)
        qts: dict = {}
        huff_dc: dict = {}
        huff_ac: dict = {}
        frame = None  # (w, h, [(cid, hs, vs, qt_id), ...])
        geom = None   # (hmax, vmax, mcux, mcuy)
        coefs = None  # per component: [by][bx] -> zigzag-INDEPENDENT
                      # natural-order 64-list, accumulated across scans
        restart_interval = 0
        got_scan = False
        zigzag = _JPEG_ZIGZAG

        class _BitReader:
            __slots__ = ("data", "limit", "pos", "acc", "nbits")

            def __init__(self, seg: bytes):
                # pad with 1-bits (the spec fill) so peeks past the end
                # are safe; overrun is caught via `limit`
                self.data = seg + b"\xff\xff\xff"
                self.limit = 8 * len(seg) + 7  # ≤7 pad bits are legal
                self.pos = 0
                self.acc = 0
                self.nbits = 0

            def peek16(self) -> int:
                while self.nbits < 16:
                    self.acc = (self.acc << 8) | self.data[self.pos]
                    self.pos += 1
                    self.nbits += 8
                return (self.acc >> (self.nbits - 16)) & 0xFFFF

            def take(self, n: int) -> int:
                while self.nbits < n:
                    self.acc = (self.acc << 8) | self.data[self.pos]
                    self.pos += 1
                    self.nbits += 8
                self.nbits -= n
                v = (self.acc >> self.nbits) & ((1 << n) - 1)
                self.acc &= (1 << self.nbits) - 1
                return v

            def consumed(self) -> int:
                return 8 * self.pos - self.nbits

        def extract_segments(start: int):
            # de-stuff + split on byte-aligned RSTn ONCE (FF D0-D7 can
            # only be real restarts: genuine FF data bytes are stuffed
            # FF 00), so the hot loop never re-inspects for markers
            segs: list = []
            cur = bytearray()
            i = start
            while i < L:
                byt = payload[i]
                if byt != 0xFF:
                    cur.append(byt)
                    i += 1
                    continue
                nxt = payload[i + 1] if i + 1 < L else None
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if nxt == 0xFF:
                    i += 1  # spec B.1.1.2 fill byte before a marker
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                break  # EOI or any other marker: end of scan
            segs.append(bytes(cur))
            return segs, i

        def decode_scan(scan_comps, ss, se, ah, al, segments):
            # scan_comps: [(ci, td, ta)] — ci indexes frame components
            hmax, vmax, mcux, mcuy = geom
            w, h, comps_f = frame
            luts = {}
            for ci, td, ta in scan_comps:
                dc_lut = (
                    _jpeg_fast_lut(*huff_dc[td]) if ss == 0 and ah == 0 else None
                )
                ac_lut = _jpeg_fast_lut(*huff_ac[ta]) if se >= 1 else None
                luts[ci] = (dc_lut, ac_lut)
            state = {
                "seg": 0,
                "br": _BitReader(segments[0]),
                "eobrun": 0,
                "dc": {ci: 0 for ci, _, _ in scan_comps},
            }
            p1 = 1 << al
            m1 = -p1

            def restart():
                br = state["br"]
                if br.consumed() > br.limit:
                    raise ValueError("truncated scan segment")
                state["seg"] += 1
                if state["seg"] >= len(segments):
                    raise ValueError("missing restart segment")
                state["br"] = _BitReader(segments[state["seg"]])
                state["eobrun"] = 0
                for k in state["dc"]:
                    state["dc"][k] = 0

            def dc_first(block, ci, lut):
                br = state["br"]
                sym, ln = lut
                w16 = br.peek16()
                t = sym[w16]
                if t < 0:
                    raise ValueError("bad huffman code")
                br.take(ln[w16])
                if t:
                    v = br.take(t)
                    if v < (1 << (t - 1)):
                        v -= (1 << t) - 1
                    state["dc"][ci] += v
                block[0] = state["dc"][ci] << al

            def dc_refine(block):
                if state["br"].take(1):
                    block[0] |= p1  # two's-complement |= matches libjpeg

            def ac_first(block, lut):
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    return
                br = state["br"]
                sym, ln = lut
                k = ss if ss else 1  # baseline combined scan: AC from 1
                while k <= se:
                    w16 = br.peek16()
                    rs = sym[w16]
                    if rs < 0:
                        raise ValueError("bad huffman code")
                    br.take(ln[w16])
                    s = rs & 0xF
                    r = rs >> 4
                    if s == 0:
                        if r != 15:
                            eob = (1 << r) - 1
                            if r:
                                eob += br.take(r)
                            state["eobrun"] = eob
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC overflow")
                    v = br.take(s)
                    if v < (1 << (s - 1)):
                        v -= (1 << s) - 1
                    block[zigzag[k]] = v << al
                    k += 1

            def ac_refine(block, lut):
                br = state["br"]
                sym, ln = lut
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        w16 = br.peek16()
                        rs = sym[w16]
                        if rs < 0:
                            raise ValueError("bad huffman code")
                        br.take(ln[w16])
                        r = rs >> 4
                        s = rs & 0xF
                        if s == 0:
                            if r != 15:
                                # refinement EOBRUN counts the CURRENT
                                # block too (its correction tail runs in
                                # the eobrun section below, then the
                                # count decrements) — unlike first-pass,
                                # where the break itself finishes the
                                # current block
                                eob = 1 << r
                                if r:
                                    eob += br.take(r)
                                state["eobrun"] = eob
                                break
                            val = 0  # ZRL: 16 zero-history skips
                        else:
                            if s != 1:
                                raise ValueError("bad refine symbol")
                            val = p1 if br.take(1) else m1
                        while k <= se:
                            z = zigzag[k]
                            if block[z] != 0:
                                if br.take(1) and (block[z] & p1) == 0:
                                    block[z] += p1 if block[z] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        block[z] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if state["eobrun"] > 0:
                    while k <= se:
                        z = zigzag[k]
                        if block[z] != 0:
                            if br.take(1) and (block[z] & p1) == 0:
                                block[z] += p1 if block[z] >= 0 else m1
                        k += 1
                    state["eobrun"] -= 1

            def decode_unit(cell, ci):
                block = cell.tolist()  # hot loop mutates a plain list
                dc_lut, ac_lut = luts[ci]
                if ss == 0:
                    if ah == 0:
                        dc_first(block, ci, dc_lut)
                    else:
                        dc_refine(block)
                    if se == 0:
                        cell[:] = block
                        return  # progressive DC scan
                if ah == 0:
                    ac_first(block, ac_lut)
                else:
                    ac_refine(block, ac_lut)
                cell[:] = block

            if len(scan_comps) > 1:
                # interleaved: MCU grid shaped by the sampling factors
                n = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_interval and n and n % restart_interval == 0:
                            restart()
                        n += 1
                        for ci, _, _ in scan_comps:
                            _, hs, vs, _ = comps_f[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    decode_unit(
                                        coefs[ci][my * vs + by, mx * hs + bx],
                                        ci,
                                    )
            else:
                # non-interleaved (spec A.2.2): raster over the
                # component's OWN block grid; sampling factors only
                # position it inside the padded storage grid
                ci = scan_comps[0][0]
                _, hs, vs, _ = comps_f[ci]
                comp_w = -(-w * hs // hmax)   # ceil(w*hs/hmax)
                comp_h = -(-h * vs // vmax)
                own_bx = -(-comp_w // 8)
                own_by = -(-comp_h // 8)
                n = 0
                for byi in range(own_by):
                    for bxi in range(own_bx):
                        if restart_interval and n and n % restart_interval == 0:
                            restart()
                        n += 1
                        decode_unit(coefs[ci][byi, bxi], ci)
            br = state["br"]
            if br.consumed() > br.limit:
                raise ValueError("truncated scan")

        while pos + 4 <= L:
            if payload[pos] != 0xFF:
                return None, None, None, None
            while payload[pos + 1] == 0xFF and pos + 2 <= L:
                pos += 1  # spec B.1.1.2: markers may be 0xFF-padded
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            body = payload[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                return None, None, None, None
            pos += 2 + seglen
            if marker == 0xDB:  # DQT (possibly several tables per segment)
                o = 0
                while o < len(body):
                    pq, tq = body[o] >> 4, body[o] & 0xF
                    o += 1
                    if pq == 0:
                        tbl = np.frombuffer(
                            body[o : o + 64], dtype=np.uint8
                        ).astype(np.int32)
                        o += 64
                    else:  # 16-bit precision
                        tbl = np.frombuffer(
                            body[o : o + 128], dtype=">u2"
                        ).astype(np.int32)
                        o += 128
                    dez = np.zeros(64, dtype=np.int32)
                    dez[_JPEG_ZIGZAG] = tbl  # stored zigzagged
                    qts[tq] = dez.reshape(8, 8)
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
                prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                if prec != 8 or ncomp not in (1, 3):
                    return None, None, None, None
                comps = []
                for i in range(ncomp):
                    cid, samp, qt_id = body[6 + 3 * i : 9 + 3 * i]
                    hs, vs = samp >> 4, samp & 0xF
                    if not (1 <= hs <= 2 and 1 <= vs <= 2):
                        return None, None, None, None
                    comps.append((cid, hs, vs, qt_id))
                if ncomp == 1:
                    # the only scans a 1-component frame can carry are
                    # non-interleaved, where sampling factors are inert
                    # geometry — normalize so the storage grid is the
                    # component's own block grid
                    cid, _hs, _vs, qt_id = comps[0]
                    comps = [(cid, 1, 1, qt_id)]
                frame = (int(w), int(h), comps)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-frame[0] // (8 * hmax))
                mcuy = -(-frame[1] // (8 * vmax))
                geom = (hmax, vmax, mcux, mcuy)
                # int32 ndarray per component (natural-order 64 per
                # block): ~256 bytes/block vs several KB of Python list
                # machinery — on a 12 MP image that is the difference
                # between ~60 MB and hundreds of MB per worker.  Scans
                # edit a block as a transient Python list (fast scalar
                # access in the hot loop) written back once per unit.
                coefs = [
                    np.zeros((mcuy * vs_, mcux * hs_, 64), dtype=np.int32)
                    for _, hs_, vs_, _ in comps
                ]
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None, None, None, None  # arithmetic/hierarchical/…
            elif marker == 0xC4:  # DHT
                o = 0
                while o < len(body):
                    tc, th = body[o] >> 4, body[o] & 0xF
                    bits = tuple(body[o + 1 : o + 17])
                    nval = sum(bits)
                    vals = tuple(body[o + 17 : o + 17 + nval])
                    (huff_dc if tc == 0 else huff_ac)[th] = (bits, vals)
                    o += 17 + nval
            elif marker == 0xDD:  # DRI (may change between scans)
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS + its entropy-coded data
                if frame is None:
                    return None, None, None, None
                ns = body[0]
                cid_to_ci = {c[0]: i for i, c in enumerate(frame[2])}
                scan_comps = []
                for i in range(ns):
                    cs, tables = body[1 + 2 * i : 3 + 2 * i]
                    scan_comps.append((cid_to_ci[cs], tables >> 4, tables & 0xF))
                ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
                a = body[3 + 2 * ns]
                segments, pos = extract_segments(pos)
                decode_scan(scan_comps, ss_, se_, a >> 4, a & 0xF, segments)
                got_scan = True
            # APPn / COM / others: skipped
        if frame is None or not got_scan:
            return None, None, None, None

        w, h, comps = frame
        hmax, vmax, mcux, mcuy = geom
        C = _dct_matrix()
        planes = []
        for ci, (cid, hs, vs, qt_id) in enumerate(comps):
            grid = coefs[ci]
            full_by, full_bx = grid.shape[0], grid.shape[1]
            A = (
                grid.reshape(-1, 8, 8).astype(np.float64)
                * qts[qt_id][None, :, :]
            )
            S = C.T @ A @ C  # batched IDCT over every block at once
            planes.append(
                S.reshape(full_by, full_bx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(full_by * 8, full_bx * 8)
            )
        out = []
        for ci, (cid, hs, vs, qt_id) in enumerate(comps):
            pl = np.clip(np.round(planes[ci]) + 128, 0, 255)
            # upsample by sample replication, crop to frame size
            pl = np.repeat(np.repeat(pl, vmax // vs, axis=0), hmax // hs, axis=1)
            out.append(pl[:h, :w])
        if len(out) == 1:
            px = out[0][:, :, None].astype(np.uint8)
            nch = 1
        else:
            y, cb, cr = out
            r = y + 1.402 * (cr - 128)
            g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = y + 1.772 * (cb - 128)
            px = np.clip(
                np.round(np.stack([r, g, b], axis=2)), 0, 255
            ).astype(np.uint8)
            nch = 3
        if channels == 3 and nch == 1:
            px = np.repeat(px, 3, axis=2)
        elif channels == 1 and nch == 3:
            px = _rgb_to_luma(px)
        return int(w), int(h), channels, px.tobytes()
    except Exception:
        return None, None, None, None


def _jpeg_scaled_qt(tbl, quality: int):
    """IJG quality scaling of a base quantization table (quality=100
    collapses to all-ones — the lossless-but-for-rounding setting the
    round-trip gates use)."""
    import numpy as np

    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (np.array(tbl, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32).reshape(8, 8)


# Huffman table for the progressive encoder's AC scans: progressive
# needs EOBRUN symbols ((nb<<4)|0 for nb 1..14) that the Annex K
# sequential tables do not define, so ship a complete flat table — 255
# symbols at 8 bits + symbol 255 at 9 (canonically the all-ones 8-bit
# code is never assigned, per the spec's padding rule).  Compression is
# not the point of the test-side encoder; validity and coverage are.
_JPEG_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _JpegBitWriter:
    """Shared entropy bit writer for BOTH encoders (baseline and
    progressive): MSB-first accumulation, 0xFF byte stuffing, 1-bit
    padding on flush — one implementation so the stuffing/padding
    rules cannot diverge between the two scan scripts."""

    __slots__ = ("out", "v", "c")

    def __init__(self, out: bytearray):
        self.out = out
        self.v = 0
        self.c = 0

    def put(self, code: int, length: int) -> None:
        v = (self.v << length) | (code & ((1 << length) - 1))
        c = self.c + length
        out = self.out
        while c >= 8:
            byte = (v >> (c - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            c -= 8
            v &= (1 << c) - 1
        self.v, self.c = v, c

    def flush(self) -> None:
        if self.c:
            pad = 8 - self.c
            byte = ((self.v << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.v, self.c = 0, 0


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    import struct

    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jpeg_dht(tc: int, th: int, bits, values) -> bytes:
    return _jpeg_seg(0xC4, bytes([(tc << 4) | th] + list(bits) + list(values)))


def _jpeg_headers(width, height, channels, qt_l, qt_c, sof_marker, sampling):
    """SOI + JFIF APP0 + DQT(s) + SOF — the header prefix both
    encoders share (they differ only in DHTs and scan scripts)."""
    import struct

    import numpy as np

    hdr = bytearray(b"\xff\xd8")
    hdr += _jpeg_seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    hdr += _jpeg_seg(
        0xDB,
        bytes([0x00])
        + qt_l.reshape(-1)[_JPEG_ZIGZAG].astype(np.uint8).tobytes(),
    )
    if channels == 3:
        hdr += _jpeg_seg(
            0xDB,
            bytes([0x01])
            + qt_c.reshape(-1)[_JPEG_ZIGZAG].astype(np.uint8).tobytes(),
        )
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i in range(channels):
        hs, vs = sampling[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    hdr += _jpeg_seg(sof_marker, sof)
    return hdr


def jpeg_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Stdlib-only JPEG encoder (SOF0 baseline by default; Annex K
    Huffman tables, IJG quality scaling of the Annex K quantization
    tables; ``subsample`` '444' or '420'; ``restart_interval`` > 0
    emits DRI/RSTn markers every that many MCUs).
    ``progressive=True`` emits an SOF2 successive-approximation scan
    script instead (4:4:4 only — see
    :func:`_jpeg_encode_progressive`).  The test-side counterpart of
    :func:`_jpeg_decode` — quality=100 yields unit quantization
    tables, so an encode→decode round trip isolates the codec's only
    irreducible loss (YCbCr + DCT rounding) and bounds it in units.
    Also useful on its own wherever :func:`png_encode` is (sinks,
    fixtures, fake-decode golden files)."""
    import struct

    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if progressive:
        if restart_interval:
            raise ValueError("progressive encoding does not emit restarts")
        return _jpeg_encode_progressive(
            width, height, channels, pixels, quality, subsample
        )
    if channels == 1:
        subsample = "444"
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)

    qt_l = _jpeg_scaled_qt(_JPEG_QT_LUM, quality)
    qt_c = _jpeg_scaled_qt(_JPEG_QT_CHR, quality)

    if channels == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        comp_px = [y, cb, cr]
    else:
        comp_px = [px[:, :, 0]]

    if subsample == "420" and channels == 3:
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        sampling = [(1, 1)] * channels
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # per-component plane: box-subsample, pad to MCU grid by edge clamp
    planes = []
    for (hs, vs), pl in zip(sampling, comp_px):
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph = -(-height // fy) * fy
            pw = -(-width // fx) * fx
            padded = np.pad(
                pl, ((0, ph - height), (0, pw - width)), mode="edge"
            )
            pl = padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * vs * 8, mcux * hs * 8
        pl = np.pad(
            pl,
            ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
            mode="edge",
        )
        planes.append(pl - 128.0)

    dc_enc_l = _jpeg_build_codes(*_JPEG_DC_LUM)[1]
    ac_enc_l = _jpeg_build_codes(*_JPEG_AC_LUM)[1]
    dc_enc_c = _jpeg_build_codes(*_JPEG_DC_CHR)[1]
    ac_enc_c = _jpeg_build_codes(*_JPEG_AC_CHR)[1]

    out = bytearray()
    bw = _JpegBitWriter(out)
    put_bits, flush_bits = bw.put, bw.flush

    def category(v):
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    C = _dct_matrix()
    dc_pred = [0] * channels

    def encode_block(block, qt, dc_enc, ac_enc, ci):
        coef = C @ block @ C.T
        zz = np.round(coef / qt).astype(np.int64).reshape(-1)[_JPEG_ZIGZAG]
        # baseline AC magnitude cap (8-bit data keeps |AC| ≤ 1023 except
        # exact-basis-aligned pathologies; the clamp keeps categories
        # inside the Annex K AC table range)
        zz[1:] = np.clip(zz[1:], -1023, 1023)
        diff = int(zz[0]) - dc_pred[ci]
        dc_pred[ci] = int(zz[0])
        t = category(diff) if diff else 0
        code, ln = dc_enc[t]
        put_bits(code, ln)
        if t:
            put_bits(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, ln = ac_enc[0x00]  # EOB
                    put_bits(code, ln)
                    break
                run += 1
                if run == 16:
                    code, ln = ac_enc[0xF0]  # ZRL
                    put_bits(code, ln)
                    run = 0
                continue
            s = category(v)
            code, ln = ac_enc[(run << 4) | s]
            put_bits(code, ln)
            put_bits(v if v > 0 else v + (1 << s) - 1, s)
            run = 0

    # --- header segments (shared with the progressive encoder) ---
    hdr = _jpeg_headers(width, height, channels, qt_l, qt_c, 0xC0, sampling)
    hdr += _jpeg_dht(0, 0, *_JPEG_DC_LUM)
    hdr += _jpeg_dht(1, 0, *_JPEG_AC_LUM)
    if channels == 3:
        hdr += _jpeg_dht(0, 1, *_JPEG_DC_CHR)
        hdr += _jpeg_dht(1, 1, *_JPEG_AC_CHR)
    if restart_interval:
        hdr += _jpeg_seg(0xDD, struct.pack(">H", int(restart_interval)))
    sos = bytes([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    hdr += _jpeg_seg(0xDA, sos)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                flush_bits()
                out += bytes(
                    (0xFF, 0xD0 + ((mcu_count // restart_interval - 1) & 7))
                )
                dc_pred[:] = [0] * channels
            mcu_count += 1
            for ci in range(channels):
                hs, vs = sampling[ci]
                qt = qt_l if ci == 0 else qt_c
                dc_e = dc_enc_l if ci == 0 else dc_enc_c
                ac_e = ac_enc_l if ci == 0 else ac_enc_c
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        encode_block(
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8],
                            qt, dc_e, ac_e, ci,
                        )
    flush_bits()
    return bytes(hdr) + bytes(out) + b"\xff\xd9"


def _real_decode(Image, payload: bytes, channels: int):
    """Real decode → (width, height, channels, raw bytes); native size.
    ``Image`` is the PIL module when importable, else None — then the
    stdlib paths handle PNG (:func:`_png_decode`), JPEG baseline +
    progressive (:func:`_jpeg_decode`), GIF first frames
    (:func:`_gif_decode`), and lossless WebP (:func:`_vp8l_decode`);
    only lossy-VP8 WebP and unknown formats are undecodable.
    Corrupt/empty/NULL payloads return an all-None row instead of
    killing the task — on real crawl corpora broken images are routine,
    and one bad row must not abort a 100 TB job."""
    import io

    if Image is None:
        if payload[:2] == b"\xff\xd8":
            return _jpeg_decode(payload, channels)
        if payload[:4] == b"GIF8":
            return _gif_decode(payload, channels)
        if payload[:4] == b"RIFF":
            # sniff gate (round 10): only a WEBP container that can
            # still hold lossless data enters the decoder — a lossy
            # 'VP8 ' primary chunk or a non-WEBP RIFF (AVI, WAV) is
            # ruled out by its magic alone, so the riff walk never
            # runs on a payload its class already condemns
            if payload[8:12] == b"WEBP" and payload[12:16] != b"VP8 ":
                return _vp8l_decode(payload, channels)
            return None, None, None, None
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _png_decode(payload, channels)
        return None, None, None, None
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

    - ``'real'``  — real decode at native size: PIL when importable,
      else the stdlib PNG decoder (``_png_decode``).  Undecodable
      payloads (corrupt, or non-PNG without PIL) yield NULL dims/pixels
      (see ``_real_decode``).
    - ``'auto'``  — PIL when the worker can import it, else the fake.
    - ``'fake'``  — deterministic payload-hash pixels, fixed ``width`` ×
      ``height`` × ``channels`` (production schema, no codec needed).
    - ``'strict'`` — always raise: use to assert codecs exist in the env.
    """
    if decode not in ("fake", "strict", "real", "auto"):
        raise ValueError("decode must be 'fake', 'strict', 'real' or 'auto'")
    if decode == "real" and _pil_image_module() is None:
        # DRIVER-side, where an operator actually sees it (the
        # worker-side warning below lands in executor stderr): without
        # PIL the stdlib fallback decodes PNG, JPEG (baseline +
        # progressive), and GIF only, so a WebP corpus would complete
        # with all-NULL rows.  Executor PIL availability can still differ
        # from the driver's — the worker warning stays as the second
        # line of defense.
        import warnings

        warnings.warn(
            "decode='real' but PIL is not importable on the DRIVER: "
            "the stdlib fallback decodes PNG, JPEG, GIF and lossless "
            "WebP only — lossy-VP8 WebP / arithmetic-JPEG payloads "
            "will yield NULL rows. Install PIL in the executor image, "
            "or use decode='strict' to fail fast.",
            RuntimeWarning,
            stacklevel=2,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image_module() if decode in ("real", "auto") else None
        # 'real' always takes the real path: PIL when importable, the
        # stdlib PNG decoder otherwise (_real_decode handles Image=None).
        # 'auto' only goes real when PIL exists; else the fake below.
        use_real = decode == "real" or (decode == "auto" and Image is not None)
        if decode == "real" and Image is None:
            # loud, once per worker: the fallback decodes PNG and
            # baseline JPEG ONLY — on a WebP/GIF corpus a missing-PIL
            # executor image would otherwise complete "successfully"
            # with all-NULL rows.  Use decode='strict' to hard-assert
            # codecs exist instead.
            import warnings

            warnings.warn(
                "decode='real' without PIL: stdlib fallback decodes "
                "PNG, JPEG, GIF and lossless WebP only; lossy-VP8 / "
                "arithmetic payloads will yield NULL rows.  Install "
                "PIL in the executor image, or use decode='strict' to "
                "fail fast.",
                RuntimeWarning,
                stacklevel=2,
            )
        for pdf in it:
            if decode == "strict":
                raise NotImplementedError(
                    "image codecs are not available in this environment; "
                    "install PIL/libjpeg or use decode='fake'/'auto'"
                )
            if use_real:
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


def decode_format_report(
    df: DataFrame,
    decoded: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-format decode outcome counts — makes the stdlib fallback's
    blind spot operationally VISIBLE instead of warn-only: without PIL,
    a JPEG/WebP corpus decodes to all-NULL rows, and this report is
    where that shows up as ``n_null == n_total`` for the format.

    ``df`` is the payload table fed to :func:`decode_images`;
    ``decoded`` its output.  Returns one row per sniffed format
    (magic-byte sniff, no decode) with
    (sniffed_format, n_total, n_decoded, n_null,
    n_null_unsupported_variant, n_null_no_decoder, n_null_other,
    decoder) where ``decoder`` names the active real-decode path —
    ``'pil'`` when PIL imports on the driver, else
    ``'stdlib-png-jpeg'`` (round 7: baseline JPEG joined PNG in the
    stdlib fallback).  Executor images can differ from the driver; an
    executor-side PIL gap still surfaces here as unexpected n_null,
    which is exactly the signal operators watch.

    The NULL split (round 6): ``n_null_unsupported_variant`` counts
    PNGs whose IHDR declares a shape the stdlib fallback documents as
    out of scope (sub-byte depths 1/2/4, unknown color type, the
    illegal 16-bit-palette combination — a pure byte probe of IHDR
    offsets, no decode; 8/16-bit and Adam7 are all DECODED since round
    6 closed those gaps);
    ``n_null_no_decoder`` counts formats with NO stdlib path at all
    (``unknown`` only — rounds 7-8 moved jpeg, gif, then riff/WebP out
    of this class; a nulled JPEG is arithmetic/12-bit or corrupt, a
    nulled GIF is corrupt, and a nulled riff is lossy-VP8 or corrupt —
    all count in ``n_null_other``).  The first class needs a corpus
    fix or PIL; the second needs PIL on the workers — operators can now
    tell which.  ``n_null_other`` is the remainder (corrupt/truncated
    payloads).  Plan: one id join + a categorical groupBy — O(rows),
    tiny result, safe at any corpus size.
    """
    fmt = attach_media_metadata(df, payload_col).select(
        F.col(id_col).alias("media_id"),
        "sniffed_format",
        # IHDR byte probe (PNG layout: 8B sig, 4B len, 4B 'IHDR', 4B w,
        # 4B h, then depth/ctype/comp/filt/interlace) — 1-based substr
        F.conv(F.hex(F.substring(F.col(payload_col), 25, 1)), 16, 10)
        .cast("int").alias("__depth"),
        F.conv(F.hex(F.substring(F.col(payload_col), 26, 1)), 16, 10)
        .cast("int").alias("__ctype"),
    )
    ok = decoded.select(
        "media_id", F.col("pixels").isNotNull().alias("__ok")
    )
    decoder = "pil" if _pil_image_module() is not None else "stdlib-png-jpeg"
    is_png = F.col("sniffed_format") == "png"
    # A payload truncated before IHDR byte 26 probes NULL depth/ctype;
    # without the coalesce the NULL propagates through `variant` and the
    # row lands in NONE of the three subclasses (breaking the documented
    # "subclasses sum to n_null" contract).  Truncation is corruption,
    # not an unsupported variant — coalesce to false → n_null_other.
    variant = F.coalesce(
        is_png
        & (
            ~F.col("__depth").isin(8, 16)
            | ~F.col("__ctype").isin(0, 2, 3, 4, 6)
            | ((F.col("__depth") == 16) & (F.col("__ctype") == 3))
        ),
        F.lit(False),
    )
    # rounds 7-8: JPEG (baseline + progressive), GIF, then lossless
    # WebP joined PNG in the stdlib fallback, so the no-decoder class
    # shrinks to the one format with NO stdlib path at all: unknown.
    # A JPEG that still nulls is an arithmetic/12-bit variant or
    # corrupt; a GIF that nulls is corrupt; a riff that nulls is
    # lossy-VP8 or corrupt — all land in n_null_other (variant
    # detection would need a segment scan, not a fixed-offset probe;
    # the report keys on cheap native byte probes only).
    no_decoder = F.lit(decoder == "stdlib-png-jpeg") & (
        F.col("sniffed_format") == "unknown"
    )
    null_row = ~F.col("__ok")
    return (
        fmt.join(ok, "media_id")
        .groupBy("sniffed_format")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("__ok"), 1).otherwise(0)).alias("n_decoded"),
            F.sum(F.when(null_row, 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(null_row & variant, 1).otherwise(0)).alias(
                "n_null_unsupported_variant"
            ),
            F.sum(
                F.when(null_row & ~variant & no_decoder, 1).otherwise(0)
            ).alias("n_null_no_decoder"),
            F.sum(
                F.when(null_row & ~variant & ~no_decoder, 1).otherwise(0)
            ).alias("n_null_other"),
        )
        .withColumn("decoder", F.lit(decoder))
        .orderBy("sniffed_format")
    )


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


_FRAME_SCHEMA = st.StructType([
    st.StructField("media_id", st.LongType()),
    st.StructField("frame_index", st.IntegerType()),
    st.StructField("width", st.IntegerType()),
    st.StructField("height", st.IntegerType()),
    st.StructField("channels", st.IntegerType()),
    st.StructField("frame", st.BinaryType()),
])


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    max_frames: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """Frame sampling: one row per sampled frame (media → frames
    fan-out inside one Arrow pass, no shuffle).

    - ``decode='real'`` (round 8): Motion-JPEG AVI payloads decode for
      real — every ``every_n``-th '00dc' JPEG chunk (up to
      ``max_frames``) through the stdlib JPEG decoder → raw RGB pixel
      buffers with true dimensions.  Inter-coded video (H.264/VP9/...)
      and non-AVI containers yield NO rows for that payload plus the
      per-row degrade guarantee (never an exception); run
      :func:`probe_video_metadata` first to see the codec mix.
    - ``decode='fake'``: the plumbing mode — ``max_frames``
      deterministic 8×8×3 payload-hash frames per payload, schema
      identical to the real path.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    cols = [f.name for f in _FRAME_SCHEMA]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                if decode == "real":
                    start = len(rows)
                    try:
                        needed = (max_frames - 1) * every_n + 1
                        frames = _avi_mjpeg_frames(payload, needed) or []
                        picked = frames[::every_n][:max_frames]
                        for j, fr in enumerate(picked):
                            w, h, c, px = _jpeg_decode(fr, 3)
                            if w is None:
                                continue
                            rows.append((mid, j * every_n, w, h, c, px))
                    except Exception:
                        # per-row degrade, all-or-nothing: drop rows
                        # already appended for THIS payload too
                        del rows[start:]
                else:
                    for j in range(max_frames):
                        rows.append((
                            mid, j * every_n, 8, 8, 3,
                            _fake_pixels(payload + bytes([j]), 8, 8, 3),
                        ))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(batches, _FRAME_SCHEMA)


def _mp3_features_or_status(payload, n_features: int):
    """MP3 row → (features or None, decode_status).  The status
    vocabulary extends the seam's three-way split with the gated
    decoder's coverage outcome (round 10):

    - ``'decoded'``: full-coverage decode (every granule bit-exact
      over validated tables) + featurization;
    - ``'decode-partial'``: the stream parses but at least one
      granule selected a Huffman table outside the validated set or
      failed accounting — honest NULL, distinct from corruption;
    - ``'decode-failed'``: no two consistent frames / hard error;
    - ``'skipped-lossy'``: ID3v2-tagged ADTS AAC unmasked after the
      failed frame walk (see :func:`_mp3_gated_decode`).
    """
    dec, status = _mp3_gated_decode(payload)
    if dec is None:
        return None, status
    try:
        feats = _wav_features(dec[0], dec[2], n_features,
                              duration=dec[3])
    except Exception:
        return None, "decode-failed"
    return feats, "decoded" if feats is not None else "decode-failed"


def _audio_features_or_none(payload, n_features: int):
    """Decode + featurize one audio payload, or None.  Routes through
    :func:`_audio_decode` (WAV, then FLAC — round 9).  Feature
    extraction honors the same per-row NULL-degrade contract as the
    decode itself — a numpy edge case must degrade the row, never kill
    the Spark task (round-8 ADVICE)."""
    dec = _audio_decode(payload) if payload is not None else None
    if dec is None:
        return None
    try:
        return _wav_features(dec[0], dec[2], n_features, duration=dec[3])
    except Exception:
        return None


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """Audio feature extraction over binary payloads (Arrow-batched
    mapInPandas; one row per input with an ``array<double>`` feature
    vector).

    - ``decode='real'`` (round 8): stdlib WAV decode (PCM u8/s16/s24/
      s32 + IEEE float, extensible wrapper, multi-channel mixed to
      mono) — plus stdlib FLAC (round 9: all subframe types, Rice
      partitions + escape, stereo decorrelation, CRC-verified frames)
      — and a deterministic numpy feature vector — duration, RMS,
      zero-crossing rate, spectral centroid / 85% rolloff / bandwidth,
      plus log-spaced band energies (see :func:`_wav_features`).
      Round 10: the container sniff runs FIRST as the decode
      skip-list (:func:`_audio_container_class`, SCALE.md's round-9
      conclusion): no-decoder lossy (AAC/OGG) and unknown containers
      never enter a decoder and report ``decode_status =
      'skipped-lossy'`` / ``'skipped-unknown'``; MP3 rows route
      through the gated mp3dec decoder (full-coverage contract,
      first-failure early exit) reporting ``'decoded'`` /
      ``'decode-partial'`` / ``'decode-failed'``; a lossless-class
      payload whose decode or featurization fails reports
      ``'decode-failed'``.  Decode cost therefore tracks decodable
      bytes, not corpus bytes.  All non-decoded rows keep NULL
      features — the same per-row degrade contract as the image
      codecs; analysis is capped at 2^21 samples per row so a huge or
      corrupt payload cannot stall a task.
    - ``decode='fake'``: deterministic payload-hash values (production
      schema incl. ``decode_status='decoded'``, no decode) — the
      oracle-replayable mode.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    schema = st.StructType([
        st.StructField("media_id", st.LongType()),
        st.StructField("features", st.ArrayType(st.DoubleType())),
        st.StructField("decode_status", st.StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            statuses = []
            for p in pdf[payload_col]:
                if decode == "real":
                    b = bytes(p) if p is not None else None
                    _, klass = _audio_container_class(b)
                    if klass == "lossy-no-decoder":
                        feats.append(None)
                        statuses.append("skipped-lossy")
                    elif klass == "unknown":
                        feats.append(None)
                        statuses.append("skipped-unknown")
                    elif klass == "lossy-decodable":
                        f, s = _mp3_features_or_status(b, n_features)
                        feats.append(f)
                        statuses.append(s)
                    else:
                        f = _audio_features_or_none(b, n_features)
                        feats.append(f)
                        statuses.append(
                            "decoded" if f is not None else "decode-failed"
                        )
                else:
                    h = hashlib.sha256(p or b"").digest()
                    feats.append([b / 255.0 for b in h[:n_features]])
                    statuses.append("decoded")
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "features": feats,
                "decode_status": statuses,
            })

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def _jpeg_encode_progressive(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int,
    subsample: str = "444",
) -> bytes:
    """Progressive (SOF2) encoder — the test-side counterpart of the
    progressive decode paths; 4:4:4 and 4:2:0.  Scan script exercises
    every decode mode: interleaved DC first at Al=1 (multi-block MCUs
    under 4:2:0), DC refinement, then per component AC first
    (Ss=1..63, Al=1, with EOB runs) and AC refinement (Ah=1, Al=0 —
    the spec G.1.2.3 bit protocol: symbol, sign, buffered correction
    bits in scan order, run corrections flushed after the EOBRUN
    symbol).  AC scans are non-interleaved over each component's OWN
    block grid (A.2.2), which under 4:2:0 differs from the padded MCU
    storage grid.  quality=100 makes a progressive encode → decode
    round trip bit-identical to the baseline one (both reduce to the
    same quantized coefficients and the same IDCT)."""
    import struct

    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    qt_l = _jpeg_scaled_qt(_JPEG_QT_LUM, quality)
    qt_c = _jpeg_scaled_qt(_JPEG_QT_CHR, quality)
    if channels == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        comp_px = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
    else:
        comp_px = [px[:, :, 0]]
    if subsample == "420" and channels == 3:
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        sampling = [(1, 1)] * channels
    hmax = max(s_[0] for s_ in sampling)
    vmax = max(s_[1] for s_ in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    C = _dct_matrix()
    comp_coefs = []   # per comp: STORAGE-grid raster of zigzag coef lists
    full_dims = []    # per comp: (full_by, full_bx)
    own_dims = []     # per comp: (own_by, own_bx) — the coded AC grid
    for ci, pl in enumerate(comp_px):
        hs, vs = sampling[ci]
        qt = qt_l if ci == 0 else qt_c
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            ph = -(-height // fy) * fy
            pw = -(-width // fx) * fx
            padded = np.pad(
                pl, ((0, ph - height), (0, pw - width)), mode="edge"
            )
            pl = padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comp_h, comp_w = pl.shape
        full_by, full_bx = mcuy * vs, mcux * hs
        own_dims.append((-(-comp_h // 8), -(-comp_w // 8)))
        full_dims.append((full_by, full_bx))
        pl = np.pad(
            pl,
            ((0, full_by * 8 - comp_h), (0, full_bx * 8 - comp_w)),
            mode="edge",
        ) - 128.0
        blocks = []
        for yb in range(full_by):
            for xb in range(full_bx):
                blk = pl[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coef = np.round((C @ blk @ C.T) / qt).astype(np.int64)
                zz = coef.reshape(-1)[_JPEG_ZIGZAG]
                zz[1:] = np.clip(zz[1:], -1023, 1023)
                blocks.append(zz.tolist())
        comp_coefs.append(blocks)

    out = bytearray()
    bw = _JpegBitWriter(out)
    put_bits, flush_bits = bw.put, bw.flush

    dc_enc = [
        _jpeg_build_codes(*_JPEG_DC_LUM)[1],
        _jpeg_build_codes(*_JPEG_DC_CHR)[1],
    ]
    ac_enc = _jpeg_build_codes(*_JPEG_PROG_AC_TABLE)[1]

    def emit(enc, sym):
        code, ln = enc[sym]
        put_bits(code, ln)

    out += _jpeg_headers(width, height, channels, qt_l, qt_c, 0xC2, sampling)
    out += _jpeg_dht(0, 0, *_JPEG_DC_LUM)
    if channels == 3:
        out += _jpeg_dht(0, 1, *_JPEG_DC_CHR)
    out += _jpeg_dht(1, 0, *_JPEG_PROG_AC_TABLE)

    def sos(comp_list, ss, se, ah, al):
        body = bytes([len(comp_list)])
        for cid, tdc, tac in comp_list:
            body += bytes([cid, (tdc << 4) | tac])
        body += bytes([ss, se, (ah << 4) | al])
        return _jpeg_seg(0xDA, body)

    all_comps = [(i + 1, 0 if i == 0 else 1, 0) for i in range(channels)]

    def mcu_block_indices():
        # interleaved MCU order: per MCU, each component contributes
        # its hs×vs blocks from the padded STORAGE grid
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(channels):
                    hs_, vs_ = sampling[ci]
                    full_bx_ = full_dims[ci][1]
                    for byy in range(vs_):
                        for bxx in range(hs_):
                            yield ci, (my * vs_ + byy) * full_bx_ + (
                                mx * hs_ + bxx
                            )

    # scan 1: DC first, interleaved, Al=1 (point transform = arithmetic
    # shift on the signed value; the refinement bit restores dc & 1)
    out += sos(all_comps, 0, 0, 0, 1)
    dc_pred = [0] * channels
    for ci, bi in mcu_block_indices():
        v = comp_coefs[ci][bi][0] >> 1
        diff = v - dc_pred[ci]
        dc_pred[ci] = v
        t = diff.bit_length() if diff > 0 else (-diff).bit_length()
        emit(dc_enc[min(ci, 1)], t)
        if t:
            put_bits(diff if diff > 0 else diff + (1 << t) - 1, t)
    flush_bits()

    # scan 2: DC refinement, Ah=1, Al=0 — one raw bit per block
    out += sos(all_comps, 0, 0, 1, 0)
    for ci, bi in mcu_block_indices():
        put_bits(comp_coefs[ci][bi][0] & 1, 1)
    flush_bits()

    # per component: AC first (Ss=1, Se=63, Ah=0, Al=1), non-interleaved
    for ci in range(channels):
        out += sos([all_comps[ci]], 1, 63, 0, 1)
        own_by_, own_bx_ = own_dims[ci]
        full_bx_ = full_dims[ci][1]
        eobrun = [0]

        def emit_eobrun():
            if eobrun[0]:
                nb = eobrun[0].bit_length() - 1
                emit(ac_enc, nb << 4)
                if nb:
                    put_bits(eobrun[0] - (1 << nb), nb)
                eobrun[0] = 0

        for byi in range(own_by_):
          for bxi in range(own_bx_):
            blk = comp_coefs[ci][byi * full_bx_ + bxi]
            last = 0
            for k2 in range(63, 0, -1):
                if abs(blk[k2]) >> 1:
                    last = k2
                    break
            if last == 0:
                eobrun[0] += 1
                if eobrun[0] == 0x7FFF:
                    emit_eobrun()
                continue
            emit_eobrun()
            r = 0
            for k in range(1, last + 1):
                t = abs(blk[k]) >> 1
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    emit(ac_enc, 0xF0)
                    r -= 16
                s = t.bit_length()
                emit(ac_enc, (r << 4) | s)
                v = t if blk[k] > 0 else -t
                put_bits(v if v > 0 else v + (1 << s) - 1, s)
                r = 0
            if last < 63:
                eobrun[0] += 1
                if eobrun[0] == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        flush_bits()

    # per component: AC refinement (Ss=1, Se=63, Ah=1, Al=0)
    for ci in range(channels):
        out += sos([all_comps[ci]], 1, 63, 1, 0)
        own_by_, own_bx_ = own_dims[ci]
        full_bx_ = full_dims[ci][1]
        eobrun = [0]
        pending: list = []  # correction bits owed to blocks in the run

        def emit_eobrun2():
            if eobrun[0]:
                nb = eobrun[0].bit_length() - 1
                emit(ac_enc, nb << 4)
                if nb:
                    put_bits(eobrun[0] - (1 << nb), nb)
                for b_ in pending:
                    put_bits(b_, 1)
                pending.clear()
                eobrun[0] = 0

        for byi in range(own_by_):
          for bxi in range(own_bx_):
            blk = comp_coefs[ci][byi * full_bx_ + bxi]
            eob = 0
            for k2 in range(63, 0, -1):
                if abs(blk[k2]) == 1:  # newly significant at Al=0
                    eob = k2
                    break
            r = 0
            br_bits: list = []
            for k in range(1, 64):
                t = abs(blk[k])
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    emit_eobrun2()
                    emit(ac_enc, 0xF0)
                    r -= 16
                    for b_ in br_bits:
                        put_bits(b_, 1)
                    br_bits = []
                if t > 1:
                    br_bits.append(t & 1)
                    continue
                emit_eobrun2()
                emit(ac_enc, (r << 4) | 1)
                put_bits(1 if blk[k] > 0 else 0, 1)
                for b_ in br_bits:
                    put_bits(b_, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun[0] += 1
                pending.extend(br_bits)
                if eobrun[0] == 0x7FFF or len(pending) > 900:
                    emit_eobrun2()
        emit_eobrun2()
        flush_bits()

    out += b"\xff\xd9"
    return bytes(out)


# --- stdlib GIF decoder (round 7c) -------------------------------------------
# Closes another slice of the no-decoder NULL class: GIF87a/GIF89a
# first-frame decode (LZW, global/local palettes, interlacing, frame
# offset composition onto the logical screen).  Animation beyond the
# first frame is out of scope — for a training-data pipeline the first
# frame IS the image signal; the remaining no-decoder formats are
# riff (WebP) and unknown.


def _gif_lzw(data: bytes, min_code: int, expect: int):
    """GIF-variant LZW decompress → list of palette indices (or None on
    a malformed stream).  Codes are LSB-first across the concatenated
    sub-blocks; the table resets on CLEAR and the code width bumps when
    the table fills 2^width (up to 12 bits)."""
    clear = 1 << min_code
    end = clear + 1
    base = [[i] for i in range(clear)] + [None, None]
    codes = list(base)
    width = min_code + 1
    out: list = []
    prev = None
    # refilling accumulator: one indexed byte per refill instead of a
    # 3-byte slice + int.from_bytes per CODE (the _Vp8lBits lesson)
    acc = 0
    nacc = 0
    byte_i = 0
    n_bytes = len(data)
    while len(out) < expect:
        while nacc < width and byte_i < n_bytes:
            acc |= data[byte_i] << nacc
            byte_i += 1
            nacc += 8
        if nacc < width:
            return None  # ran out before END/expected pixels
        c = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if c == clear:
            codes = list(base)
            width = min_code + 1
            prev = None
            continue
        if c == end:
            break
        if prev is None:
            if c >= clear:
                return None  # first code after clear must be literal
            entry = codes[c]
        elif c < len(codes) and codes[c] is not None:
            entry = codes[c]
        elif c == len(codes):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if prev is not None and len(codes) < 4096:
            codes.append(prev + [entry[0]])
        prev = entry
        if len(codes) == (1 << width) and width < 12:
            width += 1
    return out


def _gif_decode(payload: bytes, channels: int):
    """Stdlib GIF first-frame decode → (w, h, channels, raw bytes) at
    the LOGICAL SCREEN size (frame composed at its offset over a
    palette-index-0 canvas — PIL's first-frame semantics; the header's
    background byte is ignored, as Pillow and browsers do).  Malformed
    payloads return the all-None row — the per-row degrade contract."""
    import struct

    import numpy as np

    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None, None, None, None
        w, h, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            gct = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        px = None
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label + sub-blocks, skipped
                pos += 2
                while payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
                continue
            if b0 != 0x2C:
                return None, None, None, None
            left, top, fw, fh, fpacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None or fw == 0 or fh == 0:
                return None, None, None, None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _gif_lzw(bytes(data), min_code, fw * fh)
            if idx is None or len(idx) < fw * fh:
                return None, None, None, None
            ind = np.asarray(idx[: fw * fh], np.int32).reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, fh, 8))
                    + list(range(4, fh, 8))
                    + list(range(2, fh, 4))
                    + list(range(1, fh, 2))
                )
                de = np.empty_like(ind)
                de[np.asarray(order)] = ind
                ind = de
            ind = np.clip(ind, 0, len(pal) - 1)
            frame = pal[ind]  # (fh, fw, 3)
            # PIL parity: Pillow zero-fills the P-mode first-frame
            # canvas (palette index 0) before pasting — it ignores the
            # header's background-color byte, as do browsers.  Matching
            # that keeps pixel buffers identical across a mixed fleet
            # where some executors have PIL and some use this fallback.
            canvas = np.zeros((h, w, 3), np.uint8)
            fill_pal = gct if gct is not None else pal
            if len(fill_pal):
                canvas[:] = fill_pal[0]
            ch = min(fh, max(h - top, 0))
            cw = min(fw, max(w - left, 0))
            canvas[top : top + ch, left : left + cw] = frame[:ch, :cw]
            px = canvas
            break  # first frame only
        if px is None:
            return None, None, None, None
        if channels == 1:
            px = _rgb_to_luma(px)
        return int(w), int(h), channels, px.tobytes()
    except Exception:
        return None, None, None, None


def gif_encode(width: int, height: int, pixels_idx, palette) -> bytes:
    """Minimal test-side GIF writer: one full-screen frame, global
    palette, 'uncompressed' LZW (literal codes with periodic CLEARs so
    the code width never grows) — enough to round-trip the decoder's
    LZW/palette/canvas paths.  ``pixels_idx`` is height×width palette
    indices; ``palette`` is an (n, 3) array-like, n a power of two ≥ 4."""
    import struct

    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    if n & (n - 1) or n < 4:
        raise ValueError("palette size must be a power of two >= 4")
    size_bits = n.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code = max(2, size_bits)
    clear = 1 << min_code
    end = clear + 1
    width_bits = min_code + 1
    # literal-only stream: CLEAR every (2^width - clear - 3) literals
    # keeps the decoder's table below the width-bump threshold
    burst = (1 << width_bits) - clear - 3
    bits = bytearray()
    acc = [0, 0]

    def put(code):
        acc[0] |= code << acc[1]
        acc[1] += width_bits
        while acc[1] >= 8:
            bits.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    put(clear)
    flat = np.asarray(pixels_idx, dtype=np.int64).reshape(-1)
    for i, v in enumerate(flat):
        if i and i % burst == 0:
            put(clear)
        put(int(v))
    put(end)
    if acc[1]:
        bits.append(acc[0] & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# --- stdlib VP8L (lossless WebP) decoder (round 8) ---------------------------
# Closes the last NAMED no-decoder class: RIFF/WEBP payloads carrying a
# VP8L (lossless) bitstream decode without PIL; lossy VP8 stays NULL
# (n_null_other) — a DCT decoder for it would duplicate the JPEG path's
# scope without its interoperability gate.  Implemented from the public
# WebP Lossless Bitstream Specification (RFC 9649): LSB-first bit
# reader, canonical prefix codes (simple + code-length-coded), color
# cache, LZ77 backrefs with the 120-entry distance neighborhood map,
# meta-prefix images, and all four transforms (predictor, cross-color,
# subtract-green, color-indexing incl. sub-byte pixel bundling).
# Reference anchor for the per-row degrade contract:
# /root/reference/bertrand/types/object.py:10-42 (objects that cannot
# convert degrade to NA per element; here a payload that cannot decode
# degrades to the all-None row, never an exception).

_VP8L_CL_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
)

# RFC 9649 §5.2.2: distance codes 1..120 map to a pixel neighborhood.
_VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 4), (7, 7), (-7, 7), (8, 5),
    (8, 6), (8, 7),
)


# bit-reversal of a 9-bit value: prefix codes are read bit-by-bit with
# the FIRST stream bit as the code's MSB, while the stream itself is
# LSB-first — the LUT peek reverses once instead of looping per bit
_REV9 = tuple(
    int(format(i, "09b")[::-1], 2) for i in range(512)
)
_LUT_BITS = 9


class _Vp8lBits:
    """LSB-first bit reader over the VP8L payload (RFC 9649 §4) with a
    refilling accumulator — one slice per ~8 bytes instead of per bit
    (the per-bit ``int.from_bytes`` was the decoder's hot spot)."""

    __slots__ = ("d", "n", "byte_i", "acc", "nacc", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.byte_i = 0
        self.acc = 0
        self.nacc = 0
        self.pos = 0  # bits consumed (debug/tests)

    def _fill(self, need: int) -> None:
        while self.nacc < need and self.byte_i < self.n:
            self.acc |= self.d[self.byte_i] << self.nacc
            self.byte_i += 1
            self.nacc += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nacc < n:
            self._fill(n)
            if self.nacc < n:
                raise ValueError("vp8l: bitstream overrun")
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nacc -= n
        self.pos += n
        return v

    def peek_lut(self) -> int:
        """Next ``_LUT_BITS`` stream bits WITHOUT consuming, zero-padded
        past end-of-stream (a padded entry longer than the remaining
        bits is caught by :meth:`skip`'s overrun check)."""
        if self.nacc < _LUT_BITS:
            self._fill(_LUT_BITS)
        return self.acc & ((1 << _LUT_BITS) - 1)

    def skip(self, n: int) -> None:
        if self.nacc < n:
            raise ValueError("vp8l: bitstream overrun")
        self.acc >>= n
        self.nacc -= n
        self.pos += n


def _vp8l_canonical(lengths):
    """Canonical prefix code from code lengths (deflate convention:
    shorter codes first, ties by symbol order).  Returns (table
    {(len, code): symbol}, single_symbol_or_None, 512-entry peek LUT).

    The LUT resolves codes of ≤ 9 bits in ONE indexed lookup of the
    bit-reversed 9-bit peek (symbol, length); entries under a longer
    code's prefix stay None and fall back to the bit-by-bit walk —
    the same two-tier shape that doubled the stdlib JPEG decoder."""
    syms = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not syms:
        raise ValueError("vp8l: empty code")
    if len(syms) == 1:
        return {}, syms[0][1], None
    syms.sort()
    # Kraft completeness: a multi-symbol code must satisfy
    # sum(2^-len) == 1 exactly (integer form: sum(2^(maxlen-len)) ==
    # 2^maxlen).  Over-subscribed codes alias two symbols onto one bit
    # pattern and under-subscribed ones leave undecodable patterns —
    # libwebp rejects both; decoding them silently produces garbage
    # pixels that would feed downstream hashes/dedup (round-8 ADVICE).
    maxlen = syms[-1][0]
    if sum(1 << (maxlen - l) for l, _ in syms) != 1 << maxlen:
        raise ValueError("vp8l: prefix code not Kraft-complete")
    table = {}
    lut = [None] * (1 << _LUT_BITS)
    code = 0
    last = syms[0][0]
    for l, s in syms:
        code <<= l - last
        last = l
        table[(l, code)] = s
        if l <= _LUT_BITS:
            base = code << (_LUT_BITS - l)
            for i in range(1 << (_LUT_BITS - l)):
                lut[base + i] = (s, l)
        code += 1
    return table, None, lut


def _vp8l_read_sym(huff, br) -> int:
    table, single, lut = huff
    if single is not None:
        return single
    ent = lut[_REV9[br.peek_lut()]]
    if ent is not None:
        br.skip(ent[1])
        return ent[0]
    code = 0  # escape: a code longer than the LUT covers
    for l in range(1, 16):
        code = (code << 1) | br.read(1)
        s = table.get((l, code))
        if s is not None:
            return s
    raise ValueError("vp8l: bad prefix code")


def _vp8l_read_code(alphabet: int, br):
    """One prefix code: simple (1-2 symbols) or code-length-coded
    (RFC 9649 §5.2.4)."""
    if br.read(1):  # simple
        n = br.read(1) + 1
        s0 = br.read(8 if br.read(1) else 1)
        if s0 >= alphabet:
            raise ValueError("vp8l: simple symbol out of range")
        if n == 1:
            return {}, s0, None
        s1 = br.read(8)
        if s1 >= alphabet:
            raise ValueError("vp8l: simple symbol out of range")
        # read-order assignment (s0 ↔ bit 0), NOT canonical-by-symbol
        half = 1 << (_LUT_BITS - 1)
        lut = [(s0, 1)] * half + [(s1, 1)] * half
        return {(1, 0): s0, (1, 1): s1}, None, lut
    ncodes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(ncodes):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.read(3)
    cl_huff = _vp8l_canonical(cl_lengths)
    if br.read(1):  # explicit max symbol count
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _vp8l_read_sym(cl_huff, br)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                rep, val = 3 + br.read(2), prev
            elif cl == 17:
                rep, val = 3 + br.read(3), 0
            else:
                rep, val = 11 + br.read(7), 0
            if i + rep > alphabet:
                raise ValueError("vp8l: code-length repeat overrun")
            for _ in range(rep):
                lengths[i] = val
                i += 1
    return _vp8l_canonical(lengths)


def _vp8l_prefix_value(code: int, br) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _vp8l_entropy_image(br, xsize: int, ysize: int, level0: bool):
    """DecodeImageStream (RFC 9649 §6): transforms (level 0 only),
    color cache, optional meta-prefix image, prefix codes, pixel loop.
    Returns (argb pixel list, transforms read, final coded xsize)."""
    transforms = []
    seen_types = set()
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen_types:
                raise ValueError("vp8l: duplicate transform")
            seen_types.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                timg, _, _ = _vp8l_entropy_image(
                    br,
                    _vp8l_subsample(xsize, bits),
                    _vp8l_subsample(ysize, bits),
                    False,
                )
                # record the xsize AT READ TIME: a transform read
                # after color-indexing operates on the PACKED width,
                # and the inverse pass must index with that width
                # (review finding — the in-repo encoder never emits
                # the combination, but foreign streams may)
                transforms.append((ttype, bits, timg, xsize))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # color indexing
                n = br.read(8) + 1
                pal, _, _ = _vp8l_entropy_image(br, n, 1, False)
                for i in range(1, n):  # undo component subtraction coding
                    a = pal[i]
                    b = pal[i - 1]
                    pal[i] = (
                        (((a >> 24) + (b >> 24)) & 0xFF) << 24
                        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
                        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
                        | (((a + b) & 0xFF))
                    )
                wb = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
                transforms.append((3, wb, pal, xsize))
                xsize = _vp8l_subsample(xsize, wb)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad cache bits")
    meta = None
    meta_bits = 0
    ngroups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta, _, _ = _vp8l_entropy_image(
            br,
            _vp8l_subsample(xsize, meta_bits),
            _vp8l_subsample(ysize, meta_bits),
            False,
        )
        ngroups = max((p >> 8) & 0xFFFF for p in meta) + 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = [
        (
            _vp8l_read_code(green_alpha, br),
            _vp8l_read_code(256, br),
            _vp8l_read_code(256, br),
            _vp8l_read_code(256, br),
            _vp8l_read_code(40, br),
        )
        for _ in range(ngroups)
    ]
    npix = xsize * ysize
    out = [0] * npix
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    meta_w = _vp8l_subsample(xsize, meta_bits) if meta else 0
    pos = 0
    while pos < npix:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            g_idx = (
                meta[(y >> meta_bits) * meta_w + (x >> meta_bits)] >> 8
            ) & 0xFFFF
            cg, cr, cb, ca, cd = groups[g_idx]
        else:
            cg, cr, cb, ca, cd = groups[0]
        s = _vp8l_read_sym(cg, br)
        if s < 256:
            red = _vp8l_read_sym(cr, br)
            blue = _vp8l_read_sym(cb, br)
            alpha = _vp8l_read_sym(ca, br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = _vp8l_prefix_value(s - 256, br)
            dcode = _vp8l_prefix_value(_vp8l_read_sym(cd, br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dcode - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise ValueError("vp8l: backref out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms, xsize


def _vp8l_delta(t: int, c: int) -> int:
    """ColorTransformDelta (RFC 9649 §4.3.2): signed int8 product >> 5."""
    t = t - 256 if t > 127 else t
    c = c - 256 if c > 127 else c
    return (t * c) >> 5


def _vp8l_apply_inverse(argb, transforms, xsize: int, ysize: int):
    """Apply inverse transforms in reverse read order (RFC 9649 §4).

    Palette lookup / unbundling, add-green, and cross-color are
    whole-array numpy (no spatial dependency — cross-color's only
    coupling is the per-block coefficients, expanded by index arrays);
    the spatial predictor stays a scalar loop, inherently sequential in
    x through the reconstructed left neighbor.  ``argb`` is a Python
    list in and out (the entropy loop's native representation)."""
    import numpy as np

    for t in reversed(transforms):
        if t[0] == 3:  # color indexing: palette lookup (+ unbundle)
            _, wb, pal, orig_x = t
            # out-of-range indices decode to 0x00000000 per libwebp:
            # pad the lookup table with zeros
            pal_np = np.zeros(256, dtype=np.uint32)
            pal_np[: len(pal)] = pal
            arr = np.asarray(argb, dtype=np.uint32)
            if wb:
                bpp = 8 >> wb
                mask = (1 << bpp) - 1
                packed_x = _vp8l_subsample(orig_x, wb)
                g = ((arr >> 8) & 0xFF).reshape(ysize, packed_x)
                xs = np.arange(orig_x)
                shifts = ((xs & ((1 << wb) - 1)) * bpp).astype(np.uint32)
                idx = (g[:, xs >> wb] >> shifts[None, :]) & mask
                argb = pal_np[idx].reshape(-1).tolist()
            else:
                argb = pal_np[(arr >> 8) & 0xFF].tolist()
            xsize = orig_x
        elif t[0] == 2:  # add green
            arr = np.asarray(argb, dtype=np.uint32)
            g = (arr >> 8) & 0xFF
            argb = (
                (arr & 0xFF00FF00)
                | ((((arr >> 16) & 0xFF) + g & 0xFF) << 16)
                | ((arr & 0xFF) + g & 0xFF)
            ).tolist()
        elif t[0] == 1:  # cross-color inverse
            _, bits, timg, xsize = t  # width recorded at read time
            tw = _vp8l_subsample(xsize, bits)
            e2d = np.asarray(timg, dtype=np.uint32).reshape(-1, tw)
            ty = np.arange(ysize) >> bits
            tx = np.arange(xsize) >> bits
            e = e2d[ty][:, tx].reshape(-1)  # per-pixel elements

            def s8(v):  # sign-extend a uint8 lane to int32
                return (((v & 0xFF) + 128) % 256 - 128).astype(np.int32)

            arr = np.asarray(argb, dtype=np.uint32)
            g = s8(arr >> 8)
            red = ((arr >> 16) & 0xFF).astype(np.int32) + (
                (s8(e) * g) >> 5
            )  # g2r lives in the element's blue byte
            blue = (arr & 0xFF).astype(np.int32) + ((s8(e >> 8) * g) >> 5)
            blue += (s8(e >> 16) * s8(red)) >> 5
            argb = (
                (arr & 0xFF00FF00)
                | ((red.astype(np.uint32) & 0xFF) << 16)
                | (blue.astype(np.uint32) & 0xFF)
            ).tolist()
        else:  # predictor inverse
            _, bits, timg, xsize = t  # width recorded at read time
            tw = _vp8l_subsample(xsize, bits)
            add = _vp8l_add_pixels
            for y in range(ysize):
                trow = (y >> bits) * tw
                row = y * xsize
                for x in range(xsize):
                    pos = row + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = argb[pos - 1]
                    elif x == 0:
                        pred = argb[pos - xsize]
                    else:
                        mode = (timg[trow + (x >> bits)] >> 8) & 0xFF
                        pred = _vp8l_predict(
                            mode,
                            argb[pos - 1],
                            argb[pos - xsize],
                            argb[pos - xsize - 1],
                            argb[pos - xsize + 1],
                        )
                    argb[pos] = add(argb[pos], pred)
    return argb, xsize


def _vp8l_add_pixels(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | ((a + b) & 0xFF)
    )


def _vp8l_avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) >> 1) << 24)
        | ((((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) >> 1) << 16)
        | ((((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _vp8l_predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """The 14 spatial predictors (RFC 9649 §4.3.1)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(L, TR), T)
    if mode == 6:
        return _vp8l_avg2(L, TL)
    if mode == 7:
        return _vp8l_avg2(L, T)
    if mode == 8:
        return _vp8l_avg2(TL, T)
    if mode == 9:
        return _vp8l_avg2(T, TR)
    if mode == 10:
        return _vp8l_avg2(_vp8l_avg2(L, TL), _vp8l_avg2(T, TR))
    ch = lambda p, i: (p >> i) & 0xFF  # noqa: E731
    if mode == 11:  # Select
        pL = pT = 0
        for i in (24, 16, 8, 0):
            est = ch(L, i) + ch(T, i) - ch(TL, i)
            pL += abs(est - ch(L, i))
            pT += abs(est - ch(T, i))
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        v = 0
        for i in (24, 16, 8, 0):
            c = ch(L, i) + ch(T, i) - ch(TL, i)
            v |= (0 if c < 0 else 255 if c > 255 else c) << i
        return v
    if mode == 13:  # ClampAddSubtractHalf (C truncating division)
        v = 0
        for i in (24, 16, 8, 0):
            a = (ch(L, i) + ch(T, i)) >> 1
            d = a - ch(TL, i)
            half = d // 2 if d >= 0 else -((-d) // 2)
            c = a + half
            v |= (0 if c < 0 else 255 if c > 255 else c) << i
        return v
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _webp_find_vp8l(payload: bytes):
    """Walk the RIFF container for the (first) VP8L chunk — simple
    lossless files, VP8X extended files, and the first ANMF frame of a
    lossless animation.  None when absent (lossy VP8, alpha-only,
    malformed)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    found: list = []

    def on_chunk(tag, b0, b1):
        if tag == b"VP8L":
            found.append(payload[b0:b1])
            return True  # first VP8L wins
        return False

    # ANMF frame data = chunks after the 16-byte ANMF frame header
    _riff_walk(payload, 12, len(payload), on_chunk, recurse={b"ANMF": 16})
    return found[0] if found else None


def _vp8l_decode(payload: bytes, channels: int):
    """Stdlib VP8L (lossless WebP) decode → (w, h, channels, raw
    bytes).  Lossy VP8, malformed containers, and corrupt bitstreams
    return the all-None row — the per-row degrade contract shared by
    every stdlib codec here."""
    import numpy as np

    try:
        data = _webp_find_vp8l(payload)
        if data is None or data[0] != 0x2F:
            return None, None, None, None
        br = _Vp8lBits(data[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha-used hint
        if br.read(3) != 0:  # version must be 0
            return None, None, None, None
        if w * h > (1 << 24):
            # per-pixel Python decode: bound the work a (possibly
            # corrupt) header can demand; >16 MP degrades to NULL like
            # any other out-of-scope payload — ship PIL for those
            return None, None, None, None
        argb, transforms, _ = _vp8l_entropy_image(br, w, h, True)
        argb, _ = _vp8l_apply_inverse(argb, transforms, w, h)
        arr = np.asarray(argb, dtype=np.uint32).reshape(h, w)
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :, 0] = (arr >> 16) & 0xFF
        px[:, :, 1] = (arr >> 8) & 0xFF
        px[:, :, 2] = arr & 0xFF
        if channels == 1:
            px = _rgb_to_luma(px)
        return int(w), int(h), channels, px.tobytes()
    except Exception:
        return None, None, None, None


class _Vp8lBitWriter:
    """LSB-first bit writer (the encoder-side mirror of _Vp8lBits)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        """Prefix codes are read bit-by-bit MSB-first — write likewise."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _vp8l_emit_two_len_code(bw, alphabet: int, short: int, long_: int):
    """Emit a COMPLETE canonical code where symbols 0..n_short-1 get
    ``short``-bit codes and the rest ``long_``-bit codes (kraft == 1 by
    construction: n_short = 2^long - alphabet scaled).  Returns the
    symbol → (code, len) encoder map.  ``short == long_`` emits a
    single-length (identity-style) code."""
    if short == long_:
        n_short = alphabet
    else:
        # completeness: n_short*2^(long-short) + (alphabet-n_short) = 2^long
        n_short = ((1 << long_) - alphabet) // ((1 << (long_ - short)) - 1)
        if not 0 < n_short < alphabet:
            raise ValueError("vp8l_encode: alphabet unsplittable at lengths")
    bw.put(0, 1)  # not a simple code
    used = {short} if short == long_ else {short, long_}
    max_idx = max(_VP8L_CL_ORDER.index(l) for l in used)
    ncodes = max_idx + 1
    if ncodes < 4:
        ncodes = 4
    bw.put(ncodes - 4, 4)
    for i in range(ncodes):
        bw.put(1 if _VP8L_CL_ORDER[i] in used else 0, 3)
    bw.put(0, 1)  # no explicit max-symbol count
    enc = {}
    if short == long_:
        # single-symbol code-length code: zero bits per emitted length
        for s in range(alphabet):
            enc[s] = (s, short)
        return enc
    # code-length code: {short→0, long→1}, one bit per symbol length
    for s in range(alphabet):
        bw.put(0 if s < n_short else 1, 1)
    base_long = n_short << (long_ - short)
    for s in range(alphabet):
        if s < n_short:
            enc[s] = (s, short)
        else:
            enc[s] = (base_long + (s - n_short), long_)
    return enc


def _vp8l_emit_identity8(bw):
    return _vp8l_emit_two_len_code(bw, 256, 8, 8)


# length prefix codes span symbols 256..279 — 24 codes, so the largest
# encodable LZ77 run is (2+1)<<10 + 2^10 = 4096 pixels (RFC 9649
# §5.2.3); longer runs must be SPLIT by the emitter (review finding:
# an unsplit 4900-run emitted symbol 280, which is a color-cache
# reference, silently corrupting the fixture stream)
_VP8L_MAX_LZ77_LEN = 4096


def _vp8l_emit_prefix_value(bw, value: int, enc, sym_base: int,
                            max_codes: int = 40):
    """Emit an LZ77 length/distance value: prefix symbol + extra bits.
    ``max_codes`` bounds the prefix alphabet (24 for lengths, 40 for
    distances) so an out-of-range value fails loudly instead of
    emitting a neighboring alphabet's symbol."""
    if value <= 4:
        c, l = enc[sym_base + value - 1]
        bw.put_code(c, l)
        return
    for code in range(4, max_codes):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            c, l = enc[sym_base + code]
            bw.put_code(c, l)
            bw.put(value - offset - 1, extra)
            return
    raise ValueError(
        f"vp8l_encode: value {value} exceeds the {max_codes}-code "
        "prefix range"
    )


def _vp8l_emit_entropy_image(bw, argb, use_lz77=False, cache_bits=0,
                             level0=False, meta_bits=None, xsize=None,
                             ysize=None):
    """Write one entropy-coded image.  Sub-resolution images carry no
    meta-prefix bit; the level-0 image writes it (0: a single code
    group, or — with ``meta_bits`` — a real meta-prefix image assigning
    TWO code groups in a per-block checkerboard, the branch real
    libwebp output uses routinely; round-8 ADVICE asked for encoder
    coverage).  The two groups use DIFFERENT green code shapes (8/9 vs
    8/10 two-length splits) so a decoder that picks the wrong group
    cannot round-trip.  Fixed complete two-length codes keep the
    encoder tiny; optional run-of-previous-pixel LZ77 and color cache
    exercise the decoder's backref/cache paths."""
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)
    group_of = None
    if level0:
        if meta_bits:
            if cache_bits:
                # the 8/10 split of the cache-widened green alphabet is
                # not Kraft-splittable for most cache sizes — keep the
                # fixture switches orthogonal
                raise ValueError(
                    "vp8l_encode: meta_prefix_bits excludes cache_bits"
                )
            bw.put(1, 1)
            bw.put(meta_bits - 2, 3)
            mw = _vp8l_subsample(xsize, meta_bits)
            mh = _vp8l_subsample(ysize, meta_bits)
            meta_px = [
                0xFF000000 | (((bx + by) & 1) << 8)
                for by in range(mh)
                for bx in range(mw)
            ]
            _vp8l_emit_entropy_image(bw, meta_px)

            def group_of(pos):
                return (
                    meta_px[
                        ((pos // xsize) >> meta_bits) * mw
                        + ((pos % xsize) >> meta_bits)
                    ]
                    >> 8
                ) & 0xFFFF

        else:
            bw.put(0, 1)  # no meta-prefix image: a single code group
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    # the group COUNT is derived from the meta image exactly as the
    # decoder derives it (max referenced index + 1): a meta grid that
    # degenerates to one block must also write one code group, or the
    # streams desync
    ngroups = (
        max((p >> 8) & 0xFFFF for p in meta_px) + 1 if group_of else 1
    )
    groups = []
    for gi in range(ngroups):
        # complete two-length splits for the green alphabet: group 0
        # at max len 9, group 1 at max len 10 (distinct code shapes)
        g_enc = _vp8l_emit_two_len_code(
            bw, green_alpha, 8, 9 if gi == 0 else 10
        )
        r_enc = _vp8l_emit_identity8(bw)
        b_enc = _vp8l_emit_identity8(bw)
        a_enc = _vp8l_emit_identity8(bw)
        if use_lz77:
            d_enc = _vp8l_emit_two_len_code(bw, 40, 5, 6)
        else:  # single-symbol simple code: zero bits read for distance
            bw.put(1, 1)  # simple
            bw.put(0, 1)  # one symbol
            bw.put(0, 1)  # 1-bit symbol
            bw.put(0, 1)  # symbol 0
            d_enc = None
        groups.append((g_enc, r_enc, b_enc, a_enc, d_enc))
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0

    def cache_put(px):
        if cache is not None:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px

    def emit_literal(px, enc5):
        g_enc, r_enc, b_enc, a_enc, _ = enc5
        if cache is not None:
            k = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift
            if cache[k] == px:
                c, l = g_enc[280 + k]
                bw.put_code(c, l)
                return
        g = (px >> 8) & 0xFF
        c, l = g_enc[g]
        bw.put_code(c, l)
        c, l = r_enc[(px >> 16) & 0xFF]
        bw.put_code(c, l)
        c, l = b_enc[px & 0xFF]
        bw.put_code(c, l)
        c, l = a_enc[(px >> 24) & 0xFF]
        bw.put_code(c, l)
        cache_put(px)

    i = 0
    n = len(argb)
    while i < n:
        # the decoder selects the code group at the CURRENT pixel
        # position for every symbol read this iteration
        enc5 = groups[group_of(i)] if group_of else groups[0]
        if use_lz77 and i > 0 and argb[i] == argb[i - 1]:
            run = 1
            while (
                i + run < n
                and run < _VP8L_MAX_LZ77_LEN
                and argb[i + run] == argb[i - 1]
            ):
                run += 1
            if run >= 3:
                _vp8l_emit_prefix_value(
                    bw, run, enc5[0], 256, max_codes=24
                )
                _vp8l_emit_prefix_value(bw, 1 + 120, enc5[4], 0)
                for k in range(run):
                    cache_put(argb[i + k])
                i += run
                continue
        emit_literal(argb[i], enc5)
        i += 1


def vp8l_encode(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    *,
    subtract_green: bool = False,
    predictor_bits: int | None = None,
    cross_color_bits: int | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_prefix_bits: int | None = None,
) -> bytes:
    """Minimal spec-conformant VP8L (lossless WebP) test writer — the
    inverse fixture for :func:`_vp8l_decode`, with switches that force
    each decoder path: subtract-green, spatial prediction (per-block
    modes cycling through all 14), cross-color (per-block elements),
    color indexing (incl. sub-byte bundling for ≤16-color palettes),
    color cache, run-length LZ77 backrefs, and — via
    ``meta_prefix_bits`` — a meta-prefix image with two code groups
    (the multi-group branch real libwebp output exercises routinely).
    ``channels`` is 3 (RGB, alpha=255) or 4 (RGBA)."""
    import numpy as np

    if channels not in (3, 4):
        raise ValueError("vp8l_encode: channels must be 3 or 4")
    if len(pixels) != width * height * channels:
        raise ValueError("vp8l_encode: pixel buffer size mismatch")
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.uint32)
    if channels == 3:
        alpha = np.full((height, width), 255, dtype=np.uint32)
    else:
        alpha = px[:, :, 3]
    argb = list(
        (
            (alpha << 24) | (px[:, :, 0] << 16) | (px[:, :, 1] << 8)
            | px[:, :, 2]
        ).reshape(-1)
    )
    argb = [int(v) for v in argb]
    bw = _Vp8lBitWriter()
    bw.put(0x2F, 8)
    bw.put(width - 1, 14)
    bw.put(height - 1, 14)
    bw.put(1 if channels == 4 else 0, 1)  # alpha hint
    bw.put(0, 3)  # version
    xsize = width
    if palette:
        if subtract_green or cross_color_bits:
            raise ValueError(
                "vp8l_encode: palette excludes color-space transforms"
            )
        # predictor_bits IS allowed after palette: the predictor then
        # operates on the PACKED index image (read-time width), which
        # exercises the decoder's recorded-width inverse path
        uniq = sorted(set(argb))
        if len(uniq) > 256:
            raise ValueError("vp8l_encode: >256 colors cannot be paletted")
        lookup = {v: i for i, v in enumerate(uniq)}
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(len(uniq) - 1, 8)
        diffs = [uniq[0]]
        for i in range(1, len(uniq)):  # component subtraction coding
            a, b = uniq[i], uniq[i - 1]
            diffs.append(
                ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
                | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
                | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
                | (((a - b) & 0xFF))
            )
        _vp8l_emit_entropy_image(bw, diffs)
        n = len(uniq)
        wb = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = [lookup[v] for v in argb]
        if wb:
            bpp = 8 >> wb
            ppb = 1 << wb
            packed_x = _vp8l_subsample(width, wb)
            packed = [0] * (packed_x * height)
            for y in range(height):
                for x in range(width):
                    packed[y * packed_x + (x >> wb)] |= idx[
                        y * width + x
                    ] << ((x & (ppb - 1)) * bpp)
            argb = [0xFF000000 | (g << 8) for g in packed]
            xsize = packed_x
        else:
            argb = [0xFF000000 | (i << 8) for i in idx]
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        argb = [
            (p & 0xFF000000)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (p & 0xFF00)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in argb
        ]
    if cross_color_bits:
        bits = cross_color_bits
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(bits - 2, 3)
        tw = _vp8l_subsample(xsize, bits)
        th = _vp8l_subsample(height, bits)
        # deterministic per-block elements covering ± values
        elems = [
            0xFF000000
            | ((((bx * 37 + by * 11) % 256)) << 16)   # red_to_blue
            | ((((bx * 53 + by * 29) % 256)) << 8)    # green_to_blue
            | (((bx * 17 + by * 7) % 256))            # green_to_red
            for by in range(th)
            for bx in range(tw)
        ]
        _vp8l_emit_entropy_image(bw, elems)
        for y in range(height):
            trow = (y >> bits) * tw
            row = y * xsize
            for x in range(xsize):
                e = elems[trow + (x >> bits)]
                p = argb[row + x]
                g = (p >> 8) & 0xFF
                red = (p >> 16) & 0xFF
                enc_r = (red - _vp8l_delta(e & 0xFF, g)) & 0xFF
                enc_b = (
                    (p & 0xFF)
                    - _vp8l_delta((e >> 8) & 0xFF, g)
                    - _vp8l_delta((e >> 16) & 0xFF, red)
                ) & 0xFF
                argb[row + x] = (
                    (p & 0xFF000000) | (enc_r << 16) | (p & 0xFF00) | enc_b
                )
    if predictor_bits:
        bits = predictor_bits
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(bits - 2, 3)
        tw = _vp8l_subsample(xsize, bits)
        th = _vp8l_subsample(height, bits)
        modes = [
            0xFF000000 | ((((by * tw + bx) % 14)) << 8)
            for by in range(th)
            for bx in range(tw)
        ]
        _vp8l_emit_entropy_image(bw, modes)
        src = list(argb)  # predict from ORIGINAL neighbors
        sub = lambda a, b: (  # noqa: E731 — componentwise mod-256 diff
            ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
            | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
            | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
            | (((a - b) & 0xFF))
        )
        for y in range(height):
            trow = (y >> bits) * tw
            row = y * xsize
            for x in range(xsize):
                pos = row + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = src[pos - 1]
                elif x == 0:
                    pred = src[pos - xsize]
                else:
                    mode = (modes[trow + (x >> bits)] >> 8) & 0xFF
                    pred = _vp8l_predict(
                        mode,
                        src[pos - 1],
                        src[pos - xsize],
                        src[pos - xsize - 1],
                        src[pos - xsize + 1],
                    )
                argb[pos] = sub(src[pos], pred)
    bw.put(0, 1)  # end of the transform list
    _vp8l_emit_entropy_image(
        bw, argb, use_lz77=lz77, cache_bits=cache_bits, level0=True,
        meta_bits=meta_prefix_bits, xsize=xsize, ysize=height,
    )
    stream = bw.done()
    body = b"VP8L" + len(stream).to_bytes(4, "little") + stream
    if len(stream) & 1:
        body += b"\x00"
    riff = b"WEBP" + body
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# --- stdlib WAV audio decode + real features (round 8) -----------------------
# The audio lane gets the same treatment images got: a real stdlib
# decode path behind the fake, per-row degrade on anything else.  WAV
# (RIFF/WAVE) is the one audio container fully decodable with stdlib
# struct parsing — PCM u8/s16/s24/s32 and IEEE float32/64, plus the
# WAVE_FORMAT_EXTENSIBLE wrapper.  FLAC, the lossless compressed
# format, decodes via the stdlib bit parser below (round 9); LOSSY
# audio (MP3/AAC/OGG) stays NULL without worker codecs, visible per
# corpus through audio_format_report-style aggregation of the NULL
# rows.

# analysis cap: bound the per-row FFT work a (possibly huge or corrupt)
# payload can demand — 2^21 samples ≈ 47 s at 44.1 kHz mono
_WAV_ANALYSIS_MAX_SAMPLES = 1 << 21


def _wav_decode(payload: bytes):
    """Stdlib WAV decode → (sample_rate, n_channels, mono float64
    samples in [-1, 1], true_duration_seconds) or None on anything
    malformed/unsupported — the per-row degrade contract.

    Samples are TRUNCATED to the first ``_WAV_ANALYSIS_MAX_SAMPLES``
    mono frames BEFORE any float conversion (review finding: a 2 GB
    payload must not allocate 8 GB of float64 per row), so the
    returned duration — computed from the full data-chunk length —
    is the one to trust for clips longer than the cap."""
    import struct

    import numpy as np

    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"fmt " and len(body) >= 16:
                fmt = body
            elif tag == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if fmt is None or data is None:
            return None
        audio_format, n_ch, sr, _, _, bits = struct.unpack(
            "<HHIIHH", fmt[:16]
        )
        if audio_format == 0xFFFE and len(fmt) >= 26:
            # WAVE_FORMAT_EXTENSIBLE: the real format leads the GUID
            audio_format = int.from_bytes(fmt[24:26], "little")
        if n_ch < 1 or n_ch > 32 or sr < 1:
            return None
        if bits % 8 or not bits:
            return None
        bytes_per_frame = n_ch * bits // 8
        total_frames = len(data) // bytes_per_frame
        duration = total_frames / sr
        # bound the float work BEFORE conversion (review finding)
        data = data[: _WAV_ANALYSIS_MAX_SAMPLES * bytes_per_frame]
        if audio_format == 1:  # integer PCM
            if bits == 8:
                x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                x = (x - 128.0) / 128.0
            elif bits == 16:
                x = np.frombuffer(
                    data[: len(data) & ~1], dtype="<i2"
                ).astype(np.float64) / 32768.0
            elif bits == 24:
                usable = len(data) - len(data) % 3
                raw = np.frombuffer(data[:usable], dtype=np.uint8)
                raw = raw.reshape(-1, 3).astype(np.int64)
                v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
                v = np.where(v >= 1 << 23, v - (1 << 24), v)
                x = v.astype(np.float64) / float(1 << 23)
            elif bits == 32:
                x = np.frombuffer(
                    data[: len(data) & ~3], dtype="<i4"
                ).astype(np.float64) / float(1 << 31)
            else:
                return None
        elif audio_format == 3:  # IEEE float
            if bits == 32:
                x = np.frombuffer(
                    data[: len(data) & ~3], dtype="<f4"
                ).astype(np.float64)
            elif bits == 64:
                x = np.frombuffer(
                    data[: len(data) & ~7], dtype="<f8"
                ).astype(np.float64)
            else:
                return None
        else:
            return None  # compressed formats need worker codecs
        frames = len(x) // n_ch
        if frames == 0:
            return None
        x = x[: frames * n_ch].reshape(frames, n_ch).mean(axis=1)
        return int(sr), int(n_ch), x, float(duration)
    except Exception:
        return None


def wav_encode(
    sample_rate: int,
    samples,
    channels: int = 1,
    fmt: str = "s16",
) -> bytes:
    """Test-side WAV writer (PCM s16/u8/s24 and float32) — the inverse
    fixture for :func:`_wav_decode`.  ``samples`` is a float array in
    [-1, 1], interleaved if ``channels > 1``."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if fmt == "s16":
        audio_format, bits = 1, 16
        data = (
            np.clip(np.round(x * 32768.0), -32768, 32767)
            .astype("<i2").tobytes()
        )
    elif fmt == "u8":
        audio_format, bits = 1, 8
        data = (
            np.clip(np.round(x * 128.0 + 128.0), 0, 255)
            .astype(np.uint8).tobytes()
        )
    elif fmt == "s24":
        audio_format, bits = 1, 24
        v = np.clip(
            np.round(x * float(1 << 23)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
    elif fmt == "f32":
        audio_format, bits = 3, 32
        data = x.astype("<f4").tobytes()
    else:
        raise ValueError(f"wav_encode: unsupported fmt {fmt!r}")
    block_align = channels * bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# --- stdlib FLAC decode (round 9) --------------------------------------------
# FLAC (RFC 9639) is the LOSSLESS member of the compressed-audio NULL
# class — spec-decodable with pure stdlib bit parsing the way VP8L was
# for images (round 8), so it gets the same treatment: a real decoder
# behind the audio seam, an in-repo spec-conformant test writer hitting
# every decoder path, exact round trips, CRC-verified frames, and
# per-row NULL degrade on everything malformed.  Lossy audio (MP3/AAC/
# OGG) still needs worker codecs and stays NULL, report-visible.
# Reference parity anchor: the per-row degrade philosophy of
# /root/reference/bertrand/types/object.py:10-42.


def _flac_crc_tables():
    crc8 = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        crc8.append(c)
    crc16 = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
        crc16.append(c)
    return crc8, crc16


_FLAC_CRC8, _FLAC_CRC16 = _flac_crc_tables()


def _flac_crc8(data) -> int:
    c = 0
    for b in data:
        c = _FLAC_CRC8[c ^ b]
    return c


def _flac_crc16(data) -> int:
    c = 0
    for b in data:
        c = _FLAC_CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _FlacBits:
    """MSB-first bit reader (FLAC's bit order is the opposite of
    VP8L's).  ``pos`` is in BITS; frame fields are byte-aligned at the
    CRC boundaries, so byte spans for CRC checks come from pos >> 3."""

    __slots__ = ("d", "nbits", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > self.nbits:
            raise ValueError("flac: bitstream overrun")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.d[first:last], "big")
        v = (chunk >> ((last << 3) - end)) & ((1 << n) - 1)
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit (Rice quotient)."""
        q = 0
        pos = self.pos
        d = self.d
        nbits = self.nbits
        while True:
            if pos >= nbits:
                raise ValueError("flac: bitstream overrun")
            frag = d[pos >> 3] & ((1 << (8 - (pos & 7))) - 1)
            if frag == 0:
                q += 8 - (pos & 7)
                pos += 8 - (pos & 7)
            else:
                z = (8 - (pos & 7)) - frag.bit_length()
                self.pos = pos + z + 1
                return q + z

    def align(self) -> None:
        if self.pos & 7:
            if self.read(8 - (self.pos & 7)) != 0:
                raise ValueError("flac: nonzero frame padding")

    def read_rice_scalar(self, param: int, count: int) -> list:
        """Scalar Rice decode — the reference implementation the
        windowed path is parity-gated against, and the path for tiny
        partitions where window setup outweighs the win."""
        d = self.d
        nbits = self.nbits
        pos = self.pos
        out = []
        mask = (1 << param) - 1
        for _ in range(count):
            q = 0
            while True:
                if pos >= nbits:
                    raise ValueError("flac: bitstream overrun")
                frag = d[pos >> 3] & ((1 << (8 - (pos & 7))) - 1)
                if frag == 0:
                    q += 8 - (pos & 7)
                    pos += 8 - (pos & 7)
                else:
                    z = (8 - (pos & 7)) - frag.bit_length()
                    q += z
                    pos += z + 1
                    break
            if param:
                end = pos + param
                if end > nbits:
                    raise ValueError("flac: bitstream overrun")
                first = pos >> 3
                last = (end + 7) >> 3
                chunk = int.from_bytes(d[first:last], "big")
                u = (q << param) | (
                    (chunk >> ((last << 3) - end)) & mask
                )
                pos = end
            else:
                u = q
            out.append((u >> 1) ^ -(u & 1))
        self.pos = pos
        return out

    def read_rice(self, param: int, count: int) -> list:
        """Decode ``count`` Rice-coded residuals — the decoder's hot
        loop.  Windowed bit-array decode (round 9): unpack a window of
        the stream to a numpy bit vector once, list the set-bit
        positions, and precompute a 24-bit byte-aligned lookup; then
        walk samples with O(1) Python-list ops — each sample's unary
        terminator is ``ones[ci]`` because the unary span holds no set
        bits, and ``ci`` advances by 1 + popcount(param field) so no
        prefix-count array is needed.  ~1.7× over the scalar loop
        (SCALE.md); exact parity is unit-gated against
        :meth:`read_rice_scalar` on random streams and the whole
        encoder matrix.  Tiny partitions and rice2 params > 14 (the
        5-bit parameter space a foreign stream may use; 24-bit lookups
        can't span them) take the scalar path."""
        import numpy as np

        if count < 64 or param > 14:
            return self.read_rice_scalar(param, count)
        d = self.d
        pos = self.pos
        out = []
        mask = (1 << param) - 1
        # expected bits/sample ≈ 1 (terminator) + param + mean quotient
        need = count * (param + 3) + 64
        while len(out) < count:
            start_byte = pos >> 3
            end_byte = min((pos + need + 7) >> 3, len(d))
            base = start_byte << 3
            arr = np.frombuffer(
                d, np.uint8, count=end_byte - start_byte, offset=start_byte
            )
            win = np.unpackbits(arr)
            wlen = len(win)
            ones = np.flatnonzero(win).tolist()
            nones = len(ones)
            # 24-bit big-endian value starting at each window byte:
            # covers any param ≤ 14 at any bit offset ≤ 7 (zero-padded
            # tail; a read past the true end is caught by the wlen
            # straddle check before the value is used)
            a = np.concatenate(
                [arr.astype(np.int64), np.zeros(2, dtype=np.int64)]
            )
            b24 = ((a[:-2] << 16) | (a[1:-1] << 8) | a[2:]).tolist()
            p = pos - base
            ci = int(win[:p].sum()) if p else 0
            todo = count - len(out)
            append = out.append
            while todo:
                if ci >= nones:
                    break  # no terminator left in the window
                t = ones[ci]
                s = t + 1
                if s + param > wlen:
                    break  # param bits straddle the window edge
                if param:  # param == 0 admits s == wlen: no bits to read
                    val = (b24[s >> 3] >> (24 - (s & 7) - param)) & mask
                else:
                    val = 0
                u = ((t - p) << param) | val
                append((u >> 1) ^ -(u & 1))
                ci += 1 + val.bit_count()
                p = s + param
                todo -= 1
            pos = base + p
            if len(out) < count:
                if end_byte >= len(d):
                    raise ValueError("flac: bitstream overrun")
                need *= 2  # quotients larger than estimated: widen
        self.pos = pos
        return out


def _flac_utf8_num(br) -> int:
    """The frame header's UTF-8-style coded number (RFC 9639 §9.1.1 —
    same prefix scheme as UTF-8, extended to 7 bytes / 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FLAC_SR_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _flac_residual(br, block_size: int, order: int) -> list:
    """Rice-partitioned residual (RFC 9639 §9.2.7): 2-bit method (4- or
    5-bit parameters), 4-bit partition order, per-partition parameter
    with the all-ones escape to raw n-bit samples."""
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if (block_size >> po) << po != block_size:
        raise ValueError("flac: block size not divisible by partitions")
    base = block_size >> po
    out = []
    for p in range(nparts):
        count = base - order if p == 0 else base
        if count < 0:
            raise ValueError("flac: partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            if width == 0:
                out.extend([0] * count)
            else:
                out.extend(br.read_signed(width) for _ in range(count))
        else:
            out.extend(br.read_rice(param, count))
    return out


def _flac_subframe(br, block_size: int, bps: int) -> list:
    """One subframe (RFC 9639 §9.2): CONSTANT / VERBATIM / FIXED 0-4 /
    LPC 1-32, each with optional wasted-bits shift."""
    if br.read(1):
        raise ValueError("flac: bad subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        import numpy as np

        order = ftype & 7
        if order > block_size:
            raise ValueError("flac: predictor order exceeds block")
        out = [br.read_signed(eff) for _ in range(order)]
        res = _flac_residual(br, block_size, order)
        if order == 0:
            out = res
        else:
            # a FIXED residual is the order-th finite difference, so
            # restoration is `order` chained cumulative sums seeded
            # from the warmup's difference pyramid — whole-array numpy
            # instead of a per-sample Python loop.  Every intermediate
            # series of a spec-valid stream is a true difference
            # series of the signal (≤ bps+order+1 bits), far inside
            # int64.
            diffs = [np.array(out, dtype=np.int64)]
            for _ in range(order - 1):
                diffs.append(np.diff(diffs[-1]))
            cur = np.asarray(res, dtype=np.int64)
            for level in range(order, 0, -1):
                cur = np.cumsum(
                    np.concatenate(([diffs[level - 1][0]], cur))
                )
            out = cur.tolist()  # C-path int64 → Python ints
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        if order > block_size:
            raise ValueError("flac: predictor order exceeds block")
        out = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _flac_residual(br, block_size, order)
        for r in res:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[-1 - j]
            out.append(r + (pred >> shift))
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _flac_decode(payload: bytes):
    """Stdlib FLAC decode → the same (sample_rate, n_channels, mono
    float64 in [-1, 1], true_duration_seconds) contract as
    :func:`_wav_decode`, or None on anything malformed — per-row
    degrade, never raise.  Frame header CRC-8 and frame CRC-16 are
    VERIFIED (a corrupt frame degrades the row rather than yielding
    wrong samples); decoding stops at ``_WAV_ANALYSIS_MAX_SAMPLES``
    mono frames while the reported duration comes from STREAMINFO's
    total-samples field (the WAV cap convention)."""
    import numpy as np

    try:
        if len(payload) < 42 or payload[:4] != b"fLaC":
            return None
        pos = 4
        streaminfo = None
        while pos + 4 <= len(payload):  # metadata blocks
            hdr = payload[pos]
            btype = hdr & 0x7F
            size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + size]
            if len(body) != size:
                return None
            if btype == 0:
                streaminfo = body
            pos += 4 + size
            if hdr & 0x80:  # last-metadata-block flag
                break
        else:
            return None
        if streaminfo is None or len(streaminfo) < 34:
            return None
        si = int.from_bytes(streaminfo[10:18], "big")
        sr = (si >> 44) & 0xFFFFF
        n_ch = ((si >> 41) & 0x7) + 1
        bps = ((si >> 36) & 0x1F) + 1
        total = si & 0xFFFFFFFFF
        if sr == 0:
            return None
        br = _FlacBits(payload)
        br.pos = pos * 8
        cap = _WAV_ANALYSIS_MAX_SAMPLES
        chans = [[] for _ in range(n_ch)]
        got = 0
        def decode_frame():
            frame_start = br.pos >> 3
            if br.read(14) != 0x3FFE:
                raise ValueError("flac: lost frame sync")
            br.read(1)  # reserved
            br.read(1)  # blocking strategy
            bs_code = br.read(4)
            sr_code = br.read(4)
            ch_code = br.read(4)
            ss_code = br.read(3)
            if br.read(1):
                raise ValueError("flac: reserved header bit")
            _flac_utf8_num(br)
            if bs_code == 0:
                raise ValueError("flac: reserved block size")
            elif bs_code == 1:
                bs = 192
            elif bs_code <= 5:
                bs = 576 << (bs_code - 2)
            elif bs_code == 6:
                bs = br.read(8) + 1
            elif bs_code == 7:
                bs = br.read(16) + 1
            else:
                bs = 256 << (bs_code - 8)
            if sr_code == 12:
                br.read(8)
            elif sr_code in (13, 14):
                br.read(16)
            elif sr_code == 15:
                raise ValueError("flac: invalid sample rate code")
            fsr = _FLAC_SR_TABLE.get(sr_code, sr)
            if fsr != sr:
                raise ValueError("flac: frame/STREAMINFO rate mismatch")
            fbps = {
                0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32,
            }.get(ss_code)
            if fbps is None or fbps != bps:
                raise ValueError("flac: frame/STREAMINFO bits mismatch")
            hdr_end = br.pos >> 3
            if _flac_crc8(payload[frame_start:hdr_end]) != br.read(8):
                raise ValueError("flac: frame header CRC mismatch")
            if ch_code < 8:
                if ch_code + 1 != n_ch:
                    raise ValueError("flac: channel count mismatch")
                sub = [_flac_subframe(br, bs, bps) for _ in range(n_ch)]
            elif ch_code in (8, 9, 10):
                if n_ch != 2:
                    raise ValueError("flac: stereo assignment, not stereo")
                extra0 = 1 if ch_code == 9 else 0
                extra1 = 1 if ch_code in (8, 10) else 0
                a = _flac_subframe(br, bs, bps + extra0)
                b = _flac_subframe(br, bs, bps + extra1)
                if ch_code == 8:  # left/side
                    sub = [a, [l - s for l, s in zip(a, b)]]
                elif ch_code == 9:  # side/right
                    sub = [[s + r for s, r in zip(a, b)], b]
                else:  # mid/side
                    left, right = [], []
                    for m, s in zip(a, b):
                        t = (m << 1) | (s & 1)
                        left.append((t + s) >> 1)
                        right.append((t - s) >> 1)
                    sub = [left, right]
            else:
                raise ValueError("flac: reserved channel assignment")
            br.align()
            crc_end = br.pos >> 3
            if (
                _flac_crc16(payload[frame_start:crc_end]) != br.read(16)
            ):
                raise ValueError("flac: frame CRC mismatch")
            return sub, bs

        while br.pos + 16 <= br.nbits and got < cap:
            try:
                sub, bs = decode_frame()
            except Exception:
                # once a CRC-verified prefix has decoded, trailing junk
                # (appended tags, concatenation artifacts) or a corrupt
                # tail TRUNCATES the row instead of NULLing it — the
                # stop-at-loss-of-sync convention of reference decoders
                # (round-9 review); a failure before any frame still
                # degrades the whole row
                if got:
                    break
                raise
            for c in range(n_ch):
                chans[c].extend(sub[c])
            got += bs
        if got == 0:
            return None
        x = np.array(chans, dtype=np.float64)[:, :cap]
        x = x.mean(axis=0) / float(1 << (bps - 1))
        duration = (total if total else got) / sr
        return int(sr), int(n_ch), x, float(duration)
    except Exception:
        return None


class _FlacBitWriter:
    """MSB-first bit writer (encoder mirror of :class:`_FlacBits`)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _flac_utf8_encode(bw, n: int) -> None:
    if n < 0x80:
        bw.put(n, 8)
        return
    tail = []
    nbytes = 2
    # an nbytes-byte encoding carries (7 - nbytes) + 6*(nbytes - 1)
    # = 5*nbytes + 1 value bits
    while n >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    # leading byte: nbytes ones, a zero, then the high value bits
    for _ in range(nbytes - 1):
        tail.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | n
    bw.put(lead, 8)
    for b in reversed(tail):
        bw.put(b, 8)


def _flac_rice_param(res) -> int:
    """Smallest-mean Rice parameter (the standard mean-based pick),
    capped below the 4-bit escape."""
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _flac_emit_residual(bw, res, order: int, block_size: int,
                        partition_order: int, rice_escape: bool) -> None:
    # a short LAST frame may not be divisible into the requested
    # partitions (or leave partition 0 shorter than the predictor
    # order) — downgrade to the largest legal order, as real encoders
    # do per frame
    while partition_order and (
        (block_size >> partition_order) << partition_order != block_size
        or (block_size >> partition_order) < order
    ):
        partition_order -= 1
    bw.put(0, 2)  # 4-bit Rice parameters
    bw.put(partition_order, 4)
    nparts = 1 << partition_order
    base = block_size >> partition_order
    at = 0
    for p in range(nparts):
        count = base - order if p == 0 else base
        part = res[at : at + count]
        at += count
        if rice_escape:
            width = max((1 + abs(int(v)).bit_length() for v in part),
                        default=1)
            bw.put(15, 4)
            bw.put(width, 5)
            for v in part:
                bw.put(v & ((1 << width) - 1), width)
        else:
            k = _flac_rice_param(part)
            bw.put(k, 4)
            for v in part:
                u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
                bw.put_unary(u >> k)
                if k:
                    bw.put(u & ((1 << k) - 1), k)


def _flac_emit_subframe(bw, samples, bps: int, mode: str, *,
                        fixed_order: int, lpc_order: int, lpc_shift: int,
                        lpc_precision: int, partition_order: int,
                        rice_escape: bool, wasted_bits: int) -> None:
    bs = len(samples)
    if wasted_bits:
        # effective wasted bits are the trailing zeros THIS channel
        # actually has (round-9 review: the mid channel of mid/side is
        # (l+r)>>1, which halves away one of the quantizer's zeros —
        # the switches must compose, so downgrade instead of raising)
        def _tz(v):
            return wasted_bits if v == 0 else (v & -v).bit_length() - 1

        wasted_bits = min(
            [wasted_bits] + [_tz(v) for v in samples]
        )
    if wasted_bits:
        samples = [v >> wasted_bits for v in samples]
    eff = bps - wasted_bits
    # a last frame shorter than the predictor order cannot carry its
    # warmup — emit it VERBATIM (spec-legal, exact; round-9 review:
    # the truncated warmup silently produced an undecodable stream)
    if mode == "fixed" and fixed_order > bs:
        mode = "verbatim"
    if mode == "lpc" and lpc_order > bs:
        mode = "verbatim"
    if mode == "constant" and any(v != samples[0] for v in samples):
        raise ValueError("flac_encode: constant subframe needs equal samples")
    bw.put(0, 1)  # padding
    if mode == "constant":
        bw.put(0, 6)
    elif mode == "verbatim":
        bw.put(1, 6)
    elif mode == "fixed":
        bw.put(8 | fixed_order, 6)
    elif mode == "lpc":
        bw.put(32 | (lpc_order - 1), 6)
    else:
        raise ValueError(f"flac_encode: unknown subframe mode {mode!r}")
    if wasted_bits:
        bw.put(1, 1)
        bw.put_unary(wasted_bits - 1)
    else:
        bw.put(0, 1)
    if mode == "constant":
        bw.put(samples[0] & ((1 << eff) - 1), eff)
        return
    if mode == "verbatim":
        for v in samples:
            bw.put(v & ((1 << eff) - 1), eff)
        return
    if mode == "fixed":
        order = fixed_order
        for v in samples[:order]:
            bw.put(v & ((1 << eff) - 1), eff)
        res = []
        for i in range(order, bs):
            if order == 0:
                r = samples[i]
            elif order == 1:
                r = samples[i] - samples[i - 1]
            elif order == 2:
                r = samples[i] - 2 * samples[i - 1] + samples[i - 2]
            elif order == 3:
                r = (samples[i] - 3 * samples[i - 1]
                     + 3 * samples[i - 2] - samples[i - 3])
            else:
                r = (samples[i] - 4 * samples[i - 1] + 6 * samples[i - 2]
                     - 4 * samples[i - 3] + samples[i - 4])
            res.append(r)
    else:  # lpc
        order = lpc_order
        # deterministic non-trivial quantized coefficients: a damped
        # weighted average of the last `order` samples
        coefs = [
            ((1 << lpc_shift) * (order - j)) // (order * (j + 2))
            for j in range(order)
        ]
        if any(c >= (1 << (lpc_precision - 1)) for c in coefs):
            raise ValueError("flac_encode: coefficients exceed precision")
        for v in samples[:order]:
            bw.put(v & ((1 << eff) - 1), eff)
        bw.put(lpc_precision - 1, 4)
        bw.put(lpc_shift & 0x1F, 5)
        for c in coefs:
            bw.put(c & ((1 << lpc_precision) - 1), lpc_precision)
        res = []
        for i in range(order, bs):
            pred = sum(
                coefs[j] * samples[i - 1 - j] for j in range(order)
            ) >> lpc_shift
            res.append(samples[i] - pred)
    _flac_emit_residual(bw, res, order, bs, partition_order, rice_escape)


def flac_encode(
    sample_rate: int,
    samples,
    channels: int = 1,
    bits: int = 16,
    block_size: int = 4096,
    *,
    subframe: str = "fixed",
    fixed_order: int = 2,
    lpc_order: int = 2,
    lpc_shift: int = 5,
    lpc_precision: int = 12,
    stereo_mode: str = "independent",
    partition_order: int = 0,
    rice_escape: bool = False,
    wasted_bits: int = 0,
) -> bytes:
    """Test-side spec-conformant FLAC writer — the inverse fixture for
    :func:`_flac_decode`, with switches forcing each decoder path:
    CONSTANT/VERBATIM/FIXED(0-4)/LPC subframes, Rice partitions and the
    raw-bits escape, wasted-bits shifts, and the three stereo
    decorrelation modes.  ``samples`` is a float array in [-1, 1],
    interleaved when ``channels == 2``; quantized to ``bits`` exactly
    like :func:`wav_encode` so WAV/FLAC fixtures of the same signal
    decode to identical integers."""
    import numpy as np

    if channels not in (1, 2):
        raise ValueError("flac_encode: channels must be 1 or 2")
    if bits not in (8, 16, 24):
        raise ValueError("flac_encode: bits must be 8, 16 or 24")
    if channels == 1 and stereo_mode != "independent":
        raise ValueError("flac_encode: stereo_mode requires channels=2")
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    half = 1 << (bits - 1)
    ints = np.clip(np.round(x * half), -half, half - 1).astype(np.int64)
    if wasted_bits:
        ints = ints & ~((1 << wasted_bits) - 1)
    frames = len(ints) // channels
    ints = ints[: frames * channels].reshape(frames, channels)
    out = bytearray(b"fLaC")
    si = bytearray(34)
    last_bs = frames % block_size or block_size
    si[0:2] = min(block_size, last_bs).to_bytes(2, "big")
    si[2:4] = block_size.to_bytes(2, "big")
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bits - 1) << 36) | frames
    si[10:18] = packed.to_bytes(8, "big")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    sub_kwargs = dict(
        fixed_order=fixed_order, lpc_order=lpc_order, lpc_shift=lpc_shift,
        lpc_precision=lpc_precision, partition_order=partition_order,
        rice_escape=rice_escape, wasted_bits=wasted_bits,
    )
    ss_code = {8: 1, 16: 4, 24: 6}[bits]
    for fi in range(0, frames, block_size):
        blk = ints[fi : fi + block_size]
        bs = len(blk)
        bw = _FlacBitWriter()
        bw.put(0x3FFE, 14)
        bw.put(0, 1)
        bw.put(0, 1)  # fixed blocking: coded number = frame index
        bw.put(7, 4)  # block size: 16-bit field at header end
        bw.put(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode != "independent":
            bw.put(
                {"left_side": 8, "right_side": 9, "mid_side": 10}[
                    stereo_mode
                ],
                4,
            )
        else:
            bw.put(channels - 1, 4)
        bw.put(ss_code, 3)
        bw.put(0, 1)
        _flac_utf8_encode(bw, fi // block_size)
        bw.put(bs - 1, 16)
        bw.align()
        header = bytes(bw.buf)
        bw.put(_flac_crc8(header), 8)
        if channels == 1:
            _flac_emit_subframe(
                bw, [int(v) for v in blk[:, 0]], bits, subframe,
                **sub_kwargs,
            )
        else:
            l = [int(v) for v in blk[:, 0]]
            r = [int(v) for v in blk[:, 1]]
            if stereo_mode == "independent":
                _flac_emit_subframe(bw, l, bits, subframe, **sub_kwargs)
                _flac_emit_subframe(bw, r, bits, subframe, **sub_kwargs)
            elif stereo_mode == "left_side":
                side = [a - b for a, b in zip(l, r)]
                _flac_emit_subframe(bw, l, bits, subframe, **sub_kwargs)
                _flac_emit_subframe(
                    bw, side, bits + 1, subframe, **sub_kwargs
                )
            elif stereo_mode == "right_side":
                side = [a - b for a, b in zip(l, r)]
                _flac_emit_subframe(
                    bw, side, bits + 1, subframe, **sub_kwargs
                )
                _flac_emit_subframe(bw, r, bits, subframe, **sub_kwargs)
            else:  # mid_side
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                side = [a - b for a, b in zip(l, r)]
                _flac_emit_subframe(bw, mid, bits, subframe, **sub_kwargs)
                _flac_emit_subframe(
                    bw, side, bits + 1, subframe, **sub_kwargs
                )
        bw.align()
        body = bytes(bw.buf)
        bw.put(_flac_crc16(body), 16)
        out += bw.done()
    return bytes(out)


def _mpeg12_after_id3(p: bytes) -> bool:
    """True when an ID3v2-tagged payload's first post-tag MPEG sync
    carries Layer I/II bits — the second sniff blind spot behind a
    variable-length tag (round-10 review found ADTS; Layer I/II is
    the same shape).  Bounded: scans at most 4 KiB past the tag."""
    if p[:3] != b"ID3" or len(p) < 10:
        return False
    size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
        | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
    pos = 10 + size
    end = min(len(p) - 1, pos + 4096)
    while pos < end:
        pos = p.find(b"\xff", pos, end)
        if pos < 0:
            return False
        b1 = p[pos + 1]
        if (b1 & 0xE0) == 0xE0:
            # layer bits 11 (Layer I) or 10 (Layer II); 01 is Layer
            # III (decodable), 00 is ADTS/reserved (handled upstream)
            return (b1 & 0x06) in (0x04, 0x06)
        pos += 1
    return False


def _mp3_gated_decode(payload: bytes):
    """THE gated MP3 decode (single implementation — _mp3_decode and
    _mp3_features_or_status both route here): returns
    (:func:`_wav_decode`-shaped tuple or None, status).  Round 10:
    :func:`bertrand_spark.pipeline.mp3dec.decode` under its
    full-coverage contract — PCM is returned ONLY when every granule
    decoded with exact bit accounting over validated Huffman tables
    (mp3dec module docstring has the evidence-grade discussion); any
    gated or failed granule aborts early (``stop_on_fail``), so the
    per-row cost of an out-of-table-set MP3 is bounded by its first
    loud granule.  Statuses: 'decoded' / 'decode-partial' (coverage
    gap, distinct from corruption) / 'decode-failed' — plus
    'skipped-lossy' for the one sniff blind spot the round-10 review
    found: an ID3v2-tagged ADTS AAC payload classifies as mp3 (the
    native sniff cannot skip a variable-length tag), but after the
    failed frame walk the ADTS sync after the tag identifies it, and
    it must count as routed-around, not corrupt."""
    from .mp3dec import decode as _mp3_full_decode

    try:
        d = _mp3_full_decode(
            payload, max_samples=_WAV_ANALYSIS_MAX_SAMPLES,
            stop_on_fail=True,
        )
    except Exception:
        return None, "decode-failed"
    if d is None or not d["n_granules"]:
        if _adts_meta(payload) is not None:
            return None, "skipped-lossy"
        if _mpeg12_after_id3(payload):
            # ID3-tagged Layer I/II (bare Layer I/II never enters:
            # the sniff keys lossy-decodable on Layer III) — real
            # audio with no decoder, routed-around, not corrupt
            return None, "skipped-lossy"
        return None, "decode-failed"
    if d["coverage"] < 1.0:
        return None, "decode-partial"
    return (
        (d["sample_rate"], d["n_channels"], d["samples"],
         d["duration_s"]),
        "decoded",
    )


def _mp3_decode(payload: bytes):
    """Tuple-contract adapter over :func:`_mp3_gated_decode` for the
    :func:`_audio_decode` chain."""
    return _mp3_gated_decode(payload)[0]


def _audio_decode(payload: bytes):
    """Route one payload through the stdlib audio decoders: WAV first
    (cheap RIFF magic check), then FLAC, then gated MP3 (round 10;
    routed via the one centralized sniff, _audio_container_class —
    round-10 review deduplicated the inline magic test).  Same return
    contract as :func:`_wav_decode`; None for undecodable/corrupt
    payloads."""
    dec = _wav_decode(payload)
    if dec is None:
        dec = _flac_decode(payload)
    if dec is None and _audio_container_class(payload)[0] == "mp3":
        dec = _mp3_decode(payload)
    return dec


def _audio_container_class(p) -> tuple:
    """(container, codec_class) magic-byte sniff — the Python twin of
    :func:`audio_format_report`'s native-expression sniff (kept in
    exact agreement; the round-10 unit pins the parity).  This is the
    probe-as-skip-list the decode pass runs FIRST (SCALE.md's round-9
    conclusion): known-lossy and unknown containers never enter
    :func:`_audio_decode`, so decode cost tracks decodable bytes, not
    corpus bytes."""
    if not p:
        return None, "unknown"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav", "lossless-decodable"
    if p[:4] == b"fLaC":
        return "flac", "lossless-decodable"
    if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xF6) == 0xF0:
        # ADTS AAC: syncword 0xFFF + layer bits 00 — checked BEFORE
        # the mp3 sync (whose Layer III second bytes are disjoint:
        # layer bits 01 -> p[1] & 0x06 == 0x02)
        return "aac", "lossy-no-decoder"
    if p[:3] == b"ID3" or (
        len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE6) == 0xE2
    ):
        # Layer III only (sync 0xFFE + layer bits 01) — round-10
        # review: the looser 0xE0 mask also matched Layer I/II and
        # the reserved layer, which would enter the Layer-III-only
        # gated decoder, pay its 64 KiB resync scan, and come back
        # 'decode-failed' (a corruption verdict) instead of being
        # routed around.  ID3-tagged payloads stay here (the native
        # sniff cannot skip a variable-length tag — parity); the
        # gated decode unmasks post-tag ADTS/Layer-I/II as
        # 'skipped-lossy'.  Decode is ATTEMPTED (round 10,
        # full-coverage contract), not skipped.
        return "mp3", "lossy-decodable"
    if len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0:
        # MPEG audio sync with Layer I/II/reserved bits: real audio,
        # no decoder here — the routed-around skip class, same as
        # AAC/OGG/M4A
        return "mpeg-audio", "lossy-no-decoder"
    if p[:4] == b"OggS":
        return "ogg", "lossy-no-decoder"
    if p[4:8] == b"ftyp":
        return "m4a", "lossy-no-decoder"
    return None, "unknown"


def _wav_meta(p: bytes):
    """RIFF/WAVE fmt+data struct read → (duration_s, rate, channels,
    bits) without decoding samples."""
    import struct

    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(p):
        tag = p[pos : pos + 4]
        size = int.from_bytes(p[pos + 4 : pos + 8], "little")
        if tag == b"fmt " and pos + 8 + 16 <= len(p):
            fmt = p[pos + 8 : pos + 8 + 16]
        elif tag == b"data":
            data_len = min(size, len(p) - pos - 8)
        pos += 8 + size + (size & 1)
    if fmt is None:
        return None
    _, n_ch, sr, _, block_align, bits = struct.unpack("<HHIIHH", fmt)
    if not sr or not n_ch or not block_align:
        return None
    dur = (data_len / block_align / sr) if data_len else None
    return dur, sr, n_ch, bits


def _flac_meta(p: bytes):
    """STREAMINFO struct read → (duration_s, rate, channels, bits)."""
    if len(p) < 42 or p[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(p):
        hdr = p[pos]
        size = int.from_bytes(p[pos + 1 : pos + 4], "big")
        if (hdr & 0x7F) == 0 and size >= 34:
            if pos + 4 + size > len(p):  # block body truncated mid-payload
                return None
            si = int.from_bytes(p[pos + 14 : pos + 22], "big")
            sr = (si >> 44) & 0xFFFFF
            n_ch = ((si >> 41) & 0x7) + 1
            bits = ((si >> 36) & 0x1F) + 1
            total = si & 0xFFFFFFFFF
            if not sr:
                return None
            return (total / sr if total else None), sr, n_ch, bits
        pos += 4 + size
        if hdr & 0x80:
            break
    return None


# MPEG1 Layer III bitrate (kbps) and sample-rate tables (public spec)
_MP3_BITRATES = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0,
)
_MP3_RATES = (44100, 48000, 32000, 0)


def _mp3_meta(p: bytes):
    """First-frame header read → (duration_estimate_s, rate, channels,
    None).  Skips a leading ID3v2 tag (syncsafe size); the duration is
    the CBR estimate payload_bytes * 8 / bitrate — the triage-grade
    number (VBR files need a full frame walk a probe doesn't do)."""
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        size = (
            (p[6] & 0x7F) << 21 | (p[7] & 0x7F) << 14
            | (p[8] & 0x7F) << 7 | (p[9] & 0x7F)
        )
        pos = 10 + size
    if pos + 4 > len(p):
        return None
    h = int.from_bytes(p[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3
    layer = (h >> 17) & 3
    if version != 3 or layer != 1:  # MPEG1 Layer III only (the crawl bulk)
        return None
    bitrate = _MP3_BITRATES[(h >> 12) & 0xF] * 1000
    rate = _MP3_RATES[(h >> 10) & 3]
    if not bitrate or not rate:
        return None
    mode = (h >> 6) & 3
    n_ch = 1 if mode == 3 else 2
    dur = (len(p) - pos) * 8.0 / bitrate
    return dur, rate, n_ch, None


# MPEG Layer I/II bitrate tables, kbit/s (ISO 11172-3 / 13818-3):
# [version-family][layer] — index 0 is the free-format sentinel
_MPEG12_BITRATES = {
    # MPEG-1
    (3, 3): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),           # Layer I
    (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),                # Layer II
    # MPEG-2 / 2.5 (LSF)
    (2, 3): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),                # Layer I
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),                     # Layer II
}
_MPEG_RATES_BY_VERSION = {
    3: (44100, 48000, 32000),          # MPEG-1
    2: (22050, 24000, 16000),          # MPEG-2
    0: (11025, 12000, 8000),           # MPEG-2.5
}


def _mpeg12_meta(p: bytes):
    """Exact MPEG Layer I/II metadata via frame walk → (duration_s,
    rate, channels, None), or None.  The 'mpeg-audio' sniff class
    (round 11) gets the same exact-triage treatment as every other
    container: each header determines its own frame length (Layer I:
    (12*bitrate/rate + pad)*4 bytes, 384 samples; Layer II:
    144*bitrate/rate + pad, 1152 samples), so the walk is one struct
    read per frame.  Headers must stay consistent on layer/rate/
    channels; a mismatch or truncated tail ends the walk.  Skips a
    leading ID3v2 tag."""
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        size = (
            (p[6] & 0x7F) << 21 | (p[7] & 0x7F) << 14
            | (p[8] & 0x7F) << 7 | (p[9] & 0x7F)
        )
        pos = 10 + size
    n_frames = 0
    rate = n_ch = spf = None
    layer0 = None
    while pos + 4 <= len(p):
        h = int.from_bytes(p[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if layer not in (2, 3) or version == 1:
            break  # Layer III / reserved: not this probe's stream
        fam = 3 if version == 3 else 2
        br_tab = _MPEG12_BITRATES[(fam, layer)]
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            break  # free-format/bad bitrate or reserved rate
        bitrate = br_tab[br_idx] * 1000
        r = _MPEG_RATES_BY_VERSION[version][sr_idx]
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        c = 1 if mode == 3 else 2
        if layer == 3:  # Layer I
            flen = (12 * bitrate // r + pad) * 4
            s = 384
        else:           # Layer II
            flen = 144 * bitrate // r + pad
            s = 1152
        if flen <= 4 or pos + flen > len(p):
            break
        if rate is None:
            rate, n_ch, spf, layer0 = r, c, s, layer
        elif r != rate or c != n_ch or layer != layer0:
            break
        n_frames += 1
        pos += flen
    if n_frames < 2 or not rate:
        return None
    return n_frames * spf / rate, rate, n_ch, None


_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000,
               22050, 16000, 12000, 11025, 8000, 7350)


def _adts_meta(p: bytes):
    """Exact ADTS (AAC) metadata via frame walk → (duration_s, rate,
    channels, None), or None.  Each ADTS header carries an explicit
    13-bit frame_length, so the walk is one struct read per frame
    (the same crawl-triage shape as the round-10 MP3 probe); every
    frame contributes 1024 PCM samples per channel.  Headers must
    stay consistent on rate/channel config; a mid-stream mismatch
    ends the walk (truncated tails and trailing garbage are normal
    in crawls)."""
    pos = 0
    if p[:3] == b"ID3" and len(p) >= 10:
        size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
            | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        pos = 10 + size
    n_frames = 0
    rate = channels = None
    while pos + 7 <= len(p):
        if not (p[pos] == 0xFF and (p[pos + 1] & 0xF6) == 0xF0):
            break
        sr_idx = (p[pos + 2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_RATES):
            break
        ch_cfg = ((p[pos + 2] & 1) << 2) | (p[pos + 3] >> 6)
        flen = ((p[pos + 3] & 3) << 11) | (p[pos + 4] << 3) \
            | (p[pos + 5] >> 5)
        if flen < 7 or pos + flen > len(p):
            break
        r = _ADTS_RATES[sr_idx]
        # channel_configuration 7 means 8 channels (7.1) — ISO
        # 14496-3 table 1.19 (round-10 review); 0 means "in-band
        # PCE", unknown here
        c = 8 if ch_cfg == 7 else (ch_cfg or None)
        if rate is None:
            rate, channels = r, c
        elif r != rate or c != channels:
            break
        n_frames += 1
        pos += flen
    if not n_frames or not rate:
        return None
    return n_frames * 1024 / rate, rate, channels, None


def _m4a_meta(p: bytes):
    """M4A/MP4 audio metadata via ISO-BMFF box walk → (duration_s,
    rate, channels, None), or None.  Duration comes from mvhd (the
    same read :func:`_mp4_probe` does); rate/channels from the first
    mp4a/alac/ac-3 AudioSampleEntry under stsd (channelcount at
    entry+24, samplerate 16.16 fixed at entry+32 — ISO 14496-12
    12.2.3)."""
    probe = _mp4_probe(p)
    if probe is None:
        return None
    duration = probe[0]
    rate = channels = None

    def boxes(pos, end):
        while pos + 8 <= end:
            size = int.from_bytes(p[pos:pos + 4], "big")
            tag = p[pos + 4:pos + 8]
            hdr = 8
            if size == 1 and pos + 16 <= end:
                size = int.from_bytes(p[pos + 8:pos + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield tag, pos + hdr, pos + size
            pos += size

    def walk(pos, end, depth=0):
        nonlocal rate, channels
        if depth > 8 or rate is not None:
            return
        for tag, b0, b1 in boxes(pos, end):
            if tag == b"stsd" and b1 - b0 >= 8 + 36:
                entry = b0 + 8  # fullbox(4) + entry_count(4)
                fourcc = p[entry + 4:entry + 8]
                if fourcc in (b"mp4a", b"alac", b"ac-3", b"ec-3",
                              b"samr", b"Opus", b"fLaC"):
                    ch = int.from_bytes(p[entry + 24:entry + 26],
                                        "big")
                    sr = int.from_bytes(p[entry + 32:entry + 36],
                                        "big") >> 16
                    if 0 < ch <= 32:
                        channels = ch
                    if 0 < sr <= 768000:
                        rate = sr
            elif tag in (b"moov", b"trak", b"mdia", b"minf",
                         b"stbl"):
                walk(b0, b1, depth + 1)

    try:
        walk(0, len(p))
    except Exception:
        pass
    if duration is None and rate is None:
        return None
    return duration, rate, channels, None



def _ogg_meta(p: bytes):
    """Ogg page-0 id-header read (Vorbis or Opus) → (duration_s, rate,
    channels, None).  Duration comes from the LAST page's granule
    position (total PCM samples at the stream's rate for Vorbis; 48 kHz
    ticks for Opus) — an rfind + struct read, no packet decode."""
    if len(p) < 28 or p[:4] != b"OggS":
        return None
    seg_count = p[26]
    body = 27 + seg_count
    rate = n_ch = None
    gran_rate = None
    if p[body : body + 7] == b"\x01vorbis" and body + 16 <= len(p):
        n_ch = p[body + 11]
        rate = int.from_bytes(p[body + 12 : body + 16], "little")
        gran_rate = rate
    elif p[body : body + 8] == b"OpusHead" and body + 16 <= len(p):
        n_ch = p[body + 9]
        rate = int.from_bytes(p[body + 12 : body + 16], "little") or 48000
        gran_rate = 48000  # Opus granules are 48 kHz ticks by spec
    else:
        return None
    if not rate or not n_ch:
        return None
    dur = None
    # 'OggS' can occur inside packet payload bytes; only trust a
    # candidate whose page header validates (version byte 0, header-type
    # flags within the 3 defined bits) — scan earlier candidates until
    # one does.
    last = p.rfind(b"OggS")
    while last > 0:
        if last + 27 <= len(p) and p[last + 4] == 0 and p[last + 5] <= 7:
            granule = int.from_bytes(
                p[last + 6 : last + 14], "little", signed=True
            )
            if granule > 0:
                dur = granule / gran_rate
            break
        last = p.rfind(b"OggS", 0, last)
    return dur, rate, n_ch, None


_AUDIO_META_SCHEMA = st.StructType([
    st.StructField("media_id", st.LongType()),
    st.StructField("container", st.StringType()),
    st.StructField("duration_s", st.DoubleType()),
    st.StructField("sample_rate", st.IntegerType()),
    st.StructField("n_channels", st.IntegerType()),
    st.StructField("bits_per_sample", st.IntegerType()),
])


def probe_audio_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Container-level AUDIO metadata without decoding — the audio twin
    of :func:`probe_video_metadata` and the triage a 100 TB crawl runs
    before spending decode cycles: WAV fmt-chunk read, FLAC STREAMINFO
    read, MP3 exact frame walk (round 10: VBR-correct duration via
    mp3dec.parse_stream's probe mode; first-frame CBR estimate as the
    <2-frame fallback), ADTS AAC exact frame walk (round 10), M4A/MP4
    mvhd duration + mp4a sample entry (round 10), and Ogg Vorbis/Opus
    id-header + last-page granule.  One Arrow pass, struct reads
    only; rows no probe understands degrade to a NULL-container
    row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p) if p is not None else b""
                got = None
                try:
                    if p[:4] == b"RIFF":
                        m = _wav_meta(p)
                        if m is not None:
                            got = ("wav", *m)
                    elif p[:4] == b"fLaC":
                        m = _flac_meta(p)
                        if m is not None:
                            got = ("flac", *m)
                    elif p[:4] == b"OggS":
                        m = _ogg_meta(p)
                        if m is not None:
                            got = ("ogg", *m)
                    elif len(p) >= 2 and p[0] == 0xFF and (
                        p[1] & 0xF6
                    ) == 0xF0:
                        # ADTS AAC (round 10): exact frame walk —
                        # disjoint from the mp3 sync (layer bits 00)
                        m = _adts_meta(p)
                        if m is not None:
                            got = ("aac", *m)
                    elif (
                        len(p) >= 2 and p[0] == 0xFF
                        and (p[1] & 0xE0) == 0xE0
                        and (p[1] & 0x06) in (0x04, 0x06)
                    ):
                        # MPEG Layer I/II (round 11): exact frame
                        # walk for the 'mpeg-audio' sniff class
                        m = _mpeg12_meta(p)
                        if m is not None:
                            got = ("mpeg-audio", *m)
                    elif p[4:8] == b"ftyp":
                        # M4A/MP4 audio (round 10): mvhd duration +
                        # mp4a sample-entry rate/channels
                        m = _m4a_meta(p)
                        if m is not None:
                            got = ("m4a", *m)
                    else:
                        # round 10: exact MP3 duration at the cheapest
                        # evidence level — O(1) Xing/VBRI tag when
                        # present, header walk otherwise; the round-9
                        # first-frame CBR estimate stays as the
                        # single-frame / truncated-tail fallback
                        from .mp3dec import probe_info as _mp3_probe2

                        info = _mp3_probe2(p)
                        if info is not None:
                            got = ("mp3", info["duration_s"],
                                   info["sample_rate"],
                                   info["n_channels"], None)
                        else:
                            m = _mp3_meta(p)
                            if m is not None:
                                got = ("mp3", *m)
                            else:
                                # ID3v2-tagged ADTS AAC: the walk
                                # found no MP3 frames but the ADTS
                                # sync sits right after the tag
                                # (round-10 review)
                                m = _adts_meta(p)
                                if m is not None:
                                    got = ("aac", *m)
                                else:
                                    # ...same blind spot for
                                    # ID3-tagged Layer I/II (round 11)
                                    m = _mpeg12_meta(p)
                                    if m is not None:
                                        got = ("mpeg-audio", *m)
                except Exception:
                    got = None  # per-row degrade, never a task death
                if got is None:
                    rows.append((mid, None, None, None, None, None))
                else:
                    c, dur, sr, n_ch, bits = got
                    rows.append((
                        mid, c,
                        float(dur) if dur is not None else None,
                        int(sr) if sr else None,
                        int(n_ch) if n_ch else None,
                        int(bits) if bits else None,
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_META_SCHEMA]
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, _AUDIO_META_SCHEMA
    )


def audio_format_report(
    df: DataFrame,
    features: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-container audio decode outcomes — the audio twin of
    :func:`decode_format_report`: makes the stdlib audio seam's NULL
    classes operationally VISIBLE per corpus instead of warn-only.

    ``df`` is the payload table fed to :func:`extract_audio_features`;
    ``features`` its output.  One row per sniffed container
    (magic-byte sniff, native expressions, no decode) with
    (sniffed_format, codec_class, n_total, n_decoded, n_null):

    - ``wav``/``flac`` → ``lossless-decodable`` (rounds 8/9 stdlib
      decoders; a non-zero n_null here means corrupt payloads or —
      for wav — a compressed codec inside the RIFF wrapper);
    - ``mp3`` → ``lossy-decodable`` (round 10: the gated mp3dec
      decoder — n_decoded counts full-coverage decodes; NULLs here
      are coverage gaps or corruption, split per-row by
      ``decode_status`` 'decode-partial' vs 'decode-failed');
    - ``ogg``/``m4a``/``mpeg-audio`` (Layer I/II sync) →
      ``lossy-no-decoder`` (expected n_null == n_total without worker
      codecs — the documented degrade class);
    - anything else → ``unknown``.
    """
    head4 = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, 4))
    head3 = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, 3))
    head2 = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, 2))
    wave = F.hex(F.substring(F.col(payload_col).cast("binary"), 9, 4))
    ftyp = F.hex(F.substring(F.col(payload_col).cast("binary"), 5, 4))
    fmt = (
        F.when((head4 == "52494646") & (wave == "57415645"), "wav")
        .when(head4 == "664C6143", "flac")
        # ADTS AAC before the mp3 sync: 0xFFF + layer bits 00
        .when(head2.isin("FFF0", "FFF1", "FFF8", "FFF9"), "aac")
        # Layer III only ((p[1] & 0xE6) == 0xE2 — the 8 second-byte
        # values below); other sync words are Layer I/II/reserved and
        # have no decoder (round-10 review)
        .when(
            (head3 == "494433")
            | head2.isin("FFE2", "FFE3", "FFEA", "FFEB",
                         "FFF2", "FFF3", "FFFA", "FFFB"),
            "mp3",
        )
        .when(
            head2.startswith("FFF") | head2.startswith("FFE"),
            "mpeg-audio",
        )
        .when(head4 == "4F676753", "ogg")
        .when(ftyp == "66747970", "m4a")  # ISO-BMFF ftyp (M4A/MP4 audio)
        .otherwise("unknown")
    )
    klass = (
        F.when(fmt.isin("wav", "flac"), "lossless-decodable")
        .when(fmt == "mp3", "lossy-decodable")
        .when(fmt.isin("aac", "ogg", "m4a", "mpeg-audio"),
              "lossy-no-decoder")
        .otherwise("unknown")
    )
    sniffed = df.select(
        F.col(id_col), fmt.alias("sniffed_format"),
        klass.alias("codec_class"),
    )
    # extract_audio_features emits its id as 'media_id' regardless of
    # the input id_col (fixed output schema) — re-alias so a custom
    # id_col joins (round-9 review; decode_format_report's convention)
    ok = features.select(
        F.col("media_id").alias(id_col),
        F.col("features").isNotNull().alias("__ok"),
    )
    return (
        sniffed.join(ok, id_col, "left")
        .groupBy("sniffed_format", "codec_class")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("__ok"), 1).otherwise(0)).alias("n_decoded"),
            F.sum(F.when(F.col("__ok"), 0).otherwise(1)).alias("n_null"),
        )
        .orderBy("sniffed_format")
    )


def _wav_features(sr: int, x, n_features: int, duration: float = None):
    """Deterministic numpy feature vector over mono samples: [duration
    seconds, RMS, zero-crossing rate, spectral centroid Hz, 85%%
    rolloff Hz, spectral bandwidth Hz, then ``n_features - 6``
    log-band energies over log-spaced bands 20 Hz..sr/2], truncated to
    exactly ``n_features`` values (review finding: n_features < 6 must
    honor the requested width like the fake mode does).  Analysis is
    capped at the first 2^21 samples (bounded per-row work); pass the
    decoder's ``duration`` so clips beyond the cap report their TRUE
    length (review finding) — it defaults to the analyzed span."""
    import numpy as np

    x = x[:_WAV_ANALYSIS_MAX_SAMPLES]
    n = len(x)
    if duration is None:
        duration = n / sr
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    tot = float(mag.sum())
    if tot > 0:
        centroid = float((freqs * mag).sum() / tot)
        cum = np.cumsum(mag)
        # searchsorted can return len(cum) when 0.85*tot exceeds the
        # last partial sum under extreme float rounding — clamp so the
        # index never walks off the end (round-8 ADVICE)
        idx = min(int(np.searchsorted(cum, 0.85 * tot)), len(freqs) - 1)
        rolloff = float(freqs[idx])
        bandwidth = float(
            np.sqrt(((freqs - centroid) ** 2 * mag).sum() / tot)
        )
    else:
        centroid = rolloff = bandwidth = 0.0
    n_bands = max(0, n_features - 6)
    bands = []
    if n_bands:
        edges = np.geomspace(20.0, sr / 2.0, n_bands + 1)
        power = mag * mag
        for i in range(n_bands):
            sel = (freqs >= edges[i]) & (freqs < edges[i + 1])
            bands.append(float(np.log1p(power[sel].sum())))
    return ([duration, rms, zcr, centroid, rolloff, bandwidth] + bands)[
        :n_features
    ]


# --- stdlib video: container probe + MJPEG-AVI frame sampling (round 8) ------
# Video gets the image treatment where stdlib can genuinely go: (a) a
# container METADATA probe (MP4/ISO-BMFF box walk + AVI header parse —
# pure struct reads, no decode) and (b) a REAL frame-sampling path for
# Motion-JPEG AVI, where each '00dc' chunk is a JPEG the round-7 stdlib
# decoder already handles.  Inter-coded video (H.264/VP9/AV1) stays
# NULL without worker codecs — per-row degrade, visible in the probe's
# codec column.


def _mp4_probe(payload: bytes):
    """ISO-BMFF box walk → (duration_s, width, height, n_tracks,
    codec fourccs) from mvhd/tkhd/stsd.  None on malformed input."""
    import struct

    def boxes(buf, pos, end):
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            tag = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1 and pos + 16 <= end:
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield tag, pos + hdr, pos + size
            pos += size

    try:
        duration = None
        n_tracks = 0
        width = height = None
        codecs = []

        def walk(pos, end, depth=0):
            nonlocal duration, n_tracks, width, height
            if depth > 8:
                return
            for tag, b0, b1 in boxes(payload, pos, end):
                if tag == b"mvhd" and b1 - b0 >= 20:
                    ver = payload[b0]
                    if ver == 1:
                        if b1 - b0 < 32:  # duration ends at b0+32
                            continue  # truncated v1 box: degrade
                        ts = int.from_bytes(payload[b0 + 20 : b0 + 24], "big")
                        dur = int.from_bytes(payload[b0 + 24 : b0 + 32], "big")
                    else:
                        ts = int.from_bytes(payload[b0 + 12 : b0 + 16], "big")
                        dur = int.from_bytes(payload[b0 + 16 : b0 + 20], "big")
                    if ts:
                        duration = dur / ts
                elif tag == b"trak":
                    n_tracks += 1
                    walk(b0, b1, depth + 1)
                elif tag == b"tkhd" and b1 - b0 >= 84:
                    ver = payload[b0]
                    off = 88 if ver == 1 else 76
                    if b1 - b0 >= off + 8:
                        w = _clamp_dim(int.from_bytes(
                            payload[b0 + off : b0 + off + 4], "big"
                        ) >> 16)  # 16.16 fixed point
                        h = _clamp_dim(int.from_bytes(
                            payload[b0 + off + 4 : b0 + off + 8], "big"
                        ) >> 16)
                        if w and h and width is None:
                            width, height = w, h
                elif tag == b"stsd" and b1 - b0 >= 16:
                    codecs.append(payload[b0 + 12 : b0 + 16].decode(
                        "ascii", "replace"
                    ))
                elif tag in (b"moov", b"mdia", b"minf", b"stbl"):
                    walk(b0, b1, depth + 1)

        walk(0, len(payload))
        if duration is None and not n_tracks:
            return None
        return duration, width, height, n_tracks, codecs
    except Exception:
        return None


_RIFF_LIST_RECURSE = {b"LIST": 4}  # skip the 4-byte list-type fourcc


def _riff_walk(buf: bytes, pos: int, end: int, on_chunk,
               depth: int = 0, recurse: dict = _RIFF_LIST_RECURSE):
    """THE RIFF little-endian chunk walk (shared by the AVI probe, the
    MJPEG frame iterator, and the WebP container — review finding:
    hand-rolled copies drift).  ``on_chunk(tag, body_start, body_end)``
    is called for every non-container chunk; tags in ``recurse`` map to
    the byte offset of their nested chunks within the body (LIST → 4
    past the list type, WebP ANMF → 16 past the frame header); a truthy
    return from the callback stops the walk early."""
    if depth > 6:
        return False
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if pos + 8 + size > end:
            return False
        off = recurse.get(tag)
        if off is not None:
            if _riff_walk(
                buf, pos + 8 + off, pos + 8 + size, on_chunk,
                depth + 1, recurse,
            ):
                return True
        elif on_chunk(tag, pos + 8, pos + 8 + size):
            return True
        pos += 8 + size + (size & 1)
    return False


def _clamp_dim(v):
    """Parsed container dimensions → int32-safe value or None (review
    finding: a corrupt 0xFFFFFFFF width crashed the Arrow conversion
    of the IntegerType column instead of degrading)."""
    return int(v) if 0 < v < (1 << 31) else None


def _avi_probe(payload: bytes):
    """AVI avih header → (duration_s, width, height, n_frames, codec
    fourcc from the first vids strh).  None on malformed input."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        found = {"avih": None, "codec": None}

        def on_chunk(tag, b0, b1):
            if tag == b"avih" and b1 - b0 >= 40:
                found["avih"] = payload[b0:b1]
            elif (
                tag == b"strh"
                and b1 - b0 >= 8
                and found["codec"] is None
                and payload[b0 : b0 + 4] == b"vids"
            ):
                found["codec"] = payload[b0 + 4 : b0 + 8].decode(
                    "ascii", "replace"
                )
            return False

        _riff_walk(payload, 12, len(payload), on_chunk)
        avih = found["avih"]
        if avih is None:
            return None
        usec_per_frame = int.from_bytes(avih[0:4], "little")
        n_frames = int.from_bytes(avih[16:20], "little")
        width = _clamp_dim(int.from_bytes(avih[32:36], "little"))
        height = _clamp_dim(int.from_bytes(avih[36:40], "little"))
        duration = n_frames * usec_per_frame / 1e6 if usec_per_frame else None
        return duration, width, height, n_frames, found["codec"]
    except Exception:
        return None


def _ebml_vint(buf: bytes, pos: int, keep_marker: bool):
    """One EBML variable-length integer (RFC 8794 §4) → (value, width)
    or None.  Element IDs keep the length-marker bit (the Matroska ID
    convention); sizes strip it.  An all-ones size is 'unknown'
    (returned as None value with its width)."""
    if pos >= len(buf) or buf[pos] == 0:
        return None
    width = 8 - buf[pos].bit_length() + 1
    if pos + width > len(buf):
        return None
    v = int.from_bytes(buf[pos : pos + width], "big")
    if not keep_marker:
        v &= (1 << (7 * width)) - 1
        if v == (1 << (7 * width)) - 1:
            return (None, width)  # unknown size
    return (v, width)


# Matroska/WebM element IDs (with marker bits, per the spec's notation)
_EBML_HEADER = 0x1A45DFA3
_MKV_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TS_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_TRACK_TYPE = 0x83
_MKV_CODEC_ID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIX_W = 0xB0
_MKV_PIX_H = 0xBA
_MKV_CONTAINERS = {
    _EBML_HEADER, _MKV_SEGMENT, _MKV_INFO, _MKV_TRACKS,
    _MKV_TRACK_ENTRY, _MKV_VIDEO,
}


def _mkv_probe(payload: bytes):
    """Matroska/WebM EBML walk → (doctype, duration_s, width, height,
    n_tracks, codec IDs) — pure struct reads like the MP4 box walk, no
    decode.  Handles unknown-size elements (streamed Segments) by
    extending to the end of the available bytes.  None on malformed
    input."""
    import struct

    try:
        state = {
            "doctype": None, "ts_scale": 1_000_000, "dur_units": None,
            "w": None, "h": None, "n_tracks": 0, "codecs": [],
        }

        def walk(pos, end, depth=0):
            if depth > 8:
                return
            while pos < end:
                got = _ebml_vint(payload, pos, True)
                if got is None:
                    return
                eid, idw = got
                got = _ebml_vint(payload, pos + idw, False)
                if got is None:
                    return
                size, sw = got
                body = pos + idw + sw
                bend = end if size is None else body + size
                if bend > end:
                    return
                if eid in _MKV_CONTAINERS:
                    if eid == _MKV_TRACK_ENTRY:
                        state["n_tracks"] += 1
                    walk(body, bend, depth + 1)
                elif eid == _MKV_DOCTYPE:
                    state["doctype"] = payload[body:bend].rstrip(
                        b"\x00"
                    ).decode("ascii", "replace")
                elif eid == _MKV_TS_SCALE:
                    state["ts_scale"] = int.from_bytes(
                        payload[body:bend], "big"
                    )
                elif eid == _MKV_DURATION and size in (4, 8):
                    state["dur_units"] = struct.unpack(
                        ">f" if size == 4 else ">d", payload[body:bend]
                    )[0]
                elif eid == _MKV_CODEC_ID:
                    state["codecs"].append(
                        payload[body:bend].decode("ascii", "replace")
                    )
                elif eid == _MKV_PIX_W and state["w"] is None:
                    state["w"] = _clamp_dim(
                        int.from_bytes(payload[body:bend], "big")
                    )
                elif eid == _MKV_PIX_H and state["h"] is None:
                    state["h"] = _clamp_dim(
                        int.from_bytes(payload[body:bend], "big")
                    )
                pos = bend

        walk(0, len(payload))
        if state["doctype"] is None and not state["n_tracks"]:
            return None
        duration = (
            state["dur_units"] * state["ts_scale"] / 1e9
            if state["dur_units"] is not None and state["ts_scale"]
            else None
        )
        return (
            state["doctype"], duration, state["w"], state["h"],
            state["n_tracks"], state["codecs"],
        )
    except Exception:
        return None


def _ebml_elem(eid: int, body: bytes) -> bytes:
    """One EBML element: marker-carrying ID bytes + minimal-width size
    VINT + body (test-fixture writer, the probe's inverse)."""
    idw = (eid.bit_length() + 7) // 8
    n = len(body)
    sw = 1
    while n >= (1 << (7 * sw)) - 1:  # all-ones is reserved for unknown
        sw += 1
    size = n | (1 << (7 * sw))
    return (
        eid.to_bytes(idw, "big") + size.to_bytes(sw, "big") + body
    )


def mkv_encode_meta(
    doctype: str = "matroska",
    duration_s: float = None,
    width: int = None,
    height: int = None,
    codecs: tuple = ("V_VP9",),
    ts_scale: int = 1_000_000,
    unknown_segment_size: bool = False,
) -> bytes:
    """Minimal Matroska/WebM metadata skeleton — the test fixture for
    :func:`_mkv_probe` (EBML header + Segment{Info, Tracks}, no
    clusters; the probe never reads frame data anyway).  First codec
    gets the Video element; the rest are audio-typed tracks."""
    import struct

    ebml = _ebml_elem(
        _EBML_HEADER, _ebml_elem(_MKV_DOCTYPE, doctype.encode())
    )
    info = _ebml_elem(_MKV_TS_SCALE, ts_scale.to_bytes(3, "big"))
    if duration_s is not None:
        info += _ebml_elem(
            _MKV_DURATION,
            struct.pack(">d", duration_s * 1e9 / ts_scale),
        )
    tracks = b""
    for i, cid in enumerate(codecs):
        entry = _ebml_elem(_MKV_TRACK_TYPE, bytes([1 if i == 0 else 2]))
        entry += _ebml_elem(_MKV_CODEC_ID, cid.encode())
        if i == 0 and width and height:
            entry += _ebml_elem(
                _MKV_VIDEO,
                _ebml_elem(_MKV_PIX_W, width.to_bytes(2, "big"))
                + _ebml_elem(_MKV_PIX_H, height.to_bytes(2, "big")),
            )
        tracks += _ebml_elem(_MKV_TRACK_ENTRY, entry)
    seg_body = _ebml_elem(_MKV_INFO, info) + _ebml_elem(
        _MKV_TRACKS, tracks
    )
    if unknown_segment_size:
        seg = _MKV_SEGMENT.to_bytes(4, "big") + b"\xFF" + seg_body
    else:
        seg = _ebml_elem(_MKV_SEGMENT, seg_body)
    return ebml + seg


_VIDEO_META_SCHEMA = st.StructType([
    st.StructField("media_id", st.LongType()),
    st.StructField("container", st.StringType()),
    st.StructField("duration_s", st.DoubleType()),
    st.StructField("width", st.IntegerType()),
    st.StructField("height", st.IntegerType()),
    st.StructField("n_frames_or_tracks", st.LongType()),
    st.StructField("codec", st.StringType()),
])


def probe_video_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Container-level video metadata WITHOUT decoding: MP4/ISO-BMFF
    box walk (mvhd duration, tkhd dimensions, stsd codec fourccs,
    track count), AVI header parse (avih frames/dims/rate, first
    vids strh fourcc), and Matroska/WebM EBML walk (round 9: Info
    duration × timestamp scale, first video track's PixelWidth/Height,
    TrackEntry count, CodecID list — container 'webm' or 'mkv' by
    DocType).  One Arrow pass, metadata-sized output; rows no probe
    understands degrade to a NULL-container row — the operator a
    100 TB crawl triage runs BEFORE deciding what to decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p) if p is not None else b""
                got = None
                # top-level ISO-BMFF boxes seen in the wild: fast-start
                # and legacy QuickTime files may lead with wide/skip/
                # free/mdat before moov (review finding — sniffing only
                # ftyp/moov NULL'ed decodable .mov files)
                if p[4:8] in (
                    b"ftyp", b"moov", b"wide", b"skip", b"free",
                    b"mdat", b"pnot",
                ):
                    m = _mp4_probe(p)
                    if m is not None:
                        d, w, h, nt, codecs = m
                        got = (
                            "mp4", d, w, h, nt,
                            ",".join(codecs) if codecs else None,
                        )
                elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                    a = _avi_probe(p)
                    if a is not None:
                        d, w, h, nf, codec = a
                        got = ("avi", d, w, h, nf, codec)
                elif p[:4] == _EBML_HEADER.to_bytes(4, "big"):
                    k = _mkv_probe(p)
                    if k is not None:
                        doctype, d, w, h, nt, codecs = k
                        got = (
                            "webm" if doctype == "webm" else "mkv",
                            d, w, h, nt,
                            ",".join(codecs) if codecs else None,
                        )
                if got is None:
                    rows.append((mid, None, None, None, None, None, None))
                else:
                    rows.append((mid, *got))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _VIDEO_META_SCHEMA]
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, _VIDEO_META_SCHEMA
    )


def _avi_vids_fourcc(payload: bytes):
    """Codec fourcc of the FIRST vids strh, via an early-stopping RIFF
    walk over the leading hdrl LIST (the walk also stops on the first
    movi data chunk, so a headerless file costs a bounded scan).
    None when no vids strh is found before the data."""
    found: list = []

    def on_chunk(tag, b0, b1):
        if (tag == b"strh" and b1 - b0 >= 8
                and payload[b0:b0 + 4] == b"vids"):
            found.append(payload[b0 + 4:b0 + 8])
            return True
        return len(tag) == 4 and tag[2:] in (b"dc", b"db", b"wb")

    try:
        _riff_walk(payload, 12, len(payload), on_chunk)
    except Exception:
        return None
    return found[0] if found else None


# stream-declared fourccs the MJPEG sampler can actually decode
_MJPEG_FOURCCS = (b"MJPG", b"mjpg", b"dmb1", b"MJPA")


def _avi_mjpeg_frames(payload: bytes, max_needed: int = None):
    """The JPEG bytes of an MJPG AVI's FIRST video stream's frames
    ('00dc'/'00db' chunks — other streams' '01dc'… chunks are a
    different track and must not interleave; review finding).  Stops
    scanning once ``max_needed`` frames are collected (review finding:
    a multi-GB clip must not be copied wholesale when the sampler
    needs the first ~71 frames).  Returns a list (possibly empty) or
    None when the container isn't an AVI.

    Round 11 (probe-gate parity with the audio seam): the
    stream-declared codec is read FIRST from the vids strh (bounded
    early-stop walk); a declared non-MJPEG codec (H.264, VP9, raw
    DIB…) is routed AROUND without walking movi, so sampling cost
    tracks decodable bytes, not corpus bytes.  A missing/garbled strh
    falls through to the per-chunk JPEG-magic check (degrade, same as
    before)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    cc = _avi_vids_fourcc(payload)
    if cc is not None and cc not in _MJPEG_FOURCCS:
        return []
    frames: list = []

    def on_chunk(tag, b0, b1):
        if tag in (b"00dc", b"00db") and b1 - b0 >= 2:
            if payload[b0 : b0 + 2] == b"\xff\xd8":
                frames.append(payload[b0:b1])
                if max_needed is not None and len(frames) >= max_needed:
                    return True
        return False

    try:
        _riff_walk(payload, 12, len(payload), on_chunk)
    except Exception:
        return None
    return frames


def avi_mjpeg_encode(frames, width: int, height: int, fps: int = 10) -> bytes:
    """Test-side Motion-JPEG AVI writer: avih + one vids/MJPG stream +
    movi with the given JPEG payloads — the inverse fixture for the
    real :func:`sample_video_frames` path."""
    import struct

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height,
    ) + bytes(16)
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        fps, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(
            b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
        ),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
