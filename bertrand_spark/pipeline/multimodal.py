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
    "extract_audio_features", "png_encode",
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
            # PIL's exact RGB→L fixed-point (ImagingConvert.c:
            # ``L24(rgb) >> 16`` with L24 = R*19595 + G*38470 + B*7471,
            # truncating) — NOT a */1000 integer formula, which diverges
            # from PIL on some triples (e.g. RGB(6,215,0): 127 vs 128);
            # bit-parity keeps pixel hashes identical whether a worker
            # decodes via PIL or this fallback, so mixed-environment
            # clusters stay deterministic.
            r = px[:, :, 0].astype(np.uint32)
            g = px[:, :, 1].astype(np.uint32)
            b = px[:, :, 2].astype(np.uint32)
            px = ((r * 19595 + g * 38470 + b * 7471) >> 16).astype(np.uint8)
            px = px[:, :, None]
        return int(w), int(h), channels, px.astype(np.uint8).tobytes()
    except Exception:
        return None, None, None, None


def _real_decode(Image, payload: bytes, channels: int):
    """Real decode → (width, height, channels, raw bytes); native size.
    ``Image`` is the PIL module when importable, else None — then the
    stdlib PNG path (:func:`_png_decode`) handles PNG payloads and
    everything else is undecodable.  Corrupt/empty/NULL payloads return
    an all-None row instead of killing the task — on real crawl corpora
    broken images are routine, and one bad row must not abort a 100 TB
    job."""
    import io

    if Image is None:
        return _png_decode(payload, channels)
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
        # PIL the stdlib fallback decodes PNG only, so a JPEG/WebP
        # corpus would complete with all-NULL rows.  Executor PIL
        # availability can still differ from the driver's — the worker
        # warning stays as the second line of defense.
        import warnings

        warnings.warn(
            "decode='real' but PIL is not importable on the DRIVER: "
            "the stdlib fallback decodes PNG only — every non-PNG "
            "payload will yield NULL rows.  Install PIL in the "
            "executor image, or use decode='strict' to fail fast.",
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
            # loud, once per worker: the fallback decodes PNG ONLY —
            # on a JPEG/WebP corpus a missing-PIL executor image would
            # otherwise complete "successfully" with all-NULL rows.
            # Use decode='strict' to hard-assert codecs exist instead.
            import warnings

            warnings.warn(
                "decode='real' without PIL: stdlib fallback decodes PNG "
                "only; every non-PNG payload will yield NULL rows. "
                "Install PIL in the executor image, or use "
                "decode='strict' to fail fast.",
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
    ``'pil'`` when PIL imports on the driver, else ``'stdlib-png'``.
    Executor images can differ from the driver; an executor-side PIL
    gap still surfaces here as unexpected n_null, which is exactly the
    signal operators watch.

    The NULL split (round 6): ``n_null_unsupported_variant`` counts
    PNGs whose IHDR declares a shape the stdlib fallback documents as
    out of scope (sub-byte depths 1/2/4, unknown color type, the
    illegal 16-bit-palette combination — a pure byte probe of IHDR
    offsets, no decode; 8/16-bit and Adam7 are all DECODED since round
    6 closed those gaps);
    ``n_null_no_decoder`` counts non-PNG formats nulled because only
    the stdlib PNG path is available.  The first class needs a corpus
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
    decoder = "pil" if _pil_image_module() is not None else "stdlib-png"
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
    no_decoder = F.lit(decoder == "stdlib-png") & ~is_png
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
