"""Stdlib MPEG-1/2/2.5 Layer III (MP3) parser and decoder.

Written from the public specifications ISO/IEC 11172-3 (MPEG-1 audio)
and ISO/IEC 13818-3 (MPEG-2 / lower-sampling-frequency extension),
plus the public Xing/VBRI/LAME VBR header formats.  The reference
engine ships no audio codecs at all (SURVEY.md section 2.16) — like
the FLAC, PNG/JPEG/GIF and VP8L decoders before it, this module exists
for the training-data-pipeline ingest surface: a 100 TB crawl's audio
triage needs duration/rate/loudness without shelling out to native
codec processes per row.

Two layers with different evidence grades (the per-function docstrings
say which applies):

- the PARSE layer (``parse_stream`` and everything it calls) is exact
  and fully verifiable: frame sync walk with header-consistency
  checks, side-information decode for all three version families, bit
  reservoir assembly, and Xing/Info/VBRI VBR headers.  Every field is
  a struct read pinned by in-repo constructed streams and by
  self-consistency over a real-encoder stream (the CI-optional gsutil
  conformance vector: every frame boundary must land on a valid sync
  whose header agrees with the first frame's version/layer/rate).
  Exact VBR-aware duration comes from here — counting frames beats
  the first-frame CBR estimate ``_mp3_meta`` documents as triage-grade.

- the DECODE layer (``decode``) reconstructs PCM.  Scalefactor
  decode, requantization, stereo, alias reduction and the hybrid
  filterbank follow closed-form spec formulas.  The Huffman spectrum
  tables are spec DATA (ISO 11172-3 Table B.7, in ``_mp3huff``);
  every table is gated on structural validation (exact Kraft
  completeness + prefix-freeness) at import, and the decode of every
  granule asserts exact bit accounting (a granule must consume
  exactly ``part2_3_length`` bits — this pins code lengths, the
  zero/nonzero pattern via sign bits, and escape positions against a
  real encoder's output).  A granule that selects a table outside the
  validated set, or whose accounting fails, degrades to SILENCE and
  is counted in the returned stats — never silently-wrong samples.
  The polyphase synthesis window is a numerically-designed
  near-perfect-reconstruction stand-in for ISO Table B.3 (spec table
  data with no public closed form); its self-reconstruction SNR is
  measured in the round-10 unit, and the deviation is documented at
  ``_synth_window``.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "parse_stream", "probe_info", "decode", "build_frames", "iter_frames",
    "parse_header", "parse_side_info", "parse_vbr_header",
]

# ---------------------------------------------------------------------------
# header tables (ISO 11172-3 2.4.2.3, ISO 13818-3)
# ---------------------------------------------------------------------------

_BITRATE_V1_L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_BITRATE_V2_L3 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
# keyed by the 2-bit version field: 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


class MP3Header:
    """One decoded 4-byte frame header (ISO 11172-3 2.4.1.3)."""

    __slots__ = (
        "version", "bitrate", "sample_rate", "padding", "mode",
        "mode_ext", "frame_bytes", "samples_per_frame", "n_channels",
        "protection",
    )

    def __init__(self, version, bitrate, sample_rate, padding, mode,
                 mode_ext, frame_bytes, samples_per_frame, protection):
        self.version = version          # 3 / 2 / 0 (raw field value)
        self.bitrate = bitrate          # bits/s
        self.sample_rate = sample_rate
        self.padding = padding
        self.mode = mode                # 0 stereo 1 joint 2 dual 3 mono
        self.mode_ext = mode_ext
        self.frame_bytes = frame_bytes
        self.samples_per_frame = samples_per_frame
        self.protection = protection    # True when CRC-16 present
        self.n_channels = 1 if mode == 3 else 2

    @property
    def is_mpeg1(self) -> bool:
        return self.version == 3


def parse_header(h: int) -> Optional[MP3Header]:
    """4-byte header word → MP3Header, or None if not a valid Layer
    III header (used both for sync detection and consistency checks).
    Free-format (bitrate index 0) is rejected — its frame length is
    not derivable from the header and real crawls essentially never
    contain it."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3
    if version == 1:  # reserved
        return None
    layer = (h >> 17) & 3
    if layer != 1:  # Layer III only
        return None
    protection = not ((h >> 16) & 1)
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    mode_ext = (h >> 4) & 3
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    if version == 3:
        bitrate = _BITRATE_V1_L3[br_idx] * 1000
        spf = 1152
        frame_bytes = 144 * bitrate // sample_rate + padding
    else:
        bitrate = _BITRATE_V2_L3[br_idx] * 1000
        spf = 576
        frame_bytes = 72 * bitrate // sample_rate + padding
    return MP3Header(version, bitrate, sample_rate, padding, mode,
                     mode_ext, frame_bytes, spf, protection)


# ---------------------------------------------------------------------------
# bit reader
# ---------------------------------------------------------------------------


class Bits:
    """MSB-first bit reader over a bytes-like, with cheap position
    save/seek (the reservoir pointer arithmetic needs it)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if n == 0:
            return 0
        if self.pos > self.nbits:
            raise EOFError("bitstream exhausted")
        start = p >> 3
        end = (p + n + 7) >> 3
        word = int.from_bytes(self.data[start:end], "big")
        return (word >> (8 * (end - start) - (p & 7) - n)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to n bits without advancing; zero-padded past the end
        (the Huffman decoder peeks a fixed window near stream tail)."""
        p = self.pos
        start = p >> 3
        end = (p + n + 7) >> 3
        chunk = self.data[start:end]
        word = int.from_bytes(chunk, "big")
        have = 8 * len(chunk) - (p & 7)
        if have >= n:
            return (word >> (have - n)) & ((1 << n) - 1)
        word &= (1 << have) - 1 if have > 0 else 0
        return word << (n - have)

    def skip(self, n: int) -> None:
        self.pos += n


# ---------------------------------------------------------------------------
# side information (ISO 11172-3 2.4.1.7 / ISO 13818-3 2.4.1.7)
# ---------------------------------------------------------------------------


class Granule:
    __slots__ = (
        "part2_3_length", "big_values", "global_gain",
        "scalefac_compress", "window_switching", "block_type",
        "mixed_block", "table_select", "subblock_gain",
        "region0_count", "region1_count", "preflag", "scalefac_scale",
        "count1table_select",
    )


class SideInfo:
    __slots__ = ("main_data_begin", "scfsi", "granules", "nbytes")


def parse_side_info(data: bytes, hdr: MP3Header) -> SideInfo:
    """Decode the side-information block that follows the header (and
    optional CRC).  MPEG-1: 9/17/32 bytes, two granules, scfsi;
    MPEG-2/2.5 (LSF): 9/17 bytes, one granule, 9-bit
    scalefac_compress.  Raises ValueError on field values the spec
    forbids (reserved block type 0 with window switching)."""
    nch = hdr.n_channels
    ngr = 2 if hdr.is_mpeg1 else 1
    b = Bits(data)
    si = SideInfo()
    if hdr.is_mpeg1:
        si.main_data_begin = b.read(9)
        b.skip(5 if nch == 1 else 3)  # private_bits
        si.scfsi = [[b.read(1) for _ in range(4)] for _ in range(nch)]
        si.nbytes = 17 if nch == 1 else 32
    else:
        si.main_data_begin = b.read(8)
        b.skip(1 if nch == 1 else 2)
        si.scfsi = [[0, 0, 0, 0] for _ in range(nch)]
        si.nbytes = 9 if nch == 1 else 17
    si.granules = []
    for _gr in range(ngr):
        chans = []
        for _ch in range(nch):
            g = Granule()
            g.part2_3_length = b.read(12)
            g.big_values = b.read(9)
            g.global_gain = b.read(8)
            g.scalefac_compress = b.read(4 if hdr.is_mpeg1 else 9)
            g.window_switching = b.read(1)
            if g.window_switching:
                g.block_type = b.read(2)
                g.mixed_block = b.read(1)
                g.table_select = [b.read(5), b.read(5), 0]
                g.subblock_gain = [b.read(3) for _ in range(3)]
                if g.block_type == 0:
                    raise ValueError("reserved block_type 0 with "
                                     "window_switching set")
                # implicit region split (2.4.2.7 region_address):
                # fixed band-8 boundary; computed later against the
                # rate's band table
                g.region0_count = 7
                g.region1_count = 36
            else:
                g.block_type = 0
                g.mixed_block = 0
                g.table_select = [b.read(5), b.read(5), b.read(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = b.read(4)
                g.region1_count = b.read(3)
            g.preflag = b.read(1) if hdr.is_mpeg1 else 0
            g.scalefac_scale = b.read(1)
            g.count1table_select = b.read(1)
            if g.big_values > 288:
                raise ValueError("big_values > 288")
            chans.append(g)
        si.granules.append(chans)
    return si


# ---------------------------------------------------------------------------
# VBR headers (public Xing/Info and VBRI formats)
# ---------------------------------------------------------------------------


def parse_vbr_header(frame: bytes, hdr: MP3Header) -> Optional[dict]:
    """Xing/Info or VBRI tag inside the FIRST frame → dict with
    whatever of (n_frames, n_stream_bytes, quality, is_cbr_tag,
    encoder_delay, encoder_padding, encoder) is present, else None.

    The Xing tag sits right after the side info; 'Xing' marks VBR,
    'Info' the same layout written by LAME for CBR.  The optional
    LAME extension (encoder string + gapless delay/padding) follows
    the Xing block.  VBRI (Fraunhofer) sits at a fixed 32-byte offset
    after the header.  Public formats, struct reads only."""
    nch = hdr.n_channels
    if hdr.is_mpeg1:
        off = 4 + (17 if nch == 1 else 32)
    else:
        off = 4 + (9 if nch == 1 else 17)
    if hdr.protection:
        off += 2
    tag = frame[off:off + 4]
    if tag in (b"Xing", b"Info"):
        out = {"is_cbr_tag": tag == b"Info"}
        p = off + 4
        if len(frame) < p + 4:
            return out
        flags = int.from_bytes(frame[p:p + 4], "big")
        p += 4
        if flags & 1 and len(frame) >= p + 4:
            out["n_frames"] = int.from_bytes(frame[p:p + 4], "big")
            p += 4
        if flags & 2 and len(frame) >= p + 4:
            out["n_stream_bytes"] = int.from_bytes(frame[p:p + 4], "big")
            p += 4
        if flags & 4:
            p += 100  # seek table
        if flags & 8 and len(frame) >= p + 4:
            out["quality"] = int.from_bytes(frame[p:p + 4], "big")
            p += 4
        enc = frame[p:p + 9]
        if len(enc) == 9 and all(32 <= c < 127 for c in enc):
            out["encoder"] = enc.decode("ascii")
            # LAME tag: delay/padding packed in 3 bytes at +21 from
            # the encoder string start
            dp = frame[p + 21:p + 24]
            if len(dp) == 3:
                word = int.from_bytes(dp, "big")
                out["encoder_delay"] = word >> 12
                out["encoder_padding"] = word & 0xFFF
        return out
    vbri = frame[36:40]
    if vbri == b"VBRI" and len(frame) >= 62:
        return {
            "is_cbr_tag": False,
            "n_stream_bytes": int.from_bytes(frame[46:50], "big"),
            "n_frames": int.from_bytes(frame[50:54], "big"),
        }
    return None


# ---------------------------------------------------------------------------
# stream walk
# ---------------------------------------------------------------------------


def _skip_id3v2(p: bytes) -> int:
    if p[:3] != b"ID3" or len(p) < 10:
        return 0
    size = ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14) \
        | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
    return 10 + size + (10 if p[5] & 0x10 else 0)


def iter_frames(payload: bytes, max_resync: int = 65536):
    """Yield (offset, MP3Header, frame_bytes) for every frame in the
    stream.  After the first frame, the next header must agree with
    the first on version/layer/sample-rate/mode-class or the walk
    resynchronizes (scanning at most ``max_resync`` bytes — garbage
    between ID3v1 tags and truncated tails is normal in crawls)."""
    pos = _skip_id3v2(payload)
    n = len(payload)
    first = None
    scanned = 0
    while pos + 4 <= n:
        h = parse_header(int.from_bytes(payload[pos:pos + 4], "big"))
        ok = h is not None and (
            first is None
            or (h.version == first.version
                and h.sample_rate == first.sample_rate
                and (h.mode == 3) == (first.mode == 3))
        )
        if not ok:
            if payload[pos:pos + 3] == b"TAG":  # ID3v1 trailer
                return
            pos += 1
            scanned += 1
            if scanned > max_resync:
                return
            continue
        scanned = 0
        if pos + h.frame_bytes > n:
            return  # truncated final frame
        if first is None:
            first = h
        yield pos, h, payload[pos:pos + h.frame_bytes]
        pos += h.frame_bytes


def parse_stream(payload: bytes,
                 decode_side_info: bool = True) -> Optional[dict]:
    """Exact full-stream parse (no spectral decode): frame walk +
    side-info decode of every frame.  Returns None when no two
    consistent frames are found.

    ``decode_side_info=False`` is the probe mode: header-walk only
    (exact n_frames/duration/bitrate stats, empty histograms) — the
    per-row cost a 100 TB crawl pays is then one struct read per
    frame instead of ~60 bit reads of side information.

    The returned dict carries the exact, VBR-correct stream facts the
    crawl probe wants — ``duration_s`` here counts actual frames
    (correct for VBR where the first-frame CBR estimate is not) —
    plus the table-select / block-type histograms the decode layer's
    coverage report builds on:

    - version ('mpeg1'/'mpeg2'/'mpeg2.5'), sample_rate, n_channels,
      mode
    - n_frames, n_samples (granule-exact), duration_s
    - bitrate_min/max/mean (bits/s), is_vbr
    - vbr_tag: parse_vbr_header output (or None)
    - table_histogram: {table_id: n_regions_selecting_it}
    - block_types: {'long': n, 'start': n, 'short': n, 'stop': n,
      'mixed': n} counted per granule-channel
    - n_bad_side_info: frames whose side info violated the spec
    """
    frames = []
    vbr_tag = None
    table_hist: dict = {}
    block_types = {"long": 0, "start": 0, "short": 0, "stop": 0,
                   "mixed": 0}
    n_bad = 0
    first_hdr = None
    for i, (off, hdr, frame) in enumerate(iter_frames(payload)):
        if first_hdr is None:
            first_hdr = hdr
            vbr_tag = parse_vbr_header(frame, hdr)
            if vbr_tag is not None:
                continue  # tag frame carries no audio
        frames.append((off, hdr))
        if not decode_side_info:
            continue
        body = frame[4 + (2 if hdr.protection else 0):]
        try:
            si = parse_side_info(body, hdr)
        except (ValueError, EOFError):
            n_bad += 1
            continue
        for chans in si.granules:
            for g in chans:
                if g.window_switching:
                    if g.block_type == 2:
                        block_types["mixed" if g.mixed_block
                                    else "short"] += 1
                    else:
                        block_types["start" if g.block_type == 1
                                    else "stop"] += 1
                else:
                    block_types["long"] += 1
                nregions = 2 if g.window_switching else 3
                if g.big_values:
                    for r in range(nregions):
                        t = g.table_select[r]
                        table_hist[t] = table_hist.get(t, 0) + 1
    if len(frames) < 2:
        return None
    hdr = frames[0][1]
    rates = [h.bitrate for _, h in frames]
    n_samples = sum(h.samples_per_frame for _, h in frames)
    version = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}[hdr.version]
    return {
        "version": version,
        "sample_rate": hdr.sample_rate,
        "n_channels": hdr.n_channels,
        "mode": ("stereo", "joint_stereo", "dual", "mono")[hdr.mode],
        "n_frames": len(frames),
        "n_samples": n_samples,
        "duration_s": n_samples / hdr.sample_rate,
        "bitrate_min": min(rates),
        "bitrate_max": max(rates),
        "bitrate_mean": sum(rates) / len(rates),
        "is_vbr": len(set(rates)) > 1,
        "vbr_tag": vbr_tag,
        "table_histogram": table_hist,
        "block_types": block_types,
        "n_bad_side_info": n_bad,
    }


# ---------------------------------------------------------------------------
# spectral decode tables (ISO 11172-3 Table B.8 / 13818-3 Annex B)
# ---------------------------------------------------------------------------

_SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576),
    22050: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    24000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
            162, 194, 232, 278, 332, 394, 464, 540, 576),
    16000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    11025: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    12000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
            168, 200, 238, 284, 336, 396, 464, 522, 576),
    8000: (0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232,
           280, 336, 400, 476, 566, 568, 570, 572, 574, 576),
}

_SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    22050: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    11025: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    12000: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    8000: (0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192),
}

# preemphasis (ISO 11172-3 2.4.3.4.5), indexed by long sfb
_PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
           2, 0)

# MPEG-1 scalefac_compress -> (slen1, slen2) (ISO 11172-3 2.4.2.7)
_SLEN_V1 = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)

# LSF scalefactor partition sizes (ISO 13818-3 2.4.3.2), indexed
# [table][block class] with class 0=long, 1=short, 2=mixed; short
# counts include the x3 window factor.
_LSF_NSFB = (
    ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
    ((7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)),
    ((6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)),
    ((8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)),
)

_ANTIALIAS_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                 -0.0142, -0.0037)

_ANALYSIS_MAX_SAMPLES = 32 * 1024 * 1024  # mirror _WAV_ANALYSIS cap


def _block_class(g) -> int:
    """0 long (incl. start/stop), 1 short, 2 mixed — the LSF
    partition-table row and the scalefactor layout selector."""
    if g.window_switching and g.block_type == 2:
        return 2 if g.mixed_block else 1
    return 0


def _scalefactors_v1(br, g, gr_index, scfsi_ch, store_ch):
    """MPEG-1 scalefactor decode (ISO 11172-3 2.4.2.7): returns
    (sf_long[21], sf_short[13][3]); granule 1 reuses granule 0's
    groups where scfsi says so (long blocks only, per spec)."""
    slen1, slen2 = _SLEN_V1[g.scalefac_compress]
    sfl = [0] * 21
    sfs = [[0, 0, 0] for _ in range(13)]
    cls = _block_class(g)
    if cls == 1:
        for sfb in range(6):
            for w in range(3):
                sfs[sfb][w] = br.read(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sfs[sfb][w] = br.read(slen2)
    elif cls == 2:
        for sfb in range(8):
            sfl[sfb] = br.read(slen1)
        for sfb in range(3, 6):
            for w in range(3):
                sfs[sfb][w] = br.read(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sfs[sfb][w] = br.read(slen2)
    else:
        groups = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2))
        for gi, (a, b, sl) in enumerate(groups):
            if gr_index == 1 and scfsi_ch[gi]:
                for sfb in range(a, b):
                    sfl[sfb] = store_ch[sfb]
            else:
                for sfb in range(a, b):
                    sfl[sfb] = br.read(sl)
        store_ch[:] = sfl
    return sfl, sfs


def _lsf_slens(g, is_intensity_ch: bool):
    """LSF scalefactor layout (ISO 13818-3 2.4.3.2): returns
    (slens[4], partition table row, preflag)."""
    sc = g.scalefac_compress
    if not is_intensity_ch:
        if sc < 400:
            return ((sc >> 4) // 5, (sc >> 4) % 5, (sc & 0xF) >> 2,
                    sc & 3), 0, 0
        if sc < 500:
            s = sc - 400
            return ((s >> 2) // 5, (s >> 2) % 5, s & 3, 0), 1, 0
        s = sc - 500
        return (s // 3, s % 3, 0, 0), 2, 1
    si = sc >> 1
    if si < 180:
        return (si // 36, (si % 36) // 6, si % 6, 0), 3, 0
    if si < 244:
        s = si - 180
        return ((s & 0x3F) >> 3, s & 7, 0, 0), 4, 0
    s = si - 244
    return (s // 3, s % 3, 0, 0), 5, 0


def _scalefactors_lsf(br, g, is_intensity_ch: bool):
    """LSF scalefactor decode: fills the same (sf_long, sf_short)
    shapes as the MPEG-1 path.  Also returns the per-partition slens
    (kept for symmetry; _apply_stereo re-derives them via _lsf_slens
    to map each band to ITS partition's illegal-position marker)."""
    slens, tbl, preflag = _lsf_slens(g, is_intensity_ch)
    cls = _block_class(g)
    counts = _LSF_NSFB[tbl][cls]
    sfl = [0] * 21
    sfs = [[0, 0, 0] for _ in range(13)]
    # transmission-order slots
    slots = []
    if cls == 1:
        for sfb in range(12):
            for w in range(3):
                slots.append(("s", sfb, w))
    elif cls == 2:
        for sfb in range(6):
            slots.append(("l", sfb, 0))
        for sfb in range(3, 12):
            for w in range(3):
                slots.append(("s", sfb, w))
    else:
        for sfb in range(21):
            slots.append(("l", sfb, 0))
    pos = 0
    part_of = []
    for p, n in enumerate(counts):
        part_of.extend([p] * n)
    for idx, (kind, sfb, w) in enumerate(slots):
        sl = slens[part_of[idx]] if idx < len(part_of) else 0
        v = br.read(sl) if sl else 0
        if kind == "l":
            sfl[sfb] = v
        else:
            sfs[sfb][w] = v
        pos += 1
    return sfl, sfs, preflag, slens


def _huffman_spectrum(br, g, hdr, part2_start):
    """Decode the big_values + count1 regions into a 576-int list.
    Returns (values, ok, gated) — ``gated`` True when a region
    selects a table outside the validated set (see _mp3huff), ``ok``
    False when exact bit accounting fails (the granule must consume
    exactly part2_3_length bits; overrun/underrun means the stream
    and the decoder disagree and nothing downstream can be trusted).

    Hot path: bits come from a LOCAL sliding accumulator refilled a
    byte at a time (zero-padded past the payload end, like
    Bits.peek) instead of per-symbol Bits method calls — the decode
    profile was dominated by read()/peek() dispatch.  ``br.pos`` is
    synced back before every return so the caller's granule-advance
    arithmetic is unchanged."""
    from . import _mp3huff as H

    limit = part2_start + g.part2_3_length
    vals = [0] * 576
    sfbl = _SFB_LONG[hdr.sample_rate]
    if g.window_switching:
        r1 = 36 if g.block_type == 2 else sfbl[8]
        r2 = 576
    else:
        r1 = sfbl[min(g.region0_count + 1, 22)]
        r2 = sfbl[min(g.region0_count + 1 + g.region1_count + 1, 22)]
    bv2 = g.big_values * 2
    regions = (
        (0, min(r1, bv2), g.table_select[0]),
        (min(r1, bv2), min(r2, bv2), g.table_select[1]),
        (min(r2, bv2), bv2, g.table_select[2]),
    )
    data = br.data
    ndata = len(data)
    bytepos = br.pos >> 3
    acc = 0
    nacc = 0
    if br.pos & 7:
        acc = (data[bytepos] if bytepos < ndata else 0) \
            & ((1 << (8 - (br.pos & 7))) - 1)
        nacc = 8 - (br.pos & 7)
        bytepos += 1

    def _sync():
        br.pos = bytepos * 8 - nacc

    for a, b, tid in regions:
        if a >= b:
            continue
        if tid == 0:
            continue  # table 0: region is all zeros, no bits
        tab = H.lookup_table(tid)
        if tab is None:
            _sync()
            return vals, False, True
        maxlen, lut, _ny = tab
        linbits = H.HUFF_LINBITS.get(tid, 0)
        i = a
        mask = (1 << maxlen) - 1
        while i < b:
            while nacc < 24:
                acc = (acc << 8) | (data[bytepos] if bytepos < ndata
                                    else 0)
                bytepos += 1
                nacc += 8
            packed = lut[(acc >> (nacc - maxlen)) & mask]
            nacc -= packed >> 16
            x = (packed >> 8) & 0xFF
            y = packed & 0xFF
            if x == 15 and linbits:
                while nacc < linbits + 2:
                    acc = (acc << 8) | (data[bytepos]
                                        if bytepos < ndata else 0)
                    bytepos += 1
                    nacc += 8
                x += (acc >> (nacc - linbits)) & ((1 << linbits) - 1)
                nacc -= linbits
            if x:
                nacc -= 1
                if (acc >> nacc) & 1:
                    x = -x
            if y == 15 and linbits:
                while nacc < linbits + 1:
                    acc = (acc << 8) | (data[bytepos]
                                        if bytepos < ndata else 0)
                    bytepos += 1
                    nacc += 8
                y += (acc >> (nacc - linbits)) & ((1 << linbits) - 1)
                nacc -= linbits
            if y:
                nacc -= 1
                if (acc >> nacc) & 1:
                    y = -y
            vals[i] = x
            vals[i + 1] = y
            i += 2
            if bytepos * 8 - nacc > limit:
                _sync()
                return vals, False, False
    # count1 region
    tab = H.lookup_table("B" if g.count1table_select else "A")
    maxlen, lut, _ny = tab
    mask = (1 << maxlen) - 1
    i = bv2
    while bytepos * 8 - nacc < limit and i <= 572:
        while nacc < 16:
            acc = (acc << 8) | (data[bytepos] if bytepos < ndata
                                else 0)
            bytepos += 1
            nacc += 8
        packed = lut[(acc >> (nacc - maxlen)) & mask]
        nacc -= packed >> 16
        q = packed & 0xFFFF
        for k, bit in ((0, 8), (1, 4), (2, 2), (3, 1)):
            if q & bit:
                nacc -= 1
                vals[i + k] = -1 if (acc >> nacc) & 1 else 1
        i += 4
        if bytepos * 8 - nacc > limit:
            _sync()
            return vals, False, False
    _sync()
    if br.pos != limit:
        return vals, False, False
    return vals, True, False


# ---------------------------------------------------------------------------
# requantization + reordering (ISO 11172-3 2.4.3.4.6-8)
# ---------------------------------------------------------------------------


def _requantize(vals, g, sfl, sfs, hdr, preflag):
    """Huffman integers → float spectrum xr[576], long/short gain and
    scalefactor application per 2.4.3.4.6.  ``vals`` is still in
    transmission order (short-block reordering happens after)."""
    import numpy as np

    iv = np.asarray(vals, dtype=np.float64)
    xr = np.sign(iv) * np.abs(iv) ** (4.0 / 3.0)
    sf_mult = 1.0 if g.scalefac_scale else 0.5
    gexp = (g.global_gain - 210) / 4.0
    sfbl = _SFB_LONG[hdr.sample_rate]
    sfbs = _SFB_SHORT[hdr.sample_rate]
    cls = _block_class(g)
    exps = np.zeros(576)
    if cls == 0:
        # 21 scalefactor bands; the 22nd band (sfbl[21]..576) carries
        # no scalefactor and uses plain global gain (2.4.3.4.6)
        for sfb in range(21):
            a, b = sfbl[sfb], sfbl[sfb + 1]
            exps[a:b] = gexp - sf_mult * (
                sfl[sfb] + (_PRETAB[sfb] if preflag else 0))
        exps[sfbl[21]:576] = gexp
    else:
        # mixed blocks: the long region ends where short sfb 3 begins
        # — 3*sfb_short[3], which is 36 at every rate EXCEPT MPEG-2.5
        # 8 kHz where it is 72 (round-10 review: a literal 36 left
        # lines [36,72) with NO gain there — a silently-wrong-samples
        # hole that bit accounting cannot see)
        long_limit = 3 * sfbs[3] if cls == 2 else 0
        if cls == 2:
            nlong = 8 if hdr.is_mpeg1 else 6
            for sfb in range(nlong):
                a, b = sfbl[sfb], min(sfbl[sfb + 1], long_limit)
                exps[a:b] = gexp - sf_mult * (
                    sfl[sfb] + (_PRETAB[sfb] if preflag else 0))
        sfb_start = 3 if cls == 2 else 0
        for sfb in range(sfb_start, 13):
            w = sfbs[sfb + 1] - sfbs[sfb] if sfb < 13 else 0
            base = 3 * sfbs[sfb]
            if base >= 576:
                break
            for win in range(3):
                a = base + win * w
                b = min(a + w, 576)
                sf = sfs[sfb][win] if sfb < 12 else 0
                exps[a:b] = (gexp - 2.0 * g.subblock_gain[win]
                             - sf_mult * sf)
        # the 3*192=576 region is fully covered by sfb<13 above
    return xr * np.exp2(exps)


def _reorder_short(xr, g, hdr):
    """Short-block reordering (2.4.3.4.8): transmission order
    (sfb, window, line) → subband-time order the IMDCT consumes.
    Mixed blocks keep the long region in place — it ends at
    3*sfb_short[3], which is 36 lines (2 subbands) at every rate
    except MPEG-2.5 8 kHz where it is 72 (4 subbands); starting the
    loop at sfb 3 lands on exactly that boundary either way."""
    import numpy as np

    cls = _block_class(g)
    if cls == 0:
        return xr
    sfbs = _SFB_SHORT[hdr.sample_rate]
    out = xr.copy()
    sfb_start = 3 if cls == 2 else 0
    for sfb in range(sfb_start, 13):
        w = sfbs[sfb + 1] - sfbs[sfb]
        base = 3 * sfbs[sfb]
        if base >= 576 or w == 0:
            continue
        block = xr[base:base + 3 * w]
        if len(block) < 3 * w:
            break
        out[base:base + 3 * w] = block.reshape(3, w).T.ravel()
    return out


# ---------------------------------------------------------------------------
# stereo (ISO 11172-3 2.4.3.4.9 / ISO 13818-3 2.4.3.2)
# ---------------------------------------------------------------------------


def _find_rzero_band(xr_r, sfb_bounds):
    """Index of the first scalefactor band at/above which the right
    channel is entirely zero (intensity bands live there)."""
    import numpy as np

    nz = np.nonzero(xr_r)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for i in range(len(sfb_bounds) - 1):
        if sfb_bounds[i] >= last:
            return i
    return len(sfb_bounds) - 1


def _apply_stereo(xr_pair, g_pair, hdr, sf_r):
    """MS and intensity processing in-place over [left, right]
    spectra.  Returns None normally, or ``"gated"`` when the granule
    pair selects an intensity shape this decoder does not implement
    (right channel in short/mixed windows) — the caller converts the
    pair to counted silence, exactly like an out-of-set Huffman
    table, so coverage < 1 is visible and no silently-wrong PCM
    escapes (round-10 review: the old path silently applied
    full-spectrum MS there).

    MS (mode_ext bit 2) is the exactly-specified common path.
    Intensity (mode_ext bit 1) follows 2.4.3.4.9.3 (MPEG-1 tan
    ratio) / 13818-3 (power-of-sqrt2 law) over long blocks,
    INCLUDING the region above the last scalefactor band
    ([sfb_long[21], 576)), which reuses band 20's is_pos — the
    round-10 review found that region was left as raw mid/side
    under mode_ext==3.  The LSF illegal-position marker is
    per-partition ((1 << slen_of_band) - 1), not slens[0]."""
    import numpy as np

    ms = hdr.mode == 1 and (hdr.mode_ext & 2)
    intensity = hdr.mode == 1 and (hdr.mode_ext & 1)
    xl, xr_ = xr_pair
    if intensity and (_block_class(g_pair[0]) != 0
                      or _block_class(g_pair[1]) != 0):
        # EITHER channel in short/mixed windows: the long-band
        # intensity scaling below would multiply a short-reordered
        # spectrum band-wise — silently wrong on the left channel
        # exactly as the round-10 review's right-channel case
        return "gated"
    if intensity:
        sfbl = _SFB_LONG[hdr.sample_rate]
        # sfbl has 23 bounds (band 21 is the above-last-sfb region
        # ending at 576); _find_rzero_band returns 22 when the right
        # channel is nonzero into that region (no intensity bands)
        start_band = _find_rzero_band(xr_, sfbl)
        if hdr.is_mpeg1:
            illegal_of = [7] * 21
        else:
            slens, tbl, _pre = _lsf_slens(g_pair[1], True)
            part_of = []
            for pi, n in enumerate(_LSF_NSFB[tbl][0]):
                part_of.extend([pi] * n)
            illegal_of = [
                (1 << slens[part_of[i]]) - 1 if i < len(part_of)
                else 0
                for i in range(21)
            ]
        for sfb in range(start_band, 22):
            a, b = sfbl[sfb], sfbl[sfb + 1]
            # the band-21 region carries no scalefactor of its own:
            # reference decoders reuse band 20's is_pos (and its
            # illegal marker) there
            is_pos = sf_r[min(sfb, 20)]
            if is_pos == illegal_of[min(sfb, 20)]:
                if ms:
                    m = (xl[a:b] + xr_[a:b]) / np.sqrt(2.0)
                    s = (xl[a:b] - xr_[a:b]) / np.sqrt(2.0)
                    xl[a:b], xr_[a:b] = m, s
                continue
            if hdr.is_mpeg1:
                ratio = np.tan(is_pos * np.pi / 12.0)
                if not np.isfinite(ratio):
                    l_k, r_k = 1.0, 0.0
                else:
                    l_k = ratio / (1.0 + ratio)
                    r_k = 1.0 / (1.0 + ratio)
            else:
                io = 2.0 ** (-0.5 * (1 + (g_pair[1].scalefac_compress
                                          & 1)))
                if is_pos == 0:
                    l_k, r_k = 1.0, 1.0
                elif is_pos % 2:
                    l_k, r_k = io ** ((is_pos + 1) // 2), 1.0
                else:
                    l_k, r_k = 1.0, io ** (is_pos // 2)
            base = xl[a:b].copy()
            xl[a:b] = base * l_k
            xr_[a:b] = base * r_k
        if ms:
            end = sfbl[start_band] if start_band < 22 else 576
            m = (xl[:end] + xr_[:end]) / np.sqrt(2.0)
            s = (xl[:end] - xr_[:end]) / np.sqrt(2.0)
            xl[:end], xr_[:end] = m, s
        return None
    if ms:
        m = (xl + xr_) / np.sqrt(2.0)
        s = (xl - xr_) / np.sqrt(2.0)
        xl[:], xr_[:] = m, s
    return None


# ---------------------------------------------------------------------------
# hybrid filterbank (ISO 11172-3 2.4.3.4.10) + polyphase synthesis
# ---------------------------------------------------------------------------

_FB_CACHE: dict = {}


def _fb_tables():
    """Closed-form filterbank constants (all formula-specified by the
    spec, no table data): antialias cs/ca, the 36- and 12-point IMDCT
    matrices, the four block-type windows, and the synthesis
    matrixing N[i,k] = cos((16+i)(2k+1)pi/64)."""
    import numpy as np

    if _FB_CACHE:
        return _FB_CACHE
    ci = np.asarray(_ANTIALIAS_CI)
    cs = 1.0 / np.sqrt(1.0 + ci * ci)
    ca = ci / np.sqrt(1.0 + ci * ci)

    def imdct_matrix(n):
        i = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        return np.cos(np.pi / (2 * n) * (2 * i + 1 + n // 2)
                      * (2 * k + 1))

    m36 = imdct_matrix(36)
    m12 = imdct_matrix(12)
    i36 = np.arange(36)
    i12 = np.arange(12)
    win = {
        0: np.sin(np.pi / 36 * (i36 + 0.5)),
        1: np.concatenate([
            np.sin(np.pi / 36 * (np.arange(18) + 0.5)),
            np.ones(6),
            np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5)),
            np.zeros(6),
        ]),
        3: np.concatenate([
            np.zeros(6),
            np.sin(np.pi / 12 * (np.arange(6, 12) - 6 + 0.5)),
            np.ones(6),
            np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5)),
        ]),
    }
    win_short = np.sin(np.pi / 12 * (i12 + 0.5))
    i = np.arange(64)[:, None]
    k = np.arange(32)[None, :]
    nmat = np.cos((16 + i) * (2 * k + 1) * np.pi / 64)
    # the U map (2.4.3.2) as (age-in-steps, W-line) pairs: index m
    # reads V[idx_u[m]] and V[64a + r] == W[step - a][r]
    idx_u = np.concatenate([
        np.arange(32) + 128 * j + (0 if half == 0 else 96)
        for j in range(8) for half in (0, 1)
    ])
    _FB_CACHE.update(cs=cs, ca=ca, m36=m36, m12=m12, win=win,
                     win_short=win_short, nmat=nmat,
                     u_age=idx_u // 64, u_line=idx_u % 64,
                     dwin=_synth_window())
    return _FB_CACHE


def _synth_window():
    """512-tap synthesis prototype.

    HONEST DEVIATION, documented: ISO 11172-3 Table B.3 specifies the
    synthesis window as 512 printed coefficients with no generating
    formula; with neither the spec table nor any conformance PCM
    available in this environment, shipping a from-memory transcription
    of 512 decimals would be fabrication.  Instead this is one half of
    a numerically-designed near-perfect-reconstruction window PAIR for
    the exact ISO filterbank structure (alternating least squares over
    both windows; tools/mp3_window_design.py is the deterministic
    designer, _mp3window.py the baked result): held-out
    self-reconstruction SNR ~50 dB on noise/tones/sweeps, re-asserted
    as a >=45 dB floor in tests/test_round10.py.  Consequence: PCM
    from real encoders carries a linear-filtering deviation versus a
    conformant decoder (bounded by the analysis-prototype mismatch,
    order -34 dB stopband); triage features (RMS, rolloff, duration)
    are unaffected at that level.  The zero path is exact: silence
    decodes to exact zeros.
    """
    from ._mp3window import synth_window

    return synth_window()


def _imdct_granule(xr, g, hdr, overlap):
    """576-line spectrum → 576 time-domain subband samples (18 per
    subband), windowed IMDCT with overlap-add state per 2.4.3.4.10.2-3
    plus frequency inversion.  ``overlap`` is the (32, 18) carry-over
    store mutated in place."""
    import numpy as np

    t = _fb_tables()
    cls = _block_class(g)
    bt = g.block_type if g.window_switching else 0
    x = xr.reshape(32, 18)

    # long subbands in a mixed block: the long region spans
    # 3*sfb_short[3] lines (36 -> 2 subbands everywhere except
    # MPEG-2.5 8 kHz, where 72 -> 4)
    nls = (3 * _SFB_SHORT[hdr.sample_rate][3]) // 18 if cls == 2 \
        else 32
    # alias reduction first (not for pure short blocks; boundaries
    # between the long subbands only for mixed).  Boundary sb touches
    # rows 10-17 of x[sb] and rows 0-7 of x[sb+1]: disjoint line
    # sets, so all butterflies vectorize in one shot.
    if cls != 1:
        nb = (nls - 1) if cls == 2 else 31
        cs, ca = t["cs"], t["ca"]
        hi = x[:nb, 17:9:-1].copy()
        lo = x[1:nb + 1, 0:8].copy()
        x[:nb, 17:9:-1] = hi * cs - lo * ca
        x[1:nb + 1, 0:8] = lo * cs + hi * ca

    def _short_z(rows):
        z = np.zeros((len(rows), 36))
        ws = t["win_short"]
        m12t = t["m12"].T
        for wnd in range(3):
            z[:, 6 + 6 * wnd:18 + 6 * wnd] += (rows[:, wnd::3]
                                               @ m12t) * ws
        return z

    if cls == 1:
        z = _short_z(x)
    elif cls == 2:
        z = np.empty((32, 36))
        z[:nls] = (x[:nls] @ t["m36"].T) * t["win"][0]
        z[nls:] = _short_z(x[nls:])
    else:
        z = (x @ t["m36"].T) * t["win"][bt]
    out = z[:, :18] + overlap
    overlap[:] = z[:, 18:]
    # frequency inversion: odd subbands negate odd time samples
    out[1::2, 1::2] = -out[1::2, 1::2]
    return out


class _Synth:
    """Polyphase synthesis state for one channel; consume() turns
    (nsteps, 32) subband samples into nsteps*32 PCM samples.

    The classic 1024-entry V FIFO is equivalent to a 16-step history
    of the 64-point matrixing outputs (V[64a + r] == W[step-a][r]),
    so the whole call vectorizes as ONE fancy-indexed gather over a
    chronological W history instead of a per-step shift loop — the
    state carried between calls is just the last 16 W rows."""

    def __init__(self):
        import numpy as np

        self.hist = np.zeros((16, 64))

    def consume(self, sbs):
        import numpy as np

        t = _fb_tables()
        vecs = sbs @ t["nmat"].T  # (nsteps, 64) chronological
        hist = np.concatenate([self.hist, vecs])
        self.hist = hist[-16:]
        n = len(sbs)
        # U[s, m] = W[16 + s - age(m)][line(m)]
        rows = (16 + np.arange(n))[:, None] - t["u_age"][None, :]
        u = hist[rows, t["u_line"][None, :]]
        w = u * t["dwin"]
        return w.reshape(n, 16, 32).sum(axis=1).ravel()


# ---------------------------------------------------------------------------
# decode driver
# ---------------------------------------------------------------------------


def decode(payload: bytes, max_samples: int = _ANALYSIS_MAX_SAMPLES,
           stop_on_fail: bool = False, _collect_spectra=None,
           _keep_channels: bool = False):
    """Full-stream PCM decode under the gated-confidence contract
    (module docstring): returns None when the stream has no two
    consistent frames, else a dict with

    - sample_rate, n_channels, duration_s (frame-walk exact)
    - samples: mono float64 mix, one entry per decoded sample
      (granules that could not be decoded contribute SILENCE)
    - n_granules / n_decoded / n_gated / n_acct_fail / n_resv_miss /
      n_bad_side: the coverage accounting.  ``coverage`` =
      n_decoded / n_granules; callers that need trustworthy loudness
      features must require coverage == 1.0 (the multimodal seam
      does exactly that).

    ``stop_on_fail`` is the crawl-scale mode the multimodal seam
    uses: the first granule that gates or fails accounting aborts
    the walk (coverage < 1 is already unusable for features there),
    so the per-row cost of an out-of-table-set MP3 is bounded by its
    first loud granule, not its length.

    ``_collect_spectra`` (tests only): a list that receives
    (frame_idx, gr, ch, vals[576]) for every granule that decoded,
    letting the round-trip unit compare Huffman integers exactly.
    """
    import numpy as np

    hdr0 = None
    resv = bytearray()
    overlap = None
    synths = None
    sf_store = None
    pcm = []
    n_granules = n_decoded = n_gated = n_acct = n_resv = n_bad = 0
    n_frames = 0
    frame_iter = iter_frames(payload)
    n_tail_samples = 0
    for fi, (off, hdr, frame) in enumerate(frame_iter):
        if hdr0 is None:
            if parse_vbr_header(frame, hdr) is not None:
                continue  # tag frame carries no audio
            hdr0 = hdr
            nch = hdr.n_channels
            overlap = [np.zeros((32, 18)) for _ in range(nch)]
            synths = [_Synth() for _ in range(nch)]
            sf_store = [[0] * 21 for _ in range(nch)]
        n_frames += 1
        nch = hdr.n_channels
        ngr = 2 if hdr.is_mpeg1 else 1
        body = frame[4 + (2 if hdr.protection else 0):]
        try:
            si = parse_side_info(body, hdr)
        except (ValueError, EOFError):
            n_bad += 1
            n_granules += ngr * nch
            pcm.append(np.zeros((nch, 576 * ngr)))
            continue
        main = body[si.nbytes:]
        start = len(resv) - si.main_data_begin
        resv.extend(main)
        frame_pcm = np.zeros((nch, 576 * ngr))
        if start < 0:
            n_granules += ngr * nch
            n_resv += ngr * nch
            pcm.append(frame_pcm)
            continue
        br = Bits(bytes(resv), start * 8)
        for gr in range(ngr):
            xrs, oks, sfr = [], [], None
            for ch in range(nch):
                g = si.granules[gr][ch]
                n_granules += 1
                part2_start = br.pos
                try:
                    if hdr.is_mpeg1:
                        sfl, sfs = _scalefactors_v1(
                            br, g, gr, si.scfsi[ch], sf_store[ch])
                        preflag = g.preflag
                    else:
                        is_int = (ch == 1 and hdr.mode == 1
                                  and bool(hdr.mode_ext & 1))
                        sfl, sfs, preflag, _slens = _scalefactors_lsf(
                            br, g, is_int)
                    vals, ok, gated = _huffman_spectrum(
                        br, g, hdr, part2_start)
                except EOFError:
                    vals, ok, gated = [0] * 576, False, False
                if ok:
                    xr = _reorder_short(
                        _requantize(vals, g, sfl, sfs, hdr, preflag),
                        g, hdr)
                    n_decoded += 1
                    if _collect_spectra is not None:
                        _collect_spectra.append((fi, gr, ch, vals))
                else:
                    xr = np.zeros(576)
                    if gated:
                        n_gated += 1
                    else:
                        n_acct += 1
                    if stop_on_fail:
                        return {
                            "sample_rate": hdr0.sample_rate,
                            "n_channels": hdr0.n_channels,
                            "samples": np.zeros(0),
                            "duration_s": 0.0,
                            "n_granules": n_granules,
                            "n_decoded": n_decoded,
                            "n_gated": n_gated,
                            "n_acct_fail": n_acct,
                            "n_resv_miss": n_resv,
                            "n_bad_side": n_bad,
                            "coverage": (n_decoded / n_granules
                                         if n_granules else 0.0),
                        }
                xrs.append(xr)
                oks.append(ok)
                if ch == 1:
                    sfr = sfl
                # next granule starts exactly part2_3_length bits in,
                # regardless of where a failed decode landed
                br.pos = part2_start + g.part2_3_length
            if nch == 2:
                if all(oks):
                    st = _apply_stereo(xrs, si.granules[gr], hdr, sfr)
                    if st == "gated":
                        # unimplemented intensity shape (short-block
                        # right channel): convert BOTH channel
                        # granules from decoded to gated — counted
                        # silence, same contract as an out-of-set
                        # Huffman table (round-10 review: the old
                        # path emitted MS-of-(L,0) as 'decoded')
                        n_decoded -= 2
                        n_gated += 2
                        xrs = [np.zeros(576), np.zeros(576)]
                        if stop_on_fail:
                            return {
                                "sample_rate": hdr0.sample_rate,
                                "n_channels": hdr0.n_channels,
                                "samples": np.zeros(0),
                                "duration_s": 0.0,
                                "n_granules": n_granules,
                                "n_decoded": n_decoded,
                                "n_gated": n_gated,
                                "n_acct_fail": n_acct,
                                "n_resv_miss": n_resv,
                                "n_bad_side": n_bad,
                                "coverage": (n_decoded / n_granules
                                             if n_granules else 0.0),
                            }
                else:
                    # stereo coupling mixes channels; a failed side
                    # poisons both, so both emit silence
                    xrs = [np.zeros(576), np.zeros(576)]
            for ch in range(nch):
                sbs = _imdct_granule(xrs[ch], si.granules[gr][ch],
                                     hdr, overlap[ch])
                frame_pcm[ch, 576 * gr:576 * (gr + 1)] = \
                    synths[ch].consume(sbs.T)
        pcm.append(frame_pcm)
        if len(resv) > 2048:
            del resv[:len(resv) - 1024]
        if sum(p.shape[1] for p in pcm) >= max_samples:
            # samples are capped but duration must stay frame-walk
            # exact (the WAV/FLAC cap convention, round-10 review):
            # finish the header walk without decoding
            for _o, h, _f in frame_iter:
                n_tail_samples += h.samples_per_frame
                n_frames += 1
            break
    if hdr0 is None or n_frames < 2:
        return None
    mono = np.concatenate([p.mean(axis=0) for p in pcm])
    out = {}
    if _keep_channels:
        out["channels"] = np.concatenate(pcm, axis=1)
    return {
        **out,
        "sample_rate": hdr0.sample_rate,
        "n_channels": hdr0.n_channels,
        "samples": mono[:max_samples],
        "duration_s": (len(mono) + n_tail_samples)
        / hdr0.sample_rate,
        "n_granules": n_granules,
        "n_decoded": n_decoded,
        "n_gated": n_gated,
        "n_acct_fail": n_acct,
        "n_resv_miss": n_resv,
        "n_bad_side": n_bad,
        "coverage": n_decoded / n_granules if n_granules else 0.0,
    }


# ---------------------------------------------------------------------------
# in-repo frame builder (the MP3 twin of multimodal.flac_encode's
# test-writer role: NOT an encoder — a bitstream constructor for
# round-trip units and fuzz fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int) -> None:
        assert 0 <= value < (1 << n), (value, n)
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def tell(self) -> int:
        return len(self.bits)

    def to_bytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _encode_granule_bits(w, spec, hdr, gr_index=0, scfsi=None):
    """Serialize one granule's scalefactors + spectrum; returns the
    filled Granule side-info fields.  Long, (MPEG-1) pure short and
    mixed blocks (mixed: lines 0-35 in long order under sfl[0..7],
    the rest in short transmission order from sfb 3); values beyond
    big_values must be in {-1,0,1} and big region magnitudes within
    the chosen table's dimensions.  With
    ``scfsi`` (MPEG-1 long granule 1 only): groups whose flag is set
    are NOT written — the decoder reuses granule 0's, so round-trip
    tests must feed identical scalefactors in those groups."""
    from . import _mp3huff as H

    values = spec["values"]
    tid = spec.get("table", 5)
    nx, ny, entries = H.PAIR_TABLES[tid]
    assert len(values) == 576
    short = spec.get("block") in ("short", "mixed")
    mixed = spec.get("block") == "mixed"
    # the builder serializes short/mixed scalefactors in the MPEG-1
    # layout only; an LSF spec would emit long-layout bits under
    # short side info and fail every granule's accounting confusingly
    assert hdr.is_mpeg1 or not short, \
        "builder short/mixed blocks are MPEG-1 only"
    start = w.tell()
    sfl = spec.get("scalefac_long", [0] * 21)
    sfs = spec.get("scalefac_short", [[0, 0, 0] for _ in range(12)])
    # choose scalefac_compress covering the scalefactor magnitudes
    def _need(vals):
        m = max(vals) if vals else 0
        n = 0
        while (1 << n) - 1 < m:
            n += 1
        return n
    if hdr.is_mpeg1 and short:
        if mixed:
            n1 = _need(sfl[:8]
                       + [v for row in sfs[3:6] for v in row])
            n2 = _need([v for row in sfs[6:12] for v in row])
        else:
            n1 = _need([v for row in sfs[:6] for v in row])
            n2 = _need([v for row in sfs[6:12] for v in row])
        sc = next(i for i, (a, b) in enumerate(_SLEN_V1)
                  if a >= n1 and b >= n2)
        slen1, slen2 = _SLEN_V1[sc]
        if mixed:
            for sfb in range(8):
                w.write(sfl[sfb], slen1)
            lo = 3
        else:
            lo = 0
        for sfb in range(lo, 6):
            for win in range(3):
                w.write(sfs[sfb][win], slen1)
        for sfb in range(6, 12):
            for win in range(3):
                w.write(sfs[sfb][win], slen2)
    elif hdr.is_mpeg1:
        n1, n2 = _need(sfl[:11]), _need(sfl[11:21])
        sc = next(i for i, (a, b) in enumerate(_SLEN_V1)
                  if a >= n1 and b >= n2)
        slen1, slen2 = _SLEN_V1[sc]
        groups = ((0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2))
        for gi, (a, b, sl) in enumerate(groups):
            if gr_index == 1 and scfsi and scfsi[gi]:
                continue  # decoder copies granule 0's group
            for sfb in range(a, b):
                w.write(sfl[sfb], sl)
    else:
        parts = ((0, 6), (6, 11), (11, 16), (16, 21))
        sl = [_need(sfl[a:b]) for a, b in parts]
        assert sl[0] <= 4 and sl[1] <= 4 and sl[2] <= 3 and sl[3] <= 3
        sc = ((sl[0] * 5 + sl[1]) << 4) | (sl[2] << 2) | sl[3]
        for (a, b), s in zip(parts, sl):
            for sfb in range(a, b):
                w.write(sfl[sfb], s)
    # split spectrum: big values then count1 quads then rzero
    last_big = -1
    last_nz = -1
    for i, v in enumerate(values):
        if v:
            last_nz = i
        if abs(v) > 1:
            last_big = i
    bv2 = last_big + 1
    bv2 += bv2 % 2
    n1_lines = max(0, last_nz + 1 - bv2)
    n1_lines += -n1_lines % 4
    assert bv2 + n1_lines <= 576
    # per-region table selection (long non-switching only): spec
    # "tables" = (t0, t1, t2) + region0/region1_count override — the
    # region-boundary fixture for the decoder's r1/r2 computation
    tids = spec.get("tables", (tid, tid, tid))
    # defaults put region boundaries at sfb 9 / sfb 17; region fields
    # are 4/3-bit side info (region1_count > 7 is unencodable — the
    # _BitWriter width assert catches a caller passing one)
    r0c = spec.get("region0_count", 8)
    r1c = spec.get("region1_count", 7)
    sfbl = _SFB_LONG[hdr.sample_rate]
    if short:
        bounds = (min(3 * _SFB_SHORT[hdr.sample_rate][3], bv2), bv2)
        tids = (tids[0], tids[1])
    else:
        bounds = (min(sfbl[min(r0c + 1, 22)], bv2),
                  min(sfbl[min(r0c + 1 + r1c + 1, 22)], bv2), bv2)
    encs = []
    for t in tids:
        _nx, t_ny, t_entries = H.PAIR_TABLES[t]
        e = {}
        for i, (hlen, hcod) in enumerate(t_entries):
            e[(i // t_ny, i % t_ny)] = (hlen, hcod)
        encs.append(e)
    prev = 0
    region_of = []
    for ri, b in enumerate(bounds):
        region_of.extend([ri] * (b - prev))
        prev = b
    for i in range(0, bv2, 2):
        x, y = values[i], values[i + 1]
        hlen, hcod = encs[region_of[i]][(abs(x), abs(y))]
        w.write(hcod, hlen)
        if x:
            w.write(1 if x < 0 else 0, 1)
        if y:
            w.write(1 if y < 0 else 0, 1)
    use_b = spec.get("count1table", "A") == "B"
    quads = H.QUAD_TABLE_B if use_b else H.QUAD_TABLE_A
    for i in range(bv2, bv2 + n1_lines, 4):
        q = values[i:i + 4]
        assert all(abs(v) <= 1 for v in q)
        code = (abs(q[0]) << 3) | (abs(q[1]) << 2) \
            | (abs(q[2]) << 1) | abs(q[3])
        hlen, hcod = quads[code]
        w.write(hcod, hlen)
        for v in q:
            if v:
                w.write(1 if v < 0 else 0, 1)
    g = Granule()
    g.part2_3_length = w.tell() - start
    g.big_values = bv2 // 2
    g.global_gain = spec.get("global_gain", 210)
    g.scalefac_compress = sc
    g.window_switching = 1 if short else 0
    g.block_type = 2 if short else 0
    g.mixed_block = 1 if mixed else 0
    # tests can declare a DIFFERENT table id in the side info than
    # the one the bits were encoded with (gated-table / accounting-
    # mismatch fixtures)
    if "declare_table" in spec:
        decl = spec["declare_table"]
        g.table_select = [decl, decl, decl]
    else:
        g.table_select = list(tids) + [0] * (3 - len(tids))
    g.subblock_gain = spec.get("subblock_gain", [0, 0, 0])
    g.region0_count = 7 if short else r0c
    g.region1_count = 36 if short else r1c
    g.preflag = spec.get("preflag", 0)
    g.scalefac_scale = spec.get("scalefac_scale", 0)
    g.count1table_select = 1 if use_b else 0
    return g


def build_frames(granule_specs, sample_rate=44100,
                 spill=0, mode=None, mode_ext=0, scfsi=None) -> bytes:
    """Construct a valid Layer III stream from per-granule spectral
    specs.  A spec is a dict (values[576 ints], table, block='short',
    scalefac_long / scalefac_short, subblock_gain, global_gain,
    scalefac_scale, preflag, count1table, declare_table) for mono, or
    a (left, right) pair of dicts for a stereo stream.  MPEG-1 packs
    two granules per frame (specs padded with silence to an even
    count); LSF rates emit one per frame.

    ``spill`` > 0 exercises the bit reservoir (frames after the first
    start their main data inside the previous frame's padding);
    ``mode``/``mode_ext`` set the header channel mode (default: mono
    for dict specs, plain stereo for pairs; pass mode=1 + mode_ext
    for joint stereo — with MS the builder's values are the
    TRANSMITTED mid/side spectra, what the decoder matrixes);
    ``scfsi`` (4 flags, MPEG-1 long only) marks scalefactor groups
    granule 1 reuses — round-trip tests must feed granule 1 the same
    scalefactors in those groups."""
    mpeg1 = sample_rate in (44100, 48000, 32000)
    per_frame = 2 if mpeg1 else 1
    specs = [s if isinstance(s, (tuple, list)) else (s,)
             for s in granule_specs]
    nch = len(specs[0])
    assert all(len(s) == nch for s in specs)
    silent = tuple({"values": [0] * 576} for _ in range(nch))
    while len(specs) % per_frame:
        specs.append(silent)
    if mode is None:
        mode = 3 if nch == 1 else 0
    assert (mode == 3) == (nch == 1)
    scfsi = list(scfsi or [0, 0, 0, 0])
    assert len(scfsi) == 4
    if any(scfsi):
        assert mpeg1, "scfsi is an MPEG-1 feature"
    ver_bits = 3 if mpeg1 else (2 if sample_rate >= 16000 else 0)
    sr_idx = _SAMPLE_RATES[ver_bits].index(sample_rate)
    brs = _BITRATE_V1_L3 if mpeg1 else _BITRATE_V2_L3
    out = bytearray()
    frames = []
    for f in range(0, len(specs), per_frame):
        w = _BitWriter()
        hdr_probe = MP3Header(ver_bits, 0, sample_rate, 0, mode,
                              mode_ext, 0, 1152 if mpeg1 else 576,
                              False)
        gs = []
        for gr in range(per_frame):
            for ch in range(nch):
                gs.append(_encode_granule_bits(
                    w, specs[f + gr][ch], hdr_probe, gr_index=gr,
                    scfsi=scfsi))
        frames.append((gs, w.to_bytes()))

    def _spilled(fi: int) -> int:
        # a frame cannot back-reference more bytes than it has
        return min(spill, len(frames[fi][1])) if fi > 0 else 0

    if mpeg1:
        side_bytes = 17 if nch == 1 else 32
    else:
        side_bytes = 9 if nch == 1 else 17
    for fi, (gs, main) in enumerate(frames):
        md_begin = _spilled(fi)
        local_main = main[md_begin:]
        next_spill = (frames[fi + 1][1][:_spilled(fi + 1)]
                      if spill and fi + 1 < len(frames) else b"")
        need = 4 + side_bytes + len(local_main) + len(next_spill)
        br_idx = next(
            i for i in range(1, 15)
            if (144 if mpeg1 else 72) * brs[i] * 1000
            // sample_rate >= need)
        hdr_word = (0x7FF << 21) | (ver_bits << 19) | (1 << 17)
        hdr_word |= 1 << 16  # no CRC
        hdr_word |= br_idx << 12 | sr_idx << 10
        hdr_word |= mode << 6 | mode_ext << 4
        hdr = parse_header(hdr_word)
        sw = _BitWriter()
        if mpeg1:
            sw.write(md_begin, 9)
            sw.write(0, 5 if nch == 1 else 3)
            for _ch in range(nch):
                for flag in scfsi:
                    sw.write(flag, 1)
        else:
            sw.write(md_begin, 8)
            sw.write(0, 1 if nch == 1 else 2)
        for g in gs:
            sw.write(g.part2_3_length, 12)
            sw.write(g.big_values, 9)
            sw.write(g.global_gain, 8)
            sw.write(g.scalefac_compress, 4 if mpeg1 else 9)
            sw.write(g.window_switching, 1)
            if g.window_switching:
                sw.write(g.block_type, 2)
                sw.write(g.mixed_block, 1)
                for t in g.table_select[:2]:
                    sw.write(t, 5)
                for sb in g.subblock_gain:
                    sw.write(sb, 3)
            else:
                for t in g.table_select:
                    sw.write(t, 5)
                sw.write(g.region0_count, 4)
                sw.write(g.region1_count, 3)
            if mpeg1:
                sw.write(g.preflag, 1)
            sw.write(g.scalefac_scale, 1)
            sw.write(g.count1table_select, 1)
        body = sw.to_bytes()
        assert len(body) == side_bytes
        frame = bytearray(hdr.frame_bytes)
        frame[:4] = hdr_word.to_bytes(4, "big")
        frame[4:4 + side_bytes] = body
        frame[4 + side_bytes:4 + side_bytes + len(local_main)] = \
            local_main
        if next_spill:
            # reservoir bytes live at the very END of this frame's
            # main section: main_data_begin counts back from the
            # next frame's main start, PADDING INCLUDED (exactly how
            # the decoder accumulates it)
            frame[len(frame) - len(next_spill):] = next_spill
        out.extend(frame)
    return bytes(out)


def probe_info(payload: bytes) -> Optional[dict]:
    """Probe-grade stream facts at the cheapest evidence level
    available (the 100 TB triage path):

    - a first-frame Xing/Info/VBRI tag carrying ``n_frames`` gives
      O(1) exact duration (``source='tag'`` — the tag counts audio
      frames; trusted like any container header field);
    - otherwise the header walk (``source='walk'``, O(frames) at
      ~566k frames/s — still struct reads only);
    - None when no two consistent frames exist (single-frame payloads
      fall back to the caller's CBR estimate).
    """
    pos = _skip_id3v2(payload)
    hdr = parse_header(int.from_bytes(payload[pos:pos + 4], "big")) \
        if pos + 4 <= len(payload) else None
    if hdr is not None and pos + hdr.frame_bytes <= len(payload):
        tag = parse_vbr_header(payload[pos:pos + hdr.frame_bytes],
                               hdr)
        if tag and tag.get("n_frames"):
            return {
                "duration_s": tag["n_frames"]
                * hdr.samples_per_frame / hdr.sample_rate,
                "sample_rate": hdr.sample_rate,
                "n_channels": hdr.n_channels,
                "source": "tag",
            }
    info = parse_stream(payload, decode_side_info=False)
    if info is None:
        return None
    return {
        "duration_s": info["duration_s"],
        "sample_rate": info["sample_rate"],
        "n_channels": info["n_channels"],
        "source": "walk",
    }
