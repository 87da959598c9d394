"""Layer III Huffman spectrum tables (ISO/IEC 11172-3 Table B.7) —
the VALIDATED subset — plus the structural validator and peek-LUT
builder the decoder uses.

Provenance and evidence grade: the pair tables below are transcribed
from the public ISO 11172-3 Annex B listing.  With no conformance
bitstreams or spec copy available in this environment, a transcription
is shipped ONLY if it passes exact structural validation — Kraft
completeness (every Layer III table is a complete prefix code, so
sum(2^-hlen) must equal exactly 1) and pairwise prefix-freeness.  A
single mis-transcribed code length breaks completeness and a
mis-transcribed code value almost surely collides, so passing both is
a strong (not infallible) fingerprint of a faithful transcription;
the residual risk — same-length value swaps that keep the code
prefix-free — is documented here and in ``mp3dec.decode``.

Tables 7, 9-15 and the escape families 16-23/24-31 did NOT validate
as transcribed and are deliberately ABSENT rather than "repaired":
inventing lengths/codes to force Kraft completeness would produce a
decoder that consumes the right number of bits while emitting wrong
spectra — the dishonest failure mode.  ``mp3dec.decode`` degrades any
granule selecting an absent table to silence and counts it
(``n_gated_granules``), so coverage is always visible per payload.

``HUFF_LINBITS`` is kept for ALL ids (it is header-derived metadata
the parse layer reports on), independent of pair-table presence.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

# pair tables: id -> (nx, ny, entries) with entries[x*ny+y] = (hlen, hcod)
# in x-major order, exactly as ISO 11172-3 Table B.7 prints them.
PAIR_TABLES: Dict[int, Tuple[int, int, tuple]] = {
    1: (2, 2, (
        (1, 0x1), (3, 0x1),
        (2, 0x1), (3, 0x0),
    )),
    2: (3, 3, (
        (1, 0x1), (3, 0x2), (6, 0x1),
        (3, 0x3), (3, 0x1), (5, 0x1),
        (5, 0x3), (5, 0x2), (6, 0x0),
    )),
    3: (3, 3, (
        (2, 0x3), (2, 0x2), (6, 0x1),
        (3, 0x1), (2, 0x1), (5, 0x1),
        (5, 0x3), (5, 0x2), (6, 0x0),
    )),
    5: (4, 4, (
        (1, 0x1), (3, 0x2), (6, 0x6), (7, 0x5),
        (3, 0x3), (3, 0x1), (6, 0x4), (7, 0x4),
        (6, 0x7), (6, 0x5), (7, 0x7), (8, 0x1),
        (7, 0x6), (6, 0x1), (7, 0x1), (8, 0x0),
    )),
    6: (4, 4, (
        (3, 0x7), (3, 0x3), (5, 0x5), (7, 0x1),
        (3, 0x6), (2, 0x2), (4, 0x3), (5, 0x2),
        (4, 0x5), (4, 0x4), (5, 0x4), (6, 0x1),
        (6, 0x3), (5, 0x3), (6, 0x2), (7, 0x0),
    )),
    8: (6, 6, (
        (2, 0x3), (3, 0x4), (6, 0x6), (8, 0x12), (8, 0xc), (9, 0x5),
        (3, 0x5), (2, 0x1), (4, 0x2), (8, 0x10), (8, 0x9), (8, 0x3),
        (6, 0x7), (4, 0x3), (6, 0x5), (8, 0xe), (8, 0x7), (9, 0x3),
        (8, 0x13), (8, 0x11), (8, 0xf), (9, 0xd), (9, 0xa), (10, 0x4),
        (8, 0xd), (7, 0x5), (8, 0x8), (9, 0xb), (10, 0x5), (10, 0x1),
        (9, 0xc), (8, 0x4), (9, 0x4), (9, 0x1), (11, 0x1), (11, 0x0),
    )),
}

# count1 (quadruple) tables, ISO 11172-3 Table B.7 "A" and "B":
# entry index is the 4-bit value (v<<3 | w<<2 | x<<1 | y).
QUAD_TABLE_A = (
    (1, 0x1), (4, 0x5), (4, 0x4), (5, 0x5),
    (4, 0x6), (6, 0x5), (5, 0x4), (6, 0x4),
    (4, 0x7), (5, 0x3), (5, 0x6), (6, 0x0),
    (5, 0x7), (6, 0x3), (6, 0x2), (6, 0x1),
)
# table B is the fixed 4-bit code: hcod = 15 - value
QUAD_TABLE_B = tuple((4, 15 - i) for i in range(16))

# linbits by table id (ISO 11172-3 Table B.7 header column); ids 16-23
# share table 16's codes, 24-31 share table 24's — kept for the parse
# layer's escape classification even though those pair tables are
# absent above.
HUFF_LINBITS = {
    0: 0, 1: 0, 2: 0, 3: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0, 10: 0,
    11: 0, 12: 0, 13: 0, 15: 0,
    16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
    24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13,
}


def validate_table(entries, what: str) -> None:
    """Exact structural validation: Kraft completeness and pairwise
    prefix-freeness.  Raises AssertionError with the offending entries
    — import fails loudly if the shipped data ever regresses."""
    from fractions import Fraction

    kraft = sum(Fraction(1, 1 << l) for l, _ in entries)
    assert kraft == 1, f"{what}: Kraft sum {kraft} != 1"
    for i, (l1, c1) in enumerate(entries):
        assert 0 < l1 <= 19 and 0 <= c1 < (1 << l1), (what, i)
        for j, (l2, c2) in enumerate(entries):
            if i < j:
                if l1 == l2:
                    assert c1 != c2, f"{what}: dup code {i}/{j}"
                elif l1 < l2:
                    assert (c2 >> (l2 - l1)) != c1, \
                        f"{what}: {i} prefixes {j}"
                else:
                    assert (c1 >> (l1 - l2)) != c2, \
                        f"{what}: {j} prefixes {i}"


_LUT_CACHE: Dict[object, tuple] = {}


def lookup_table(tid) -> Optional[tuple]:
    """(maxlen, flat LUT, ny) for a pair table id, or the quad tables
    under ids 'A'/'B'; None when the id is outside the validated set.
    The LUT maps a ``maxlen``-bit peek to ``(nbits << 16) | payload``
    where payload is ``x << 8 | y`` (pairs) or the 4-bit quad value —
    one list index per decoded symbol, built once per table."""
    if tid in _LUT_CACHE:
        return _LUT_CACHE[tid]
    if tid == "A":
        entries, ny, vals = QUAD_TABLE_A, 0, list(range(16))
    elif tid == "B":
        entries, ny, vals = QUAD_TABLE_B, 0, list(range(16))
    elif tid in PAIR_TABLES:
        nx, ny, entries = PAIR_TABLES[tid]
        vals = [(i // ny) << 8 | (i % ny) for i in range(len(entries))]
    else:
        _LUT_CACHE[tid] = None
        return None
    validate_table(entries, f"huffman table {tid}")
    maxlen = max(l for l, _ in entries)
    lut = [0] * (1 << maxlen)
    for (hlen, hcod), v in zip(entries, vals):
        base = hcod << (maxlen - hlen)
        packed = (hlen << 16) | v
        for k in range(1 << (maxlen - hlen)):
            lut[base + k] = packed
    out = (maxlen, lut, ny)
    _LUT_CACHE[tid] = out
    return out
