"""PDF text extraction — the stdlib-subset reader for the largest
crawl-payload class the crawl front did not cover (round 12).

Not in the reference (its surface stops at the type system); this
extends the engine per the LLM-pipeline brief, sized against public
PDF 1.4–1.7 structure (ISO 32000): xref table + object walk, page
tree, FlateDecode/ASCIIHexDecode content streams, and the
text-showing operators (``Tj``/``TJ``/``'``/``"`` with
``Td``/``TD``/``T*``/``Tm`` line breaks).  Everything a stdlib parser
cannot honestly decode degrades to a VISIBLE status class — the same
contract as every codec in :mod:`.multimodal`:

* ``extracted`` — classic xref walked, all pages decoded.
* ``extracted-scan`` — xref missing/broken; objects recovered by a
  linear ``N G obj`` scan (the lenient path real crawl PDFs need).
* ``extracted-partial`` — some page's content stream was undecodable
  (unsupported filter, corrupt deflate) or CID-encoded; the readable
  pages' text is kept.
* ``cid-font`` — every shown string sits under a composite
  (``/Type0``) font: 2-byte CID codes need font CMaps this subset
  deliberately does not ship (no conformance ground truth in this
  container) — NULL text, never silently-wrong text.
* ``unsupported-filter`` — no content stream could be decoded.
* ``xref-stream`` — PDF 1.5+ cross-reference STREAM (compressed
  xref): documented out of the subset — NULL text.
* ``encrypted`` — trailer carries ``/Encrypt``: NULL text.
* ``parse-failed`` / ``not-pdf`` — structure beyond repair / wrong
  magic.  The kernel NEVER raises: one hostile document must never
  kill a Spark task (same rule as the WARC/HTML path).

Simple-font strings decode as latin-1 — the right call for the
Standard/WinAnsi encodings that dominate simple-font text, and the
honest documented approximation for the rest.

Gating follows the codec recipe: an in-repo spec-shaped writer
(:func:`pdf_write` — classic xref, correct offsets, optional Flate /
hex strings / TJ kerning / multi-page / Type0 / encryption / xref
streams) drives exact round trips and degrade-class units; fuzz pins
the never-raise contract.

Scale shape: :func:`extract_pdf_text` is one Arrow-batched
``pandas_udf`` over a binary column (the per-document loop IS the
parser, like :mod:`.htmltext` / :mod:`.multimodal`) — a narrow map
pass, no shuffle, no driver collection; feeds the existing text stack
(quality, language-ID, dedup) directly.
"""

from __future__ import annotations

import binascii
import re
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_pdf_text", "pdf_format_report", "pdf_write"]


# --- low-level object parser ------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num):
        self.num = num


class _PdfError(Exception):
    pass


def _skip_ws(b, i):
    n = len(b)
    while i < n:
        c = b[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = b.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


# the only bytes a literal string's inner loop must inspect; plain
# spans between them bulk-copy (the hot path — most strings contain
# no specials until the terminator)
_LIT_SPECIAL = re.compile(rb"[()\\\r]")


def _lit_string(b, i):
    """Literal ``(...)`` string starting at ``i`` (which is '(').
    Returns (bytes, next_index); handles nesting, escapes, octal,
    line continuations, and EOL normalization per ISO 32000 §7.3.4.2."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(b)
    while i < n:
        m = _LIT_SPECIAL.search(b, i)
        if m is None:
            break  # unterminated
        if m.start() > i:
            out += b[i:m.start()]
            i = m.start()
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\x08", 0x66: b"\x0c"}[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                val = 0
                k = 0
                while k < 3 and i < n and 0x30 <= b[i] <= 0x37:
                    val = val * 8 + (b[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
            elif e == 0x0D:  # line continuation
                i += 1
                if i < n and b[i] == 0x0A:
                    i += 1
            elif e == 0x0A:
                i += 1
            else:  # \( \) \\ and unknown escapes: the char itself
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        elif c == 0x0D:  # raw EOL in a string reads as \n
            out.append(0x0A)
            i += 1
            if i < n and b[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    raise _PdfError("unterminated string")


def _hex_string(b, i):
    """``<...>`` hex string at ``i`` (which is '<', not '<<')."""
    j = b.find(b">", i)
    if j < 0:
        raise _PdfError("unterminated hex string")
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", b[i + 1:j])
    if len(digits) % 2:
        digits += b"0"
    return binascii.unhexlify(digits), j + 1


def _name(b, i):
    """``/Name`` at ``i`` (which is '/'), with #xx hex escapes."""
    i += 1
    start = i
    n = len(b)
    while i < n and b[i] not in _WS and b[i] not in _DELIM:
        i += 1
    raw = b[start:i]
    raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                 lambda m: binascii.unhexlify(m.group(1)), raw)
    return raw.decode("latin-1"), i


def _parse_value(b, i):
    """One object-level value at ``i``: dict, array, name, string,
    number, ref, bool, null.  Returns (value, next_index)."""
    i = _skip_ws(b, i)
    if i >= len(b):
        raise _PdfError("eof")
    c = b[i]
    if b.startswith(b"<<", i):
        d = {}
        i += 2
        while True:
            i = _skip_ws(b, i)
            if b.startswith(b">>", i):
                return d, i + 2
            if i >= len(b) or b[i] != 0x2F:
                raise _PdfError("bad dict key")
            k, i = _name(b, i)
            v, i = _parse_value(b, i)
            d[k] = v
    if c == 0x5B:  # [
        arr = []
        i += 1
        while True:
            i = _skip_ws(b, i)
            if i < len(b) and b[i] == 0x5D:
                return arr, i + 1
            v, i = _parse_value(b, i)
            arr.append(v)
    if c == 0x28:
        return _lit_string(b, i)
    if c == 0x3C:
        return _hex_string(b, i)
    if c == 0x2F:
        return _name(b, i)
    if b.startswith(b"true", i):
        return True, i + 4
    if b.startswith(b"false", i):
        return False, i + 5
    if b.startswith(b"null", i):
        return None, i + 4
    m = _NUM_RE.match(b, i)
    if m:
        # "N G R" indirect reference?
        m2 = re.compile(rb"(\d+)\s+(\d+)\s+R\b").match(b, i)
        if m2:
            return _Ref(int(m2.group(1))), m2.end()
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    raise _PdfError("bad value at %d" % i)


class _Doc:
    """Parsed PDF: object offsets + lazy fetch with deref."""

    def __init__(self, data: bytes, offsets: dict, trailer: dict,
                 via_scan: bool):
        self.data = data
        self.offsets = offsets
        self.trailer = trailer
        self.via_scan = via_scan
        self._cache = {}

    def deref(self, v, depth=0):
        if isinstance(v, _Ref):
            if depth > 32:
                raise _PdfError("ref cycle")
            return self.deref(self.obj(v.num), depth + 1)
        return v

    def obj(self, num):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            raise _PdfError("missing object %d" % num)
        m = _OBJ_RE.match(self.data, _skip_ws(self.data, off))
        if not m or int(m.group(1)) != num:
            raise _PdfError("offset does not hold object %d" % num)
        val, i = _parse_value(self.data, m.end())
        i = _skip_ws(self.data, i)
        if self.data.startswith(b"stream", i):
            val = ("stream", val, self._stream_bytes(val, i))
        self._cache[num] = val
        return val

    def _stream_bytes(self, dct, i):
        """Raw stream payload following the ``stream`` keyword at
        ``i`` (decoding happens in :func:`_decode_stream`)."""
        i += 6
        if self.data.startswith(b"\r\n", i):
            i += 2
        elif i < len(self.data) and self.data[i] in (0x0A, 0x0D):
            i += 1
        length = dct.get("Length")
        if isinstance(length, _Ref):
            try:
                length = self.deref(length)
            except _PdfError:
                length = None
        if isinstance(length, (int, float)):
            end = i + int(length)
            if self.data.startswith(b"endstream",
                                    _skip_ws(self.data, end)):
                return self.data[i:end]
        # lenient: wrong/indirect-unresolvable /Length — search
        end = self.data.find(b"endstream", i)
        if end < 0:
            raise _PdfError("unterminated stream")
        raw = self.data[i:end]
        return raw[:-2] if raw.endswith(b"\r\n") else (
            raw[:-1] if raw.endswith(b"\n") else raw)


class _XrefStreamError(_PdfError):
    pass


def _load_doc(data: bytes) -> _Doc:
    """Classic-xref walk: the last ``startxref``, xref table chains
    via ``/Prev``.  Raises :class:`_XrefStreamError` when the offset
    points at a cross-reference STREAM (PDF 1.5 compressed xref — the
    documented out-of-subset class), plain :class:`_PdfError` when
    the structure is broken (caller falls back to the object scan)."""
    tail = data[-2048:]
    ms = list(re.finditer(rb"startxref\s+(\d+)", tail))
    if not ms:
        raise _PdfError("no startxref")
    off = int(ms[-1].group(1))
    offsets: dict[int, int] = {}
    trailer: dict = {}
    seen = set()
    while off is not None and off not in seen and off < len(data):
        seen.add(off)
        i = _skip_ws(data, off)
        if not data.startswith(b"xref", i):
            if _OBJ_RE.match(data, i):
                # an object at the xref offset = xref STREAM
                raise _XrefStreamError("cross-reference stream")
            raise _PdfError("bad xref offset")
        i += 4
        while True:
            i = _skip_ws(data, i)
            m = re.compile(rb"(\d+)\s+(\d+)").match(data, i)
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            i = _skip_ws(data, m.end())
            for k in range(count):
                ent = data[i:i + 20]
                if len(ent) < 18:
                    raise _PdfError("short xref entry")
                kind = ent[17:18]
                num = start + k
                # newest-first walk: first entry seen wins
                if kind == b"n" and num not in offsets:
                    offsets[num] = int(ent[:10])
                i += 20
        i = _skip_ws(data, i)
        if not data.startswith(b"trailer", i):
            raise _PdfError("missing trailer")
        tdict, _ = _parse_value(data, i + 7)
        for k, v in tdict.items():
            trailer.setdefault(k, v)
        prev = tdict.get("Prev")
        off = int(prev) if isinstance(prev, (int, float)) else None
    if "Root" not in trailer:
        raise _PdfError("trailer has no /Root")
    return _Doc(data, offsets, trailer, via_scan=False)


def _scan_doc(data: bytes) -> _Doc:
    """Lenient recovery for broken/absent xref: linear ``N G obj``
    scan (what every real-world PDF repairer does); the catalog is
    found by ``/Type /Catalog``."""
    offsets = {}
    for m in _OBJ_RE.finditer(data):
        offsets[int(m.group(1))] = m.start()  # later update wins
    if not offsets:
        raise _PdfError("no objects found")
    doc = _Doc(data, offsets, {}, via_scan=True)
    root = None
    for num in offsets:
        try:
            v = doc.obj(num)
        except _PdfError:
            continue
        d = v[1] if isinstance(v, tuple) else v
        if isinstance(d, dict) and d.get("Type") == "Catalog":
            root = _Ref(num)
            break
    if root is None:
        raise _PdfError("no catalog")
    doc.trailer = {"Root": root}
    # encryption is still detectable from the newest trailer dict
    m = re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data[-4096:])
    if m:
        doc.trailer["Encrypt"] = True
    return doc


class _UnsupportedFilter(_PdfError):
    pass


def _decode_stream(doc: _Doc, obj) -> bytes:
    if not (isinstance(obj, tuple) and obj[0] == "stream"):
        raise _PdfError("not a stream")
    dct, raw = obj[1], obj[2]
    filt = doc.deref(dct.get("Filter"))
    filters = ([] if filt is None
               else filt if isinstance(filt, list) else [filt])
    for f in filters:
        f = doc.deref(f)
        if f in ("FlateDecode", "Fl"):
            d = zlib.decompressobj()
            try:
                raw = d.decompress(raw) + d.flush()
            except zlib.error as e:
                raise _PdfError("bad deflate") from e
        elif f in ("ASCIIHexDecode", "AHx"):
            digits = re.sub(rb"[^0-9A-Fa-f]", b"",
                            raw.split(b">")[0])
            if len(digits) % 2:
                digits += b"0"
            raw = binascii.unhexlify(digits)
        else:
            raise _UnsupportedFilter(str(f))
    return raw


# --- content-stream tokenizer + text assembly -------------------------------

_OP_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


def _content_tokens(b: bytes):
    """Token stream for a page content stream: ('str', bytes) |
    ('num', float) | ('name', str) | ('mark', '['|']') | ('op', bytes).
    Inline-image payloads (``BI .. ID <binary> EI``) are skipped."""
    i = 0
    n = len(b)
    while i < n:
        i = _skip_ws(b, i)
        if i >= n:
            return
        c = b[i]
        if c == 0x28:
            s, i = _lit_string(b, i)
            yield ("str", s)
        elif b.startswith(b"<<", i):
            d, i = _parse_value(b, i)
            yield ("dict", d)
        elif c == 0x3C:
            s, i = _hex_string(b, i)
            yield ("str", s)
        elif c == 0x2F:
            nm, i = _name(b, i)
            yield ("name", nm)
        elif c == 0x5B:
            yield ("mark", "[")
            i += 1
        elif c == 0x5D:
            yield ("mark", "]")
            i += 1
        elif c in b"{}":
            i += 1
        else:
            m = _NUM_RE.match(b, i)
            op = _OP_RE.match(b, i)
            if m and op and op.group(0) == m.group(0):
                yield ("num", float(m.group(0)))
                i = m.end()
                continue
            if not op:
                i += 1
                continue
            tok = op.group(0)
            i = op.end()
            if tok == b"ID":
                # inline image binary: skip to EI
                j = b.find(b"EI", i)
                i = n if j < 0 else j + 2
                continue
            yield ("op", tok)


# TJ kerning: a displacement ≤ this (thousandths of text-space units,
# negative moves right-ward text apart) reads as a word space — the
# threshold every public extractor uses (±, commonly 180/1000 em).
_TJ_SPACE = -180.0

_LINE_OPS = (b"Td", b"TD", b"T*", b"Tm")


def _page_text(doc: _Doc, content: bytes, fonts: dict):
    """(lines_text, saw_cid, any_simple_show): assemble shown text.
    Line model: every show op appends to the current line; every
    line-positioning op (Td/TD/T*/Tm) and the ``'``/``"`` implicit
    T* flushes the line IF anything was shown since the last flush
    (so positioning before the first show adds nothing)."""
    lines: list[str] = []
    cur: list[str] = []
    pending = False
    saw_cid = False
    any_show = False
    cur_cid = False
    stack: list = []

    def flush():
        nonlocal pending
        if pending:
            lines.append("".join(cur))
            cur.clear()
            pending = False

    def show(raw: bytes):
        nonlocal pending, saw_cid, any_show
        if cur_cid:
            saw_cid = True
            return
        cur.append(raw.decode("latin-1"))
        pending = True
        any_show = True

    arr: list | None = None
    for typ, val in _content_tokens(content):
        if typ == "mark":
            arr = [] if val == "[" else arr
            if val == "]" and arr is not None:
                stack.append(("arr", arr))
                arr = None
            continue
        if typ != "op":
            if arr is not None:
                arr.append((typ, val))
            else:
                stack.append((typ, val))
            continue
        op = val
        if op == b"Tf":
            if len(stack) >= 2 and stack[-2][0] == "name":
                cur_cid = bool(fonts.get(stack[-2][1], False))
        elif op in _LINE_OPS:
            flush()
        elif op == b"Tj":
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"'":
            flush()
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b'"':
            flush()
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"TJ":
            if stack and stack[-1][0] == "arr":
                for t2, v2 in stack[-1][1]:
                    if t2 == "str":
                        show(v2)
                    elif t2 == "num" and v2 <= _TJ_SPACE and pending:
                        cur.append(" ")
        stack.clear()
    flush()
    return "\n".join(lines), saw_cid, any_show


def _page_fonts(doc: _Doc, resources) -> dict:
    """{font-resource-name: is_type0} from a /Resources dict."""
    fonts = {}
    res = doc.deref(resources) if resources is not None else None
    if isinstance(res, dict):
        fdict = doc.deref(res.get("Font"))
        if isinstance(fdict, dict):
            for k, v in fdict.items():
                try:
                    fd = doc.deref(v)
                except _PdfError:
                    continue
                fonts[k] = (isinstance(fd, dict)
                            and fd.get("Subtype") == "Type0")
    return fonts


def _walk_pages(doc: _Doc, node, inherited_res, out, depth=0):
    if depth > 64 or len(out) > 10_000:
        return
    d = doc.deref(node)
    if not isinstance(d, dict):
        return
    res = d.get("Resources", inherited_res)
    if d.get("Type") == "Page":
        out.append((d, res))
        return
    kids = doc.deref(d.get("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _walk_pages(doc, kid, res, out, depth + 1)


def _try_extract(doc: _Doc):
    """(text, status, n_pages) from a loaded doc; raises
    :class:`_PdfError` when root/page-tree resolution fails (so the
    caller can fall back to the object scan)."""
    if doc.trailer.get("Encrypt") is not None:
        return (None, "encrypted", None)
    root = doc.deref(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise _PdfError("bad /Root")
    pages: list = []
    _walk_pages(doc, root.get("Pages"), None, pages)
    if not pages:
        raise _PdfError("no pages")
    texts = []
    bad_pages = 0
    cid_pages = 0
    for pdict, res in pages:
        try:
            contents = doc.deref(pdict.get("Contents"))
            if isinstance(contents, list):
                blob = b"\n".join(
                    _decode_stream(doc, doc.deref(c))
                    for c in contents)
            elif contents is None:
                texts.append("")
                continue
            else:
                blob = _decode_stream(doc, contents)
            fonts = _page_fonts(doc, res)
            txt, saw_cid, any_show = _page_text(doc, blob, fonts)
        except _PdfError:
            bad_pages += 1
            continue
        if saw_cid and not any_show:
            cid_pages += 1  # every shown string was composite-font
            continue
        texts.append(txt)
        if saw_cid:
            bad_pages += 1  # mixed page: CID spans dropped
    n = len(pages)
    text = "\n".join(texts)
    if cid_pages == n:
        return (None, "cid-font", n)
    if bad_pages + cid_pages == n and not text:
        return (None, "unsupported-filter", n)
    if bad_pages or cid_pages:
        return (text, "extracted-partial", n)
    return (text, "extracted-scan" if doc.via_scan else "extracted", n)


def _extract_pdf_one(b):
    """(text, status, n_pages) for one payload — never raises."""
    if b is None:
        return (None, None, None)
    try:
        data = bytes(b)
        if not data.startswith(b"%PDF-"):
            return (None, "not-pdf", None)
        try:
            return _try_extract(_load_doc(data))
        except _XrefStreamError:
            return (None, "xref-stream", None)
        except _PdfError:
            # broken xref / offsets / page tree: the lenient path —
            # recover objects by linear scan, then re-extract
            try:
                return _try_extract(_scan_doc(data))
            except _PdfError:
                return (None, "parse-failed", None)
    except Exception:
        # the never-raise contract: structure beyond anything the
        # walkers anticipated is still just one bad document
        return (None, "parse-failed", None)


def extract_pdf_text(payload: Column) -> Column:
    """Binary PDF payload → ``struct<text, status, n_pages>`` (see the
    module docstring for the status classes).  One Arrow-batched
    ``pandas_udf`` map pass — no shuffle, scale-free; NULL in → NULL
    out; one hostile document can never kill the task.  Feeds the
    text stack exactly like
    :func:`~bertrand_spark.pipeline.htmltext.extract_html_text`."""

    @F.pandas_udf("struct<text: string, status: string, n_pages: int>")
    def kernel(payloads: pd.Series) -> pd.DataFrame:
        rows = [_extract_pdf_one(p) for p in payloads]
        return pd.DataFrame(rows, columns=["text", "status", "n_pages"])

    return kernel(payload)


def pdf_format_report(df: DataFrame, extracted: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-status extraction outcomes — the PDF twin of
    :func:`~bertrand_spark.pipeline.multimodal.decode_format_report`:
    join inputs to outcomes on ``id_col`` and aggregate counts +
    page totals per status class (one shuffle over the tiny
    status-cardinality key space)."""
    e = extracted.select(id_col, "pdf.status", "pdf.n_pages") \
        if "pdf" in extracted.columns else extracted
    return (
        e.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.coalesce(F.sum("n_pages"), F.lit(0)).alias("n_pages"),
             F.sum(F.when(F.col("n_pages").isNull(), 1).otherwise(0))
             .alias("n_unpaged"))
        .orderBy("status")
    )


# --- in-repo writer (the gating twin, NOT a production sink) ----------------


def _esc_lit(s: str) -> bytes:
    raw = s.encode("latin-1", "replace")
    out = bytearray()
    for c in raw:
        if c in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([c])
        elif c == 0x0A:
            out += b"\\n"
        elif c == 0x0D:
            out += b"\\r"
        else:
            out.append(c)
    return bytes(out)


def _hex_lit(s: str) -> bytes:
    return b"<" + s.encode("latin-1", "replace").hex().encode() + b">"


def _content_for(text: str, op_mix: bool) -> bytes:
    """BT/ET block for one page: one line-positioning op + one show op
    per text line, cycling Tj / TJ-with-kerning / ``'`` and literal /
    hex strings so every reader path is exercised."""
    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for j, line in enumerate(text.split("\n")):
        mode = (j % 3) if op_mix else 0
        use_hex = op_mix and (j % 4 == 3)
        tok = _hex_lit(line) if use_hex else b"(" + _esc_lit(line) + b")"
        if mode == 2 and j > 0:
            # ' = T* + show: the op itself is the line break
            parts.append(tok + b" '")
            continue
        if j > 0:
            parts.append(b"0 -14 Td")
        if mode == 1 and " " in line:
            a, rest = line.split(" ", 1)
            ta = _hex_lit(a) if use_hex else b"(" + _esc_lit(a) + b")"
            tb = (_hex_lit(rest) if use_hex
                  else b"(" + _esc_lit(rest) + b")")
            parts.append(b"[" + ta + b" -200 " + tb + b"] TJ")
        else:
            parts.append(tok + b" Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def pdf_write(
    pages,
    *,
    flate: bool = True,
    op_mix: bool = True,
    encrypt: bool = False,
    xref_stream: bool = False,
    type0_font: bool = False,
    bad_filter: bool = False,
    break_xref: bool = False,
) -> bytes:
    """In-repo classic-xref PDF writer (the test/gating twin of
    :func:`extract_pdf_text`): ``pages`` is a list of page texts.
    Flags build the degrade-class fixtures: ``encrypt`` adds an
    ``/Encrypt`` trailer entry, ``xref_stream`` replaces the classic
    table with a ``/Type /XRef`` stream object, ``type0_font`` makes
    the page font composite (CID), ``bad_filter`` declares an
    unsupported ``/JBIG2Decode`` filter, ``break_xref`` zeroes the
    table offsets (forcing the reader's object scan)."""
    if isinstance(pages, str):
        pages = [pages]
    bodies: list[bytes] = []

    def add(body: bytes) -> int:
        bodies.append(body)
        return len(bodies)  # 1-based object number

    root = add(b"")  # placeholder, filled below
    pages_obj = add(b"")
    if type0_font:
        font = add(b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
                   b"/Encoding /Identity-H >>")
    else:
        font = add(b"<< /Type /Font /Subtype /Type1 "
                   b"/BaseFont /Helvetica >>")
    kid_nums = []
    for text in pages:
        content = _content_for(text, op_mix)
        if bad_filter:
            filt, data = b"/Filter /JBIG2Decode ", content
        elif flate:
            filt, data = b"/Filter /FlateDecode ", zlib.compress(content)
        else:
            filt, data = b"", content
        cnum = add(b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
                   + data + b"\nendstream")
        kid_nums.append(add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (pages_obj, font, cnum)))
    enc = add(b"<< /Filter /Standard /V 1 /R 2 /O (x) /U (x) /P -44 >>") \
        if encrypt else None
    bodies[root - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % pages_obj
    bodies[pages_obj - 1] = (
        b"<< /Type /Pages /Kids [" +
        b" ".join(b"%d 0 R" % k for k in kid_nums) +
        b"] /Count %d >>" % len(kid_nums))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"

    trailer_extra = b" /Encrypt %d 0 R" % enc if encrypt else b""
    if xref_stream:
        # PDF 1.5 compressed-xref shape: startxref points at a
        # /Type /XRef STREAM object (payload content irrelevant —
        # the reader must classify, not parse)
        xoff = len(out)
        out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 2 1] "
                b"/Root %d 0 R /Length 4 >>\nstream\n\x00\x00\x00\x00"
                b"\nendstream\nendobj\n"
                % (len(bodies) + 1, len(bodies) + 2, root))
        out += b"startxref\n%d\n%%%%EOF\n" % xoff
        return bytes(out)
    xoff = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % (0 if break_xref else off)
    out += (b"trailer\n<< /Size %d /Root %d 0 R" % (len(bodies) + 1, root)
            + trailer_extra + b" >>\nstartxref\n%d\n%%%%EOF\n" % xoff)
    return bytes(out)
