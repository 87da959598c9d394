"""WARC ingestion — the canonical crawl source format (ISO 28500).

A crawl corpus arrives as many ~1 GB ``.warc.gz`` files, each a
concatenation of per-record gzip members.  The distributed shape is
files-as-parallel-unit: ``spark.read.format("binaryFile")`` lists the
files into a DataFrame (one row per file, contents lazily read inside
the scan), and an Arrow-batched ``mapInPandas`` walker explodes each
file into records — at 100 TB that is 100k files spread across
executors with no shuffle, the same plan Common Crawl processors use.
The per-file walk is pure stdlib (``zlib`` member iteration + header
parses); a truncated tail or malformed member ends THAT FILE's walk
(truncated tails are normal in crawls) — it never kills the task.

Feeds :func:`bertrand_spark.pipeline.htmltext.extract_html_text` (the
response payloads are the HTML) and the multimodal payload columns.

Output schema (response records by default)::

    url string, warc_ts string (ISO-8601 as written), record_type
    string, mime string, charset string, http_status int,
    payload binary

Gating follows the codec recipe: an in-repo spec-shaped writer
(:func:`warc_write`) drives exact round trips, multi-record /
multi-member / truncation / garbage fuzz units.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator
from urllib.parse import unquote, urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_warc", "read_warc_streaming", "warc_records",
           "warc_records_worker_open", "parse_warc", "warc_write"]

_SCHEMA = ("path string, url string, warc_ts string, "
           "record_type string, mime string, charset string, "
           "http_status int, payload binary")


# Read size for the decompression loop — bounds each Python-level
# iteration, not correctness.
_GZ_CHUNK = 1 << 20


def _gunzip_chain(data: bytes) -> bytes:
    """Decompressed prefix of a chain of concatenated gzip members
    (the standard WARC layout is one member per record; a plain single
    member walks identically).

    Linear in total bytes regardless of member count: ``gzip.GzipFile``
    walks concatenated members natively with an internal buffered
    reader, so no per-member tail copy ever happens.  (The previous
    per-member ``decompressobj`` walk re-sliced the remaining tail for
    every member — O(bytes × members), minutes of pure memcpy at
    Common Crawl shape: ~1 GB .gz, 30k–150k members.)  Member
    boundaries are deliberately not surfaced: WARC records are
    self-delimited by Content-Length, so :func:`_split_records` never
    needs them.  A truncated tail, mid-stream corruption, or trailing
    garbage ends the walk with everything decompressed so far — the
    parsed-prefix degrade the crawl contract requires."""
    g = gzip.GzipFile(fileobj=io.BytesIO(data))
    parts = []
    try:
        while True:
            # read1, not read: read(n) loops the buffered reader until
            # n bytes accumulate, so a corrupt member mid-chain would
            # discard every clean member buffered in the same call;
            # read1 surfaces each decompressed span as it is produced,
            # keeping everything before the fault.
            chunk = g.read1(_GZ_CHUNK)
            if not chunk:
                break
            parts.append(chunk)
    except (OSError, EOFError, zlib.error):
        pass  # truncated / corrupt member — keep the parsed prefix
    return b"".join(parts)


def _split_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """(warc_headers, payload) for each record in an UNCOMPRESSED
    stream: version line, CRLF headers, Content-Length payload bytes,
    CRLF CRLF separator.  Stops on malformed/truncated structure."""
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            return
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            return
        head = blob[pos:end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        hdrs = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            return
        if clen < 0:
            return  # adversarial length must not move pos backward
        body_start = end + 4
        if body_start + clen > n:
            return  # truncated payload
        yield hdrs, blob[body_start:body_start + clen]
        pos = body_start + clen
        # skip the two record-terminating CRLFs (tolerate their
        # absence at EOF / sloppy writers)
        while blob.startswith(b"\r\n", pos):
            pos += 2


def _split_http(payload: bytes):
    """(status, content-type, charset, body) from an HTTP response
    payload; (None, None, None, payload) when it does not parse as
    HTTP.  ``charset`` is the Content-Type's charset parameter (the
    transport-declared encoding — feeds
    :func:`bertrand_spark.pipeline.htmltext.decode_html_bytes`)."""
    end = payload.find(b"\r\n\r\n")
    if end < 0 or not payload.startswith(b"HTTP/"):
        return None, None, None, payload
    head = payload[:end].decode("latin-1", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None, payload
    mime = charset = None
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep and k.strip().lower() == "content-type":
            pieces = v.split(";")
            mime = pieces[0].strip().lower() or None
            for piece in pieces[1:]:
                pk, psep, pv = piece.partition("=")
                if psep and pk.strip().lower() == "charset":
                    charset = pv.strip().strip('"\'').lower() or None
            break
    return status, mime, charset, payload[end + 4:]


def parse_warc(data: bytes, record_types: tuple = ("response",)):
    """All records of the wanted types from one WARC file's bytes
    (gzipped per-member or plain) as tuples
    (url, warc_ts, record_type, mime, charset, http_status, body).  For
    response records the HTTP envelope is split off: ``mime`` is the
    cleaned Content-Type, ``payload`` the entity body.  Non-HTTP
    payloads pass through whole with NULL status/mime."""
    if data[:2] == b"\x1f\x8b":
        blobs = iter([_gunzip_chain(data)])
    else:
        blobs = iter([data])
    out = []
    for blob in blobs:
        for hdrs, payload in _split_records(blob):
            rtype = hdrs.get("warc-type", "")
            if record_types and rtype not in record_types:
                continue
            status, mime, charset, body = _split_http(payload)
            if mime is None:
                ct = hdrs.get("content-type", "")
                if ct and not ct.lower().startswith("application/http"):
                    mime = ct.split(";")[0].strip().lower() or None
            out.append((
                hdrs.get("warc-target-uri"),
                hdrs.get("warc-date"),
                rtype or None,
                mime,
                charset,
                status,
                body,
            ))
    return out


def warc_records(
    files_df: DataFrame,
    record_types: tuple = ("response",),
) -> DataFrame:
    """The record-explosion transform over a (path, content) files
    DataFrame — the shared core of :func:`read_warc` (batch) and
    :func:`bertrand_spark.streaming.rollup.stream_extract_warc`
    (per-micro-batch): one Arrow-batched ``mapInPandas``, no
    shuffle.  Malformed or truncated files degrade to however many
    records parsed before the fault."""
    rts = tuple(record_types)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc(bytes(content), rts)
                except Exception:
                    recs = []  # per-file degrade, never a task death
                rows.extend((p, *r) for r in recs)
            yield pd.DataFrame(
                rows,
                columns=["path", "url", "warc_ts", "record_type",
                         "mime", "charset", "http_status", "payload"],
            )

    return files_df.select("path", "content").mapInPandas(
        batches, _SCHEMA)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
) -> DataFrame:
    """WARC files → DataFrame[path, url, warc_ts, record_type, mime,
    charset, http_status, payload].

    ``binaryFile`` lists and reads the files (one input row per file —
    the parallel unit; Spark spreads files across executors, no
    shuffle anywhere in the plan), and the stdlib record walk runs as
    an Arrow-batched ``mapInPandas`` (:func:`warc_records`).  Holds
    one whole file (plus its decompressed records) per task — fine at
    test/moderate segment sizes; for crawl-sized ~1 GB segments use
    :func:`read_warc_streaming`, which is bounded-memory."""
    return warc_records(
        spark.read.format("binaryFile").load(path), record_types)


def _iter_warc_records(fobj) -> Iterator[tuple[dict, bytes]]:
    """(warc_headers, payload) records streamed INCREMENTALLY off a
    buffered binary reader of the UNCOMPRESSED stream — never more
    than one record in memory (the bounded-memory twin of
    :func:`_split_records`).  A truncated/corrupt tail (EOFError /
    zlib.error mid-read, short payload) ends the walk with the
    records already yielded.

    Record terminators (the CRLF CRLF after each payload; bare-LF and
    extra blanks tolerated) are consumed with ``readline``, NOT
    ``peek``: ``BufferedReader.peek(2)``/``GzipFile.peek(2)`` only
    guarantee >=1 byte, so at a decompression-chunk boundary that
    splits a CRLF a peek-based loop saw just ``b'\\r'``, bailed, and
    the orphaned newline failed the next version check — silently
    dropping every remaining record in the file (only visible on
    large single-member streams where chunk boundaries are not
    record-aligned)."""
    try:
        line = fobj.readline()
        while True:
            # skip record-terminating blank lines; at EOF readline
            # returns b"" which falls through to the version check
            while line in (b"\r\n", b"\n"):
                line = fobj.readline()
            if not line.startswith(b"WARC/"):
                return
            hdrs = {}
            while True:
                line = fobj.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                k, sep, v = line.decode("utf-8", "replace").partition(":")
                if sep:
                    hdrs[k.strip().lower()] = v.strip()
            try:
                clen = int(hdrs.get("content-length", ""))
            except ValueError:
                return
            if clen < 0:
                return
            payload = fobj.read(clen)
            if len(payload) < clen:
                return  # truncated payload
            yield hdrs, payload
            line = fobj.readline()
    except (OSError, EOFError, zlib.error):
        return  # truncated / corrupt member: keep the parsed prefix


def _worker_local_path(p: str) -> str:
    """Worker-openable filesystem path for a Spark-emitted file URI.

    ``binaryFile`` emits RFC-8089 ``file:`` URIs (usually the
    no-authority ``file:/path`` form), so resolve with
    ``urllib.parse`` rather than a prefix strip: a naive ``p[5:]``
    mangled ``file://host/path`` (left ``//host/path``) and never
    decoded percent-escapes.  A non-local authority is returned
    unchanged — the open fails and the caller's per-file degrade
    skips that file.  Non-``file`` schemes and plain paths pass
    through untouched (no unquoting: a raw local path may contain a
    literal ``%``)."""
    if not p.startswith("file:"):
        return p
    u = urlparse(p)
    if u.netloc and u.netloc.lower() != "localhost":
        return p  # file://remote-host/... — not openable here
    return unquote(u.path) or p


def warc_records_worker_open(
    files_df: DataFrame,
    record_types: tuple = ("response",),
    batch_rows: int = 256,
) -> DataFrame:
    """The bounded-memory record explosion over any DataFrame carrying
    a ``path`` column — the shared core of :func:`read_warc_streaming`
    (batch) and ``stream_extract_warc(worker_open=True)`` (per
    micro-batch): only ``path`` is selected (the scan prunes any
    content column — no file bytes through Spark), each Python worker
    opens its files directly and streams records off the decompressor
    in ``batch_rows`` chunks, O(record) peak memory per task.  Paths
    must be worker-openable (local disk, NFS/FUSE mounts)."""
    rts = tuple(record_types)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "url", "warc_ts", "record_type",
                "mime", "charset", "http_status", "payload"]
        for pdf in it:
            for p in pdf["path"]:
                local = _worker_local_path(p)
                rows = []
                try:
                    with open(local, "rb") as fh:
                        if fh.read(2) == b"\x1f\x8b":
                            fh.seek(0)
                            # GzipFile walks concatenated members
                            # natively and buffers its own reads
                            fobj = gzip.GzipFile(fileobj=fh)
                        else:
                            fh.seek(0)
                            fobj = fh
                        for hdrs, payload in _iter_warc_records(fobj):
                            rtype = hdrs.get("warc-type", "")
                            if rts and rtype not in rts:
                                continue
                            status, mime, charset, body = \
                                _split_http(payload)
                            if mime is None:
                                ct = hdrs.get("content-type", "")
                                if ct and not ct.lower().startswith(
                                        "application/http"):
                                    mime = (ct.split(";")[0].strip()
                                            .lower() or None)
                            rows.append((
                                p, hdrs.get("warc-target-uri"),
                                hdrs.get("warc-date"), rtype or None,
                                mime, charset, status, body,
                            ))
                            if len(rows) >= batch_rows:
                                yield pd.DataFrame(rows, columns=cols)
                                rows = []
                except Exception:
                    pass  # per-file degrade, never a task death
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files_df.select("path").mapInPandas(batches, _SCHEMA)


def read_warc_streaming(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
    batch_rows: int = 256,
) -> DataFrame:
    """Bounded-memory :func:`read_warc`: same output schema, but each
    task holds ~one RECORD at a time instead of a whole segment.

    ``binaryFile`` does the LISTING only — selecting just ``path``
    prunes the content column, so no file bytes flow through Spark —
    and each Python worker opens its files directly
    (``gzip.GzipFile`` over the local/mounted path, concatenated
    members handled natively), streaming records off the decompressor
    in ``batch_rows`` chunks (:func:`warc_records_worker_open`).
    This is the 100 TB shape for ~1 GB crawl segments: peak memory
    per task is O(record), not O(segment + decompressed segment).
    Paths must be worker-openable (local disk, NFS/FUSE mounts — the
    usual cluster layouts); for object stores without a mount, use
    :func:`read_warc`."""
    return warc_records_worker_open(
        spark.read.format("binaryFile").load(path),
        record_types, batch_rows)


def warc_write(
    records,
    gzip_members: bool = True,
) -> bytes:
    """In-repo WARC writer (the test/gating twin of :func:`read_warc`,
    NOT a production sink): each record is a dict with ``url``,
    ``ts`` (ISO-8601 string), ``body`` (bytes), and optionally
    ``status`` (default 200), ``mime`` (default text/html),
    ``record_type`` (default response), ``http`` (False to write a
    raw non-HTTP payload).  One gzip member per record when
    ``gzip_members`` (the standard layout used by Common Crawl)."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["body"]
        if r.get("http", True):
            status = r.get("status", 200)
            mime = r.get("mime", "text/html")
            if r.get("charset"):
                mime = "%s; charset=%s" % (mime, r["charset"])
            payload = (
                b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n"
                b"Content-Length: %d\r\n\r\n"
                % (status, mime.encode(), len(body))
            ) + body
            ctype = "application/http; msgtype=response"
        else:
            payload = body
            ctype = r.get("mime", "application/octet-stream")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: %s\r\n"
            "WARC-Record-ID: <urn:uuid:%08d>\r\n"
            "WARC-Date: %s\r\n"
            "WARC-Target-URI: %s\r\n"
            "Content-Type: %s\r\n"
            "Content-Length: %d\r\n\r\n"
            % (r.get("record_type", "response"), i, r["ts"], r["url"],
               ctype, len(payload))
        ).encode()
        rec = head + payload + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)
