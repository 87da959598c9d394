"""Round-13 regressions and additions.

Leads with the round-12 ADVICE high: ``read_warc_streaming``'s
record-terminator loop used ``peek(2)``, which only guarantees >=1
byte — at a decompression-chunk boundary that split a CRLF the loop
saw ``b'\\r'``, bailed, and every remaining record in the file was
silently dropped (reproduced upstream: 1747/2000 on a single-member
gzip).  The round-12 fixtures missed it because one-gzip-member-per-
record keeps chunk boundaries record-aligned; the pinned fixture here
is a single-member gzip spanning many 8192-byte buffer chunks.
"""

import gzip
import io

import pytest

from bertrand_spark.sources.warc import (_iter_warc_records,
                                         _worker_local_path,
                                         warc_write)


class TestWarcStreamingChunkBoundaries:
    """ADVICE r12 (high): terminator consumption must survive CRLFs
    split across BufferedReader/GzipFile chunk boundaries."""

    def _single_member_blob(self, n):
        # plain concatenated records, then ONE gzip member over the
        # whole stream — chunk boundaries land mid-record, unlike the
        # member-per-record layout where each member is record-aligned
        plain = warc_write(
            [{"url": f"http://e/{i}", "ts": "2026-01-01T00:00:00Z",
              "body": b"x" * (31 + (i * 7) % 97)}  # co-prime sizes:
             for i in range(n)],                   # boundaries drift
            gzip_members=False)
        return gzip.compress(plain)

    def test_no_silent_truncation_single_member(self):
        blob = self._single_member_blob(2000)
        fobj = gzip.GzipFile(fileobj=io.BytesIO(blob))
        got = list(_iter_warc_records(fobj))
        assert len(got) == 2000  # was 1747/2000 with the peek loop
        # and nothing was mis-framed along the way
        for i, (hdrs, payload) in enumerate(got):
            assert hdrs["warc-target-uri"] == f"http://e/{i}"

    def test_no_truncation_uncompressed_buffered(self):
        plain = gzip.decompress(self._single_member_blob(2000))
        # tiny buffer forces many split-CRLF opportunities
        fobj = io.BufferedReader(io.BytesIO(plain), buffer_size=13)
        assert len(list(_iter_warc_records(fobj))) == 2000

    def test_spark_parity_single_member(self, spark, tmp_path):
        from bertrand_spark.sources.warc import (read_warc,
                                                 read_warc_streaming)
        d = tmp_path / "w"
        d.mkdir()
        (d / "big.warc.gz").write_bytes(self._single_member_blob(800))
        batch = read_warc(spark, str(d), record_types=()).count()
        stream = read_warc_streaming(
            spark, str(d), record_types=()).count()
        assert batch == stream == 800

    def test_sloppy_terminators_still_tolerated(self):
        # extra blank lines between records, bare-LF blanks, and a
        # final record with NO terminator at EOF
        recs = warc_write(
            [{"url": "http://a/", "ts": "t", "body": b"one"},
             {"url": "http://b/", "ts": "t", "body": b"two"}],
            gzip_members=False)
        doctored = recs.replace(b"\r\n\r\nWARC/", b"\r\n\r\n\n\r\nWARC/")
        assert doctored != recs
        fobj = io.BufferedReader(io.BytesIO(doctored.rstrip(b"\r\n")))
        assert len(list(_iter_warc_records(fobj))) == 2


class TestWorkerLocalPath:
    """ADVICE r12 / VERDICT item 5: urlparse+unquote path resolution
    instead of the scheme-prefix-naive ``p[5:]`` strip."""

    def test_spark_no_authority_form(self):
        assert _worker_local_path("file:/tmp/a.warc.gz") == \
            "/tmp/a.warc.gz"

    def test_empty_and_localhost_authority(self):
        assert _worker_local_path("file:///tmp/a.gz") == "/tmp/a.gz"
        assert _worker_local_path("file://localhost/tmp/a.gz") == \
            "/tmp/a.gz"

    def test_percent_escapes_decoded(self):
        assert _worker_local_path("file:/tmp/sp%20ace/a%25b.warc") == \
            "/tmp/sp ace/a%b.warc"

    def test_remote_authority_left_alone(self):
        # unopenable here — pass through so open() fails into the
        # caller's per-file degrade instead of mangling to //host/...
        p = "file://nas01/vol/a.warc.gz"
        assert _worker_local_path(p) == p

    def test_plain_path_untouched(self):
        # a raw local path may contain a literal % — never unquote it
        assert _worker_local_path("/data/100%done/a.warc") == \
            "/data/100%done/a.warc"

    def test_other_schemes_untouched(self):
        assert _worker_local_path("s3a://bucket/k") == "s3a://bucket/k"

    def test_streaming_reader_opens_percent_escaped_path(
            self, spark, tmp_path):
        from bertrand_spark.sources.warc import read_warc_streaming
        d = tmp_path / "sp ace"
        d.mkdir()
        (d / "a.warc.gz").write_bytes(warc_write(
            [{"url": "http://e/", "ts": "t", "body": b"payload"}]))
        rows = read_warc_streaming(spark, str(d)).collect()
        assert len(rows) == 1 and bytes(rows[0].payload) == b"payload"
