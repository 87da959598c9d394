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


class TestBenchAttemptFold:
    """ADVICE r12 (low x2): the cross-attempt fold filters on the
    round tag, and bench runs never write attempt records unless
    opted in."""

    def _write(self, d, name, **kw):
        import json
        rec = {"sf": 0.1, "queries": {"qa": 2.0, "qb": 3.0}}
        rec.update(kw)
        (d / name).write_text(json.dumps(rec))

    def test_same_round_folds_minima(self, tmp_path):
        from bench import fold_attempts
        self._write(tmp_path, "attempt_1_1.json",
                    round_tag="r13", queries={"qa": 1.5, "qb": 9.0})
        cross, n = fold_attempts(
            {"qa": 2.0, "qb": 3.0}, 0.1, str(tmp_path), "r13")
        assert n == 2 and cross == {"qa": 1.5, "qb": 3.0}

    def test_other_round_and_untagged_records_rejected(self, tmp_path):
        from bench import fold_attempts
        # the round-12 leak shape: right sf, prior-round payload
        self._write(tmp_path, "attempt_1_1.json",
                    round_tag="r12", queries={"qa": 0.1})
        self._write(tmp_path, "attempt_2_1.json",  # no tag at all
                    queries={"qa": 0.1})
        cross, n = fold_attempts(
            {"qa": 2.0}, 0.1, str(tmp_path), "r13")
        assert n == 1 and cross == {"qa": 2.0}

    def test_wrong_sf_rejected(self, tmp_path):
        from bench import fold_attempts
        self._write(tmp_path, "attempt_1_1.json",
                    round_tag="r13", sf=0.01, queries={"qa": 0.1})
        cross, n = fold_attempts(
            {"qa": 2.0}, 0.1, str(tmp_path), "r13")
        assert n == 1 and cross == {"qa": 2.0}

    def test_untagged_run_keeps_sf_only_behavior(self, tmp_path):
        # out-of-repo use without a ROUND_TAG file: old semantics
        from bench import fold_attempts
        self._write(tmp_path, "attempt_1_1.json", queries={"qa": 0.5})
        cross, n = fold_attempts(
            {"qa": 2.0}, 0.1, str(tmp_path), None)
        assert n == 2 and cross == {"qa": 0.5}

    def test_append_is_opt_in_and_tag_committed(self):
        import os
        src = open("/root/repo/bench.py").read()
        assert 'os.environ.get("SPARK_GRAFT_APPEND_ATTEMPT") == "1"' in src
        assert "time.time_ns()" in src and "os.getpid()" in src
        tag = open(
            "/root/repo/bench_attempts/current/ROUND_TAG").read().strip()
        assert tag  # the committed tag the fold filters on
