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


class TestPdfEncryption:
    """Round-12 verdict items 2(what's-wrong)/3(next): the standard
    security handler's empty-user-password RC4 path (ISO 32000-1
    §7.6.3, V1/V2 R2/R3) decrypts permissions-only documents — page
    text AND /Info metadata — while anything locked surfaces NULL
    fields, never ciphertext-as-latin-1.  pdf_write(encrypt=...) now
    REALLY encrypts (per-object RC4 over every string and stream), so
    these fixtures would catch a mojibake regression.

    Evidence grade: _rc4 is pinned against the published RC4 test
    vectors below; the Algorithm 2/3/4/5 composition is gated by
    writer<->reader round trips (no third-party encrypted-PDF ground
    truth ships in this container)."""

    def test_rc4_published_vectors(self):
        from bertrand_spark.pipeline.pdftext import _rc4
        assert _rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
        assert _rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
        assert _rc4(b"Secret", b"Attack at dawn").hex() == \
            "45a01f645fc35b383552544b9bf5"
        # symmetric
        assert _rc4(b"Key", bytes.fromhex("bbf316e8d940af0ad3")) == \
            b"Plaintext"

    def test_fixture_really_encrypts(self):
        """The round-12 fixture only ADDED the /Encrypt trailer key —
        plaintext everywhere — which is why the mojibake wart was
        invisible.  Pin that ciphertext actually differs now."""
        from bertrand_spark.pipeline.pdftext import pdf_write
        plain = pdf_write(["finally hidden"], flate=False,
                          info={"Title": "Visible Title"})
        enc = pdf_write(["finally hidden"], flate=False, encrypt=True,
                        info={"Title": "Visible Title"})
        assert b"finally hidden" in plain
        assert b"finally hidden" not in enc
        assert b"Visible Title" in plain
        assert b"Visible Title" not in enc

    def test_empty_password_decrypts_all_layouts(self):
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     pdf_write)
        t = ["hello encrypted world", "page two"]
        for kw in ({}, {"xref_stream": True},
                   {"xref_stream": True, "predictor": True},
                   {"objstm": True}, {"flate": False}, {"lzw": True},
                   {"type0_font": True, "tounicode": True}):
            got = _extract_pdf_one(pdf_write(t, encrypt=True, **kw))
            assert got == ("hello encrypted world\npage two",
                           "extracted-decrypted", 2), (kw, got)

    def test_locked_and_v4_stay_locked(self):
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     pdf_write)
        for mode in ("locked", "v4"):
            got = _extract_pdf_one(pdf_write(["s"], encrypt=mode))
            assert got == (None, "encrypted", None), (mode, got)

    def test_metadata_decrypted_vs_nulled(self):
        from bertrand_spark.pipeline.pdftext import (_INFO_FIELDS,
                                                     _pdf_meta_one,
                                                     pdf_write)
        info = {"Title": "My Doc", "Author": "Jérôme ☃"}
        m = _pdf_meta_one(pdf_write(["x"], encrypt=True, info=info))
        assert m[0] == "My Doc" and m[1] == "Jérôme ☃"
        assert m[-1] == "decrypted" and m[-2] == 1
        for mode in ("locked", "v4"):
            m = _pdf_meta_one(pdf_write(["x"], encrypt=mode, info=info))
            # ciphertext NEVER surfaces: every string field NULL
            assert m[:len(_INFO_FIELDS)] == (None,) * len(_INFO_FIELDS)
            assert m[-1] == "encrypted" and m[-2] == 1

    def test_broken_xref_scan_rescues_key(self):
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     _pdf_meta_one,
                                                     pdf_write)
        b = pdf_write(["scan me"], encrypt=True, break_xref=True,
                      info={"Title": "T"})
        assert _extract_pdf_one(b) == ("scan me", "extracted-decrypted", 1)
        m = _pdf_meta_one(b)
        assert m[0] == "T" and m[-1] == "decrypted"
        # a genuinely locked broken-xref doc stays locked through the
        # rescue (the verify fails with any wrong password)
        b = pdf_write(["scan me"], encrypt="locked", break_xref=True,
                      info={"Title": "T"})
        assert _extract_pdf_one(b) == (None, "encrypted", None)
        assert _pdf_meta_one(b)[0] is None

    def test_encrypted_fuzz_never_raises(self):
        import random
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     _pdf_meta_one,
                                                     pdf_write)
        rng = random.Random(1301)
        base = pdf_write(["fuzz base text\nline two"], encrypt=True,
                         info={"Title": "F"})
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            assert isinstance(_extract_pdf_one(bytes(b)), tuple)
            assert isinstance(_pdf_meta_one(bytes(b)), tuple)

    def test_spark_seam(self, spark):
        from pyspark.sql import functions as F
        from bertrand_spark.pipeline.pdftext import (extract_pdf_text,
                                                     pdf_metadata,
                                                     pdf_write)
        rows = [(1, pdf_write(["open secret"], encrypt=True,
                              info={"Title": "OK"})),
                (2, pdf_write(["locked tight"], encrypt="locked",
                              info={"Title": "NO"}))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: (r.pdf, r.m) for r in df.select(
            "doc_id", extract_pdf_text(F.col("payload")).alias("pdf"),
            pdf_metadata(F.col("payload")).alias("m")).collect()}
        assert got[1][0].text == "open secret"
        assert got[1][0].status == "extracted-decrypted"
        assert got[1][1].title == "OK" and got[1][1].status == "decrypted"
        assert got[2][0].text is None
        assert got[2][0].status == "encrypted"
        assert got[2][1].title is None and got[2][1].status == "encrypted"


class TestPdfTreeTruncationVisible:
    """ADVICE r12 (low): the hostile-structure caps (10k pages / depth
    64) must surface as ``extracted-partial``, not a silent stop that
    still claims full extraction."""

    def test_page_cap_reports_partial(self):
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     pdf_write)
        big = pdf_write(["pg %d" % i for i in range(10_002)],
                        flate=False, op_mix=False)
        text, status, n_pages = _extract_pdf_one(big)
        assert status == "extracted-partial"
        assert n_pages == 10_001  # collected before the cap
        assert text.startswith("pg 0")

    def test_under_cap_still_full(self):
        from bertrand_spark.pipeline.pdftext import (_extract_pdf_one,
                                                     pdf_write)
        b = pdf_write(["a", "b", "c"], flate=False, op_mix=False)
        assert _extract_pdf_one(b) == ("a\nb\nc", "extracted", 3)

    def test_deep_tree_reports_partial(self):
        # hand-built 70-deep /Pages chain: depth cap fires with only
        # plaintext dict objects, no writer support needed
        from bertrand_spark.pipeline.pdftext import _extract_pdf_one
        bodies = [b"<< /Type /Catalog /Pages 2 0 R >>"]
        depth = 70
        for i in range(depth):  # objects 2..71: nested Pages nodes
            bodies.append(
                b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % (i + 3))
        bodies.append(b"<< /Type /Page /MediaBox [0 0 612 792] >>")
        out = bytearray(b"%PDF-1.4\n")
        offs = []
        for i, body in enumerate(bodies, start=1):
            offs.append(len(out))
            out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        xoff = len(out)
        out += b"xref\n0 %d\n" % (len(bodies) + 1)
        out += b"0000000000 65535 f \n"
        for o in offs:
            out += b"%010d 00000 n \n" % o
        out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n"
                b"%d\n%%%%EOF\n" % (len(bodies) + 1, xoff))
        text, status, n_pages = _extract_pdf_one(bytes(out))
        # the only page sits past depth 64: the walk truncates to zero
        # pages, and zero pages is parse-failed (never a silent empty
        # "extracted")
        assert status == "parse-failed" and text is None
