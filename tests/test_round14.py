"""Round-14 regressions and additions.

Leads with the round-13 ADVICE items: (1) **medium** — ``odt_write``
with ``spans=True`` escaped the text BEFORE chunking into 12-char
spans, so an entity like ``&amp;`` could be split across a span
boundary, yielding malformed content.xml (the x56 corpus happened to
contain no ``&/<>`` so the gate under-tested the escape path); the
writer now chunks the raw text and escapes per chunk, like the DOCX
``_runs_xml``.  (2) **low** — the RTF ``\\uc`` fallback-skip is
group-scoped per the RTF 1.9 spec, but ``_rtf_parse`` left
``uc_pending`` armed across a closing brace, swallowing the first
character after a skipped destination ending in ``\\uN``.  (3)
**low** — the XLSX ``_MAX_PARAS`` line cap applied per sheet, so a
hostile many-sheet workbook accumulated ``n_sheets x cap`` lines; the
cap is now global per document.  Also covers the round-13 verdict's
"what's wrong" item 2: XLSX numeric cells are normalized to
shortest-roundtrip form (``1.1000000000000001`` storage → ``1.1``).
"""

import io
import zipfile

import pytest

from bertrand_spark.pipeline.docxtext import (_extract_odt_one,
                                              _extract_xlsx_one,
                                              _num_text, odt_write,
                                              xlsx_write)
from bertrand_spark.pipeline.rtftext import _extract_rtf_one, _rtf_parse


class TestOdtSpanEscape:
    """ADVICE r13 (medium): entities must never split across span
    boundaries — chunk raw text first, escape each chunk."""

    def test_entity_straddling_span_boundary_survives(self):
        # 10 chars then '&' — under the old escape-then-chunk order
        # the 5-char '&amp;' straddled the 12-char boundary and the
        # content.xml failed to parse
        t = "aaaaaaaaaa&<>bbbbbbbbbb&amp;literal&&&&&&&&&&&&"
        b = odt_write([t], spans=True)
        assert _extract_odt_one(b) == (t, "extracted", 1)

    def test_every_offset_of_each_entity_char(self):
        # slide each escapable char across every position of the
        # first two span chunks
        for ch in "&<>'\"":
            for pad in range(0, 26):
                t = "x" * pad + ch + "y" * 5
                b = odt_write([t], spans=True)
                out = _extract_odt_one(b)
                assert out == (t, "extracted", 1), (ch, pad, out)

    def test_written_xml_is_well_formed(self):
        from xml.etree import ElementTree as ET
        b = odt_write(["a" * 11 + "&" + "b" * 11], spans=True)
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            ET.fromstring(z.read("content.xml"))  # must not raise


class TestRtfUcPendingGroupScope:
    """ADVICE r13 (low): a \\uN ending a skipped destination must not
    swallow the first character of the following document text."""

    def test_skipped_destination_trailing_unicode(self):
        txt, bal = _rtf_parse(b"{\\rtf1{\\*\\foo\\u4660}Hello}")
        assert txt == "Hello"
        assert bal

    def test_info_title_unicode_does_not_eat_body(self):
        txt, _ = _rtf_parse(
            b"{\\rtf1{\\info{\\title T\\u4660}}Body}")
        assert txt == "Body"

    def test_fallback_still_swallowed_inside_group(self):
        # inside the SAME group the fallback char after \uN is
        # swallowed as before (uc=1 default)
        txt, _ = _rtf_parse(b"{\\rtf1 \\u4660 ?after}")
        assert txt == "ሴafter"

    def test_group_restore_keeps_uc_value(self):
        # \uc2 inside a group must not leak out either (existing
        # behavior — pinned alongside the uc_pending fix)
        txt, _ = _rtf_parse(
            b"{\\rtf1{\\uc2\\u4660 XY}\\u4661 Z}")
        assert txt == "ሴስ"

    def test_extract_wrapper_status(self):
        t, status, n = _extract_rtf_one(
            b"{\\rtf1{\\*\\dest\\u4660}Hi}")
        assert (t, status, n) == ("Hi", "extracted", 2)


class TestXlsxGlobalLineCap:
    """ADVICE r13 (low): the _MAX_PARAS cap is per DOCUMENT — a
    many-sheet workbook must not accumulate n_sheets x cap lines."""

    def test_cap_spans_sheets(self, monkeypatch):
        import bertrand_spark.pipeline.docxtext as m
        monkeypatch.setattr(m, "_MAX_PARAS", 5)
        b = xlsx_write([[["s%dr%d" % (s, r)] for r in range(4)]
                        for s in range(4)])  # 4 sheets x 4 rows
        text, status, _ = _extract_xlsx_one(b)
        assert status == "extracted"
        # global cap: 5 lines from the first two sheets, then stop
        # (old behavior: 4 sheets x 4 = 16 lines)
        assert len(text.split("\n")) == 5

    def test_uncapped_multi_sheet_unchanged(self):
        b = xlsx_write([[["a"], ["b"]], [["c"]]])
        assert _extract_xlsx_one(b)[0] == "a\nb\nc"


class TestXlsxNumericNormalization:
    """Verdict r13 "what's wrong" item 2: numeric storage text is
    noise-shaped (17 significant digits); extracted text must be the
    shortest round-trip form a human saw."""

    @pytest.mark.parametrize("storage,display", [
        ("1.1000000000000001", "1.1"),
        ("7.0999999999999996", "7.1"),
        ("1E-3", "0.001"),
        ("1e+20", "1e+20"),
        ("5", "5"),                 # integer storage stays integral
        ("-5", "-5"),
        ("5.0", "5.0"),             # explicit decimal point kept
        ("0", "0"),
        ("abc", "abc"),             # non-numeric passes through
        ("inf", "inf"),             # non-finite passes through
    ])
    def test_num_text(self, storage, display):
        assert _num_text(storage) == display

    def test_writer_noisy_float_roundtrip(self):
        b = xlsx_write([[["label", 7.1, 700, True, False]]])
        text, status, n_cells = _extract_xlsx_one(b)
        assert (text, status, n_cells) == (
            "label\t7.1\t700\tTRUE\tFALSE", "extracted", 5)

    def test_writer_storage_is_actually_noisy(self):
        # the fixture must exercise the normalization: %.17g of 7.1
        # is NOT the shortest form
        b = xlsx_write([[[7.1]]])
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            xml = z.read("xl/worksheets/sheet1.xml").decode()
        assert "7.0999999999999996" in xml


class TestEpubFontObfuscation:
    """Round-13 verdict item 5: walk encryption.xml retrieval methods
    to distinguish font-only obfuscation (IDPF/Adobe font keys —
    content still plaintext) from real content DRM, instead of the
    blanket `encrypted` class that threw those books away."""

    def test_font_only_extracts_with_distinct_status(self):
        from bertrand_spark.pipeline.epubtext import (_extract_epub_one,
                                                      epub_write)
        b = epub_write(["<p>readable body text here</p>"],
                       font_obfuscation=True)
        text, status, n = _extract_epub_one(b)
        assert status == "extracted-font-obfuscated"
        assert "readable body text" in text

    def test_content_drm_still_encrypted(self):
        from bertrand_spark.pipeline.epubtext import (_extract_epub_one,
                                                      epub_write)
        b = epub_write(["<p>x</p>"], drm=True)
        assert _extract_epub_one(b) == (None, "encrypted", None)

    def test_mixed_methods_conservative(self):
        # a manifest carrying BOTH a font key and a content method
        # must class encrypted (all-font-only is the requirement)
        import io
        import zipfile
        from bertrand_spark.pipeline.epubtext import (_extract_epub_one,
                                                      epub_write)
        b = epub_write(["<p>x</p>"], font_obfuscation=True)
        buf = io.BytesIO(b)
        with zipfile.ZipFile(buf, "a") as z:
            z.writestr(
                "META-INF/encryption.xml",  # shadow: mixed manifest
                '<encryption xmlns:enc="http://www.w3.org/2001/04/'
                'xmlenc#"><enc:EncryptedData><enc:EncryptionMethod '
                'Algorithm="http://www.idpf.org/2008/embedding"/>'
                '</enc:EncryptedData><enc:EncryptedData>'
                '<enc:EncryptionMethod Algorithm="http://www.w3.org/'
                '2001/04/xmlenc#aes128-cbc"/></enc:EncryptedData>'
                '</encryption>')
        # zipfile.read returns the LAST entry for duplicate names
        assert _extract_epub_one(buf.getvalue())[1] == "encrypted"

    def test_empty_or_unreadable_manifest_conservative(self):
        from bertrand_spark.pipeline.epubtext import _font_only_encryption
        import io
        import zipfile

        def zip_with(content):
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as z:
                z.writestr("META-INF/encryption.xml", content)
            return zipfile.ZipFile(io.BytesIO(buf.getvalue()))

        assert not _font_only_encryption(zip_with("<encryption/>"))
        assert not _font_only_encryption(zip_with("not xml <<<"))

    def test_metadata_status_ok_under_font_obfuscation(self):
        from bertrand_spark.pipeline.epubtext import (_epub_meta_one,
                                                      epub_write)
        b = epub_write(["<p>x</p>"], info={"title": "T"},
                       font_obfuscation=True)
        row = _epub_meta_one(b)
        assert row[0] == "T" and row[-1] == "ok"


class TestWorkerOpenContentGuard:
    """Round-13 verdict "what's wrong" item 1: a worker_open batch
    that still carries `content` means the binaryFile source already
    read every segment's bytes — refuse loudly with the prune recipe
    instead of silently paying full I/O (invisible until cluster
    scale)."""

    def test_unpruned_batch_raises_with_recipe(self, spark, tmp_path):
        from bertrand_spark.sources.warc import warc_write
        from bertrand_spark.streaming.rollup import stream_extract_warc
        d = tmp_path / "segs"
        d.mkdir()
        (d / "a.warc.gz").write_bytes(warc_write(
            [{"url": "http://e/", "ts": "t", "body": b"hi"}]))
        files = spark.read.format("binaryFile").load(str(d))
        handle = stream_extract_warc(
            str(tmp_path / "out"), worker_open=True)
        with pytest.raises(ValueError) as ei:
            handle(files, 0)
        msg = str(ei.value)
        assert ".select('path')" in msg  # names the prune recipe
        assert "content" in msg

    def test_pruned_batch_still_works(self, spark, tmp_path):
        from bertrand_spark.sources.warc import warc_write
        from bertrand_spark.streaming.rollup import stream_extract_warc
        d = tmp_path / "segs"
        d.mkdir()
        (d / "a.warc.gz").write_bytes(warc_write(
            [{"url": "http://e/", "ts": "t", "body": b"hi"}]))
        files = spark.read.format("binaryFile").load(str(d))
        out = str(tmp_path / "out")
        stream_extract_warc(out, worker_open=True)(
            files.select("path"), 0)
        assert spark.read.parquet(
            f"{out}/ingest_batch=0").count() == 1
