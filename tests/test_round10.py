"""Round-10 regression gates.

1. Anonymous-cast array promotion (C31 extension, VERDICT r9 item 3):
   ``array<string>`` columns and struct leaves whose elements all parse
   as one family promote element-wise (XML's repeated elements — the
   most common XML shape); a mixed array stays string; the raise /
   ignore / coerce protocol covers element-level violations inside the
   same single validation aggregate.
2. base_to_int overflow hygiene: under ANSI mode (Spark 4's default)
   ``F.conv`` raises ARITHMETIC_OVERFLOW past 2^64-1, so a 20+-digit
   numeric string crashed even a coerce-mode cast.  The guarded conv
   nulls instead — a coerce cast must never throw.
3. Round-9 ADVICE probes: _flac_meta truncated-STREAMINFO guard and
   _ogg_meta false-'OggS' page validation.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bertrand_spark.convert.cast import CastError, cast, infer_best_types  # noqa: E402
from bertrand_spark.functions.strings import base_to_int  # noqa: E402


class TestArrayLeafPromotion:
    @pytest.fixture()
    def frame(self, spark):
        return spark.createDataFrame(
            [
                (1, ["1", "2", "3"], ["1", "x"], ("7", ["1.5", "2"]), []),
                (2, ["4", None], ["2", "y"], ("8", ["3.25"]), None),
            ],
            "id long, nums array<string>, mixed array<string>, "
            "s struct<tag: string, vals: array<string>>, "
            "empty array<string>",
        )

    def test_infer_emits_array_keys(self, frame):
        plan = infer_best_types(frame)
        assert plan["`nums`[]"] == "int64"
        assert plan["`s`.`vals`[]"] == "float64"
        assert plan["`s`.`tag`"] == "int64"
        # mixed elements (int + str) and all-empty arrays never promote
        assert "`mixed`[]" not in plan
        assert "`empty`[]" not in plan

    def test_anonymous_cast_promotes_elementwise(self, frame):
        out = cast(frame)
        schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert schema["nums"] == "array<bigint>"
        assert schema["mixed"] == "array<string>"
        assert schema["empty"] == "array<string>"
        assert schema["s"] == "struct<tag:bigint,vals:array<double>>"
        rows = {r.id: r for r in out.collect()}
        assert rows[1].nums == [1, 2, 3]
        assert rows[2].nums == [4, None]  # NULL element preserved
        assert rows[1].s.vals == [1.5, 2.0]
        assert rows[1].empty == [] and rows[2].empty is None

    def test_explicit_quoted_spec_routes_arrays(self, spark):
        df = spark.createDataFrame(
            [(("1", ["2", "3"]),)], "s struct<t: string, v: array<string>>"
        )
        out = cast(df, {"`s`.`t`": "int64", "`s`.`v`[]": "float64"},
                   errors="raise")
        assert out.schema["s"].dataType.simpleString() == (
            "struct<t:bigint,v:array<double>>"
        )
        # a quoted key naming no candidate still errors
        with pytest.raises(CastError, match="no such column"):
            cast(df, {"`zzz`[]": "int64"})

    def test_element_violation_protocol(self, spark):
        df = spark.createDataFrame(
            [(["1", "2"],), (["3", "oops"],)], "a array<string>"
        )
        with pytest.raises(CastError, match="errors='raise'"):
            cast(df, {"`a`[]": "int64"}, errors="raise").collect()
        kept = cast(df, {"`a`[]": "int64"}, errors="ignore")
        assert kept.schema["a"].dataType.simpleString() == "array<string>"
        coerced = cast(df, {"`a`[]": "int64"}, errors="coerce")
        vals = sorted(r.a for r in coerced.collect())
        assert vals == [[1, 2], [3, None]]
        # a clean frame passes errors='raise'
        clean = spark.createDataFrame([(["1"],)], "a array<string>")
        assert cast(clean, {"`a`[]": "int64"}, errors="raise").schema[
            "a"
        ].dataType.simpleString() == "array<bigint>"

    def test_xml_repeated_elements_promote(self, spark, tmp_path):
        xml = (
            "<root>"
            "<row><name>a</name><qty>1</qty><qty>2</qty></row>"
            "<row><name>b</name><qty>3</qty></row>"
            "<row><name>c</name><tag>x</tag><tag>1</tag></row>"
            "</root>"
        )
        (tmp_path / "t.xml").write_text(xml)
        from bertrand_spark.sources.reader import read_xml_inferred

        out = read_xml_inferred(spark, str(tmp_path), row_tag="row")
        schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
        assert schema["qty"] == "array<bigint>"  # repeated numeric element
        assert schema["tag"] == "array<string>"  # mixed stays string
        byname = {r.name: r for r in out.collect()}
        assert byname["a"].qty == [1, 2]

    def test_backtick_toplevel_name_not_a_candidate(self, spark):
        """Round-9 ADVICE: a top-level string column whose raw name
        contains backticks could collide with a quoted nested display
        key; such names are skipped from candidacy (mirroring the
        struct-side skip) so the nested promotion wins unshadowed."""
        from pyspark.sql import types as st

        schema = st.StructType([
            st.StructField("`s`.`t`", st.StringType()),
            st.StructField(
                "s", st.StructType([st.StructField("t", st.StringType())])
            ),
        ])
        df = spark.createDataFrame([("1", ("2",))], schema)
        plan = infer_best_types(df)
        assert plan == {"`s`.`t`": "int64"}
        out = cast(df)
        assert out.schema["s"].dataType.simpleString() == "struct<t:bigint>"
        assert out.schema["`s`.`t`"].dataType.simpleString() == "string"


class TestBaseToIntOverflow:
    def test_out_of_range_nulls_not_throws(self, spark):
        df = spark.createDataFrame(
            [(s,) for s in [
                "1", "-7", "9223372036854775807", "-9223372036854775808",
                "9223372036854775808", "99999999999999999999999999",
                "0001", "-0000000000000000000005", "abc",
            ]],
            "a string",
        )
        got = {
            r.a: r.v
            for r in df.select("a", base_to_int(F.col("a")).alias("v")).collect()
        }
        assert got["9223372036854775807"] == 2**63 - 1
        assert got["-9223372036854775808"] == -(2**63)  # INT64_MIN parses
        assert got["9223372036854775808"] is None  # one past max → NULL
        assert got["99999999999999999999999999"] is None
        assert got["0001"] == 1  # leading zeros don't trip the guard
        assert got["-0000000000000000000005"] == -5
        assert got["abc"] is None

    def test_prefixed_and_radix_guards(self, spark):
        df = spark.createDataFrame(
            [("0x10",), ("0b101",), ("-0o17",), ("0x" + "f" * 17,)],
            "a string",
        )
        vals = [r.v for r in df.select(base_to_int(F.col("a"), 0).alias("v")).collect()]
        assert vals == [16, 5, -15, None]
        hexdf = spark.createDataFrame([("ff",), ("f" * 17,)], "a string")
        assert [
            r.v for r in hexdf.select(base_to_int(F.col("a"), 16).alias("v")).collect()
        ] == [255, None]

    def test_anonymous_cast_coerce_survives_overflow(self, spark):
        df = spark.createDataFrame(
            [("1",), ("99999999999999999999999999",)], "a string"
        )
        out = cast(df, errors="coerce")
        assert out.schema["a"].dataType.simpleString() == "bigint"
        assert sorted([r.a for r in out.collect()], key=str) == [1, None]


class TestAudioProbeHardening:
    def test_flac_meta_truncated_streaminfo_nulls(self):
        """Round-9 ADVICE: a payload truncated mid-STREAMINFO (header
        claims 34 bytes, body shorter) must probe as None, not
        mis-aligned garbage fields."""
        from bertrand_spark.pipeline.multimodal import _flac_meta, flac_encode
        import numpy as np

        blob = flac_encode(44100, np.zeros((2048, 1), dtype=np.int16))
        assert _flac_meta(blob) is not None
        # keep the 4-byte magic + block header but cut the body short
        truncated = blob[: 4 + 4 + 20]
        assert _flac_meta(truncated) is None

    def test_ogg_meta_rejects_payload_oggs(self):
        """Round-9 ADVICE: 'OggS' inside packet payload bytes is not a
        page header; the granule must come from a candidate whose
        version byte and header-type flags validate."""
        from bertrand_spark.pipeline.multimodal import _ogg_meta

        def ogg_page(body: bytes, granule: int, first: bool) -> bytes:
            segs = []
            n = len(body)
            while n >= 255:
                segs.append(255)
                n -= 255
            segs.append(n)
            return (
                b"OggS" + bytes([0, 2 if first else 4])
                + granule.to_bytes(8, "little", signed=True)
                + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
                + (0).to_bytes(4, "little")
                + bytes([len(segs)]) + bytes(segs) + body
            )

        ident = (
            b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
            + (44100).to_bytes(4, "little") + bytes(16)
        )
        good = ogg_page(ident, 0, True) + ogg_page(b"\x05" * 40, 44100 * 3, False)
        meta = _ogg_meta(good)
        assert meta is not None and abs(meta[0] - 3.0) < 1e-9

        # append a page whose PAYLOAD contains a fake 'OggS' with a
        # huge bogus granule; the validating scan must skip it and
        # still find the real last page header before it
        fake = b"junk" + b"OggS" + bytes([9, 99]) + (10**15).to_bytes(
            8, "little", signed=True
        ) + b"tail"
        poisoned = good + ogg_page(fake, 44100 * 4, False)
        meta2 = _ogg_meta(poisoned)
        # the real LAST page (granule 4s) wins, not the payload fake
        assert meta2 is not None and abs(meta2[0] - 4.0) < 1e-9


class TestProbeGatedAudioDecode:
    """Round-10 (VERDICT items 4/5): the container sniff is the decode
    skip-list — lossy/unknown payloads never enter _audio_decode, the
    per-row decode_status records which path each row took, and the
    streaming epoch report splits skipped-lossy vs decoded vs
    decode-failed."""

    @pytest.fixture()
    def mixed(self, spark):
        import numpy as np

        from bertrand_spark.pipeline.multimodal import flac_encode, wav_encode

        sr = 16000
        sig = 0.3 * np.sin(np.arange(sr) * 0.2)
        rows = [
            (1, bytearray(wav_encode(sr, sig))),
            (2, bytearray(flac_encode(sr, sig))),
            (3, bytearray(b"ID3\x04" + bytes(64))),           # mp3 (ID3)
            (4, bytearray(b"\xff\xfb\x90" + bytes(64))),      # mp3 (sync)
            (5, bytearray(b"OggS" + bytes(64))),              # ogg
            (6, bytearray(bytes(4) + b"ftypM4A " + bytes(32))),  # m4a
            (7, bytearray(b"garbage")),
            (8, bytearray(wav_encode(sr, sig))[:30]),         # corrupt wav
        ]
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_decode_status_split(self, mixed):
        from bertrand_spark.pipeline.multimodal import extract_audio_features

        out = {
            r.media_id: r
            for r in extract_audio_features(mixed, decode="real").collect()
        }
        assert out[1].decode_status == "decoded" and out[1].features
        assert out[2].decode_status == "decoded" and out[2].features
        # lossy containers are ROUTED AROUND the decoder — the only
        # branch that can emit 'skipped-lossy' is the pre-decode gate
        for mid in (3, 4, 5, 6):
            assert out[mid].decode_status == "skipped-lossy", mid
            assert out[mid].features is None
        assert out[7].decode_status == "skipped-unknown"
        # lossless-class payload that entered the decoder and failed
        assert out[8].decode_status == "decode-failed"
        assert out[8].features is None

    def test_fake_mode_schema_parity(self, mixed):
        from bertrand_spark.pipeline.multimodal import extract_audio_features

        fake = extract_audio_features(mixed, decode="fake")
        assert [f.name for f in fake.schema.fields] == [
            "media_id", "features", "decode_status",
        ]
        assert {r.decode_status for r in fake.collect()} == {"decoded"}

    def test_python_sniff_matches_native_sniff(self, mixed):
        """_audio_container_class (the kernel's gate) and
        audio_format_report's native-expression sniff must classify
        identically — a divergence would make the report's class
        counts lie about what the gate actually did."""
        from bertrand_spark.pipeline.multimodal import (
            _audio_container_class, audio_format_report,
            extract_audio_features,
        )

        feats = extract_audio_features(mixed, decode="real")
        native = {
            r["sniffed_format"]: (r["codec_class"], r["n_total"])
            for r in audio_format_report(mixed, feats).collect()
        }
        py_counts: dict = {}
        for row in mixed.collect():
            c, k = _audio_container_class(bytes(row.payload))
            key = c or "unknown"
            py_counts.setdefault(key, [k, 0])
            py_counts[key][1] += 1
        assert {k: (v[0], v[1]) for k, v in py_counts.items()} == native

    def test_stream_report_splits(self, spark, mixed, tmp_path):
        from bertrand_spark.streaming.rollup import stream_extract_audio

        out_dir, rep_dir = str(tmp_path / "out"), str(tmp_path / "rep")
        handle = stream_extract_audio(out_dir, report_dir=rep_dir)
        handle(mixed, 0)
        rep = spark.read.parquet(f"{rep_dir}/ingest_batch=0").collect()[0]
        assert rep.n_total == 8
        assert rep.n_decoded == 2
        assert rep.n_skipped_lossy == 4   # 2 mp3 + ogg + m4a
        assert rep.n_skipped_unknown == 1
        assert rep.n_decode_failed == 1   # the truncated wav
        assert rep.n_null == 6
        # per-container table still written (round-9 contract)
        fmts = spark.read.parquet(f"{rep_dir}/formats/ingest_batch=0")
        assert fmts.count() >= 4


class TestSniffGatedImageDecode:
    """The image twin: with no PIL, _real_decode must never hand a
    payload to a codec its magic already rules out — a lossy 'VP8 '
    WebP or a non-WEBP RIFF skips the riff walk, unknown magic skips
    the PNG path."""

    def test_ruled_out_payloads_never_reach_codecs(self, monkeypatch):
        from bertrand_spark.pipeline import multimodal as mm

        def boom(*a, **k):
            raise AssertionError("codec called on a ruled-out payload")

        monkeypatch.setattr(mm, "_vp8l_decode", boom)
        monkeypatch.setattr(mm, "_png_decode", boom)
        null = (None, None, None, None)
        lossy_webp = b"RIFF" + bytes(4) + b"WEBP" + b"VP8 " + bytes(32)
        avi = b"RIFF" + bytes(4) + b"AVI " + bytes(32)
        junk = b"not an image at all"
        assert mm._real_decode(None, lossy_webp, 3) == null
        assert mm._real_decode(None, avi, 3) == null
        assert mm._real_decode(None, junk, 3) == null

    def test_decodable_classes_still_route(self):
        from bertrand_spark.pipeline import multimodal as mm

        png = mm.png_encode(4, 4, 3, bytes(range(48)))
        w, h, c, px = mm._real_decode(None, png, 3)
        assert (w, h, c) == (4, 4, 3) and px == bytes(range(48))
        # VP8L (lossless webp) still decodes through the gate
        vp8l = mm.vp8l_encode(4, 4, 3, bytes(48))
        w, h, c, px = mm._real_decode(None, vp8l, 3)
        assert (w, h) == (4, 4) and px is not None
