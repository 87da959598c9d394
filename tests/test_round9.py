"""Round-9 regression gates.

1. audit fix (round-8 ADVICE): _global_reduction_attr_ids matches the
   aggregate function HEAD, so an elementwise array_max inside a
   groupless aggregate no longer counts as a global reduction and
   cannot launder an unbounded broadcast hint through the equality-
   filter idiom.
2. audio degrade contract (round-8 ADVICE): a feature-extraction crash
   on a decodable WAV degrades that row to NULL features instead of
   killing the Spark task.
3. VP8L prefix-code hygiene (round-8 ADVICE): an over- or
   under-subscribed (non-Kraft-complete) code in a corrupt stream
   raises inside the decoder so the row degrades to NULL instead of
   decoding garbage pixels; the meta-prefix-image / multi-group decode
   branch is exercised against a real encoded fixture.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bertrand_spark.plans.audit import audit_broadcast_hints  # noqa: E402


def _analyzed(df):
    return df._jdf.queryExecution().analyzed()


class TestReductionHeadMatch:
    def test_array_max_aggregate_does_not_launder(self, spark, sf_dir):
        """Round-8 ADVICE: the substring test ('"max(" in s') counted a
        groupless aggregate computing array_max(collect_list(...)) as a
        global max reduction, so an equality filter against it passed
        the q57-idiom check and laundered an unbounded broadcast hint.
        The head-anchored match must flag this shape."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pseudo = d.agg(
            F.array_max(F.collect_list("n_chars")).alias("mx")
        )
        shaped = d.crossJoin(pseudo).filter(F.col("n_chars") == F.col("mx"))
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(5)
        df = o.crossJoin(F.broadcast(shaped))
        flags = audit_broadcast_hints("array_max_launder", _analyzed(df))
        assert len(flags) == 1 and "documents" in flags[0], flags

    def test_true_global_max_still_recognized(self, spark, sf_dir):
        """The real reduction (groupless max) keeps passing — the
        tightening must not break the documented q57 idiom."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        mx = d.agg(F.max("n_chars").alias("mx"))
        shaped = d.crossJoin(mx).filter(F.col("n_chars") == F.col("mx"))
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(5)
        df = o.crossJoin(F.broadcast(shaped))
        assert audit_broadcast_hints("true_max", _analyzed(df)) == []


class TestAudioFeatureDegrade:
    """extract_audio_features(decode='real') routes every row through
    _audio_features_or_none, which must NULL the row (not raise) when
    the FEATURE step crashes on a payload the decoder accepted."""

    def test_feature_crash_degrades_to_none(self, monkeypatch):
        import numpy as np

        from bertrand_spark.pipeline import multimodal as mm

        wav = mm.wav_encode(
            16000, np.sin(np.linspace(0, 200, 16000)).astype(np.float64)
        )
        assert mm._audio_features_or_none(wav, 16) is not None

        def boom(*a, **kw):
            raise IndexError("synthetic numpy edge case")

        monkeypatch.setattr(mm, "_wav_features", boom)
        assert mm._audio_features_or_none(wav, 16) is None

    def test_undecodable_and_null_payloads(self):
        from bertrand_spark.pipeline import multimodal as mm

        assert mm._audio_features_or_none(b"\x00not-a-wav", 16) is None
        assert mm._audio_features_or_none(None, 16) is None

    def test_rolloff_index_clamped(self):
        """The 85% rolloff is freqs[searchsorted(...)], which can index
        one past the end under extreme float rounding — the clamp keeps
        it a valid bin.  Property over assorted signals: rolloff is a
        real rfft bin frequency <= Nyquist."""
        import numpy as np

        from bertrand_spark.pipeline.multimodal import _wav_features

        rng = np.random.default_rng(7)
        for n in (2, 3, 64, 1001):
            for x in (
                rng.standard_normal(n),
                np.ones(n),
                np.zeros(n),
                np.sin(np.linspace(0, 50, n)),
            ):
                v = _wav_features(8000, x.astype(np.float64), 16)
                rolloff = v[4]
                freqs = np.fft.rfftfreq(min(n, 2**21), 1.0 / 8000)
                assert rolloff <= 4000.0
                assert any(abs(rolloff - f) < 1e-9 for f in freqs)


class TestVp8lPrefixCodeHygiene:
    """Round-8 ADVICE items 1+2: Kraft-completeness rejection and real
    coverage for the meta-prefix-image / multi-group decode branch."""

    def _rt(self, w, h, ch, px, **kw):
        import numpy as np

        from bertrand_spark.pipeline.multimodal import (
            _vp8l_decode, vp8l_encode,
        )

        blob = vp8l_encode(w, h, ch, px.tobytes(), **kw)
        W, H, C, raw = _vp8l_decode(blob, 3)
        assert (W, H, C) == (w, h, 3), kw
        got = np.frombuffer(raw, np.uint8).reshape(H, W, 3)
        assert (got == px[:, :, :3]).all(), kw
        return blob

    def test_kraft_incomplete_code_raises(self):
        """An under-subscribed multi-symbol code (two symbols at length
        2: sum(2^-len) = 1/2) must raise, not decode garbage — libwebp
        rejects such streams."""
        from bertrand_spark.pipeline.multimodal import _vp8l_canonical

        lengths = [0] * 256
        lengths[5] = 2
        lengths[9] = 2
        with pytest.raises(ValueError, match="Kraft"):
            _vp8l_canonical(lengths)

    def test_kraft_oversubscribed_code_raises(self):
        """Over-subscription (three 1-bit codes: sum = 3/2) aliases two
        symbols onto one pattern — must raise likewise."""
        from bertrand_spark.pipeline.multimodal import _vp8l_canonical

        lengths = [0] * 256
        lengths[1] = lengths[2] = lengths[3] = 1
        with pytest.raises(ValueError, match="Kraft"):
            _vp8l_canonical(lengths)

    def test_complete_and_single_symbol_codes_still_build(self):
        from bertrand_spark.pipeline.multimodal import _vp8l_canonical

        # complete: {1, 2, 2} — sums to 1
        lengths = [0] * 16
        lengths[3] = 1
        lengths[7] = lengths[11] = 2
        table, single, lut = _vp8l_canonical(lengths)
        assert single is None and len(table) == 3
        # single-symbol codes are exempt (the spec's 0-bit case)
        only = [0] * 16
        only[5] = 1
        _, s, _ = _vp8l_canonical(only)
        assert s == 5

    def test_meta_prefix_roundtrips(self):
        """The multi-group branch decodes pixel-exactly: a 2-group
        checkerboard meta-prefix image whose groups use DIFFERENT green
        code shapes, alone and stacked with transforms and LZ77."""
        import numpy as np

        rng = np.random.default_rng(91)
        px = rng.integers(0, 256, size=(14, 18, 3), dtype=np.uint8)
        self._rt(18, 14, 3, px, meta_prefix_bits=2)
        self._rt(18, 14, 3, px, meta_prefix_bits=3)
        self._rt(
            18, 14, 3, px, meta_prefix_bits=2, subtract_green=True,
            predictor_bits=2,
        )
        runs = np.repeat(
            rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8), 4, axis=1
        )
        self._rt(20, 9, 3, runs, meta_prefix_bits=2, lz77=True)
        # RGBA payload through the multi-group path
        self._rt(
            10, 6, 4,
            rng.integers(0, 256, size=(6, 10, 4), dtype=np.uint8),
            meta_prefix_bits=2,
        )

    def test_meta_prefix_groups_actually_differ(self):
        """The fixture would be vacuous if both groups shared one code
        shape — assert the stream really contains TWO code groups by
        checking the decoded meta image drives group selection: flipping
        meta_prefix_bits changes the block geometry but not the pixels."""
        import numpy as np

        rng = np.random.default_rng(92)
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        b2 = self._rt(16, 16, 3, px, meta_prefix_bits=2)
        b3 = self._rt(16, 16, 3, px, meta_prefix_bits=3)
        assert b2 != b3
        # a meta grid degenerating to ONE block must write (and read)
        # a single code group — encoder/decoder group counts both come
        # from the meta image
        self._rt(16, 16, 3, px, meta_prefix_bits=4)

    def test_meta_prefix_excludes_cache(self):
        import numpy as np

        from bertrand_spark.pipeline.multimodal import vp8l_encode

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="meta_prefix_bits"):
            vp8l_encode(
                4, 4, 3, px.tobytes(), meta_prefix_bits=2, cache_bits=3
            )
