"""Z-order layout: Morton-key correctness vs a Python bit-interleave
reference, and the actual pruning property — per-file min/max ranges
stay narrow in EVERY z-ordered dimension."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bertrand_spark.sources.layout import write_zordered, zorder_key, zorder_value


def _morton_ref(vals, bits):
    z = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * n + j)
    return z


class TestZorderValue:
    def test_matches_reference_interleave(self, spark):
        rows = [(a, b) for a in range(16) for b in range(16)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = df.select(
            "a", "b", zorder_value([F.col("a"), F.col("b")], bits=4).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == _morton_ref([r["a"], r["b"]], 4), (r["a"], r["b"])

    def test_three_columns(self, spark):
        rows = [(a, b, c) for a in range(4) for b in range(4) for c in range(4)]
        df = spark.createDataFrame(rows, "a long, b long, c long")
        got = df.select(
            "a", "b", "c",
            zorder_value([F.col("a"), F.col("b"), F.col("c")], bits=2).alias("z"),
        ).collect()
        zs = set()
        for r in got:
            assert r["z"] == _morton_ref([r["a"], r["b"], r["c"]], 2)
            zs.add(r["z"])
        assert len(zs) == 64  # the curve is a bijection on the grid

    def test_too_many_bits_rejected(self):
        with pytest.raises(ValueError):
            zorder_value([F.col("a")] * 4, bits=16)  # 64 > 63

    def test_curve_locality_beats_lexicographic(self, spark):
        # points close in (a, b) should be closer along the z-curve than
        # along a lexicographic (a major, b minor) order on average
        rows = [(a, b) for a in range(32) for b in range(32)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = df.select(
            "a", "b", zorder_value([F.col("a"), F.col("b")], bits=5).alias("z")
        ).collect()
        z_of = {(r["a"], r["b"]): r["z"] for r in got}
        # neighbors along b: both orders are fine; neighbors along A are
        # 32 apart lexicographically but bounded on the z-curve on average
        lex_gap = z_gap = 0
        for a in range(31):
            for b in range(32):
                lex_gap += 32  # |(a+1)*32+b - (a*32+b)|
                z_gap += abs(z_of[(a + 1, b)] - z_of[(a, b)])
        assert z_gap < lex_gap * 0.5


class TestZorderWrite:
    @pytest.fixture()
    def tmpdir(self):
        d = tempfile.mkdtemp(prefix="zorder_test_")
        yield d
        shutil.rmtree(d, ignore_errors=True)

    def _file_ranges(self, path, col):
        import glob

        import pyarrow.parquet as pq

        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = mx = None
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            spans.append((mn, mx))
        return spans

    def test_perfile_ranges_narrow_in_both_dims(self, spark, tmpdir):
        # a 100x100 uniform grid: 16 z-ordered files should each cover
        # roughly a quadrant-ish tile, so per-file spans are far below
        # the global span in BOTH dimensions; a single-column sort can
        # only achieve that for its own column.
        rows = [(a, b) for a in range(100) for b in range(100)]
        df = spark.createDataFrame(rows, "a long, b long")
        write_zordered(df, f"{tmpdir}/z", ["a", "b"], num_files=16, bits=7)
        out = spark.read.parquet(f"{tmpdir}/z")
        assert out.count() == 10_000
        assert set(out.columns) == {"a", "b"}  # __z dropped
        for col in ("a", "b"):
            spans = self._file_ranges(f"{tmpdir}/z", col)
            assert len(spans) >= 8
            avg_span = sum(mx - mn for mn, mx in spans) / len(spans)
            assert avg_span < 99 * 0.7, (col, avg_span)

    def test_null_and_constant_columns_safe(self, spark, tmpdir):
        rows = [(i, None, 7) for i in range(50)]
        df = spark.createDataFrame(rows, "a long, b long, c long")
        keyed, _ = zorder_key(df, ["a", "b", "c"], bits=4)
        got = keyed.select("a", "__z").orderBy("a").collect()
        # b (all null) and c (constant) rank 0 everywhere: the key is
        # monotone in a's rank alone
        zs = [r["__z"] for r in got]
        assert zs == sorted(zs)


class TestCompactParquet:
    def test_compacts_many_small_files(self, spark, tmp_path):
        from bertrand_spark.sources.layout import compact_parquet

        src = str(tmp_path / "small")
        spark.range(10_000).repartition(50).write.parquet(src)
        import glob

        assert len(glob.glob(f"{src}/*.parquet")) == 50
        dst = str(tmp_path / "compact")
        n = compact_parquet(spark, src, dst, target_mb=256)
        assert n == 1
        assert len(glob.glob(f"{dst}/*.parquet")) == 1
        assert spark.read.parquet(dst).count() == 10_000

    def test_sorted_compaction_prunes(self, spark, tmp_path):
        from bertrand_spark.sources.layout import compact_parquet

        src = str(tmp_path / "src")
        spark.range(5_000).selectExpr("id", "id % 100 as k").repartition(
            20
        ).write.parquet(src)
        dst = str(tmp_path / "dst")
        compact_parquet(spark, src, dst, target_mb=256, sort_cols=["k"])
        back = spark.read.parquet(dst)
        assert back.count() == 5_000
        assert {r["k"] for r in back.filter("k = 7").collect()} == {7}
