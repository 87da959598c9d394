"""Round-2 batch C: modpow (M6), complex tolerance (M2), positional
swap/move/distance (L9), exhaust (I18), dispatch normalization (D2),
scalar hooks (R11), local tz (T8)."""

import decimal

import pytest
from pyspark.sql import functions as F

import bertrand_spark as b
from bertrand_spark.functions.rounding import modpow, within_tol_complex
from bertrand_spark.operators import rows as R


class TestMathKernels:
    def test_modpow(self, spark):
        df = spark.createDataFrame([(7,), (12,), (0,)], "x long")
        out = {
            r["x"]: r["v"]
            for r in df.select("x", modpow(F.col("x"), 13, 1000003).alias("v")).collect()
        }
        assert out == {x: pow(x, 13, 1000003) for x in (7, 12, 0)}

    def test_modpow_validation(self, spark):
        with pytest.raises(ValueError):
            modpow(F.lit(2), -1, 7)
        with pytest.raises(ValueError):
            modpow(F.lit(2), 3, 1 << 32)

    def test_within_tol_complex(self, spark):
        df = spark.range(1).select(
            F.struct(F.lit(1.0).alias("re"), F.lit(2.0).alias("im")).alias("a"),
            F.struct(F.lit(1.05).alias("re"), F.lit(2.2).alias("im")).alias("b"),
        )
        r = df.select(
            within_tol_complex(F.col("a"), F.col("b"), 0.3).alias("both"),
            within_tol_complex(F.col("a"), F.col("b"), complex(0.1, 0.3)).alias("cx"),
            within_tol_complex(F.col("a"), F.col("b"), complex(0.1, 0.1)).alias("no"),
        ).collect()[0]
        assert r["both"] is True and r["cx"] is True and r["no"] is False


class TestPositionalL9:
    def test_swap(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5)], "v int")
        out = [r["v"] for r in R.swap_rows(df, 1, 3, ["v"]).collect()]
        assert out == [0, 3, 2, 1, 4]

    def test_move_forward_and_back(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5)], "v int")
        fwd = [r["v"] for r in R.move_rows(df, 0, 3, ["v"]).collect()]
        assert fwd == [1, 2, 3, 0, 4]
        back = [r["v"] for r in R.move_rows(df, 4, 1, ["v"]).collect()]
        assert back == [0, 4, 1, 2, 3]

    def test_distance(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], "v int")
        d = R.distance_rows(df, F.col("v") == 2, F.col("v") == 7, ["v"])
        assert d == 5
        assert R.distance_rows(df, F.col("v") == 99, F.col("v") == 7, ["v"]) is None

    def test_exhaust(self, spark):
        df = spark.range(100)
        assert R.exhaust(df) == 100


class TestDispatchNormalize:
    def test_bare_list_dispatches(self, spark):
        from bertrand_spark.convert.dispatch import dispatch

        @dispatch("col")
        def double(df, col):
            return df.select((F.col(col) * 2).alias("out"))

        out = double([1, 2, 3])
        assert sorted(r["out"] for r in out.collect()) == [2, 4, 6]

    def test_pandas_series_dispatches(self, spark):
        import pandas as pd

        from bertrand_spark.convert.dispatch import dispatch

        @dispatch("col")
        def length(df, col):
            return df.select(F.length(F.col(col)).alias("n"))

        out = length(pd.Series(["ab", "abc"]))
        assert sorted(r["n"] for r in out.collect()) == [2, 3]


class TestScalarHooks:
    def test_decimal_refinement(self):
        t = b.detect(decimal.Decimal("12.345"))
        assert t.params == (5, 3)
        assert t.unparametrized is b.resolve("decimal")

    def test_custom_hook(self):
        t = b.resolve("string")
        b.registry.register_scalar_hook("string", lambda tt, v: tt.with_params(len(v)))
        try:
            got = b.detect("hello")
            assert got.params == (5,)
        finally:
            b.registry._scalar_hooks.pop("string", None)


class TestLocalTz:
    def test_local_resolves_to_session_tz(self, spark):
        from bertrand_spark.convert.cast import CastArgs

        a = CastArgs(tz="local")
        assert a.tz == spark.conf.get("spark.sql.session.timeZone")


class TestProfile:
    def test_single_job_and_hll_mode(self, spark, sf_dir):
        from bertrand_spark.functions.profile import profile_table
        from bertrand_spark.sources.reader import read_table

        o = read_table(spark, sf_dir, "orders")
        exact = {r["column"]: r for r in profile_table(o, ["o_custkey"]).collect()}
        assert exact["o_custkey"]["n_nulls"] == 0
        assert exact["o_custkey"]["n_distinct"] > 0
        hll = {
            r["column"]: r
            for r in profile_table(o, ["o_custkey"], exact=False).collect()
        }
        nd, approx = exact["o_custkey"]["n_distinct"], hll["o_custkey"]["n_distinct"]
        assert abs(approx - nd) / nd < 0.1  # HLL within its error bound

    def test_nulls_counted(self, spark):
        from bertrand_spark.functions.profile import profile_table

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, "c")], ["x", "s"]
        )
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["x"]["n_nulls"] == 1 and prof["s"]["n_nulls"] == 1
        assert prof["x"]["mean"] == 1.5
        assert prof["s"]["mean"] is None

    def test_dotted_names_and_empty_selection(self, spark):
        from bertrand_spark.functions.profile import profile_table

        df = spark.createDataFrame([(1, 2.0)], ["user.id", "score"])
        prof = {r["column"]: r for r in profile_table(df).collect()}
        assert prof["user.id"]["n_rows"] == 1
        assert profile_table(df, []).count() == 0
