"""Round-2 additions: object escape hatch, temporal matrix holes, calendar
units, decorators (extension_func/attachable), dispatch protocol, scale-safe
enumeration, EXCEPT multiplicity."""

import datetime as dt
import pickle

import pytest
from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

from bertrand_spark.convert.cast import cast, cast_col
from bertrand_spark.operators import rows as R


def one(df):
    return df.collect()[0]


# --- object escape hatch (C27/E1) ------------------------------------------
class TestObjectEscapeHatch:
    def test_roundtrip_int(self, spark):
        df = spark.range(5).select(F.col("id").cast("long").alias("x"))
        obj = cast(df, {"x": "object"})
        assert obj.schema["x"].dataType.simpleString() == "binary"
        back = cast(obj, {"x": "int64"}, errors="coerce")
        assert sorted(r["x"] for r in back.collect()) == [0, 1, 2, 3, 4]

    def test_object_to_string_and_float(self, spark):
        payload = [(pickle.dumps(3.5),), (pickle.dumps(7),), (None,)]
        df = spark.createDataFrame(payload, "x binary")
        f = cast(df, {"x": "float64"}, errors="coerce")
        assert sorted(
            (r["x"] for r in f.collect() if r["x"] is not None)
        ) == [3.5, 7.0]
        s = cast(df, {"x": "string"}, errors="coerce")
        assert sorted(r["x"] for r in s.collect() if r["x"] is not None) == ["3.5", "7"]

    def test_coerce_nulls_bad_elements(self, spark):
        payload = [(pickle.dumps("not a number"),), (pickle.dumps(42),)]
        df = spark.createDataFrame(payload, "x binary")
        out = cast(df, {"x": "int64"}, errors="coerce")
        got = sorted((r["x"] for r in out.collect()), key=lambda v: (v is None, v))
        assert got == [42, None]

    def test_object_datetime(self, spark):
        when = dt.datetime(2001, 2, 3, 4, 5, 6)
        df = spark.createDataFrame([(pickle.dumps(when),)], "x binary")
        out = cast(df, {"x": "datetime"}, errors="raise")
        assert one(out)["x"] == when

    def test_user_call(self, spark):
        df = spark.createDataFrame(
            [(pickle.dumps({"v": 9}),)], "x binary"
        )
        out = cast(df, {"x": "int64"}, call=lambda o: o["v"], errors="raise")
        assert one(out)["x"] == 9


# --- C13: DayTimeIntervalType boundary -------------------------------------
class TestIntervalBoundary:
    def test_ns_interval_roundtrip(self, spark):
        from bertrand_spark.functions.temporal import (
            interval_to_ns, ns_to_interval,
        )

        ns_vals = [0, 1_000, 86_400 * 10**9 + 5_123_456_000, -3_600 * 10**9]
        df = spark.createDataFrame([(v,) for v in ns_vals], "ns long")
        out = df.select(
            "ns", interval_to_ns(ns_to_interval(F.col("ns"))).alias("back")
        ).collect()
        for r in out:
            # intervals carry µs resolution: round-trip exact to 1000 ns
            assert abs(r["back"] - r["ns"]) < 1000

    def test_interval_to_ns_not_seconds_truncated(self, spark):
        from bertrand_spark.functions.temporal import interval_to_ns

        df = spark.range(1).select(
            F.make_dt_interval(
                F.lit(1), F.lit(2), F.lit(3), F.lit(4.5)
            ).alias("iv")
        )
        v = one(df.select(interval_to_ns(F.col("iv")).alias("v")))["v"]
        assert v == ((24 + 2) * 3600 + 3 * 60) * 10**9 + 4_500_000_000 + 86400 * 0

    def test_cast_emits_interval(self, spark):
        import pyspark.sql.types as st

        df = spark.createDataFrame([(90,)], "x long")
        out = df.select(
            cast_col(
                F.col("x"), "int64", "timedelta", unit="s", as_interval=True
            ).alias("iv")
        )
        assert isinstance(out.schema["iv"].dataType, st.DayTimeIntervalType)
        assert str(one(out)["iv"]) == "0:01:30"

    def test_dataframe_cast_consumes_interval(self, spark):
        df = spark.range(1).select(
            F.make_dt_interval(F.lit(0), F.lit(1), F.lit(0), F.lit(30.5)).alias("iv")
        )
        out = cast(df, {"iv": "float64"}, unit="m")
        v = one(out)["iv"]
        assert v == pytest.approx(60.5083333333)


# --- temporal matrix holes (C18-C21) ---------------------------------------
class TestTemporalMatrix:
    def test_datetime_to_timedelta(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(1970, 1, 2, 0, 0, 0),)], "ts timestamp"
        )
        ns = one(df.select(cast_col(F.col("ts"), "datetime", "timedelta").alias("v")))["v"]
        assert ns == 86400 * 10**9

    def test_timedelta_to_datetime(self, spark):
        df = spark.createDataFrame([(3600 * 10**9,)], "td long")
        out = one(
            df.select(cast_col(F.col("td"), "timedelta", "datetime").alias("v"))
        )["v"]
        assert out == dt.datetime(1970, 1, 1, 1, 0, 0)

    def test_bool_to_datetime(self, spark):
        df = spark.createDataFrame([(True,), (False,)], "b boolean")
        vals = sorted(
            r["v"]
            for r in df.select(
                cast_col(F.col("b"), "bool", "datetime", unit="D").alias("v")
            ).collect()
        )
        assert vals == [dt.datetime(1970, 1, 1), dt.datetime(1970, 1, 2)]

    def test_timedelta_to_float_hours(self, spark):
        df = spark.createDataFrame([(5400 * 10**9,)], "td long")
        v = one(
            df.select(
                cast_col(F.col("td"), "timedelta", "float64", unit="h").alias("v")
            )
        )["v"]
        assert v == pytest.approx(1.5)

    def test_float_to_timedelta(self, spark):
        df = spark.createDataFrame([(1.5,)], "x double")
        v = one(
            df.select(
                cast_col(F.col("x"), "float64", "timedelta", unit="s").alias("v")
            )
        )["v"]
        assert v == 1_500_000_000

    def test_calendar_month_unit_exact(self, spark):
        # 13 months after unix epoch is exactly 1971-02-01 (not 13*30.44 days)
        df = spark.createDataFrame([(13,)], "n int")
        v = one(
            df.select(cast_col(F.col("n"), "int64", "datetime", unit="M").alias("v"))
        )["v"]
        assert v == dt.datetime(1971, 2, 1)

    def test_calendar_month_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 3, 15),)], "ts timestamp"
        )
        months = one(
            df.select(cast_col(F.col("ts"), "datetime", "int64", unit="M").alias("v"))
        )["v"]
        assert months == (2024 - 1970) * 12 + 2  # floor(months since epoch)

    def test_datetime_to_bool_rejects(self, spark):
        df = spark.createDataFrame([(dt.datetime(1999, 1, 1),)], "ts timestamp")
        v = one(
            df.select(cast_col(F.col("ts"), "datetime", "bool", unit="s").alias("v"))
        )["v"]
        assert v is None


# --- one-pass validation ----------------------------------------------------
class TestValidation:
    def test_raise_lists_all_columns(self, spark):
        df = spark.createDataFrame([("x", "y")], "a string, b string")
        from bertrand_spark.convert.cast import CastError

        with pytest.raises(CastError) as exc:
            cast(df, {"a": "int64", "b": "float64"})
        # single aggregate reports both offending columns at once
        assert "a" in str(exc.value) and "b" in str(exc.value)


# --- decorators (D7/D8) -----------------------------------------------------
class TestExtensionFunc:
    def test_defaults_and_overrides(self):
        from bertrand_spark.decorators import extension_func

        @extension_func
        def f(x, *, factor=None):
            return x * factor

        @f.argument(default=2)
        def factor(val):
            v = int(val)
            if v <= 0:
                raise ValueError("factor must be positive")
            return v

        assert f(3) == 6
        f.factor = 5
        assert f(3) == 15
        assert f(3, factor=1) == 3
        del f.factor
        assert f(3) == 6
        with pytest.raises(ValueError):
            f.factor = -1

    def test_thread_local(self):
        import threading

        from bertrand_spark.decorators import extension_func

        @extension_func
        def f(*, k=None):
            return k

        @f.argument(default=1)
        def k(val):
            return int(val)

        f.k = 10
        seen = {}

        def other():
            seen["val"] = f()

        t = threading.Thread(target=other)
        t.start()
        t.join()
        assert f() == 10
        assert seen["val"] == 1  # override did not leak across threads


class TestAttachable:
    def test_attach_detach_roundtrip(self, spark):
        import bertrand_spark.api as api

        df = spark.range(3).select(F.col("id").cast("double").alias("x"))
        had_cast = hasattr(DataFrame, "cast")
        api.attach()
        try:
            out = df.cast("int64", cols=["x"])
            assert out.schema["x"].dataType.simpleString() == "bigint"
            assert df.typecheck({"x": "float64"})
            ns = df.bertrand
            assert ns.typecheck({"x": "float64"})
        finally:
            api.detach()
        assert hasattr(DataFrame, "cast") == had_cast


class TestDispatchPipe:
    def test_protocol(self, spark):
        from bertrand_spark.convert.dispatch import dispatch

        @dispatch("col")
        def verb(df, col):
            return F.col(col) * 2  # transform

        @verb.overload("string")
        def _s(df, col):
            return F.length(F.col(col)) > 3  # filtration (boolean)

        nums = spark.createDataFrame([(1,), (2,)], "v int")
        strs = spark.createDataFrame([("ab",), ("abcdef",)], "v string")
        assert sorted(r["v"] for r in verb.pipe(nums, "v").collect()) == [2, 4]
        assert [r["v"] for r in verb.pipe(strs, "v").collect()] == ["abcdef"]


# --- scale-safe enumeration + set semantics ---------------------------------
class TestEnumerateScale:
    def test_multi_partition_parallel(self, spark):
        # AQE coalescing shrinks tiny local data to 1 partition; disable it
        # here to observe the range partitioning the plan really declares
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            df = spark.range(0, 10000).select(F.col("id").alias("k"))
            out = R.enumerate_rows(df, ["k"])
            # ranking stage must not collapse to one partition
            assert out.rdd.getNumPartitions() > 1
            rows = out.orderBy("idx").limit(5).collect()
            assert [(r["idx"], r["k"]) for r in rows] == [(i, i) for i in range(5)]
            tail = out.orderBy(F.col("idx").desc()).limit(1).collect()[0]
            assert tail["idx"] == 9999 and tail["k"] == 9999
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    def test_except_multiplicity(self, spark):
        a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "v int")
        b = spark.createDataFrame([(1,)], "v int")
        # value present in b is removed entirely even if count_a > count_b
        assert R.except_sorted(a, b).collect() == [Row(v=2)]

    def test_compare_lex_positional(self, spark):
        a = spark.createDataFrame([(0, 9), (1, 1)], "i int, v int")
        b = spark.createDataFrame([(0, 9), (1, 2)], "i int, v int")
        # first positional difference decides (idx 1: 1 < 2), and it is NOT
        # the minimum-valued pair trap
        assert R.compare_lex(a, b, ["i"], ["i"], "v") == -1


class TestParametrizedContains:
    def test_flyweight_subtype(self):
        import pyspark.sql.types as st

        from bertrand_spark.types.resolve import resolve

        base = resolve("string")
        param = resolve(st.VarcharType(5))
        assert base.contains(param)
        dec = resolve("decimal")
        assert dec.contains(resolve(st.DecimalType(10, 2)))
