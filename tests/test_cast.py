"""Conversion engine: cast matrix, rounding, bounds, downcast (SURVEY §2.2, §2.6)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
import pyspark.sql.types as st

import bertrand_spark as b
from bertrand_spark.functions.rounding import round_col, round_div, snap_round


def rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


class TestRounding:
    @pytest.fixture(scope="class")
    def vals(self, spark):
        data = [(-2.5,), (-1.5,), (-0.5,), (0.5,), (1.5,), (2.5,), (1.4,), (-1.4,)]
        return spark.createDataFrame(data, ["x"])

    def test_all_rules(self, vals):
        got = vals.select(
            *[round_col(F.col("x"), r).alias(r) for r in sorted(
                ["floor", "ceiling", "down", "up", "half_floor",
                 "half_ceiling", "half_down", "half_up", "half_even"])]
        ).collect()
        by_x = {row_x: g for row_x, g in zip([r[0] for r in vals.collect()], got)}
        # python-reference expectations for 2.5
        r = by_x[2.5].asDict()
        assert r["floor"] == 2 and r["ceiling"] == 3
        assert r["down"] == 2 and r["up"] == 3
        assert r["half_up"] == 3 and r["half_down"] == 2
        assert r["half_even"] == 2
        assert r["half_floor"] == 2 and r["half_ceiling"] == 3
        r = by_x[-2.5].asDict()
        assert r["half_up"] == -3 and r["half_down"] == -2
        assert r["half_even"] == -2
        assert r["half_floor"] == -3 and r["half_ceiling"] == -2
        assert r["down"] == -2 and r["up"] == -3

    def test_round_div(self, spark):
        df = spark.createDataFrame([(7, 2), (-7, 2), (5, 3), (-5, 3)], ["n", "d"])
        got = df.select(
            round_div(F.col("n"), F.col("d"), "floor").alias("f"),
            round_div(F.col("n"), F.col("d"), "ceiling").alias("c"),
            round_div(F.col("n"), F.col("d"), "down").alias("t"),
            round_div(F.col("n"), F.col("d"), "half_even").alias("he"),
        ).collect()
        assert [r["f"] for r in got] == [3, -4, 1, -2]
        assert [r["c"] for r in got] == [4, -3, 2, -1]
        assert [r["t"] for r in got] == [3, -3, 1, -1]
        assert [r["he"] for r in got] == [4, -4, 2, -2]

    def test_snap_round(self, spark):
        df = spark.createDataFrame([(1.0000004,), (2.9999997,), (1.5,)], ["x"])
        got = df.select(snap_round(F.col("x"), 1e-6, errors="coerce").alias("v")).collect()
        assert got[0]["v"] == 1.0
        assert got[1]["v"] == 3.0
        assert got[2]["v"] is None  # not near-integer, no rule → coerced


class TestCastMatrix:
    def test_float_to_int(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0000001,), (2.7,)], ["x"])
        out = b.cast(df, {"x": "int64"}, tol=1e-6, errors="coerce")
        assert [r["x"] for r in out.collect()] == [1, 2, None]
        out2 = b.cast(df, {"x": "int64"}, rounding="half_even", errors="coerce")
        assert [r["x"] for r in out2.collect()] == [1, 2, 3]

    def test_float_to_int_raise(self, spark):
        df = spark.createDataFrame([(2.7,)], ["x"])
        with pytest.raises(b.CastError):
            b.cast(df, {"x": "int64"}, errors="raise")

    def test_int_to_bool(self, spark):
        df = spark.createDataFrame([(0,), (1,), (2,)], ["x"])
        out = b.cast(df, {"x": "bool"}, errors="coerce")
        assert [r["x"] for r in out.collect()] == [False, True, None]

    def test_string_to_bool_tokens(self, spark):
        df = spark.createDataFrame(
            [("true",), (" YES ",), ("off",), ("0",), ("xyz",)], ["x"]
        )
        out = b.cast(df, {"x": "bool"}, errors="coerce")
        assert [r["x"] for r in out.collect()] == [True, True, False, False, None]

    def test_string_to_int_radix(self, spark):
        df = spark.createDataFrame([("ff",), ("10",)], ["x"])
        out = b.cast(df, {"x": "int64"}, base=16, errors="coerce")
        assert [r["x"] for r in out.collect()] == [255, 16]
        df2 = spark.createDataFrame([("0x1F",), ("0b1010",), ("0o777",), ("42",)], ["x"])
        out2 = b.cast(df2, {"x": "int64"}, base=0, errors="coerce")
        assert [r["x"] for r in out2.collect()] == [31, 10, 511, 42]

    def test_int_to_string_radix(self, spark):
        df = spark.createDataFrame([(255,), (-16,)], ["x"])
        out = b.cast(df, {"x": "string"}, base=16)
        assert [r["x"] for r in out.collect()] == ["ff", "-10"]

    def test_string_to_float_specials(self, spark):
        df = spark.createDataFrame([("1.5",), ("inf",), ("-inf",), ("bad",)], ["x"])
        out = b.cast(df, {"x": "float64"}, errors="coerce")
        got = [r["x"] for r in out.collect()]
        assert got[0] == 1.5 and got[1] == float("inf") and got[2] == float("-inf")
        assert got[3] is None

    def test_string_to_datetime_iso(self, spark):
        df = spark.createDataFrame(
            [("2021-03-04",), ("2021-03-04T05:06:07",), ("garbage",)], ["x"]
        )
        out = b.cast(df, {"x": "datetime"}, errors="coerce")
        got = [r["x"] for r in out.collect()]
        assert got[0] == dt.datetime(2021, 3, 4)
        assert got[1] == dt.datetime(2021, 3, 4, 5, 6, 7)
        assert got[2] is None

    def test_string_to_timedelta(self, spark):
        df = spark.createDataFrame(
            [("1:24:31.123",), ("1 day, 23 seconds",), ("1.5 hours",), ("-2 weeks",)],
            ["x"],
        )
        from bertrand_spark.functions.temporal import parse_timedelta_string
        out = df.select(parse_timedelta_string(F.col("x")).alias("ns")).collect()
        assert out[0]["ns"] == (1 * 3600 + 24 * 60 + 31) * 10**9 + 123_000_000
        assert out[1]["ns"] == (86400 + 23) * 10**9
        assert out[2]["ns"] == int(1.5 * 3600 * 10**9)
        assert out[3]["ns"] == -2 * 7 * 86400 * 10**9

    def test_int_to_datetime_epoch(self, spark):
        df = spark.createDataFrame([(0,), (86400,)], ["x"])
        out = b.cast(df, {"x": "datetime"}, unit="s", since="j2000")
        got = [r["x"] for r in out.collect()]
        assert got[0] == dt.datetime(2000, 1, 1, 12)
        assert got[1] == dt.datetime(2000, 1, 2, 12)

    def test_datetime_to_int_roundtrip(self, spark):
        df = spark.createDataFrame([(dt.datetime(2020, 5, 17, 3, 4, 5),)], ["x"])
        ns = b.cast(df, {"x": "int64"}, unit="s")
        back = b.cast(ns, {"x": "datetime"}, unit="s")
        assert back.collect()[0]["x"] == dt.datetime(2020, 5, 17, 3, 4, 5)

    def test_complex_roundtrip(self, spark):
        df = spark.createDataFrame([("1+2j",), ("-3.5j",), ("4",)], ["x"])
        out = b.cast(df, {"x": "complex"}, errors="coerce")
        got = [r["x"] for r in out.collect()]
        assert got[0] == (1.0, 2.0) and got[1] == (0.0, -3.5) and got[2] == (4.0, 0.0)
        back = b.cast(out, {"x": "string"})
        assert back.collect()[0]["x"] == "(1.0+2.0j)"

    def test_trivial_cast_noop(self, lineitem):
        out = b.cast(lineitem, {"l_orderkey": "int64"})
        assert out is lineitem


class TestDowncast:
    def test_downcast_plan(self, spark):
        df = spark.createDataFrame(
            [(1, 100, 100000, 1.5)], ["a", "b", "c", "d"]
        ).select(
            F.col("a").cast("long"), F.col("b").cast("long"),
            F.col("c").cast("long"), F.col("d").cast("double"),
        )
        plan = b.downcast_plan(df)
        assert plan["a"].simpleString() == "tinyint"
        assert plan["b"].simpleString() == "tinyint"
        assert plan["c"].simpleString() == "int"
        assert plan["d"].simpleString() == "float"

    def test_downcast_applies(self, lineitem):
        out = b.downcast(lineitem, ["l_linenumber"])
        assert dict(out.dtypes)["l_linenumber"] == "tinyint"

    def test_boundscheck(self, spark):
        df = spark.createDataFrame([(1,), (300,)], ["x"])
        with pytest.raises(ValueError):
            b.boundscheck(df, "x", "int8")
        filtered, _ = b.boundscheck(df, "x", "int8", errors="coerce")
        assert filtered.count() == 1
        _, t = b.boundscheck(df, "x", "int8", errors="ignore")
        assert t is b.resolve("int16")
