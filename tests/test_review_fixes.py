"""Regression tests for the round-2 self-review findings."""

import pickle

import pytest
from pyspark.sql import functions as F

from bertrand_spark.convert.cast import cast, cast_col
from bertrand_spark.operators import rows as R
from bertrand_spark.operators.joins import salted_join


class TestComplexToObject:
    def test_struct_column_pickles(self, spark):
        df = spark.range(1).select(
            F.struct(F.lit(1.5).alias("re"), F.lit(-2.0).alias("im")).alias("c")
        )
        obj = cast(df, {"c": "object"})
        raw = obj.collect()[0]["c"]
        assert pickle.loads(bytes(raw)) == complex(1.5, -2.0)


class TestIgnoreSemantics:
    def test_ignore_keeps_input_column(self, spark):
        df = spark.createDataFrame([("1",), ("oops",)], "x string")
        out = cast(df, {"x": "int64"}, errors="ignore")
        # one unparseable value → whole column reverts to the input
        assert out.schema["x"].dataType.simpleString() == "string"
        assert sorted(r["x"] for r in out.collect()) == ["1", "oops"]

    def test_ignore_converts_clean_column(self, spark):
        df = spark.createDataFrame([("1",), ("2",)], "x string")
        out = cast(df, {"x": "int64"}, errors="ignore")
        assert out.schema["x"].dataType.simpleString() == "bigint"

    def test_ignore_object_column(self, spark):
        payload = [(pickle.dumps("bad"),), (pickle.dumps(1),)]
        df = spark.createDataFrame(payload, "x binary")
        out = cast(df, {"x": "int64"}, errors="ignore")
        assert out.schema["x"].dataType.simpleString() == "binary"


class TestSaltedJoinGuard:
    def test_outer_rejected(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            salted_join(df, df, ["k"], how="full")
        with pytest.raises(ValueError):
            salted_join(df, df, ["k"], how="right")


class TestStepSizeConsistency:
    def test_dt_to_float_matches_int(self, spark):
        import datetime as dt

        df = spark.createDataFrame([(dt.datetime(1970, 1, 1, 2),)], "ts timestamp")
        as_int = cast_col(F.col("ts"), "datetime", "int64", unit="m", step_size=60)
        as_float = cast_col(F.col("ts"), "datetime", "float64", unit="m", step_size=60)
        row = df.select(as_int.alias("i"), as_float.alias("f")).collect()[0]
        assert row["i"] == 2 and row["f"] == pytest.approx(2.0)


class TestDayFirstDash:
    def test_dash_separated_ydm(self, spark):
        import datetime as dt

        df = spark.createDataFrame([("2021-05-03",)], "s string")
        v = df.select(
            cast_col(F.col("s"), "string", "datetime", day_first=True,
                     year_first=True, errors="coerce").alias("v")
        ).collect()[0]["v"]
        assert v == dt.datetime(2021, 3, 5)  # year-DAY-month ordering


class TestRowIdPreservesUserIdx:
    def test_user_idx_survives(self, spark):
        df = spark.createDataFrame([(10, 1), (20, 2)], "idx int, v int")
        out = R.with_row_id(df, order_by=["v"])
        rows = {r["v"]: (r["idx"], r[R.ROW_ID]) for r in out.collect()}
        assert rows[1] == (10, 0) and rows[2] == (20, 1)


class TestExhaustSingleJob:
    def test_count_correct(self, spark):
        assert R.exhaust(spark.range(123)) == 123


class TestPipeNormalization:
    def test_pipe_on_bare_list(self, spark):
        from bertrand_spark.convert.dispatch import dispatch

        @dispatch("col")
        def keep_big(df, col):
            return F.col(col) > 1  # boolean → filtration

        out = keep_big.pipe([1, 2, 3])
        assert sorted(r["value"] for r in out.collect()) == [2, 3]


class TestRunningTotalsStringKey:
    def test_string_key_schema(self, spark, sf_dir):
        from bertrand_spark.sources.reader import read_table
        from bertrand_spark.streaming import running_totals

        batch = read_table(spark, sf_dir, "events")
        out = running_totals(batch, "event_type", "value")
        assert out.schema["event_type"].dataType.simpleString() == "string"
        assert out.count() > 0
