"""Range-adaptor operator surface (SURVEY §2.4/§2.5)."""

from pyspark.sql import functions as F

from bertrand_spark.operators import rows as R


def vals(df, col):
    return [r[col] for r in df.collect()]


class TestIota:
    def test_iota(self, spark):
        df = R.iota(spark, 0, 10, 3)
        assert vals(df.orderBy("i"), "i") == [0, 3, 6, 9]

    def test_broadcast_ops(self, spark):
        df = R.iota(spark, 5).select((F.col("i") * 2 + 1).alias("v"))
        assert sorted(vals(df, "v")) == [1, 3, 5, 7, 9]


class TestSlice:
    def test_basic(self, spark):
        df = R.iota(spark, 100)
        out = R.slice_rows(df, 10, 20, 3, order_by=["i"])
        assert vals(out.orderBy("i"), "i") == [10, 13, 16, 19]

    def test_negative(self, spark):
        df = R.iota(spark, 10)
        out = R.slice_rows(df, -3, None, 1, order_by=["i"])
        assert vals(out.orderBy("i"), "i") == [7, 8, 9]

    def test_negative_step(self, spark):
        df = R.iota(spark, 10)
        out = R.slice_rows(df, 8, 2, -2, order_by=["i"])
        assert vals(out, "i") == [8, 6, 4]

    def test_limit_fast_path(self, spark):
        df = R.iota(spark, 1000)
        assert R.slice_rows(df, None, 5).count() == 5


class TestZipEnumerate:
    def test_enumerate(self, spark):
        df = R.iota(spark, 3).withColumn("s", F.col("i") * 10)
        out = R.enumerate_rows(df, ["i"])
        assert [(r["idx"], r["i"]) for r in out.orderBy("idx").collect()] == [
            (0, 0), (1, 1), (2, 2)
        ]

    def test_zip_truncates(self, spark):
        a = R.iota(spark, 5)
        b = R.iota(spark, 3).select(F.col("i").alias("j"))
        z = R.zip_rows(a, b, ["i"], ["j"])
        assert z.count() == 3


class TestSetAlgebra:
    def test_dedup_ordered(self, spark):
        df = spark.createDataFrame(
            [(1, "b"), (2, "a"), (3, "b"), (4, "c"), (5, "a")], ["id", "v"]
        )
        out = R.dedup_ordered(df, ["v"], ["id"])
        assert vals(out, "v") == ["b", "a", "c"]

    def test_intersect_except(self, spark):
        a = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
        b = spark.createDataFrame([(2,), (3,), (4,)], ["x"])
        assert sorted(vals(R.intersect_all_sorted(a, b), "x")) == [2, 3]
        assert vals(R.except_sorted(a, b), "x") == [1]
        assert sorted(vals(R.symmetric_difference(a, b), "x")) == [1, 4]
        assert not R.is_disjoint(a, b)
        assert R.is_subset(a.filter("x=2"), b)
        assert R.is_superset(b, a.filter("x>=2"))


class TestReductions:
    def test_all_any_count(self, spark):
        df = R.iota(spark, 10)
        assert R.all_rows(df, F.col("i") >= 0)
        assert not R.all_rows(df, F.col("i") > 0)
        assert R.any_rows(df, F.col("i") == 7)
        assert R.count_rows(df, F.col("i") % 2 == 0) == 5
        assert R.contains_value(df, "i", 3)
        assert not R.contains_value(df, "i", 33)

    def test_min_max_by(self, spark):
        df = spark.createDataFrame([("aa", 1), ("b", 2), ("ccc", 3)], ["s", "x"])
        assert R.min_rows(df, "x") == 1
        assert R.max_rows(df, "x") == 3
        # custom comparator: min by string length
        assert R.min_rows(df, "s", by=F.length("s")) == "b"

    def test_find_first(self, spark):
        df = R.iota(spark, 100)
        assert R.find_first(df, F.col("i") * 2 == 40, ["i"]) == 20
        assert R.find_first(df, F.col("i") < 0, ["i"]) is None


class TestMisc:
    def test_rotate(self, spark):
        df = R.iota(spark, 5)
        out = R.rotate_rows(df, 2, ["i"])
        # rotate moves each row to (pos+2)%5 → reading in new order: 3,4,0,1,2
        first = out.limit(1).collect()[0]["i"]
        assert first == 3

    def test_repeat(self, spark):
        df = R.iota(spark, 3)
        assert R.repeat_rows(df, 4).count() == 12

    def test_replace_values(self, spark):
        df = spark.createDataFrame([("a",), ("b",), (None,)], ["v"])
        out = R.replace_values(df, "v", {"a": "x", None: "z"})
        assert sorted(vals(out, "v")) == ["b", "x", "z"]

    def test_at_positions(self, spark):
        df = R.iota(spark, 50)
        out = R.at_positions(df, [5, 1, 30], ["i"])
        assert vals(out, "i") == [1, 5, 30]

    def test_sort_stable(self, spark):
        df = spark.createDataFrame(
            [("bb", 1), ("a", 2), ("cc", 3), ("d", 4)], ["s", "k"]
        )
        out = R.sort_rows(df, F.length("s"), stable_by=["k"])
        assert vals(out, "s") == ["a", "d", "bb", "cc"]

    def test_compare_lex(self, spark):
        a = spark.createDataFrame([(0, 1), (1, 2)], ["i", "v"])
        b = spark.createDataFrame([(0, 1), (1, 3)], ["i", "v"])
        assert R.compare_lex(a, b, ["i"], ["i"], "v") == -1
        assert R.compare_lex(b, a, ["i"], ["i"], "v") == 1
        assert R.compare_lex(a, a, ["i"], ["i"], "v") == 0
