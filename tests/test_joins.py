"""asof/range/salted join semantics."""

import pytest
from pyspark.sql import functions as F

from bertrand_spark.operators.joins import asof_join, range_join, salted_join


def by_key(rows, *cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


class TestAsofJoin:
    def trades(self, spark):
        return spark.createDataFrame(
            [("a", 10, 1.0), ("a", 25, 2.0), ("b", 5, 3.0), ("a", 3, 4.0)],
            "k string, t long, v double",
        )

    def quotes(self, spark):
        return spark.createDataFrame(
            [("a", 5, 100.0), ("a", 20, 200.0), ("b", 50, 300.0)],
            "k string, t long, q double",
        )

    def test_backward(self, spark):
        out = asof_join(self.trades(spark), self.quotes(spark), on="t", by=["k"])
        got = {(r["k"], r["t"]): r["q_right"] for r in out.collect()}
        assert got == {
            ("a", 3): None,        # nothing at or before 3
            ("a", 10): 100.0,      # quote at 5
            ("a", 25): 200.0,      # quote at 20
            ("b", 5): None,        # b's only quote is later
        }

    def test_backward_exact_tie(self, spark):
        left = spark.createDataFrame([("a", 5)], "k string, t long")
        out = asof_join(left, self.quotes(spark), on="t", by=["k"])
        assert out.collect()[0]["q_right"] == 100.0  # <= includes equality

    def test_forward(self, spark):
        out = asof_join(
            self.trades(spark), self.quotes(spark), on="t", by=["k"],
            direction="forward",
        )
        got = {(r["k"], r["t"]): r["q_right"] for r in out.collect()}
        assert got == {
            ("a", 3): 100.0,       # next quote at 5
            ("a", 10): 200.0,      # next at 20
            ("a", 25): None,
            ("b", 5): 300.0,
        }

    def test_tolerance(self, spark):
        out = asof_join(
            self.trades(spark), self.quotes(spark), on="t", by=["k"],
            tolerance=5,
        )
        got = {(r["k"], r["t"]): r["q_right"] for r in out.collect()}
        assert got[("a", 10)] == 100.0   # gap 5 <= 5
        assert got[("a", 25)] == 200.0   # gap 5 <= 5
        out2 = asof_join(
            self.trades(spark), self.quotes(spark), on="t", by=["k"],
            tolerance=4,
        )
        got2 = {(r["k"], r["t"]): r["q_right"] for r in out2.collect()}
        assert got2[("a", 10)] is None   # gap 5 > 4


class TestRangeJoin:
    def test_point_in_interval(self, spark):
        pts = spark.createDataFrame([(i,) for i in (0, 5, 10, 15, 99)], "p long")
        iv = spark.createDataFrame(
            [(1, 0, 10), (2, 10, 20), (3, 90, 100)], "id long, lo long, hi long"
        )
        out = range_join(pts, iv, "p", "lo", "hi", bucket_width=7)
        got = by_key(out.collect(), "p", "id")
        assert got == [(0, 1), (5, 1), (10, 2), (15, 2), (99, 3)]

    def test_float_bounds(self, spark):
        pts = spark.createDataFrame([(10000.2,)], "p double")
        iv = spark.createDataFrame([(1, 9999.5, 10000.5)], "id long, lo double, hi double")
        out = range_join(pts, iv, "p", "lo", "hi", bucket_width=5000)
        assert out.count() == 1  # boundary bucket not lost for float hi


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        left = spark.createDataFrame(
            [(i % 3, i) for i in range(1000)], "k int, v int"
        )
        right = spark.createDataFrame([(0, "x"), (1, "y")], "k int, tag string")
        plain = left.join(right, ["k"]).select("k", "v", "tag")
        salted = salted_join(left, right, ["k"], salt=8).select("k", "v", "tag")
        assert by_key(salted.collect(), "k", "v", "tag") == by_key(
            plain.collect(), "k", "v", "tag"
        )


class TestSkewReport:
    def test_uniform_vs_hot_key(self, spark):
        from bertrand_spark.operators.joins import skew_report

        uniform = [(i % 100, i) for i in range(10_000)]
        hot = [(0 if i % 5 else i, i) for i in range(10_000)]
        df = spark.createDataFrame(
            [(u, h) for (u, _), (h, _) in zip(uniform, hot)], "u long, h long"
        )
        rows = {r["column"]: r for r in skew_report(df, ["u", "h"], top=3).collect()}
        assert rows["u"]["n_rows"] == rows["h"]["n_rows"] == 10_000
        assert rows["u"]["skew_factor"] == pytest.approx(1.0)
        assert rows["h"]["skew_factor"] > 100
        # heaviest key of the hot column is 0, with ~80% of the rows
        top = rows["h"]["top_keys"][0]
        assert top["key"] == "0" and top["cnt"] == rows["h"]["max_key_rows"]
        assert top["cnt"] >= 7_900
        assert len(rows["h"]["top_keys"]) == 3

    def test_null_keys_counted(self, spark):
        from bertrand_spark.operators.joins import skew_report

        df = spark.createDataFrame(
            [(None,)] * 50 + [(1,)] * 10, "k long"
        )
        r = skew_report(df, ["k"]).collect()[0]
        assert r["n_rows"] == 60
        assert r["n_keys"] == 2
        assert r["max_key_rows"] == 50
