"""Property-based tests (hypothesis) — the reference's test strategy
(SURVEY §5): generate adversarial inputs, assert engine kernels agree with
Python reference semantics.  Each example batches its cases into ONE
DataFrame so a property costs a handful of Spark jobs, not hundreds.
"""

import datetime as dt
import math

import pytest
from hypothesis import given, settings, strategies as st_
from pyspark.sql import functions as F

from bertrand_spark.convert.cast import cast_col
from bertrand_spark.functions.rounding import round_col
from bertrand_spark.functions.strings import base_to_int, int_to_base
from bertrand_spark.functions.temporal import parse_timedelta_string

SETTINGS = dict(max_examples=5, deadline=None)


def py_round(x: float, rule: str) -> int:
    if rule == "floor":
        return math.floor(x)
    if rule == "ceiling":
        return math.ceil(x)
    if rule == "down":
        return math.trunc(x)
    if rule == "up":
        return math.ceil(x) if x > 0 else math.floor(x)
    if rule == "half_floor":
        return math.ceil(x - 0.5)
    if rule == "half_ceiling":
        return math.floor(x + 0.5)
    if rule == "half_up":  # ties away from zero
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
    if rule == "half_down":  # ties toward zero
        return math.ceil(x - 0.5) if x >= 0 else math.floor(x + 0.5)
    if rule == "half_even":
        f = math.floor(x)
        if x - f == 0.5:
            return f if f % 2 == 0 else f + 1
        return math.floor(x + 0.5)
    raise ValueError(rule)


class TestRoundingProperties:
    @given(
        st_.lists(
            st_.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=50,
        )
    )
    @settings(**SETTINGS)
    def test_rules_match_python(self, spark, xs):
        # exact .5 ties are covered by the explicit grid below; random
        # floats check the bulk behavior
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        rules = ["floor", "ceiling", "down", "up", "half_even"]
        out = df.select(
            "x", *[round_col(F.col("x"), r).alias(r) for r in rules]
        ).collect()
        for row in out:
            for r in rules:
                assert row[r] == pytest.approx(py_round(row["x"], r)), (
                    row["x"], r,
                )

    def test_tie_grid(self, spark):
        xs = [i / 2 for i in range(-9, 10)]  # ...-4.5, -4.0, ... 4.5
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        rules = [
            "floor", "ceiling", "down", "up",
            "half_floor", "half_ceiling", "half_down", "half_up", "half_even",
        ]
        out = df.select(
            "x", *[round_col(F.col("x"), r).alias(r) for r in rules]
        ).collect()
        for row in out:
            for r in rules:
                assert row[r] == py_round(row["x"], r), (row["x"], r)


class TestRadixProperties:
    @given(
        st_.lists(st_.integers(min_value=-(2**40), max_value=2**40),
                  min_size=1, max_size=50),
        st_.integers(min_value=2, max_value=36),
    )
    @settings(**SETTINGS)
    def test_roundtrip(self, spark, xs, base):
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        out = df.select(
            "x",
            base_to_int(int_to_base(F.col("x"), base), base).alias("back"),
        ).collect()
        for row in out:
            assert row["back"] == row["x"], (row["x"], base)


class TestTimedeltaGrammar:
    @given(
        st_.lists(
            st_.tuples(
                st_.integers(min_value=0, max_value=99),   # hours
                st_.integers(min_value=0, max_value=59),   # minutes
                st_.integers(min_value=0, max_value=59),   # seconds
            ),
            min_size=1, max_size=30,
        )
    )
    @settings(**SETTINGS)
    def test_clock_roundtrip(self, spark, parts):
        rows = [(f"{h}:{m:02d}:{s:02d}", (h * 3600 + m * 60 + s) * 10**9)
                for h, m, s in parts]
        df = spark.createDataFrame(rows, "s string, expected long")
        out = df.select(
            "expected", parse_timedelta_string(F.col("s")).alias("got")
        ).collect()
        for row in out:
            assert row["got"] == row["expected"]


class TestEpochRoundtrip:
    @given(
        st_.lists(st_.integers(min_value=-10**9, max_value=10**9),
                  min_size=1, max_size=50),
        st_.sampled_from(["s", "ms", "us"]),
    )
    @settings(**SETTINGS)
    def test_int_datetime_int(self, spark, xs, unit):
        df = spark.createDataFrame([(x,) for x in xs], "x long")
        ts = cast_col(F.col("x"), "int64", "datetime", unit=unit)
        back = cast_col(ts, "datetime", "int64", unit=unit)
        out = df.select("x", back.alias("back")).collect()
        for row in out:
            assert row["back"] == row["x"], (row["x"], unit)


# --- connected components: property vs union-find ---------------------------
@settings(max_examples=8, deadline=None)
@given(
    st_.lists(
        st_.tuples(st_.integers(0, 40), st_.integers(0, 40)),
        min_size=1, max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from bertrand_spark.pipeline.graph import connected_components

    real = [(a, b) for a, b in edges if a != b]
    nodes = {x for e in real for x in e}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    comp = {}
    for a, b in real:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = {n: min(comp[find(n)]) for n in nodes}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == expect


class TestKnnGraphProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        st_.integers(min_value=4, max_value=24),   # corpus size
        st_.integers(min_value=2, max_value=6),    # dim
        st_.integers(min_value=1, max_value=4),    # k
        st_.integers(min_value=1, max_value=4),    # num_blocks
        st_.integers(min_value=0, max_value=2**31),
    )
    def test_matches_bruteforce(self, spark, n, dim, k, blocks, seed):
        import numpy as np

        from bertrand_spark.pipeline.similarity import knn_graph

        rng = np.random.default_rng(seed)
        M = rng.normal(size=(n, dim))
        df = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        got = {
            (r["src"], r["dst"], r["rn"])
            for r in knn_graph(df, k=k, num_blocks=blocks).collect()
        }
        Mn = M / np.linalg.norm(M, axis=1)[:, None]
        sims = Mn @ Mn.T
        want = set()
        for i in range(n):
            cands = sorted(
                ((sims[i, j], j) for j in range(n) if j != i),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            for rn, (_, j) in enumerate(cands, start=1):
                want.add((i, j, rn))
        assert got == want


class TestZorderProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        st_.lists(
            st_.tuples(
                st_.integers(min_value=0, max_value=255),
                st_.integers(min_value=0, max_value=255),
            ),
            min_size=1,
            max_size=50,
            unique=True,
        )
    )
    def test_interleave_matches_reference(self, spark, pts):
        from pyspark.sql import functions as F

        from bertrand_spark.sources.layout import zorder_value

        df = spark.createDataFrame(pts, "a long, b long")
        got = df.select(
            "a", "b", zorder_value([F.col("a"), F.col("b")], bits=8).alias("z")
        ).collect()
        for r in got:
            ref = 0
            for i in range(8):
                ref |= ((r["a"] >> i) & 1) << (2 * i)
                ref |= ((r["b"] >> i) & 1) << (2 * i + 1)
            assert r["z"] == ref

    def test_axis_monotone(self, spark):
        # with the other coordinate fixed at 0, the key is monotone in
        # each axis (interleaving preserves per-axis order)
        from pyspark.sql import functions as F

        from bertrand_spark.sources.layout import zorder_value

        df = spark.createDataFrame([(i,) for i in range(256)], "a long")
        za = [
            r["z"]
            for r in df.select(
                zorder_value([F.col("a"), F.lit(0)], bits=8).alias("z")
            ).orderBy("a").collect()
        ]
        assert za == sorted(za)


class TestSamplePerGroupProperties:
    @settings(max_examples=10, deadline=None)
    @given(
        st_.lists(
            st_.tuples(
                st_.sampled_from(["a", "b", "c", "d"]),
                st_.integers(min_value=0, max_value=10_000),
            ),
            min_size=1,
            max_size=80,
        ),
        st_.integers(min_value=1, max_value=8),
    )
    def test_quota_respected_and_subset(self, spark, rows, n):
        from bertrand_spark.pipeline.curation import sample_per_group

        rows = list({(g, i) for g, i in rows})  # unique ids per group
        df = spark.createDataFrame(rows, "g string, id long")
        got = [(r["g"], r["id"]) for r in sample_per_group(df, "g", "id", n).collect()]
        assert set(got) <= set(rows)
        from collections import Counter

        sizes = Counter(g for g, _ in rows)
        kept = Counter(g for g, _ in got)
        for g, total in sizes.items():
            assert kept[g] == min(n, total)
