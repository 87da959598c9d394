"""S3 regex dialect layer + L11 navigable-map views."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bertrand_spark.functions import regex as RX
from bertrand_spark.operators import maps as M


# --- dialect translation (driver-side, no Spark needed) --------------------
def test_translate_named_groups():
    assert RX.translate_pattern(r"(?P<y>\d{4})-(?P<m>\d{2})") == \
        r"(?<y>\d{4})-(?<m>\d{2})"
    assert RX.translate_pattern(r"(?P<w>\w+)\s+(?P=w)") == r"(?<w>\w+)\s+\k<w>"


def test_translate_leaves_java_constructs():
    for p in [r"a++b", r"(?>atomic)", r"(?i)case", r"\h\v", r"(?<=look)x"]:
        assert RX.translate_pattern(p) == p


def test_translate_ignores_class_contents():
    # (?P< inside a character class is literal, not a group
    assert RX.translate_pattern(r"[(?P<x>]") == r"[(?P<x>]"


def test_reject_unsupported():
    for p in [r"foo\Kbar", r"a(?R)b", r"x(?&name)y", r"(*FAIL)", r"\C"]:
        with pytest.raises(RX.RegexDialectError):
            RX.translate_pattern(p)


def test_replacement_translation():
    assert RX.translate_replacement(r"\1-\2") == "$1-$2"
    assert RX.translate_replacement(r"\g<name>!") == "${name}!"
    assert RX.translate_replacement("cost: $5") == "cost: \\$5"
    assert RX.translate_replacement(r"a\\b") == r"a\\b"


def test_named_groups_order():
    assert RX.named_groups(r"(?P<a>x)(?:nc)(?P<b>y)") == ["a", "b"]
    assert RX.named_groups(r"(?<a>x)(?<b>y)") == ["a", "b"]


# --- Spark-side semantics --------------------------------------------------
@pytest.fixture(scope="module")
def rdf(spark):
    return spark.createDataFrame(
        [
            Row(i=1, s="2024-03-15 order ab12 ab12 done"),
            Row(i=2, s="no dates here"),
            Row(i=3, s=None),
        ]
    )


def test_regex_match_vs_search(spark, rdf):
    out = rdf.select(
        "i",
        RX.regex_match(F.col("s"), r"\d{4}").alias("m"),
        RX.regex_search(F.col("s"), r"\d{4}").alias("c"),
    ).orderBy("i").collect()
    assert [r["m"] for r in out] == [True, False, None]
    assert [r["c"] for r in out] == [True, False, None]


def test_regex_extract_null_on_miss(spark, rdf):
    out = rdf.select(
        "i", RX.regex_extract(F.col("s"), r"(?P<y>\d{4})-(?P<mo>\d{2})", 1).alias("y")
    ).orderBy("i").collect()
    assert [r["y"] for r in out] == ["2024", None, None]


def test_regex_findall_and_count(spark, rdf):
    out = rdf.select(
        "i",
        RX.regex_findall(F.col("s"), r"ab\d+").alias("all"),
        RX.regex_count(F.col("s"), r"ab\d+").alias("n"),
    ).orderBy("i").collect()
    assert out[0]["all"] == ["ab12", "ab12"]
    assert out[0]["n"] == 2
    assert out[1]["all"] == []


def test_regex_sub_backrefs(spark, rdf):
    out = rdf.filter(F.col("i") == 1).select(
        RX.regex_sub(F.col("s"), r"(?P<w>ab\d+) (?P=w)", r"\g<w>x2").alias("r")
    ).collect()
    assert "ab12x2" in out[0]["r"]


def test_regex_groupdict(spark, rdf):
    out = rdf.select(
        "i",
        RX.regex_groupdict(F.col("s"), r"(?P<y>\d{4})-(?P<mo>\d{2})-(?P<d>\d{2})").alias("g"),
    ).orderBy("i").collect()
    assert out[0]["g"].asDict() == {"y": "2024", "mo": "03", "d": "15"}
    assert out[1]["g"] is None


def test_finditer_positions(spark, rdf):
    k = RX.finditer_udf(r"ab\d+")
    out = rdf.select("i", k(F.col("s")).alias("ms")).orderBy("i").collect()
    ms = [r.asDict() for r in out[0]["ms"]]
    assert ms == [
        {"match": "ab12", "start": 17, "end": 21},
        {"match": "ab12", "start": 22, "end": 26},
    ]
    assert out[1]["ms"] == []
    assert out[2]["ms"] is None


# --- L11 navigable map views ----------------------------------------------
@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame([Row(i=1)]).select(
        "i",
        M.map_from_pairs((10, "a"), (30, "c"), (20, "b")).alias("m"),
    )


def test_map_range(spark, mdf):
    row = mdf.select(M.map_range(F.col("m"), 15, 30).alias("r")).first()
    assert [(e["key"], e["value"]) for e in row["r"]] == [(20, "b"), (30, "c")]
    row = mdf.select(M.map_range(F.col("m")).alias("r")).first()
    assert [e["key"] for e in row["r"]] == [10, 20, 30]


def test_map_navigation(spark, mdf):
    row = mdf.select(
        M.map_first_key(F.col("m")).alias("fk"),
        M.map_last_key(F.col("m")).alias("lk"),
        M.map_floor_key(F.col("m"), 25).alias("fl"),
        M.map_ceiling_key(F.col("m"), 25).alias("ce"),
        M.map_floor_key(F.col("m"), 5).alias("fl_none"),
        M.map_index_of_key(F.col("m"), 30).alias("idx"),
        M.map_index_of_key(F.col("m"), 99).alias("idx_none"),
    ).first()
    assert (row["fk"], row["lk"], row["fl"], row["ce"]) == (10, 30, 20, 30)
    assert row["fl_none"] is None
    assert row["idx"] == 1  # entry order: 10, 30, 20
    assert row["idx_none"] is None


def test_map_set_algebra(spark, mdf):
    row = mdf.select(
        M.map_intersection(F.col("m"), F.array(F.lit(10), F.lit(30))).alias("i"),
        M.map_difference(F.col("m"), F.array(F.lit(10), F.lit(30))).alias("d"),
    ).first()
    assert sorted(row["i"].keys()) == [10, 30]
    assert sorted(row["d"].keys()) == [20]


def test_map_symmetric_difference_and_union_left(spark):
    df = spark.createDataFrame([Row(i=1)]).select(
        M.map_from_pairs((1, "a"), (2, "b")).alias("x"),
        M.map_from_pairs((2, "B"), (3, "C")).alias("y"),
    )
    row = df.select(
        M.map_symmetric_difference(F.col("x"), F.col("y")).alias("s"),
        M.map_union_left(F.col("x"), F.col("y")).alias("u"),
    ).first()
    assert row["s"] == {1: "a", 3: "C"}
    assert row["u"] == {1: "a", 2: "b", 3: "C"}
