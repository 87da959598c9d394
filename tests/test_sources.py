"""Sources/sinks: inferred CSV/JSON, partitioned writes, IVF persistence."""

import tempfile

from pyspark.sql import functions as F

from bertrand_spark.sources.reader import (
    read_csv_inferred,
    read_json_inferred,
    write_partitioned,
)


class TestInferredSources:
    def test_csv_round_trip(self, spark):
        with tempfile.TemporaryDirectory() as d:
            src = spark.createDataFrame(
                [(1, 2.5, "true", "hello"), (2, 3.5, "false", "world")],
                "a long, b double, c string, d string",
            )
            src.select(
                F.col("a").cast("string"), F.col("b").cast("string"), "c", "d"
            ).write.mode("overwrite").option("header", True).csv(f"{d}/csv")
            out = read_csv_inferred(spark, f"{d}/csv")
            kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
            assert kinds == {
                "a": "bigint", "b": "double", "c": "boolean", "d": "string"
            }
            assert out.count() == 2

    def test_json_strings_promoted(self, spark):
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                [("10", "x"), ("20", "y")], "n string, s string"
            ).write.mode("overwrite").json(f"{d}/js")
            out = read_json_inferred(spark, f"{d}/js")
            assert out.schema["n"].dataType.simpleString() == "bigint"
            assert out.schema["s"].dataType.simpleString() == "string"

    def test_xml_strings_promoted(self, spark):
        """Spark 4's built-in XML source behind the same engine
        re-classification as CSV/JSON: numeric leaves promote, nested
        structs pass through untouched (round 8)."""
        import os

        from bertrand_spark.sources.reader import read_xml_inferred

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "recs.xml")
            with open(path, "w") as f:
                f.write(
                    "<records>"
                    "<rec><qty>10</qty><name>ax</name>"
                    "<meta><tag>u</tag></meta></rec>"
                    "<rec><qty>25</qty><name>by</name>"
                    "<meta><tag>v</tag></meta></rec>"
                    "</records>"
                )
            out = read_xml_inferred(spark, path, row_tag="rec")
            kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
            assert kinds["qty"] == "bigint"
            assert kinds["name"] == "string"
            assert kinds["meta"].startswith("struct")
            rows = {r["name"]: r["qty"] for r in out.collect()}
            assert rows == {"ax": 10, "by": 25}

    def test_write_partitioned_prunes(self, spark):
        with tempfile.TemporaryDirectory() as d:
            df = spark.createDataFrame(
                [(i % 3, i) for i in range(30)], "p int, v int"
            )
            write_partitioned(df, f"{d}/t", partition_by=["p"])
            back = spark.read.parquet(f"{d}/t").filter(F.col("p") == 1)
            assert back.count() == 10
            plan = back._jdf.queryExecution().executedPlan().toString()
            # partition filter must reach the scan, not a post-filter
            assert "PartitionFilters: [isnotnull(p" in plan


class TestIvfPersistence:
    def test_write_read_probe(self, spark, sf_dir):
        import tempfile

        from bertrand_spark.pipeline.similarity import (
            ivf_build, ivf_read, ivf_topk, ivf_write,
        )

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        assigned, cents = ivf_build(e, num_cells=4)
        with tempfile.TemporaryDirectory() as d:
            ivf_write(assigned, cents, f"{d}/ivf")
            loaded, cents2 = ivf_read(spark, f"{d}/ivf")
            assert cents2 == cents
            q = e.limit(1).select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
            )
            top = ivf_topk(loaded, cents2, q, k=3, nprobe=2)
            rows = top.collect()
            assert 0 < len(rows) <= 3
            # self-match comes back first with cosine ~1
            assert abs(rows[0]["cosine"] - 1.0) < 1e-9


class TestMoreFormats:
    def test_orc_round_trip(self, spark, sf_dir, tmp_path):
        from bertrand_spark.sources.reader import read_orc, read_table, write_partitioned

        src = read_table(spark, sf_dir, "nation")
        dest = str(tmp_path / "nation_orc")
        write_partitioned(src, dest, partition_by=["n_regionkey"], fmt="orc")
        back = read_orc(spark, dest)
        assert back.count() == src.count()
        a = {tuple(r) for r in src.select("n_nationkey", "n_name").collect()}
        b = {tuple(r) for r in back.select("n_nationkey", "n_name").collect()}
        assert a == b

    def test_text_lines_classified(self, spark, tmp_path):
        from bertrand_spark.sources.reader import read_text_lines

        p = tmp_path / "corpus.txt"
        p.write_text("hello world\n42\n3.14\n2024-01-02\ntrue\n")
        out = read_text_lines(spark, str(p), classify=True)
        tags = {r["value"]: r["tag"] for r in out.collect()}
        assert tags["42"] == "int"
        assert tags["3.14"] == "float"
        assert tags["2024-01-02"] == "datetime"
        assert tags["true"] == "bool"
        assert tags["hello world"] == "str"


class TestBucketedLayout:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        """The SCALE.md co-location claim, proven on a real plan: equal
        bucketing on the join key eliminates every shuffle from the join."""
        from bertrand_spark.sources.reader import write_bucketed

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(li, "t_li_bucketed", ["l_orderkey"], num_buckets=8)
        write_bucketed(o, "t_o_bucketed", ["o_orderkey"], num_buckets=8)
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # forbid broadcast so the join would otherwise shuffle both sides
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = spark.table("t_li_bucketed").join(
                spark.table("t_o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert j.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
            spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
            spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


class TestBandTableBucketed:
    def test_bucketed_band_join_no_exchange_and_same_candidates(
        self, spark, sf_dir
    ):
        from bertrand_spark.pipeline.dedup import (
            candidate_pairs_from_band_table,
            min_band_matches,
            minhash_banded_vectorized,
            write_band_table,
        )
        from bertrand_spark.sources.reader import read_table, spread

        d = read_table(spark, sf_dir, "documents").limit(200)
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # at test size the planner would broadcast the band table;
            # force the sort-merge path the bucket layout exists for
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            write_band_table(
                d, "t_bands", k=770, num_bands=154, shingle_n=5, num_buckets=8
            )
            cand = candidate_pairs_from_band_table(
                spark, "t_bands", threshold=0.6
            )  # banding geometry comes from the __params companion
            plan = cand._jdf.queryExecution().executedPlan().toString()
            # both scan sides are bucket-aligned: NO exchange on the join
            # key (band/bucket); the only exchange in the plan is the
            # pair-groupBy above the join
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            for ln in plan.splitlines():
                if "Exchange" in ln:
                    assert "band" not in ln, ln
            got = {(r["id_a"], r["id_b"]) for r in cand.collect()}

            # same candidates as the inline (shuffled) band join
            kernel = minhash_banded_vectorized(770, 154, 5)
            bands = (
                spread(d)
                .select(F.col("doc_id"), kernel(F.col("text")).alias("__p"))
                .select(
                    "doc_id",
                    F.posexplode("__p.bk").alias("band", "bucket"),
                )
            )
            a = bands.withColumnRenamed("doc_id", "id_a")
            b = bands.withColumnRenamed("doc_id", "id_b")
            consensus = min_band_matches(0.6, 5, 154, 1e-4)
            want = {
                (r["id_a"], r["id_b"])
                for r in (
                    a.join(b, ["band", "bucket"])
                    .filter(F.col("id_a") < F.col("id_b"))
                    .groupBy("id_a", "id_b")
                    .agg(F.count("*").alias("m"))
                    .filter(F.col("m") >= consensus)
                ).collect()
            }
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
            spark.sql("DROP TABLE IF EXISTS t_bands")
            spark.sql("DROP TABLE IF EXISTS t_bands__params")
