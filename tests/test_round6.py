"""Round-6 additions.

1. Store-backed STREAMING dedup (`stream_dedup_against_fingerprint_store`,
   `stream_curation_pipeline(store_table=...)`): the continuous-ingest
   history side is the bucketed fingerprint store, so the per-micro-batch
   stream-static anti join scans the store with NO Exchange — the same
   plan-shape guarantee TestBucketedFingerprintStore pins for batch,
   asserted here on the micro-batch executed plan, plus stream==batch
   parity.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from bertrand_spark.sources.reader import read_table


def run_stream(stream_df, mode="append"):
    """Start → drain (availableNow) → return (memory-table name, query)."""
    name = "mem_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name, q


def _walk_jplan(node):
    yield node
    cs = node.children()
    for i in range(cs.size()):
        yield from _walk_jplan(cs.apply(i))


class TestStoreBackedStreamDedup:
    """VERDICT r5 item 4: the streaming ingest path must use the bucketed
    fingerprint store, not an inline corpus frame."""

    @pytest.fixture()
    def store(self, spark, sf_dir, tmp_path):
        from bertrand_spark.pipeline.dedup import write_fingerprint_store

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        hist = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        spark.sql("DROP TABLE IF EXISTS t_fp_store_r6")
        write_fingerprint_store(hist, "t_fp_store_r6", num_buckets=8)
        src = str(tmp_path / "docs_src")
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        yield docs, hist, batch, stream
        spark.sql("DROP TABLE IF EXISTS t_fp_store_r6")

    def test_stream_equals_batch_store_path(self, spark, store):
        """Streamed ingest against the store == the batch
        exact_dedup_incremental_store on the same split (fingerprint
        sets — the within-stream dedup keeps SOME doc per fp)."""
        from bertrand_spark.pipeline.dedup import exact_dedup_incremental_store
        from bertrand_spark.pipeline.text import fingerprint
        from bertrand_spark.streaming.rollup import (
            stream_dedup_against_fingerprint_store,
        )

        docs, hist, batch, stream = store
        out = stream_dedup_against_fingerprint_store(
            stream, "t_fp_store_r6", "text"
        )
        name, _ = run_stream(out)
        got = {
            r["fp"]
            for r in spark.table(name)
            .select(fingerprint(F.col("text")).alias("fp"))
            .collect()
        }
        want = {
            r["fp"]
            for r in exact_dedup_incremental_store(batch, "t_fp_store_r6")
            .select(fingerprint(F.col("text")).alias("fp"))
            .collect()
        }
        assert got == want and len(got) > 0

    def test_micro_batch_history_side_has_no_exchange(self, spark, store):
        """The micro-batch executed plan's anti-join history side reads
        the store's buckets directly — no Exchange, Bucketed: true —
        with broadcast forbidden (at 100 TB the store dwarfs any
        micro-batch, so sort-merge IS the production plan)."""
        from bertrand_spark.streaming.rollup import (
            stream_dedup_against_fingerprint_store,
        )

        docs, hist, batch, stream = store
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = stream_dedup_against_fingerprint_store(
                stream, "t_fp_store_r6", "text"
            )
            _, q = run_stream(out)
            # StreamingQueryWrapper -> StreamExecution -> last micro-batch
            jplan = q._jsq.streamingQuery().lastExecution().executedPlan()
            if jplan.nodeName() == "AdaptiveSparkPlan":
                jplan = jplan.initialPlan()
            anti = next(
                n
                for n in _walk_jplan(jplan)
                if "Join" in n.nodeName()
                and "t_fp_store_r6" in n.children().apply(1).toString()
            )
            history = anti.children().apply(1).toString()
            assert "Exchange" not in history
            assert "Bucketed: true" in history
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_curation_pipeline_store_table(self, spark, store):
        """stream_curation_pipeline(store_table=...) == the inline-store
        variant on the same data; passing both stores raises."""
        from bertrand_spark.pipeline.text import fingerprint
        from bertrand_spark.streaming.rollup import stream_curation_pipeline

        docs, hist, batch, stream = store
        out_store = stream_curation_pipeline(
            stream, min_quality=0.5, store_table="t_fp_store_r6"
        )
        name_s, _ = run_stream(out_store)
        out_inline = stream_curation_pipeline(stream, hist, min_quality=0.5)
        name_i, _ = run_stream(out_inline)
        fps = lambda nm: {
            r["fp"]
            for r in spark.table(nm)
            .select(fingerprint(F.col("text")).alias("fp"))
            .collect()
        }
        assert fps(name_s) == fps(name_i) and len(fps(name_s)) > 0
        with pytest.raises(ValueError, match="not both"):
            stream_curation_pipeline(
                stream, hist, store_table="t_fp_store_r6"
            )


class TestFuzzyJoinBandStore:
    """fuzzy_join_band_store: the two-corpus MinHash join with the store
    side read from its persisted bucketed band table — identical pairs
    to the inline path, store-side candidate join exchange-free."""

    GEOM = dict(k=64, num_bands=16, shingle_n=5)

    @pytest.fixture()
    def corpus(self, spark, sf_dir):
        from bertrand_spark.pipeline.dedup import write_band_table

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        store = docs.filter(F.col("doc_id") % 2 == 0).persist()
        store.count()
        near = store.limit(3).select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
        batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(near)
        spark.sql("DROP TABLE IF EXISTS t_band_r6")
        write_band_table(
            store, "t_band_r6", num_buckets=8, **self.GEOM
        )
        yield store, batch
        spark.sql("DROP TABLE IF EXISTS t_band_r6")
        spark.sql("DROP TABLE IF EXISTS t_band_r6__params")
        store.unpersist()

    def test_pairs_equal_inline_path(self, spark, corpus):
        from bertrand_spark.pipeline.dedup import (
            fuzzy_join_band_store,
            fuzzy_join_minhash,
        )

        store, batch = corpus
        got = {
            (r["id_l"], r["id_r"], round(r["jaccard"], 9))
            for r in fuzzy_join_band_store(
                batch, "t_band_r6", store, threshold=0.6
            ).collect()
        }
        want = {
            (r["id_l"], r["id_r"], round(r["jaccard"], 9))
            for r in fuzzy_join_minhash(
                batch, store, threshold=0.6, **self.GEOM
            ).collect()
        }
        assert got == want and len(got) >= 3  # the 3 planted near-dups

    def test_candidate_join_store_side_has_no_exchange(self, spark, corpus):
        from bertrand_spark.pipeline.dedup import fuzzy_join_band_store

        store, batch = corpus
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = fuzzy_join_band_store(
                batch, "t_band_r6", store, threshold=0.6, persist=False
            )
            jplan = out._jdf.queryExecution().executedPlan()
            if jplan.nodeName() == "AdaptiveSparkPlan":
                jplan = jplan.initialPlan()
            # the CANDIDATE join is the one keyed on (band, bucket) —
            # the later verify joins also reference the table's scans
            # (and use intentional candidate-sized broadcasts), so
            # select by join key, not by subtree content
            cand_join = next(
                n
                for n in _walk_jplan(jplan)
                if "Join" in n.nodeName()
                and "band#" in n.toString().splitlines()[0]
                and "t_band_r6" in n.children().apply(1).toString()
            )
            store_side = cand_join.children().apply(1).toString()
            assert "Exchange" not in store_side
            assert "Bucketed: true" in store_side
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_streamed_band_store_dedup_equals_inline(
        self, spark, corpus, tmp_path
    ):
        from bertrand_spark.pipeline.dedup import fuzzy_join_minhash
        from bertrand_spark.streaming import stream_fuzzy_dedup

        store, batch = corpus
        expected_hits = {
            r["id_l"]
            for r in fuzzy_join_minhash(
                batch, store, threshold=0.6, **self.GEOM
            ).collect()
        }
        expected_kept = {
            r["doc_id"] for r in batch.collect()
        } - expected_hits
        qdir = str(tmp_path / "in")
        batch.repartition(2).write.parquet(qdir)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(qdir)
        )
        out = str(tmp_path / "kept")
        q = (
            stream.writeStream.foreachBatch(
                stream_fuzzy_dedup(
                    store, out, threshold=0.6, band_table="t_band_r6"
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == expected_kept
