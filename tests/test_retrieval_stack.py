"""End-to-end retrieval stack: raw text → hashing embeddings → persisted
IVF store (partition-pruned) → streamed query enrichment → recall gated
against the exact kNN graph.  One test that exercises every tier the
similarity stack ships, composed the way a deployment would wire them."""

import pytest
from pyspark.sql import functions as F

from bertrand_spark.pipeline.similarity import (
    ann_recall,
    ivf_build,
    ivf_read,
    ivf_topk,
    ivf_write,
    knn_graph,
)
from bertrand_spark.pipeline.text import embed_documents
from bertrand_spark.sources.reader import read_table


class TestRetrievalStack:
    def test_text_to_serving_pipeline(self, spark, sf_dir, tmp_path):
        # 1. embed raw documents (no embeddings table needed)
        docs = read_table(spark, sf_dir, "documents").limit(120)
        emb = embed_documents(docs, dim=32).persist()
        n = emb.count()
        emb = emb.withColumnRenamed("doc_id", "vec_id")

        # 2. exact kNN graph = the recall oracle
        exact = knn_graph(emb, "vec_id", "embedding", k=5, num_blocks=4).persist()
        exact.count()

        # 3. build + persist the IVF index, read it back
        assigned, cents = ivf_build(emb, num_cells=4, seed=13)
        ivf_write(assigned, cents, str(tmp_path / "ivf"))
        loaded, cents2 = ivf_read(spark, str(tmp_path / "ivf"))
        assert cents2 == cents

        # 4. probe the persisted store; pruned probes read a cell subset
        q = emb.select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        pruned = (
            ivf_topk(loaded, cents2, q, k=6, nprobe=2)
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(F.col("q_id").alias("src"), F.col("vec_id").alias("dst"))
        )
        r = ann_recall(exact, pruned).collect()[0]
        assert r["n_queries"] == n
        assert 0.0 < r["micro_recall"] <= 1.0

        # 5. exhaustive probes over the SAME persisted store = full recall
        full = (
            ivf_topk(loaded, cents2, q, k=6, nprobe=4)
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(F.col("q_id").alias("src"), F.col("vec_id").alias("dst"))
        )
        r_full = ann_recall(exact, full).collect()[0]
        assert r_full["micro_recall"] == pytest.approx(1.0)
        assert r_full["micro_recall"] >= r["micro_recall"]

    def test_partition_pruning_on_store(self, spark, sf_dir, tmp_path):
        # the ivf_write layout is partitioned by __cell; a pruned probe's
        # scan must carry a partition filter on it
        e = read_table(spark, sf_dir, "embeddings")
        assigned, cents = ivf_build(e, num_cells=4, seed=3)
        ivf_write(assigned, cents, str(tmp_path / "ivf"))
        loaded, cents2 = ivf_read(spark, str(tmp_path / "ivf"))
        q = e.limit(2).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        top = ivf_topk(loaded, cents2, q, k=3, nprobe=1)
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "__cell" in plan
