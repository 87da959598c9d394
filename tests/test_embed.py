"""Feature-hashing embedder: determinism, bag-of-words invariance, and
composition with the similarity stack (kNN graph over embedded text)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bertrand_spark.pipeline.text import embed_documents


def _embed(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(df, **kw).collect()
    }


class TestHashingEmbed:
    def test_deterministic_across_runs(self, spark):
        rows = [(i, f"the quick brown fox {i} jumps over dog {i*7}") for i in range(20)]
        a = _embed(spark, rows)
        b = _embed(spark, rows)
        for k in a:
            assert a[k] == b[k]

    def test_unit_norm_and_dim(self, spark):
        vecs = _embed(spark, [(0, "alpha beta gamma delta")], dim=32)
        v = np.array(vecs[0])
        assert len(v) == 32
        assert np.linalg.norm(v) == pytest.approx(1.0)

    def test_bag_of_words_word_order_invariant(self, spark):
        vecs = _embed(
            spark, [(0, "red green blue"), (1, "blue red green")]
        )
        assert vecs[0] == vecs[1]

    def test_null_and_empty(self, spark):
        vecs = _embed(spark, [(0, None), (1, ""), (2, "   ")])
        assert vecs[0] is None
        assert all(x == 0.0 for x in vecs[1])
        assert all(x == 0.0 for x in vecs[2])

    def test_similar_texts_closer_than_different(self, spark):
        base = "large scale data processing with distributed query engines"
        near = base + " tonight"
        far = "entirely unrelated cooking recipe with butter flour sugar eggs"
        vecs = _embed(spark, [(0, base), (1, near), (2, far)], dim=64)
        a, b, c = (np.array(vecs[i]) for i in range(3))
        assert a @ b > 0.8
        assert a @ b > a @ c + 0.2

    def test_ngram_mode_distinguishes_order(self, spark):
        vecs = _embed(
            spark, [(0, "red green blue"), (1, "blue red green")], ngram=2
        )
        assert vecs[0] != vecs[1]

    def test_composes_with_knn_graph(self, spark, sf_dir):
        from bertrand_spark.pipeline.similarity import knn_graph
        from bertrand_spark.sources.reader import read_table

        d = read_table(spark, sf_dir, "documents").limit(60)
        emb = embed_documents(d, dim=32)
        edges = knn_graph(emb, "doc_id", "embedding", k=2, num_blocks=4)
        rows = edges.collect()
        n = d.count()
        assert len(rows) == 2 * n
        assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in rows)


class TestSemanticDedupFromText:
    def test_cosine_metric_on_raw_text(self, spark):
        from bertrand_spark.pipeline.dedup import near_dup, semantic_dedup

        base = (
            "distributed query engines shuffle partitioned data across "
            "executors while the optimizer prunes columns and pushes filters"
        )
        rows = [
            (0, base),
            (1, base + " efficiently"),          # near-dup of 0
            (2, "totally different cooking recipe butter flour sugar"),
            (3, "yet another unrelated document about mountain weather"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = near_dup(df, "doc_id", "text", metric="cosine", threshold=0.7)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 1) in got
        assert all({a, b} <= {0, 1} for a, b in got)

        kept = semantic_dedup(
            df, "doc_id", "text", metric="cosine", threshold=0.7
        )
        assert {r["doc_id"] for r in kept.collect()} == {0, 2, 3}

    def test_embedding_column_input_unchanged(self, spark):
        # arrays still go straight to the vector path (no re-embedding)
        from bertrand_spark.pipeline.dedup import near_dup

        rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            (r["id_a"], r["id_b"])
            for r in near_dup(
                df, "vec_id", "embedding", metric="cosine", threshold=0.7
            ).collect()
        }
        assert got == {(0, 1)}
