"""Round-8 regression gates.

1. audit_broadcast_hints tightenings (round-7 ADVICE):
   a. a HAVING-style filter above a PER-KEY aggregate no longer
      launders the hint — only the q57 ties-to-the-max idiom (equality
      against a global reduction) passes structurally;
   b. the _BCAST_OK contract exemption is applied hint-by-hint with a
      table signature — a new unbounded hint over an unexpected table
      in an allowlisted query is still flagged.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bertrand_spark.plans.audit import audit_broadcast_hints  # noqa: E402


def _analyzed(df):
    return df._jdf.queryExecution().analyzed()


class TestTokenPrefixByThreshold:
    """The distributed key-threshold path of dsir_resample_tokens
    (round-7 VERDICT item 4: the >10M-candidate regime is now a real
    selection path, not a ValueError) must produce the IDENTICAL
    selection to the TakeOrdered fast path."""

    def _setup(self, spark, sf_dir):
        from bertrand_spark.pipeline import curation as CU
        from bertrand_spark.sources import read_table

        d = read_table(spark, sf_dir, "documents").limit(300)
        model = CU.train_dsir(
            d.filter(F.col("lang") == "en"), d, buckets=512, alpha=1.0
        )
        return CU, d, model

    def test_threshold_path_equals_takeordered_path(self, spark, sf_dir):
        """Forced-small regime (max_candidates=0 routes every call to
        the threshold path; tiny collect_max + 8 bins force several
        real histogram-bisection rounds): identical ids, order, and
        token counts across budgets spanning empty → near-complete."""
        CU, d, model = self._setup(spark, sf_dir)
        for budget in (0, 30, 3_000, 30_000):
            fast = CU.dsir_resample_tokens(d, model, budget).collect()
            slow = CU.dsir_resample_tokens(
                d,
                model,
                budget,
                max_candidates=0,
                threshold_bins=8,
                threshold_collect_max=16,
            ).collect()
            assert [(r["doc_id"], r["n_tokens"]) for r in slow] == [
                (r["doc_id"], r["n_tokens"]) for r in fast
            ], f"budget={budget}"

    def test_threshold_path_everything_fits(self, spark, sf_dir):
        """A budget above the corpus total selects the whole corpus —
        the no-cutoff branch."""
        CU, d, model = self._setup(spark, sf_dir)
        sel = CU.dsir_resample_tokens(
            d, model, 10**9, max_candidates=0, threshold_bins=8
        )
        assert sel.count() == d.count()

    def test_retry_doubling_rechecks_regime(self, spark, sf_dir):
        """Round-7 ADVICE: the undershoot-doubling loop must re-check
        the regime bound instead of collecting an ever-larger pull.
        With max_candidates=20 and a budget needing ~all 300 docs, the
        initial estimate passes but a doubling crosses the bound — the
        call must still succeed (via the threshold path), never collect
        more than max_candidates rows through TakeOrdered."""
        CU, d, model = self._setup(spark, sf_dir)
        # avg tokens ~ O(100); budget of 1500 estimates ~20 candidates,
        # token skew can force doublings past max_candidates=20
        sel = CU.dsir_resample_tokens(
            d, model, 100_000, max_candidates=20, threshold_bins=8
        ).collect()
        ref = CU.dsir_resample_tokens(d, model, 100_000).collect()
        assert [r["doc_id"] for r in sel] == [r["doc_id"] for r in ref]

    def test_threshold_path_repartition_stable(self, spark, sf_dir):
        CU, d, model = self._setup(spark, sf_dir)
        a = CU.dsir_resample_tokens(
            d, model, 3000, max_candidates=0, threshold_bins=8
        ).collect()
        b = CU.dsir_resample_tokens(
            d.repartition(17), model, 3000, max_candidates=0,
            threshold_bins=8,
        ).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


class TestHintAuditTightenings:
    def test_flags_having_filtered_per_key_aggregate(self, spark, sf_dir):
        """The round-7 ADVICE hole: a per-fact-key aggregate with a
        trivial HAVING filter on top (cardinality still ~|part|) used to
        pass via the loose any-Filter-above-any-Aggregate check.  It
        must be flagged now."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_quantity", "l_extendedprice"
        )
        thresholds = (
            li.groupBy(F.col("l_partkey").alias("t_partkey"))
            .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
            .filter(F.col("qty_threshold") > 0)  # prunes ~nothing
        )
        df = li.join(
            F.broadcast(thresholds), li["l_partkey"] == F.col("t_partkey")
        )
        flags = audit_broadcast_hints("having_shape", _analyzed(df))
        assert len(flags) == 1 and "lineitem" in flags[0], flags

    def test_ties_to_max_idiom_still_passes(self, spark, sf_dir):
        """The q57 shape (equality filter against an unpartitioned
        window max) remains the documented safe idiom."""
        from pyspark.sql import Window

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rev = li.groupBy("l_suppkey").agg(
            F.sum("l_extendedprice").alias("rev")
        )
        top = (
            rev.withColumn("mx", F.max("rev").over(Window.partitionBy()))
            .filter(F.col("rev") == F.col("mx"))
            .drop("mx")
        )
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        df = s.join(F.broadcast(top), s["s_suppkey"] == top["l_suppkey"])
        assert audit_broadcast_hints("ties_shape", _analyzed(df)) == []

    def test_allowlisted_query_unexpected_table_still_flagged(
        self, spark, sf_dir
    ):
        """x02 is allowlisted for documents-derived verify broadcasts;
        a hint over lineitem under the same query name must NOT be
        laundered by the contract (round-7 ADVICE: the old query-wide
        short-circuit blessed it silently)."""
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        df = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
        flags = audit_broadcast_hints("x02_minhash_near_dup", _analyzed(df))
        assert len(flags) == 1, flags
        assert "orders" in flags[0] and "contract" in flags[0], flags

    def test_allowlisted_contract_shape_passes(self, spark, sf_dir):
        """A documents-derived unbounded hint under an allowlisted name
        passes via the per-hint contract (the real x02 verify shape)."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pruned = d.select("doc_id", "text")  # still sf-scaling
        df = d.join(F.broadcast(pruned), "doc_id")
        assert (
            audit_broadcast_hints("x02_minhash_near_dup", _analyzed(df)) == []
        )
        # ...and under a NON-allowlisted name the same shape is flagged
        flags = audit_broadcast_hints("plain_query", _analyzed(df))
        assert len(flags) == 1 and "documents" in flags[0], flags
