"""Join strategies Spark lacks natively: as-of join, range join, salted
skew join.

These are the classic time-series/skew operators the reference ecosystem
(and any 100 TB pipeline) needs.  Design notes:

* ``asof_join`` — the union-and-carry-forward construction: tag both
  sides, union, ONE shuffle on the key, per-key window carrying the most
  recent right-side payload forward.  No per-row subquery, no range
  explosion; cost = one shuffle + one windowed sort per key group, the
  same profile as a groupBy.  (A naive inequality join is O(|L|·|R|)
  per key and unrunnable at scale.)
* ``range_join`` — inequality joins fall back to broadcast-nested-loop in
  Spark; bucketizing the range key turns them into an equi-join on
  (bucket) with a residual filter, shuffling only matching buckets.
* ``salted_join`` — skewed hot keys split across ``salt`` sub-keys; the
  small side replicates per salt (explode), the big side picks a random
  salt: the hot key's rows spread over ``salt`` tasks instead of one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "salted_join", "skew_report"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    tolerance: int | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.on <= left.on`` (backward; ``forward`` takes the earliest
    ``>=``), optionally within ``tolerance`` (same units as ``on``),
    equi-matched on ``by`` keys.

    Implementation: tag + union + per-key ordered window carrying the
    last non-null right payload forward (backward direction) — one
    shuffle on ``by``, windows partitioned per key (parallel), zero
    range-explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    by = list(by)
    right_payload = [c for c in right.columns if c not in by and c != on]

    lt = left.withColumn("__side", F.lit(1))
    for c in right_payload:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    lt = lt.withColumn(f"{on}{suffix}", F.lit(None).cast(right.schema[on].dataType))

    rt = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    ).withColumn("__side", F.lit(0)).withColumn(f"{on}{suffix}", F.col(on))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rt = rt.select(*lt.columns)

    both = lt.unionByName(rt)
    # right rows sort before left rows at equal timestamps so an exact
    # tie matches (asof <= semantics)
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload + [on]
        ]
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = [
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload + [on]
        ]

    out = both.select(
        *[c for c in left.columns], "__side", *carried
    ).filter(F.col("__side") == 1).drop("__side")

    if tolerance is not None:
        gap = (
            F.col(on) - F.col(f"{on}{suffix}")
            if direction == "backward"
            else F.col(f"{on}{suffix}") - F.col(on)
        )
        within = F.col(f"{on}{suffix}").isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            *left.columns,
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_payload + [on]
            ],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join: ``right_lo <= left_point < right_hi``.

    Naive inequality joins become broadcast-nested-loop; bucketizing by
    ``bucket_width`` turns this into an equi-join on (by, bucket) — each
    interval explodes into ceil(len/width) bucket rows, each point into
    one — followed by the exact residual filter.  Choose ``bucket_width``
    near the typical interval length (amplification =
    interval_len/width + 1).
    """
    by = list(by)
    pt_bucket = F.floor(F.col(left_point) / F.lit(bucket_width))
    lo_b = F.floor(F.col(right_lo) / F.lit(bucket_width))
    # floor(hi/w) keeps the boundary bucket (one occasionally-empty extra
    # bucket; the residual filter guarantees exactness for float bounds)
    hi_b = F.floor(F.col(right_hi) / F.lit(bucket_width))
    l2 = left.withColumn("__bucket", pt_bucket)
    r2 = right.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b)))
    )
    cond = (F.col(right_lo) <= F.col(left_point)) & (
        F.col(left_point) < F.col(right_hi)
    )
    return l2.join(r2, by + ["__bucket"], "inner").filter(cond).drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (big) left side picks a random salt
    in [0, salt); the (small) right side replicates every row across all
    salts — a hot key's rows land on ``salt`` tasks instead of one.

    AQE's skew-join handles moderate skew automatically; explicit salting
    is for pathological keys (power-law joins) where one key exceeds a
    single task's memory.

    Only inner/left joins are supported: the right side is replicated per
    salt, so an unmatched right row would surface once per salt under
    right/full outer semantics.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(right rows are replicated per salt)"
        )
    on = list(on)
    l2 = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l2.join(r2, on + ["__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    cols: Sequence[str],
    top: int = 10,
) -> DataFrame:
    """Per-column key-skew diagnostic: the measurement that decides
    between a plain shuffle join, AQE skew splitting, and
    :func:`salted_join` BEFORE the 100 TB job runs.

    For each column: total rows, exact distinct keys (a full per-key
    count is already required for the heavy-key search, so exactness is
    free), the ``top`` heaviest keys with their counts, and
    ``skew_factor`` = heaviest count / mean count per key (1.0 =
    perfectly uniform; ≥ executor count means one task outweighs the
    whole cluster's average).  One groupBy per column over (col, count)
    pairs — the heavy-key search aggregates counts, never rows, so the
    report costs a scan plus key-cardinality shuffles regardless of
    data size.
    """
    if not cols:
        raise ValueError("skew_report: cols must name at least one column")
    out = None
    for c in cols:
        counts = df.groupBy(F.col(c).cast("string").alias("key")).agg(
            F.count("*").alias("cnt")
        )
        stats = counts.agg(
            F.lit(c).alias("column"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_key_rows"),
            (F.max("cnt") / F.avg("cnt")).cast("double").alias("skew_factor"),
        )
        # heavy keys via orderBy+limit → TakeOrderedAndProject (per-
        # partition heaps); collect_list then folds ≤ `top` rows — never
        # an array of the whole key space
        topk = (
            counts.orderBy(F.col("cnt").desc(), F.col("key"))
            .limit(top)
            .agg(F.collect_list(F.struct("cnt", "key")).alias("top_keys"))
        )
        rep = stats.crossJoin(topk)  # two 1-row frames
        out = rep if out is None else out.unionByName(rep)
    return out
