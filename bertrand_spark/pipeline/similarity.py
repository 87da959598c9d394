"""Approximate/exact similarity search over embedding columns.

North-star extension: ANN over ``array<float>`` embeddings.

* Exact path: brute-force cosine top-k — a broadcast of the (small) query
  set against the (huge) vector table; the dot product is a native
  ``zip_with``+``aggregate`` expression (JVM, codegen) — no Python, no
  shuffle except the final top-k, which is a ``TakeOrderedAndProject``
  (per-partition heaps, no global sort).
* Scale path: IVF — k-means-style coarse centroids (trained on a sample via
  Spark ML), each vector assigned to its nearest centroid once (narrow
  projection persisted alongside the data); queries probe ``nprobe``
  partitions → candidate set shrinks by ~ncells/nprobe.
* LSH path: random-hyperplane signatures (shared with dedup) for
  bucketed joins.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot", "l2_norm", "cosine_sim",
    "random_hyperplane_signature",
    "brute_force_topk", "ivf_build", "ivf_topk", "ivf_write", "ivf_read",
]


def dot(a: Column, b: Column) -> Column:
    """Native dot product: zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _seeded_planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller on an xorshift
    stream) — driver-side constants, broadcast as literals."""
    x = seed | 1
    def rnd():
        nonlocal x
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        return (x % 10**9) / 10**9
    planes = []
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            u1, u2 = max(rnd(), 1e-12), rnd()
            v.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(v)
    return planes


def hyperplane_signatures_vectorized(
    num_planes: int, num_tables: int, seed: int = 42
):
    """Arrow kernel: ALL hyperplane-table signatures in one matrix multiply.

    The expression path evaluates ``num_tables × num_planes`` dot
    products per vector as higher-order functions — CodegenFallback,
    interpreted row-at-a-time.  Here the whole batch stacks into one
    (batch × dim) float64 matrix and a single ``@ planes.T`` yields every
    sign bit at once; per-table bit-packing is a vectorized fold.  Plane
    coefficients reproduce ``_seeded_planes`` exactly (same xorshift +
    Box–Muller stream), so the bucketing — and therefore the candidate
    set — is identical to the expression path's.

    Returns a pandas_udf: ``array<bigint>`` of ``num_tables`` packed
    signatures for an ``array<double>`` input column.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def kernel(vecs: pd.Series) -> pd.Series:
        planes_cache: dict[int, "np.ndarray"] = {}

        def planes_for(dim: int) -> "np.ndarray":
            got = planes_cache.get(dim)
            if got is None:
                got = np.array(
                    [
                        _seeded_planes(dim, num_planes, seed + 7919 * t)
                        for t in range(num_tables)
                    ],
                    dtype=np.float64,
                ).reshape(num_tables * num_planes, dim)
                planes_cache[dim] = got
            return got

        mask = vecs.notna().to_numpy()
        out: list = [None] * len(vecs)
        if mask.any():
            M = np.stack(vecs.to_numpy()[mask])  # (rows, dim)
            bits = (M @ planes_for(M.shape[1]).T) >= 0  # (rows, t*p)
            bits = bits.reshape(len(M), num_tables, num_planes)
            weights = (1 << np.arange(num_planes, dtype=np.int64))
            sigs = (bits * weights).sum(axis=2).astype(np.int64)  # (rows, t)
            for pos, sig in zip(np.nonzero(mask)[0], sigs):
                out[pos] = sig
        return pd.Series(out, dtype=object)

    return kernel


def random_hyperplane_signature(
    df: DataFrame, vec_col: str, num_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Append ``__sig``: bit-packed signs of ⟨v, plane_i⟩ (angle LSH)."""
    dim = len(df.select(vec_col).first()[0])
    planes = _seeded_planes(dim, num_planes, seed)
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(c)) for c in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return df.withColumn("__sig", sig)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) × vectors.

    Result: (q_id, vec_id, cosine) — top k per query via a window rank over
    per-partition partial top-k (Catalyst rewrites orderBy+limit patterns;
    the rank window shuffles only (q_id, cand) pairs).
    """
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_build(
    vectors: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index: train coarse centroids (Spark ML KMeans on a sample), then
    assign every vector to its nearest centroid — one narrow projection.

    Returns (assigned_df with ``__cell``, centroids).  At 100 TB you persist
    ``assigned_df`` partitioned by ``__cell`` so probes prune files.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = vectors if sample_fraction >= 1.0 else vectors.sample(sample_fraction, seed)
    ml_df = sample.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=num_cells, seed=seed, maxIter=20).fit(ml_df)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    # nearest centroid via native expression: argmin over literal centroid arrays
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    assigned = vectors.withColumn("__cell", F.array_min(dists)["cell"])
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells per query, exact cosine inside.

    The (query, cell) probe list is tiny → broadcast; the big table is
    filtered by cell (partition pruning when stored partitioned by cell)
    before any scoring.
    """
    probe_rows = []
    for q in queries.collect():  # queries are small by contract
        qv = list(q[q_vec_col])
        d = [
            (sum((a - b) ** 2 for a, b in zip(qv, c)), i)
            for i, c in enumerate(centroids)
        ]
        d.sort()
        for _, cell in d[:nprobe]:
            probe_rows.append((q[q_id_col], cell, qv))
    spark = assigned.sparkSession
    probes = spark.createDataFrame(probe_rows, [q_id_col, "__cell", q_vec_col])
    joined = assigned.join(F.broadcast(probes), "__cell")
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col(q_vec_col)).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_write(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist an IVF index partitioned by ``__cell`` — probes then prune
    whole cell directories at scan time (the layout half of nprobe
    pruning at scale).  Centroids ride along as JSON."""
    import json

    assigned.write.mode(mode).partitionBy("__cell").parquet(f"{path}/vectors")
    spark = assigned.sparkSession
    spark.createDataFrame(
        [(json.dumps(centroids),)], "centroids string"
    ).coalesce(1).write.mode(mode).json(f"{path}/centroids")


def ivf_read(spark, path: str):
    """Load a persisted IVF index → (assigned_df, centroids)."""
    import json

    assigned = spark.read.parquet(f"{path}/vectors")
    row = spark.read.json(f"{path}/centroids").collect()[0]
    return assigned, json.loads(row["centroids"])
