"""Data-layout optimization: Z-order (Morton) clustering for multi-
dimensional min/max pruning.

The 100 TB problem this solves: a parquet lake is usually sorted (if at
all) by ONE column, so per-file min/max statistics prune scans only for
filters on that column.  Z-ordering interleaves the bits of several
columns' rank-normalized values into one clustering key; sorting by it
gives every participating column locality, so a filter on ANY of them
skips most files (the same layout trick as Delta's OPTIMIZE ZORDER BY,
built here from native Spark expressions — no engine fork needed).

Everything is expression-level: one bounded min/max aggregate for the
normalization ranges, `width_bucket` to map each column onto 2^bits
ranks, and a shiftleft/OR cascade for the interleave — no UDF, no
shuffle beyond the final range partition that the write needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_key", "write_zordered", "compact_parquet"]


def zorder_value(rank_cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already rank-normalized,
    non-negative) column into one Morton key.

    Bit ``i`` of column ``j`` lands at position ``i * n_cols + j`` —
    the standard Z-curve so that truncating the key from the top walks
    all dimensions down together.  Pure shiftleft/AND/OR expression
    tree: ``bits × n_cols`` terms, whole-stage-codegen friendly.
    """
    n = len(rank_cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} > 63 key bits; lower bits="
        )
    z = None
    for j, c in enumerate(rank_cols):
        lc = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(lc, i).bitwiseAND(F.lit(1).cast("long"))
            term = F.shiftleft(bit, i * n + j)
            z = term if z is None else z.bitwiseOR(term)
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Append ``__z``: the Morton key over ``cols`` rank-normalized to
    ``2^bits`` buckets via their measured min/max.

    The ranges come from ONE aggregate job over all columns (the same
    single-job discipline as cast validation); NULL values rank 0 so
    they cluster together at the curve origin.  Rank normalization is
    ``width_bucket`` — linear binning, which is exactly what min/max
    file statistics prune on.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).first()
    nb = 1 << bits
    ranks = []
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            ranks.append(F.lit(0).cast("long"))
            continue
        # width_bucket returns nb+1 for x == max: clamp into [0, nb-1];
        # NULLs coalesce to rank 0 (cluster at the curve origin)
        ranks.append(
            F.least(
                F.coalesce(
                    F.width_bucket(
                        F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(nb)
                    )
                    - 1,
                    F.lit(0),
                ).cast("long"),
                F.lit(nb - 1).cast("long"),
            )
        )
    z = zorder_value(ranks, bits)
    return df.withColumn("__z", z), F.col("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``.

    ``repartitionByRange(__z)`` puts contiguous curve segments in the
    same file and ``sortWithinPartitions`` orders rows inside each, so
    every file covers a tight hyper-rectangle of the key space — its
    min/max stats stay narrow in EVERY participating dimension, and a
    reader filtering on any of them prunes most files.  One range
    shuffle; the curve key is dropped before writing.
    """
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, z)
        .sortWithinPartitions(z)
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_mb: int = 256,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_mb`` each (optionally re-sorted) and return the output
    file count.

    The operational problem: streaming sinks and per-epoch writers leave
    thousands of KB-scale files; every downstream scan then pays one
    task + one open per file and the NameNode/listing pays the metadata.
    Sizing comes from the actual input bytes — summed via the Hadoop
    FileSystem API, so it works on ANY scheme (file://, hdfs://, s3a://,
    …), not just local paths — never a row-count guess, so compression
    ratio is accounted for.  One repartition shuffle (or a range
    partition by ``sort_cols``, which also gives min/max pruning on
    them — pass the Z-order key columns through :func:`write_zordered`
    instead when you want multi-dimensional locality).
    """
    import math

    df = spark.read.parquet(src)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(src)
    fs = root.getFileSystem(hconf)
    try:
        # ONE metadata call for the whole tree — compacting a 20k-file
        # sink directory must not pay 20k serial driver RPCs first
        total = fs.getContentSummary(root).getLength()
    except Exception:
        # fall back to per-file stats, skipping files deleted between
        # the listing and the stat (live sink directories churn)
        total = 0
        for f in df.inputFiles():
            try:
                total += fs.getFileStatus(
                    jvm.org.apache.hadoop.fs.Path(f)
                ).getLen()
            except Exception:
                continue
    if total == 0:  # empty input: one empty output file
        total = 1
    n_files = max(1, math.ceil(total / (target_mb << 20)))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst)
    return n_files
