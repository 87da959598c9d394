"""Decorator-type conversions: categorize/decategorize, sparsify/densify.

Reference: ``bertrand/convert/categorical.py:11,62``, ``convert/sparse.py:12,58``;
types at ``bertrand/types/{categorical,sparse}.py``.

Spark mapping (SURVEY §1.1): decorators are *logical* wrappers.  Categorical
becomes a dictionary encoding — a levels dimension table + integer codes;
Sparse becomes a fill_value recorded in column metadata (physical RLE is
Parquet's job).  ``levels`` are computed distributed (``dense_rank`` over
distinct values — never ``collect`` the data; only the distinct levels ever
reach the driver, and only if the caller asks for them).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["categorize", "decategorize", "levels_table", "sparsify", "densify"]


def levels_table(df: DataFrame, column: str) -> DataFrame:
    """Distinct levels with dense 0-based codes, ordered by value
    (deterministic).  Distributed: distinct → dense_rank."""
    w = Window.orderBy(column)
    return (
        df.select(column)
        .distinct()
        .withColumn("code", F.dense_rank().over(w) - 1)
        .withColumnRenamed(column, "level")
    )


def categorize(df: DataFrame, column: str, levels: list | None = None) -> DataFrame:
    """Replace a column by its integer code (reference ``categorical.py:11``).

    With explicit ``levels`` the mapping is a literal CASE WHEN (no join, no
    shuffle); otherwise levels are derived and broadcast-joined (levels are
    small by definition of 'categorical').
    """
    if levels is not None:
        expr = None
        for i, v in enumerate(levels):
            cond = F.col(column) == F.lit(v)
            expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
        out = df.withColumn(f"{column}_code", expr.otherwise(F.lit(None)))
    else:
        lv = levels_table(df, column).withColumnRenamed("level", column)
        out = df.join(F.broadcast(lv), column, "left").withColumnRenamed(
            "code", f"{column}_code"
        )
    return out


def decategorize(
    df: DataFrame, code_column: str, levels: DataFrame | list, out_column: str
) -> DataFrame:
    """Join codes back to values (reference ``categorical.py:62``)."""
    if isinstance(levels, list):
        expr = None
        for i, v in enumerate(levels):
            cond = F.col(code_column) == F.lit(i)
            expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
        return df.withColumn(out_column, expr)
    lv = levels.withColumnRenamed("code", code_column).withColumnRenamed(
        "level", out_column
    )
    return df.join(F.broadcast(lv), code_column, "left")


def sparsify(df: DataFrame, column: str, fill_value: Any) -> DataFrame:
    """Record fill_value in column metadata; NULL-out fill occurrences so
    Parquet RLE/definition-levels compress them (reference ``sparse.py:12``)."""
    meta = {"sparse_fill_value": str(fill_value)}
    new = F.when(F.col(column) == F.lit(fill_value), F.lit(None)).otherwise(
        F.col(column)
    )
    return df.withColumn(column, new.alias(column, metadata=meta))


def densify(df: DataFrame, column: str, fill_value: Any | None = None) -> DataFrame:
    """Inverse transform: restore the fill value (reference ``sparse.py:58``).

    ``fill_value=None`` reads it from column metadata if present.
    """
    if fill_value is None:
        for f in df.schema.fields:
            if f.name == column and "sparse_fill_value" in (f.metadata or {}):
                fill_value = f.metadata["sparse_fill_value"]
                break
    if fill_value is None:
        raise ValueError(f"no fill_value known for column {column!r}")
    return df.withColumn(column, F.coalesce(F.col(column), F.lit(fill_value)))
