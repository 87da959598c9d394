"""String parsing kernels: boolean token sets, radix conversion, complex parse.

Reference: ``bertrand/util/string.pyx:7-66`` (``boolean_match``,
``int_to_base``), ``convert/string.py:26-135``.  All native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TRUE_TOKENS", "FALSE_TOKENS",
    "boolean_match", "int_to_base", "base_to_int", "parse_complex",
]

# reference convert/arguments.py:1012,1159 default token sets
TRUE_TOKENS = ("true", "t", "yes", "y", "on", "1")
FALSE_TOKENS = ("false", "f", "no", "n", "off", "0")


def boolean_match(
    col: Column,
    true_tokens=TRUE_TOKENS,
    false_tokens=FALSE_TOKENS,
    ignore_case: bool = True,
) -> Column:
    """String → boolean via token sets; non-members → NULL (coerce semantics).

    Reference ``util/string.pyx:7-38``.
    """
    s = F.trim(col)
    if ignore_case:
        s = F.lower(s)
        true_tokens = tuple(t.lower() for t in true_tokens)
        false_tokens = tuple(t.lower() for t in false_tokens)
    return (
        F.when(s.isin(*true_tokens), F.lit(True))
        .when(s.isin(*false_tokens), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def int_to_base(col: Column, base: int) -> Column:
    """Integer → string in radix ``base`` (2-36), Spark-native ``conv``.

    Reference ``util/string.pyx:45-66``.
    """
    if not 2 <= base <= 36:
        raise ValueError(f"base must be in [2, 36], got {base}")
    pos = F.lower(F.conv(F.abs(col).cast("string"), 10, base))
    return F.when(col < 0, F.concat(F.lit("-"), pos)).otherwise(pos)


def _conv_guarded(body: Column, base: int) -> Column:
    """``F.conv(body, base, 10)`` that can NEVER throw: under ANSI mode
    (Spark 4's default) conv raises ARITHMETIC_OVERFLOW past 2^64-1, so
    inputs whose zero-stripped digit count can exceed it return NULL
    instead — a coerce-mode cast must null, not crash the job."""
    import math

    stripped = F.regexp_replace(body, r"^0+(.)", "$1")
    maxlen = int(64 // math.log2(base))  # maxlen digits always < 2^64
    return F.when(
        F.length(stripped) <= maxlen, F.conv(stripped, base, 10)
    ).otherwise(F.lit(None))


def base_to_int(col: Column, base: int = 10) -> Column:
    """String in radix ``base`` → LongType; base=0 auto-detects 0b/0o/0x
    prefixes (reference ``convert/string.py:56-76``).  Out-of-int64
    magnitudes null (try_cast), except INT64_MIN whose magnitude is one
    past INT64_MAX."""
    s = F.trim(col)
    neg = s.startswith("-")
    mag = F.when(neg | s.startswith("+"), F.substring(s, 2, 2**31 - 1)).otherwise(s)
    if base == 0:
        low = F.lower(mag)
        body_bin = F.substring(mag, 3, 2**31 - 1)
        val = (
            F.when(low.startswith("0b"), _conv_guarded(body_bin, 2))
            .when(low.startswith("0o"), _conv_guarded(body_bin, 8))
            .when(low.startswith("0x"), _conv_guarded(body_bin, 16))
            .otherwise(_conv_guarded(mag, 10))
        )
    else:
        val = _conv_guarded(mag, base)
    # conv returns NULL on bad digits in Spark 4; reject non-digit base-10 early
    if base == 10:
        val = F.when(mag.rlike(r"^\d+$"), val).otherwise(F.lit(None))
    out = val.try_cast("long")
    return (
        F.when(neg & (val == F.lit("9223372036854775808")), F.lit(-(2**63)))
        .when(neg, -out)
        .otherwise(out)
    )


_COMPLEX_RE = (
    r"^\s*\(?\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)?"
    r"\s*([+-]\s*(?:\d+\.?\d*|\.\d+)?(?:[eE][+-]?\d+)?)?\s*([jJi])?\s*\)?\s*$"
)


def parse_complex(col: Column) -> Column:
    """String → struct{re, im} (reference ``convert/string.py:91-135``).

    Handles '1+2j', '-3.5j', '4', '(2-2j)'; invalid → NULL.
    """
    s = F.regexp_replace(F.trim(col), r"[()\s]", "")
    # pure real: no j
    real_only = s.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    # pure imaginary: ends with j, single term
    imag_only = s.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)?([eE][+-]?\d+)?[jJ]$")
    # full a+bj
    full_re = r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)([+-](?:\d+\.?\d*|\.\d+)?(?:[eE][+-]?\d+)?)[jJ]$"
    is_full = s.rlike(full_re)

    def imag_coeff(c: Column) -> Column:
        body = F.regexp_replace(c, r"[jJ]$", "")
        return (
            F.when(body.isin("", "+"), F.lit(1.0))
            .when(body == "-", F.lit(-1.0))
            .otherwise(body.cast("double"))
        )

    re_part = (
        F.when(real_only, s.cast("double"))
        .when(imag_only, F.lit(0.0))
        .when(is_full, F.regexp_extract(s, full_re, 1).cast("double"))
    )
    im_part = (
        F.when(real_only, F.lit(0.0))
        .when(imag_only, imag_coeff(s))
        .when(is_full, imag_coeff(F.concat(F.regexp_extract(s, full_re, 2), F.lit("j"))))
    )
    ok = real_only | imag_only | is_full
    pair = F.struct(re_part.alias("re"), im_part.alias("im"))
    return F.when(ok, pair).otherwise(F.lit(None).cast("struct<re:double,im:double>"))
