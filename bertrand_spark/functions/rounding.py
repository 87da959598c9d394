"""The 10 rounding rules + tolerance snap as native Column expressions.

Reference kernels: ``bertrand/util/round/float.pyx:14-106`` (rule tables at
:84-97), ``round/decimal.pyx:18-119``, integer-division bias at
``round/integer.pyx:14-165``; C++ twins ``bertrand/math.h:278-768,1601-1886``.
``snap_round`` at ``bertrand/convert/base.py:514-554``; ``Tolerance`` at
``util/round/tolerance.pyx:11-80``.

Every rule compiles to a closed-form JVM expression (whole-stage codegen,
zero Python) so the hot path is identical at sf0.001 and at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["round_col", "snap_round", "round_div", "within_tol", "RULES"]


def _half_adjust(col: Column, toward: str) -> Column:
    # round-half-* via floor(x + 0.5) family with sign handling
    if toward == "up":  # half away from zero
        return F.signum(col) * F.floor(F.abs(col) + F.lit(0.5))
    if toward == "down":  # half toward zero
        return F.signum(col) * F.ceil(F.abs(col) - F.lit(0.5))
    if toward == "floor":
        return F.ceil(col - F.lit(0.5))
    if toward == "ceiling":
        return F.floor(col + F.lit(0.5))
    raise ValueError(toward)


def round_col(col: Column, rule: str = "half_even", decimals: int = 0) -> Column:
    """Apply one of the reference's 10 rounding rules to a numeric column."""
    scale = F.lit(float(10 ** decimals)) if decimals else None
    x = col * scale if decimals else col

    if rule == "floor":
        r = F.floor(x)
    elif rule == "ceiling":
        r = F.ceil(x)
    elif rule == "down":  # toward zero (truncate)
        r = F.signum(x) * F.floor(F.abs(x))
    elif rule == "up":  # away from zero
        r = F.signum(x) * F.ceil(F.abs(x))
    elif rule == "half_floor":
        r = _half_adjust(x, "floor")
    elif rule == "half_ceiling":
        r = _half_adjust(x, "ceiling")
    elif rule == "half_down":
        r = _half_adjust(x, "down")
    elif rule == "half_up":
        r = _half_adjust(x, "up")
    elif rule == "half_even":
        r = F.bround(x, 0)
    elif rule == "half_odd":
        # ties to the nearest ODD integer (reference math.h:710-768,1244:
        # "half_down when the truncated quotient is odd, half_up when
        # even").  Sign-correct at |x| < 1: ±0.5 → ±1 (trunc 0 is even →
        # half_up/away), where the reference's float specialization's
        # modf/fmod formulation loses the sign of -0.0.
        trunc = F.signum(x) * F.floor(F.abs(x))
        tie = (F.abs(x) - F.floor(F.abs(x))) == F.lit(0.5)
        odd = F.pmod(trunc, 2) == 1
        r = F.when(
            tie, F.when(odd, trunc).otherwise(trunc + F.signum(x))
        ).otherwise(F.signum(x) * F.floor(F.abs(x) + F.lit(0.5)))
    else:
        raise ValueError(
            f"unknown rounding rule {rule!r}; expected one of {sorted(RULES)}"
        )
    return r / scale if decimals else r


RULES = {
    "floor", "ceiling", "down", "up",
    "half_floor", "half_ceiling", "half_down", "half_up", "half_even",
    "half_odd",
}


def snap_round(
    col: Column,
    tol: float = 1e-6,
    rule: str | None = None,
    errors: str = "raise",
) -> Column:
    """Tolerance-snap then round (reference ``convert/base.py:514-554``).

    Values within ``tol`` of an integer snap to it; remaining non-integers
    are rounded by ``rule`` if given, else rejected (``errors='coerce'`` →
    NULL; 'raise' is enforced at validation time by the caller since Spark
    expressions cannot raise per-row).
    """
    nearest = F.round(col, 0)
    snapped = F.when(F.abs(col - nearest) <= F.lit(tol), nearest).otherwise(col)
    if rule is not None:
        return round_col(snapped, rule)
    is_int = snapped == F.floor(snapped)
    if errors == "coerce":
        return F.when(is_int, snapped).otherwise(F.lit(None))
    return snapped  # caller validates integrality separately for errors='raise'


def round_div(num: Column, den: Column, rule: str = "floor") -> Column:
    """Integer division with rounding rule (reference
    ``util/round/integer.pyx:14-165``).  Pure integer arithmetic — exact."""
    q = F.floor(num / den)  # floor division
    r = num - q * den
    if rule == "floor":
        return q
    if rule == "ceiling":
        return q + F.when(r != 0, F.lit(1)).otherwise(F.lit(0))
    if rule == "down":  # toward zero
        neg = (num < 0) != (den < 0)
        return q + F.when(neg & (r != 0), F.lit(1)).otherwise(F.lit(0))
    if rule == "up":  # away from zero
        neg = (num < 0) != (den < 0)
        return q + F.when(~neg & (r != 0), F.lit(1)).otherwise(F.lit(0))
    if rule in (
        "half_up", "half_down", "half_even", "half_floor", "half_ceiling",
        "half_odd",
    ):
        twice_r = 2 * r
        da = F.abs(den)
        if rule == "half_odd":
            # reference math.h:748-768: at a tie, behave as half_down if
            # the TOWARD-ZERO quotient is odd, half_up if even — which
            # lands the result on the nearest odd integer
            neg = (num < 0) != (den < 0)
            qt = q + F.when(neg & (r != 0), F.lit(1)).otherwise(F.lit(0))
            odd_q = F.pmod(qt, 2) == 1
            over = F.abs(twice_r) > da
            tie = F.abs(twice_r) == da
            tie_bump = F.when(odd_q, neg).otherwise(~neg)
            return q + F.when(over | (tie & tie_bump), F.lit(1)).otherwise(
                F.lit(0)
            )
        if rule == "half_floor":
            bump = F.abs(twice_r) > da
        elif rule == "half_ceiling":
            bump = F.abs(twice_r) >= da
        elif rule == "half_down":
            neg = (num < 0) != (den < 0)
            bump = F.when(neg, F.abs(twice_r) >= da).otherwise(F.abs(twice_r) > da)
        elif rule == "half_up":
            neg = (num < 0) != (den < 0)
            bump = F.when(neg, F.abs(twice_r) > da).otherwise(F.abs(twice_r) >= da)
        else:  # half_even
            neg = (num < 0) != (den < 0)
            odd = F.pmod(q, 2) == 1
            over = F.abs(twice_r) > da
            tie = F.abs(twice_r) == da
            bump = over | (tie & odd)
            return q + F.when(bump, F.lit(1)).otherwise(F.lit(0))
        return q + F.when(bump, F.lit(1)).otherwise(F.lit(0))
    raise ValueError(f"unknown rounding rule {rule!r}")


def within_tol(a: Column, b: Column, tol: float) -> Column:
    """``abs(a-b) <= tol`` (reference ``util/numeric.pyx:285``)."""
    return F.abs(a - b) <= F.lit(tol)


def within_tol_complex(a: Column, b: Column, tol: float | complex) -> Column:
    """Complex-aware Tolerance (M2; reference ``Tolerance`` at
    ``convert/arguments.py:226-341`` — a complex ``tol`` checks the real
    and imaginary parts independently).

    ``a``/``b`` are complex struct{re,im} columns; a scalar ``tol``
    applies to both components.
    """
    if isinstance(tol, complex):
        t_re, t_im = abs(tol.real), abs(tol.imag)
    else:
        t_re = t_im = float(tol)
    return (F.abs(a["re"] - b["re"]) <= F.lit(t_re)) & (
        F.abs(a["im"] - b["im"]) <= F.lit(t_im)
    )


def modpow(base: Column, exp: int, mod: int) -> Column:
    """Modular exponentiation by repeated squaring (M6; reference
    ``util/numeric.pyx`` ``pymodpow``) — unrolled into O(log exp) native
    multiply-mod expressions, exact as long as ``mod² < 2^63``.
    """
    if exp < 0:
        raise ValueError("modpow requires a non-negative exponent")
    if mod <= 0:
        raise ValueError("modpow requires a positive modulus")
    if mod * mod >= (1 << 63):
        raise ValueError("modulus too large for exact 64-bit squaring")
    m = F.lit(mod)
    result: Column = F.lit(1 % mod).cast("long")
    cur = F.pmod(base.cast("long"), m)
    while exp:
        if exp & 1:
            result = F.pmod(result * cur, m)
        exp >>= 1
        if exp:
            cur = F.pmod(cur * cur, m)
    return result
