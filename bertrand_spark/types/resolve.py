"""``resolve()`` — parse any type specifier into a type object.

Re-implements the reference's mini-language (grammar at
``bertrand/types/base/meta.py:1461-1693``; entry ``resolve`` at
``meta.py:1143``): accepts Python classes, Spark ``DataType`` instances,
numpy/pandas dtypes, strings like ``"int32"``, ``"int | float64"``,
``"sparse[int, 23]"``, ``"foo: int32, bar: bool"``, PEP-604 unions, mappings
and iterables.  Pure driver-side parsing — no Spark jobs.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import pyspark.sql.types as st

from .core import (
    AnyType,
    DecoratedType,
    ScalarType,
    StructuredType,
    UnionType,
    registry,
)

__all__ = ["resolve"]

# tokenizer for the string grammar: ident, optional [params] with nesting
_TOKEN = re.compile(r"\s*([A-Za-z_][\w .]*)\s*(\[)?")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` at bracket-depth 0 (reference meta.py:1538 nested expr)."""
    parts, depth, buf = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _parse_param(tok: str) -> Any:
    tok = tok.strip()
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    if (tok.startswith("'") and tok.endswith("'")) or (
        tok.startswith('"') and tok.endswith('"')
    ):
        return tok[1:-1]
    # nested type spec?
    try:
        return resolve(tok)
    except ValueError:
        return tok


def _resolve_ident(name: str, params_src: str | None) -> AnyType:
    low = name.strip().lower()
    params = _split_top(params_src, ",") if params_src else []

    # decorator types: sparse[...] / categorical[...]
    if low in registry.decorators:
        deco = registry.decorators[low]
        if not params:
            raise ValueError(f"decorator '{name}' requires a wrapped type")
        wrapped = resolve(params[0])
        extra = tuple(_parse_param(p) for p in params[1:])
        return DecoratedType(deco, wrapped, extra)

    # sized unicode "U32" (reference meta.py:1232-1235)
    m = re.fullmatch(r"[uU](\d+)", name.strip())
    if m:
        return registry.aliases["string"].with_params(int(m.group(1)))

    t = registry.aliases_exact.get(name.strip()) or registry.aliases.get(low)
    if t is None:
        # backend suffix form "int64[pandas]" → backend collapses on Spark
        from ..errors import shorten_list

        raise ValueError(
            f"unrecognized type specifier: {name!r}; known aliases include "
            f"{shorten_list(sorted(registry.aliases))}"
        )
    if params:
        # backend selectors resolve to the same Spark-backed type
        if len(params) == 1 and params[0].lower() in (
            "numpy", "pandas", "python", "pyarrow", "spark", "arrow",
        ):
            return t
        return t.with_params(*(_parse_param(p) for p in params))
    return t


# Far beyond any real specifier (reference grammar nests ~4 deep) but
# far below the Python stack: the parser recurses once per bracket
# level, and an adversarial "sparse[sparse[...["-style input must get a
# ValueError, not a RecursionError mid-parse (round-5 fuzz finding).
# The bracket pre-scan alone is not enough — structured specs recurse
# once per top-level colon ("a: a: a: ... int64") and nested
# mappings/iterables recurse without any string at all, so resolve()
# also threads an explicit depth counter (round-5 ADVICE).
_MAX_SPEC_DEPTH = 64

import threading as _threading

_depth_state = _threading.local()


def _enter_depth(s: Any) -> None:
    d = getattr(_depth_state, "d", 0) + 1
    if d > _MAX_SPEC_DEPTH:
        _depth_state.d = 0
        raise ValueError(
            f"type specifier recursion exceeds {_MAX_SPEC_DEPTH} levels "
            f"(adversarial or malformed input): {str(s)[:80]!r}..."
        )
    _depth_state.d = d


def _exit_depth() -> None:
    _depth_state.d = max(0, getattr(_depth_state, "d", 1) - 1)


def _resolve_string(s: str) -> AnyType:
    s = s.strip()
    if not s:
        raise ValueError("empty type specifier")

    depth = mx = 0
    for ch in s:
        if ch == "[":
            depth += 1
            mx = max(mx, depth)
        elif ch == "]":
            depth -= 1
    if mx > _MAX_SPEC_DEPTH:
        raise ValueError(
            f"type specifier nests {mx} bracket levels deep "
            f"(max {_MAX_SPEC_DEPTH}): {s[:80]!r}..."
        )

    # whole-string alias wins before any grammar (R5: runtime aliases may
    # contain brackets, e.g. "int64[strict]")
    whole = registry.aliases_exact.get(s) or registry.aliases.get(s.lower())
    if whole is not None:
        return whole

    # structured: "col: spec, col2: spec" (reference meta.py:1508)
    cols = _split_top(s, ",")
    if any(":" in c and "[" not in c.split(":")[0] for c in cols) and all(
        ":" in c for c in cols
    ):
        out = {}
        for c in cols:
            k, v = c.split(":", 1)
            out[k.strip()] = resolve(v.strip())
        return StructuredType(out)

    # union: "a | b | c"
    alts = _split_top(s, "|")
    if len(alts) > 1:
        return UnionType([resolve(a) for a in alts])

    m = _TOKEN.match(s)
    if not m:
        raise ValueError(f"cannot parse type specifier: {s!r}")
    name = m.group(1).strip()
    rest = s[m.end():]
    if m.group(2):  # opening bracket consumed
        if not rest.endswith("]"):
            raise ValueError(f"unbalanced brackets in: {s!r}")
        return _resolve_ident(name, rest[:-1])
    if rest.strip():
        raise ValueError(f"trailing characters in type specifier: {s!r}")
    return _resolve_ident(name, None)


def resolve(target: Any) -> AnyType:
    """Parse any type specifier → type object (reference ``meta.py:1143``)."""
    if isinstance(target, (ScalarType, DecoratedType, UnionType, StructuredType)):
        return target
    _enter_depth(target)
    try:
        return _resolve_inner(target)
    finally:
        _exit_depth()


def _resolve_inner(target: Any) -> AnyType:
    if isinstance(target, str):
        return _resolve_string(target)
    if isinstance(target, st.DataType):
        return registry.from_spark(target)
    if isinstance(target, type):
        # numpy scalar classes resolve by their DTYPE name first:
        # np.float32/np.int32/np.longdouble/... carry no Python builtin
        # in their MRO except `object`, so from_scalar_class would fall
        # through to the Object escape hatch (every MRO ends in object).
        # np.float64/np.complex128 work either way (they subclass
        # float/complex); non-dtype numpy classes fall through.
        if getattr(target, "__module__", "").startswith("numpy"):
            try:
                import numpy as np

                return _resolve_string(str(np.dtype(target)))
            except Exception:
                pass  # not a dtype-convertible class → scalar lookup
        hit = registry.from_scalar_class(target)
        if hit is not None:
            return hit
        # any other Python class → Object[cls] escape hatch
        return registry.aliases["object"].with_params(target)
    if isinstance(target, Mapping):
        return StructuredType({k: resolve(v) for k, v in target.items()})
    if isinstance(target, slice):  # "col": spec as slice (reference grammar)
        return StructuredType({str(target.start): resolve(target.stop)})
    # numpy / pandas dtypes — optional deps, resolved by name
    mod = type(target).__module__
    if mod.startswith("numpy") or mod.startswith("pandas"):
        return _resolve_string(str(target))
    if hasattr(target, "__iter__"):
        return UnionType([resolve(t) for t in target])
    raise ValueError(f"cannot resolve type specifier: {target!r}")
