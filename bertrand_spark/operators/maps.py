"""Map-column operators: the LinkedDict surface on MapType columns (L10/L11).

Reference: ``bertrand/structs/linked.pyi:352-494`` (LinkedDict — an
insertion-ordered dict with set-like views) and the BST-ordered variants
(L11).  Spark's MapType is unordered; order-dependent semantics are
re-expressed over the **entry array** (``map_entries`` preserves the
underlying entry sequence) or explicit sorts — all native expressions,
codegen-able (no HOF in the hot paths where avoidable), zero shuffle.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "map_from_pairs", "map_get", "map_put", "map_remove",
    "map_keys_ordered", "map_values_ordered", "map_sorted_by_key",
    "map_filter_entries", "map_merge", "map_zip",
    "map_invert", "map_contains_key", "map_size",
    # set algebra on keys (linked.pyi:440-475 SET section)
    "map_intersection", "map_difference", "map_symmetric_difference",
    "map_union_left",
    # L11 navigable (BST-ordered) views
    "map_range", "map_first_key", "map_last_key",
    "map_floor_key", "map_ceiling_key", "map_index_of_key",
]


def map_from_pairs(*pairs: tuple[Any, Any]) -> Column:
    """Literal ordered map from (key, value) pairs (LinkedDict ctor,
    linked.pyi:360)."""
    keys = F.array(*[F.lit(k) for k, _ in pairs])
    vals = F.array(*[F.lit(v) for _, v in pairs])
    return F.map_from_arrays(keys, vals)


def map_get(m: Column, key: Any, default: Any = None) -> Column:
    """``d.get(key, default)`` (linked.pyi:401) — NULL-safe element_at."""
    got = F.try_element_at(m, F.lit(key))
    if default is None:
        return got
    return F.coalesce(got, F.lit(default))


def map_put(m: Column, key: Any, value: Any) -> Column:
    """``d[key] = value`` — overwrite-or-append (linked.pyi:415).

    ``map_concat`` rejects duplicate keys under ANSI, so remove first.
    """
    cleaned = map_remove(m, key)
    return F.map_concat(
        cleaned, F.map_from_arrays(F.array(F.lit(key)), F.array(F.lit(value)))
    )


def map_remove(m: Column, key: Any) -> Column:
    """``del d[key]`` (linked.pyi:430)."""
    return F.map_filter(m, lambda k, _: k != F.lit(key))


def map_keys_ordered(m: Column) -> Column:
    """Keys in entry (insertion) order — LinkedDict's keys() view
    (linked.pyi:444)."""
    return F.transform(F.map_entries(m), lambda e: e["key"])


def map_values_ordered(m: Column) -> Column:
    """Values in entry order (linked.pyi:452)."""
    return F.transform(F.map_entries(m), lambda e: e["value"])


def map_sorted_by_key(m: Column, asc: bool = True) -> Column:
    """BST-ordered view (L11): entries as an array sorted by key."""
    entries = F.array_sort(F.map_entries(m))
    if asc:
        return entries
    return F.reverse(entries)


def map_filter_entries(m: Column, predicate) -> Column:
    """``{k: v for k, v in d.items() if p(k, v)}`` (linked.pyi:468)."""
    return F.map_filter(m, predicate)


def map_merge(a: Column, b: Column, resolver=None) -> Column:
    """``a | b`` dict union (linked.pyi:476): right side wins by default,
    or ``resolver(k, va, vb)`` decides."""
    if resolver is None:
        resolver = lambda k, va, vb: F.coalesce(vb, va)  # noqa: E731
    return F.map_zip_with(a, b, resolver)


def map_zip(a: Column, b: Column, merge) -> Column:
    """Key-aligned zip of two maps (map_zip_with pass-through)."""
    return F.map_zip_with(a, b, merge)


def map_invert(m: Column) -> Column:
    """value → key inversion (later duplicates win, as in dict
    comprehension inversion)."""
    entries = F.map_entries(m)
    return F.map_from_arrays(
        F.transform(entries, lambda e: e["value"]),
        F.transform(entries, lambda e: e["key"]),
    )


def map_contains_key(m: Column, key: Any) -> Column:
    """``key in d`` (linked.pyi:489)."""
    return F.map_contains_key(m, F.lit(key))


def map_size(m: Column) -> Column:
    return F.size(m)


# --- set algebra on keys (LinkedDict SET section, linked.pyi:440-475) ------
def map_intersection(m: Column, keys: Column) -> Column:
    """Entries whose key is in ``keys`` (array column) —
    ``d.intersection(other)`` (linked.pyi:446)."""
    return F.map_filter(m, lambda k, v: F.array_contains(keys, k))


def map_difference(m: Column, keys: Column) -> Column:
    """Entries whose key is NOT in ``keys`` — ``d.difference``
    (linked.pyi:449)."""
    return F.map_filter(m, lambda k, v: ~F.array_contains(keys, k))


def map_symmetric_difference(a: Column, b: Column) -> Column:
    """Entries present in exactly one side — ``d.symmetric_difference``
    (linked.pyi:450).  Key order: a-only entries then b-only entries
    (matches the reference's append semantics)."""
    return F.map_concat(
        F.map_filter(a, lambda k, v: ~F.map_contains_key(b, k)),
        F.map_filter(b, lambda k, v: ~F.map_contains_key(a, k)),
    )


def map_union_left(a: Column, b: Column) -> Column:
    """Union where the LEFT side wins on key conflicts and b's novel keys
    append — ``d.union_left`` (linked.pyi:443)."""
    return F.map_concat(
        a, F.map_filter(b, lambda k, v: ~F.map_contains_key(a, k))
    )


# --- L11: navigable (BST-ordered) views ------------------------------------
def map_range(m: Column, lo: Any = None, hi: Any = None) -> Column:
    """Entries with ``lo ≤ key ≤ hi``, sorted by key — the BST range scan
    (L11; NavigableMap.subMap semantics).  Open ends via None."""
    entries = F.array_sort(F.map_entries(m))

    def keep(e: Column) -> Column:
        c = F.lit(True)
        if lo is not None:
            c = c & (e["key"] >= F.lit(lo))
        if hi is not None:
            c = c & (e["key"] <= F.lit(hi))
        return c

    return F.filter(entries, keep)


def map_first_key(m: Column) -> Column:
    """Smallest key (BST leftmost; NavigableMap.firstKey)."""
    return F.array_min(F.map_keys(m))


def map_last_key(m: Column) -> Column:
    """Largest key (BST rightmost; NavigableMap.lastKey)."""
    return F.array_max(F.map_keys(m))


def map_floor_key(m: Column, key: Any) -> Column:
    """Largest key ≤ ``key`` (NavigableMap.floorKey) — NULL when none."""
    ks = F.map_keys(m)
    return F.array_max(F.filter(ks, lambda k: k <= F.lit(key)))


def map_ceiling_key(m: Column, key: Any) -> Column:
    """Smallest key ≥ ``key`` (NavigableMap.ceilingKey) — NULL when none."""
    ks = F.map_keys(m)
    return F.array_min(F.filter(ks, lambda k: k >= F.lit(key)))


def map_index_of_key(m: Column, key: Any) -> Column:
    """0-based position of ``key`` in entry order — ``d.index(key)``
    (linked.pyi:427); NULL when absent (the reference raises)."""
    pos = F.array_position(F.map_keys(m), F.lit(key))
    return F.when(pos > 0, pos - 1)
