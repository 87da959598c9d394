"""Physical-plan scale audit — the library core behind both the CI gate
(``tools/plan_audit.py``) and the user API (:func:`bertrand_spark.api
.audit_scale`).

Checks a plan string for 100 TB anti-patterns:
* nested-loop joins (outside documented bounded contracts)
* single-partition exchanges feeding sorts/windows over non-trivial input
* scans reading more columns than a pruned query should
* shuffle-heavy plans (distinct exchange count over a per-shape ceiling)

Plus a LOGICAL-plan check (:func:`audit_broadcast_hints`): a static
``F.broadcast`` hint whose input scales with the data — an aggregate
keyed by a fact-table column, or an sf-scaling base relation — is a
driver OOM at 100 TB, not a slow plan.  The physical plan cannot show
this (an AQE-chosen and a hint-forced broadcast print identically), so
this check walks the ANALYZED plan's ``ResolvedHint`` subtrees.
"""

from __future__ import annotations

import re

# Documented nested-loop contracts, not bugs:
# - x05/x06: exhaustive baselines (broadcast cross-score / exact pairwise
#   oracle);
# - x18/x20: decontamination's short-eval-text containment check — a cross
#   join against a BROADCAST list bounded by the (small by contract) eval
#   set, curation.py _containment_hits.
# - q45: the scalar-subquery idiom — a ONE-row broadcast aggregate crossed
#   into the filter (TPC-H Q22 shape); bounded by construction.
# - q58/q59/q60: the derived-partsupp fan-out (part × a 4-row literal ×
#   a one-row supplier count — queries.derived_partsupp) is a bounded
#   cross join by construction; q59 additionally crosses its one-row
#   global threshold back in (the q45 idiom, TPC-H Q11 HAVING).
_BNLJ_OK = ("x05", "x06", "x18", "x20", "q45", "q58", "q59", "q60")

# Composed multi-stage pipelines legitimately carry more exchanges:
# x02/x03 are LSH/posting-join dedups (sig shuffle + band join + verify),
# x18 chains six curation stages (post-materialize_stage), x32 is the
# TWO-corpus LSH join — both sides pay prep+band exchanges.
_PIPELINE_CEILING = {"x02": 16, "x03": 16, "x18": 16, "x32": 12}


def _plan_line_key(ln: str) -> str:
    """Normalize a plan tree line for distinct-counting: drop the
    branch-drawing prefix (spaces, ':', '+', '-', '*') so the same
    operator printed under different tree branches (a cached subtree is
    printed once per consumer) collapses to one entry."""
    return re.sub(r"^[\s:+*-]+", "", ln)


def audit_plan(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    if "BroadcastNestedLoopJoin" in plan and not any(
        k in name for k in _BNLJ_OK
    ):
        flags.append("nested-loop join (O(n*m)) in the plan")
    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    # window/global-sort funnels: a SinglePartition exchange feeding a Sort
    # or Window over non-trivial input.  q36 is exempt: its sort runs on
    # the per-COLUMN profile rows (one row per profiled column) produced
    # by a global aggregate — bounded by the schema width, not the data.
    if (
        n_single
        and "q36" not in name
        and re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*(Window|Sort)", plan)
    ):
        flags.append(f"{n_single} single-partition exchange(s) feeding sort/window")
    scans = re.findall(r"FileScan parquet[^\n]*ReadSchema: ([^\n]*)", plan)
    for rs in scans:
        ncols = rs.count(",") + 1 if rs.strip("<>") else 0
        if ncols > 12:
            flags.append(f"scan reads {ncols} columns — check pruning")
    # count DISTINCT exchange lines: a persisted subtree is printed once
    # per consumer (InMemoryRelation embeds its child plan), but its
    # exchanges execute once at cache fill — normalizing away the tree
    # prefix collapses exactly those repeated prints (same plan ids)
    n_exchanges = len(
        {
            _plan_line_key(ln)
            for ln in plan.splitlines()
            if re.search(r"\bExchange\b", ln)
        }
    )
    ceiling = next((v for k, v in _PIPELINE_CEILING.items() if k in name), 6)
    if n_exchanges > ceiling:
        flags.append(f"{n_exchanges} exchanges — shuffle-heavy plan")
    return flags


# ---------------------------------------------------------------------------
# Static broadcast-hint audit (logical plan)
# ---------------------------------------------------------------------------

# Base relations whose cardinality does not scale with the data volume:
# TPC-H fixes nation at 25 rows and region at 5 at every scale factor.
_BOUNDED_TABLES = {"nation", "region"}

# Leaf nodes that are driver-local by construction (literal lookup
# tables shipped via createDataFrame) — bounded by the code that built
# them, not by the data.  LogicalRDD is what Spark 4's Arrow-backed
# createDataFrame produces; nothing in this engine wraps an unbounded
# external RDD, so a LogicalRDD leaf means driver-local literals.
_LOCAL_LEAVES = {"LocalRelation", "OneRowRelation", "Range", "LogicalRDD"}

# Hints whose subtree is structurally unbounded but bounded by a
# DOCUMENTED contract the structural walk cannot see.  Maps query-name
# substring -> (contract, allowed unbounded-table signature).  The
# signature is the set of sf-scaling base tables the contract-covered
# hint subtree is allowed to scan (probed from the real analyzed plans
# at sf0.01, round 8): the exemption applies HINT-BY-HINT, and only to
# hints whose unbounded tables are a subset of the signature — a future
# genuinely new unbounded hint over a different table in an allowlisted
# query is still flagged (round-7 ADVICE: the old query-wide
# short-circuit silently blessed any future hint in e.g. x02/x18).
#
# Deliberately MINIMAL — only the queries whose analyzed plans actually
# surface such hints today (verified by running the audit over all 110
# plans).  The dedup/DSIR pipelines also carry contract-bounded
# broadcasts (measured-regime verify sides, the 512-row λ table), but
# those sit behind persist/materialize boundaries and never reach the
# returned plan's hint nodes; if a refactor ever surfaces one, the
# audit FAILING is the desired behavior — re-allowlist consciously
# with its contract, don't pre-bless it here.
_DOCS = frozenset({"documents"})
_BCAST_OK = {
    # per-language / per-source aggregates: grouping key domain is the
    # language / corpus-source vocabulary (dozens), not the row count
    "x39": ("per-language bounds aggregate — key domain = #languages", _DOCS),
    "x37": ("per-source rates table — key domain = #sources", _DOCS),
    "x40": ("per-source mixture weights — key domain = #sources", _DOCS),
    # decontamination: the broadcast side is the EVAL benchmark's n-gram
    # table — bounded by the benchmark suite size, never the corpus
    # (curation.py _containment_hits documents the BNLJ contract too)
    "x18": ("benchmark n-gram table — bounded by the eval set", _DOCS),
    "x20": ("benchmark n-gram table — bounded by the eval set", _DOCS),
    # MinHash/LSH verify joins: dedup.py MEASURES the candidate-pruned
    # side (a count action on materialized prep) and applies F.broadcast
    # only in the small regime — i.e. the hint IS size-guarded at
    # runtime, which is exactly the remedy this audit prescribes; the
    # regime (and so whether the hint appears in the plan) varies with
    # sf, so all five family members stay listed even though only the
    # sf0.01 plans of x02/x32 surface it today.
    "x02": ("measured-regime verify broadcast (dedup.py size switch)", _DOCS),
    "x30": ("measured-regime verify broadcast via x02 pair generation", _DOCS),
    "x31": ("measured-regime verify broadcast via x02 pair generation", _DOCS),
    "x32": ("measured-regime verify broadcast (two-corpus size switch)", _DOCS),
    "x35": ("measured-regime verify broadcast (chunk variant)", _DOCS),
    "x16": ("measured-regime verify broadcast (cosine near-dup)", _DOCS),
}


def _jchildren(node):
    s = node.children()
    return [s.apply(i) for i in range(s.size())]


def _node_kind(node) -> str:
    return node.getClass().getSimpleName()


def _relation_table(node) -> str:
    """Best-effort base-table name for a LogicalRelation leaf."""
    try:
        path = node.relation().location().rootPaths().apply(0).toString()
    except Exception:
        return "<unknown>"
    base = path.rstrip("/").rsplit("/", 1)[-1]
    return base.split(".")[0]


def _contains_aggregate(node) -> bool:
    if _node_kind(node) == "Aggregate":
        return True
    return any(_contains_aggregate(c) for c in _jchildren(node))


# A named expression's toString is ``<child> AS <name>#<id>`` (Alias) or
# the bare child, so a HEAD-anchored match is exactly "the outermost
# function is the max/min aggregate".  The round-8 substring test
# (``"max(" in s``) also matched e.g. ``array_max(col)`` — an elementwise
# function whose output is NOT a global reduction — which would let an
# equality filter against it launder an unbounded broadcast hint past the
# audit (round-8 ADVICE).  A chain of cast() wrappers is allowed
# (round-9 review: ``cast(max(x#1) as bigint) AS mx#2`` is still a
# global reduction — an equality against it is still tie-bounded).
_REDUCTION_HEAD = re.compile(r"^(?:cast\()*(?:max|min)\(")


def _global_reduction_attr_ids(node, out: set) -> None:
    """Collect the exprIds of max/min outputs computed over the WHOLE
    frame: unpartitioned-Window max/min expressions and groupless-
    Aggregate max/min aggregate expressions."""
    kind = _node_kind(node)
    try:
        if kind == "Window" and node.partitionSpec().size() == 0:
            exprs = node.windowExpressions()
            for i in range(exprs.size()):
                e = exprs.apply(i)
                if _REDUCTION_HEAD.match(e.toString()):
                    out.add(e.toAttribute().exprId().id())
        if kind == "Aggregate" and node.groupingExpressions().size() == 0:
            exprs = node.aggregateExpressions()
            for i in range(exprs.size()):
                e = exprs.apply(i)
                if _REDUCTION_HEAD.match(e.toString()):
                    out.add(e.toAttribute().exprId().id())
    except Exception:
        pass
    for c in _jchildren(node):
        _global_reduction_attr_ids(c, out)


def _max_reduction_filter(node) -> bool:
    """True iff some Filter EQUALITY-compares an attribute against THE
    OUTPUT of a global max/min reduction computed beneath it — q57's
    ties-to-the-max idiom (revenue = max(revenue)), whose post-filter
    cardinality is the tie count regardless of input scale.  Two
    round-8 tightenings beyond the round-7 ADVICE: (a) HAVING-style
    per-key filters (Filter(sum > literal) over a grouped aggregate —
    the q54 shape) fail the EqualTo test; (b) an UNRELATED equality
    (a == b with a global count() merely present in the subtree) fails
    the provenance test — one EqualTo side must be the reduction's own
    exprId, so the filter provably selects the argmax/argmin ties."""
    if _node_kind(node) == "Filter":
        try:
            cond = node.condition()
            if cond.getClass().getSimpleName() == "EqualTo":
                sides = [cond.left(), cond.right()]
                if all(
                    s.getClass().getSimpleName() == "AttributeReference"
                    for s in sides
                ):
                    reduction_ids: set = set()
                    _global_reduction_attr_ids(node, reduction_ids)
                    if any(
                        s.exprId().id() in reduction_ids for s in sides
                    ):
                        return True
        except Exception:
            pass
    return any(_max_reduction_filter(c) for c in _jchildren(node))


def _bounded_subtree(node) -> bool:
    """Structurally bounded cardinality: every leaf is a fixed-size
    table or driver-local literal, or the subtree funnels through a
    global (no grouping keys) aggregate."""
    kind = _node_kind(node)
    if kind == "LogicalRelation":
        return _relation_table(node) in _BOUNDED_TABLES
    if kind in _LOCAL_LEAVES:
        return True
    if kind == "Aggregate" and node.groupingExpressions().size() == 0:
        return True  # global aggregate: at most one row regardless of input
    kids = _jchildren(node)
    if not kids:
        return False  # unknown leaf: assume it scales
    return all(_bounded_subtree(c) for c in kids)


def _collect_hints(node, out):
    if _node_kind(node) == "ResolvedHint" and "broadcast" in node.hints().toString():
        out.append(node)
    for c in _jchildren(node):
        _collect_hints(c, out)


def _unbounded_tables(node, out):
    kind = _node_kind(node)
    if kind == "LogicalRelation":
        t = _relation_table(node)
        if t not in _BOUNDED_TABLES:
            out.add(t)
    for c in _jchildren(node):
        _unbounded_tables(c, out)


def _contract_covers(contract, tables: set) -> bool:
    """A _BCAST_OK contract covers a structurally-failing hint only
    when the hint's unbounded tables are a NON-EMPTY subset of the
    contract's signature.  An empty table set (derived subtree whose
    leaves the walk doesn't recognize — e.g. a future DataSourceV2
    relation) must NOT pass vacuously (review finding): flag it and
    force a conscious re-allowlist instead."""
    return bool(tables) and tables <= contract[1]


def audit_broadcast_hints(name: str, analyzed_jplan) -> list[str]:
    """Flag static F.broadcast hints whose input scales with the data.

    ``analyzed_jplan`` is ``df._jdf.queryExecution().analyzed()``.  A
    hint passes if its subtree is bounded by construction (nation/region
    leaves, literal local relations, global aggregates), carries a
    ties-to-the-max equality filter against a global reduction (the q57
    idiom), or — evaluated HINT-BY-HINT — matches a documented
    ``_BCAST_OK`` contract for this query, including the contract's
    unbounded-table signature.  Everything else — q54's
    |part|-cardinality thresholds aggregate was the motivating case —
    is a forced driver OOM at 100 TB and gets flagged.  The structural
    checks run FIRST for every hint (round-7 ADVICE): a contract entry
    no longer short-circuits the audit for the whole query, so a new
    unbounded hint over an unexpected table in e.g. x02/x18 is still
    caught.
    """
    contract = next((v for k, v in _BCAST_OK.items() if k in name), None)
    hints: list = []
    _collect_hints(analyzed_jplan, hints)
    flags: list[str] = []
    for h in hints:
        child = _jchildren(h)[0]
        if _bounded_subtree(child):
            continue
        if _max_reduction_filter(child):
            continue
        tables: set = set()
        _unbounded_tables(child, tables)
        if contract is not None and _contract_covers(contract, tables):
            continue  # this hint is the documented contract shape
        hint_tables = ", ".join(sorted(tables)) or "derived"
        suffix = (
            f" (query contract '{contract[0]}' covers only "
            f"{sorted(contract[1])}, not this hint)"
            if contract is not None
            else ""
        )
        flags.append(
            "static broadcast hint over sf-scaling input "
            f"(tables: {hint_tables}) — forced broadcast cannot survive "
            "100 TB; drop the hint (AQE decides from measured sizes) or "
            f"add a size guard{suffix}"
        )
    return flags
