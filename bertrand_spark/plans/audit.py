"""Physical-plan scale audit — the library core behind both the CI gate
(``tools/plan_audit.py``) and the user API (:func:`bertrand_spark.api
.audit_scale`).

Checks a plan string for 100 TB anti-patterns:
* nested-loop joins (outside documented bounded contracts)
* single-partition exchanges feeding sorts/windows over non-trivial input
* scans reading more columns than a pruned query should
* shuffle-heavy plans (distinct exchange count over a per-shape ceiling)
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
_BNLJ_OK = ("x05", "x06", "x18", "x20", "q45")

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
