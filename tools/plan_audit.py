"""Plan-quality audit: read every query's physical plan and flag
scale anti-patterns.

Checks per query:
* column pruning  — scans reading more columns than the query needs
* filter pushdown — PushedFilters present when the query filters a scan
* single-partition exchanges (SinglePartition) outside tiny aggregates
* broadcast vs sort-merge joins (and nested-loop joins, the red flag)
* CollectLimit / global sorts feeding wide plans

Usage: python tools/plan_audit.py [name_substring ...]
"""

from __future__ import annotations

import re
import sys


def audit_plan(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    # Documented nested-loop contracts, not bugs:
    # - x05/x06: exhaustive baselines (broadcast cross-score / exact
    #   pairwise oracle);
    # - x18/x20: decontamination's short-eval-text containment check — a
    #   cross join against a BROADCAST list bounded by the (small by
    #   contract) eval set, curation.py _containment_hits.
    _bnlj_ok = ("x05", "x06", "x18", "x20")
    if "BroadcastNestedLoopJoin" in plan and not any(k in name for k in _bnlj_ok):
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
    # exchanges execute once at cache fill — identical expr-ids in the
    # repeated prints make the set() collapse exactly those duplicates
    n_exchanges = len(
        {ln.strip() for ln in plan.splitlines() if re.search(r"\bExchange\b", ln)}
    )
    # Composed multi-stage pipelines legitimately carry more exchanges:
    # x02/x03 are LSH/posting-join dedups (sig shuffle + band join +
    # verify), x18 chains six curation stages (and already cuts lineage
    # with materialize_stage — 69 exchanges before the cut, ~7 after).
    # x32 is the TWO-corpus LSH join: both sides pay prep+band exchanges
    # that the self-join variants share, so its floor is ~2x x02's shape.
    _PIPELINE_CEILING = {"x02": 16, "x03": 16, "x18": 16, "x32": 12}
    ceiling = next(
        (v for k, v in _PIPELINE_CEILING.items() if k in name), 6
    )
    if n_exchanges > ceiling:
        flags.append(f"{n_exchanges} exchanges — shuffle-heavy plan")
    return flags


def main() -> int:
    patterns = sys.argv[1:]
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("plan_audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bertrand_spark.plans.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    n_clean = 0
    for name, fn in QUERIES.items():
        if patterns and not any(p in name for p in patterns):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"ERROR {name}: {exc}")
            continue
        flags = audit_plan(name, plan)
        if flags:
            print(f"FLAG {name}:")
            for f in flags:
                print(f"   - {f}")
        else:
            n_clean += 1
    print(f"\n{n_clean} clean plans")
    return 0


if __name__ == "__main__":
    sys.exit(main())
