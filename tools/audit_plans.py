"""Plan audit: sweep every registry key's physical plan for scale
anti-patterns and print a report.

Flags:
  CARTESIAN   CartesianProduct (never acceptable)
  BNLJ        BroadcastNestedLoopJoin (acceptable only where declared:
              theta/cross joins and broadcast-query kNN shapes)
  PY_ROW      BatchEvalPython (row-at-a-time Python UDF; acceptable only
              in the declared udf_python demo)

(WholeStageCodegen coverage needs the executed plan under AQE, so it is
asserted per-key in tests/test_plans.py rather than swept here.)

Usage: python tools/audit_plans.py [--sf DIR]
Exit code 1 if any UNDECLARED flag fires — suitable as a CI gate.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from kwery_spark.session import get_spark

# Keys where a flagged pattern is the documented, intended strategy.
DECLARED = {
    "join_cross": {"BNLJ"},          # explicit cartesian demo (small x small)
    "join_theta": {"BNLJ"},          # non-equi join, broadcast small side
    "udf_python": {"PY_ROW"},        # row-at-a-time UDF demo by definition
    "udtf_python": {"PY_ROW"},       # Python UDTF evaluates per-row by definition
    "sim_knn_bruteforce": {"BNLJ"},  # crossJoin(broadcast(1-row query vector))
    "ann_ivf": {"BNLJ"},             # crossJoin(broadcast(8 seed cells / probes))
    "ann_lsh": {"BNLJ"},             # crossJoin(broadcast(6 hyperplanes))
    "ml_kmeans": {"BNLJ"},           # crossJoin(broadcast(k centroids))
    "sim_maxsim": {"BNLJ"},          # crossJoin(broadcast(one label's query vectors))
    "events_gapfill": {"BNLJ"},      # crossJoin(broadcast(1-row min/max bounds))
    "q22_dormant_customers": {"BNLJ"},  # crossJoin(broadcast(1-row avg-balance threshold))
    "analytics_rfm": {"BNLJ"},       # crossJoin(broadcast(1-row horizon / quintile bounds))
    "ml_naive_bayes": {"BNLJ"},      # crossJoin(broadcast(5-row lang priors, 1-row vocab/total))
    "graph_triangle_count": {"BNLJ"},  # crossJoin(broadcast(1-row edge/wedge counters))
    "layout_zorder": {"BNLJ"},       # crossJoin(broadcast(1-row key bounds / match count))
    "text_perplexity_proxy": {"BNLJ"},  # crossJoin(broadcast(1-row corpus total))
    "graph_pagerank": {"BNLJ"},      # crossJoin(broadcast(1-row node count))
    "embedding_mrl_truncate": {"BNLJ"},  # crossJoin(broadcast(5 query vectors))
    "pipeline_temperature_mixture": {"BNLJ"},  # crossJoin(broadcast(1-row totals))
    "ann_ivfpq": {"BNLJ"},           # crossJoin(broadcast(seeds / codebook / 3 queries))
    "events_churn": {"BNLJ"},        # crossJoin(broadcast(1-row corpus horizon))
    "q11_important_parts": {"BNLJ"},  # crossJoin(broadcast(1-row decimal total))
    "text_tfidf": {"BNLJ"},          # crossJoin(broadcast(1-row corpus size))
}


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(key: str, df) -> list[str]:
    plan = plan_of(df)
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNLJ")
    if "BatchEvalPython" in plan:
        flags.append("PY_ROW")
    return flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    bad = 0
    for key in sorted(queries):
        try:
            flags = audit(key, queries[key](spark, args.sf))
        except Exception as e:  # plan build only; execution not needed
            print(f"[ERR ] {key}: {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        undeclared = [f for f in flags if f not in DECLARED.get(key, set())]
        if undeclared:
            print(f"[FLAG] {key}: {','.join(undeclared)}")
            bad += 1
        elif flags:
            print(f"[ok* ] {key}: declared {','.join(flags)}")
        else:
            print(f"[ok  ] {key}")
    print(f"\n{bad} undeclared-flag keys")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
