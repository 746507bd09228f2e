"""Physical-plan audit over the whole query registry.

Plans (does NOT execute) every registered query at sf0.01 and tabulates the
scale-relevant plan features into PLANS.md: parquet scans, shuffle
exchanges, Python eval nodes, window/sort-merge/broadcast operators, and —
most importantly — cartesian products and nested-loop joins, which are the
two shapes that cannot survive 100 TB.  The per-query invariant ("no
cartesian anywhere, BNLJ only with a 1-row/labeled build side") is enforced
in tests/test_plan_shape.py::test_no_cartesian_products_anywhere; this
script is the human-readable evidence behind it.

Usage: python scripts/plan_audit.py [SF_DIR] (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from liatrio_otel_collector_spark.entry_queries import QUERIES
    from liatrio_otel_collector_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    t0 = time.time()
    for name, fn in QUERIES.items():
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append(
            {
                "query": name,
                "scans": plan.count("FileScan parquet"),
                "exchanges": plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning")
                + plan.count("Exchange SinglePartition"),
                "broadcasts": plan.count("BroadcastExchange"),
                "smj": plan.count("SortMergeJoin"),
                "bhj": plan.count("BroadcastHashJoin"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "cartesian": plan.count("CartesianProduct"),
                "python": plan.count("EvalPython"),
                "windows": plan.count("Window ["),
            }
        )
    elapsed = time.time() - t0
    spark.stop()

    hdr = ["query", "scans", "exchanges", "broadcasts", "bhj", "smj", "bnlj", "cartesian", "python", "windows"]
    lines = [
        "# PLANS — physical-plan audit of the full query registry",
        "",
        f"Planned (not executed) at `{sf}`; {len(rows)} queries in "
        f"{elapsed:.0f}s. Regenerate: `python scripts/plan_audit.py`.",
        "",
        "Columns: parquet scans / shuffle exchanges / broadcast exchanges /",
        "broadcast-hash joins / sort-merge joins / broadcast-nested-loop",
        "joins / cartesian products / Python eval nodes / window operators.",
        "Pre-AQE plans: runtime ReusedExchange dedup (dd9/ts9/ts10) and",
        "SMJ→BHJ demotions are NOT reflected, so shuffle/scan counts here",
        "are upper bounds.  `cartesian` must be 0 everywhere; `bnlj` > 0",
        "only for labeled 1-row-build or exact-baseline cases",
        "(enforced: tests/test_plan_shape.py::test_no_cartesian_products_anywhere).",
        "",
        "| " + " | ".join(hdr) + " |",
        "|" + "---|" * len(hdr),
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(r[h]) for h in hdr) + " |")
    flagged = [r["query"] for r in rows if r["cartesian"]]
    bnlj = [r["query"] for r in rows if r["bnlj"]]
    lines += [
        "",
        f"Cartesian products: {flagged or 'none'}.",
        f"Nested-loop joins: {bnlj or 'none'}.",
        "",
    ]
    out = os.path.join(_REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(out, f"({len(rows)} queries, cartesian={flagged}, bnlj={bnlj})")


if __name__ == "__main__":
    main()
