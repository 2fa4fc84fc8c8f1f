"""Capture .explain('formatted') output for named queries.

    python tools/capture_plans.py <out_suffix> [sf_dir] q1 q2 ...

Writes plans/r14/<query>_<out_suffix>.txt for each query. Used for the
round-14 optimization before/after plan evidence.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture must not die on one query
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
