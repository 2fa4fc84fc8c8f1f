#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is collected (full materialization) and timed wall-clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from corrie_spark.session import get_spark
    from corrie_spark.queries.registry import all_queries

    spark = get_spark("corrie-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    timings: dict[str, float] = {}
    # warm the JVM/session on the smallest query first (not timed)
    queries["q_extremes"](spark, sf_dir).collect()

    t_all = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # one broken query must not sink the run
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(time.perf_counter() - t_all, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
