"""Isolated timing probe for round-14 optimization work.

    python tools/probe_r14.py q_a q_b ...            # sf0.1, 4 reps, min
    SPARK_GRAFT_PROBE_REPS=6 python tools/probe_r14.py q_a

Runs the named queries in one session after the same shared-memo
warmup bench.py uses (so the timed number is the steady-state serving
path, comparable to BENCH_FULL), 4 reps each, and prints min/all.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "4"))

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.session import get_spark

    spark = get_spark("probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    qs["q_extremes"](spark, sf).collect()
    # minimal targeted warm: build any session memos the probed queries
    # use by running each query once untimed first (memo builds happen
    # on first call; bit-identical results either way)
    for n in names:
        try:
            qs[n](spark, sf).collect()
        except Exception as e:
            print(f"warm {n} FAILED: {e}", file=sys.stderr)
    for n in names:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[n](spark, sf).collect()
            times.append(time.perf_counter() - t0)
        print(
            f"{n}: min={min(times):.3f} all={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
