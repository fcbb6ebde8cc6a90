"""Per-round benchmark harness.

Runs the headline queries (``bench=True`` in the registry) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is fully executed (collected — results are small aggregates /
top-k) after a warm-up of the session JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cs_tutorial_reporting_spark.queries import QUERIES
    from cs_tutorial_reporting_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/codegen warm-up on a trivial action so q1 doesn't pay startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    names = [n for n, q in QUERIES.items() if q.bench] or list(QUERIES)
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        # best-of-4: the first execution pays whole-stage-codegen compile
        # and C2 JIT tiering (measured 2-6x the steady state), and timings
        # keep dropping through ~4 reps; best-of-2 sampled that warm-up
        # slope and produced phantom round-over-round "regressions"
        # (r1->r2 dedup_exact_docs +30% with identical code). The min of
        # 4 sits on the steady-state floor.
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
