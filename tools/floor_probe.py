"""Decompose the per-query fixed floor: construction vs planning vs execution.

Usage: python tools/floor_probe.py [n_iters] [query ...]

For each named query (default: a spread of cheap floor-dominated ones),
runs n_iters warm iterations and reports median seconds in three phases:
  build  — Python-side DataFrame construction (py4j + analysis)
  plan   — force executedPlan (optimizer + physical planning)
  exec   — noop write (job scheduling + compute)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.session import (
    get_spark,
    release_managed,
)

DEFAULT = [
    "point_lookup",
    "global_market_stats",
    "data_quality_checks",
    "langid_confusion",
    "forecast_eval_naive",
    "cohort_retention_matrix",
]


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 7
    names = args[1:] if args and args[0].isdigit() else (args or DEFAULT)
    names = names or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qdvp-floor-probe")
    # warmup
    QUERIES["global_market_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        builds, plans, execs = [], [], []
        for _ in range(n):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            execs.append(t3 - t2)
            release_managed()
        med = statistics.median
        print(
            f"{name:32s} build={med(builds):6.3f}  plan={med(plans):6.3f}  "
            f"exec={med(execs):6.3f}  total={med(builds)+med(plans)+med(execs):6.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
