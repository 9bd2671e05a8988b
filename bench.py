"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is executed to completion with a noop sink (full computation,
no driver-side materialization cost), timed individually. A warmup query
runs first so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from quantitative_database_and_visualization_platform_spark.plans import QUERIES
from quantitative_database_and_visualization_platform_spark.session import (
    get_spark,
    release_managed,
)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return -1.0


def _execute(df) -> None:
    # noop sink: full execution of the plan without collecting to driver
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qdvp-bench")
    names = sys.argv[1:] or sorted(QUERIES)

    # warmup: cheap query to absorb JVM + codegen + parquet-footer startup
    _execute(QUERIES["global_market_stats"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            _execute(QUERIES[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"# bench error in {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # drop per-query managed caches so a 55-query session does not
            # accumulate cached blocks (the shared alpha table is exempt)
            release_managed()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
