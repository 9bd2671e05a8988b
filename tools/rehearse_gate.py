"""Rehearse the driver's correctness gate: run every GATE_FIRST query
against its oracle in ONE hostile session (8 GB heap, non-UTC driver
TZ, sf0.01) — the conditions the round driver gates under.

Usage: python tools/rehearse_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__  # noqa: F401  (driver import path)
    from quantitative_database_and_visualization_platform_spark.plans import GATE_FIRST
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import check_query

    t0 = time.time()
    bad = []
    n = len(GATE_FIRST)
    for i, name in enumerate(GATE_FIRST, 1):
        t = time.time()
        problems = check_query(spark, sf, name)
        status = "OK" if not problems else f"FAIL {problems}"
        print(f"[{i:2d}/{n}] {name}: {status} ({time.time()-t:.1f}s)", flush=True)
        if problems:
            bad.append(name)
    print(f"{n - len(bad)}/{n} green in {time.time()-t0:.0f}s")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
