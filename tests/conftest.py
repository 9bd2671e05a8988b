from __future__ import annotations

import pytest

from quantitative_database_and_visualization_platform_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("qdvp-tests", shuffle_partitions=8)
    yield s


def pytest_sessionfinish(session, exitstatus):
    """Dump per-query Spark/oracle wall-times collected by check_query so
    an oracle-runtime regression is visible before the driver gate runs."""
    import json
    import pathlib

    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import TIMINGS

    if TIMINGS:
        out = pathlib.Path(__file__).resolve().parent.parent / "ORACLE_TIMINGS.json"
        # merge with the existing snapshot: a targeted (-k) run must not
        # clobber the timings of queries it didn't execute
        merged = {}
        try:
            merged = json.loads(out.read_text())
        except Exception:
            pass
        merged.update(TIMINGS)
        # prune entries for renamed/deleted queries so the snapshot cannot
        # accumulate stale timings forever (merge-preserve is only for
        # queries a targeted -k run didn't execute, not for ghosts)
        from quantitative_database_and_visualization_platform_spark.plans import QUERIES

        merged = {k: v for k, v in merged.items() if k in QUERIES}
        out.write_text(json.dumps(dict(sorted(merged.items())), indent=1) + "\n")
