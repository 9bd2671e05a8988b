"""Mirror of the driver's correctness gate: every registered query must
match its DuckDB oracle on row count, schema, and values (SURVEY.md §5.1).

Runs at sf0.01 — the driver's gate scale — so data-dependent failures
(e.g. a zero-variance rolling window that sf0.001 happens not to contain)
surface here first. Override with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.001
for a faster smoke loop.
"""

from __future__ import annotations

import os

import pytest

from quantitative_database_and_visualization_platform_spark.plans import ORACLES, QUERIES
from quantitative_database_and_visualization_platform_spark.plans.oracle_check import check_query

SF_TEST = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, SF_TEST, name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_is_flagged():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # non-SQL-expressible ops are allowed to omit the oracle; keep the
    # list explicit so additions are deliberate
    allowed_rows_only = set()
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver contract: entry() must produce rows
    assert "sector_name" in df.columns
