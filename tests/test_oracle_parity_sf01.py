"""Opt-in BENCH-SCALE oracle parity: the full-suite sf0.1 sweep as a
reproducible test instead of a one-off script.

The driver's gate verifies values at sf0.01 and test_oracle_parity.py
adds sf0.001 — neither says anything about sf0.1 VALUES, and the round-10
sweep proved that matters: four real divergence classes surfaced only at
bench scale (int64 wrap in day-level OLS moments, global_ntile's
exchange-reuse boundary skew, hurst's zero-close window membership, and
ln(0) error-vs-NULL semantics). Three of the four were SILENT on Spark.

Run with::

    SPARK_GRAFT_SWEEP_SF01=1 python -m pytest tests/test_oracle_parity_sf01.py -q

Skipped by default: the sweep adds ~25 quiet-host minutes to the suite.
The 101-alpha chains stay excluded as the documented DuckDB resource
cliff (their values are pytest-verified at sf0.001/0.01 via the pruned
splits).
"""

from __future__ import annotations

import os

import pytest

from quantitative_database_and_visualization_platform_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"

# DuckDB resource cliff at sf0.1 (the alpha CTE chains); values are
# covered at sf0.001/0.01 by test_oracle_parity.py
HEAVY_EXCLUDED = {
    "alpha101_a",
    "alpha101_b",
    "alpha101_c",
    "alpha101_d",
    "alpha_ic_gate",
    "alpha_ic_b",
    "alpha_ic_c",
    "alpha_ic_d",
    "rank_ic_matrix",
    "alpha_ic_scan",
    "alpha101_subset",
}

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF01"),
    reason="bench-scale sweep is opt-in: SPARK_GRAFT_SWEEP_SF01=1",
)


@pytest.mark.parametrize(
    "name", [n for n in sorted(QUERIES) if n not in HEAVY_EXCLUDED]
)
def test_sf01_parity(spark, name):
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import check_query

    problems = check_query(spark, SF, name)
    assert not problems, problems
    assert name in QUERIES
