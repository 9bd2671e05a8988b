"""Opt-in BENCH-SCALE oracle parity: the full-suite sf0.1 sweep as a
reproducible test instead of a one-off script.

The driver's gate verifies values at sf0.01 and test_oracle_parity.py
adds sf0.001 — neither says anything about sf0.1 VALUES, and the round-10
sweep proved that matters: four real divergence classes surfaced only at
bench scale (int64 wrap in day-level OLS moments, global_ntile's
exchange-reuse boundary skew, hurst's zero-close window membership, and
ln(0) error-vs-NULL semantics). Three of the four were SILENT on Spark.

Round 11 removed the alpha-chain exclusion: the pruned-split AND
full-width alpha oracles complete at sf0.1 under the mitigated checker
config (run_oracle: 16 threads + spill; ~100-120 s each), and running
them found — and fixed — three more bench-scale-only divergences, all
the same class: cross-sectional ranks of raw float window outputs whose
tie groups split on engine-order ulp differences (alpha_045's 20-day
mean, alpha_002's log-volume delta, alpha_018's three-term sum; all
pre-rounded to 9dp at creation on both engines now, the established
rank-input convention).

Run with::

    SPARK_GRAFT_SWEEP_SF01=1 python -m pytest tests/test_oracle_parity_sf01.py -q

Skipped by default: the sweep adds ~45 quiet-host minutes to the suite.
"""

from __future__ import annotations

import os

import pytest

from quantitative_database_and_visualization_platform_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SWEEP_SF01"),
    reason="bench-scale sweep is opt-in: SPARK_GRAFT_SWEEP_SF01=1",
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_sf01_parity(spark, name):
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import check_query

    problems = check_query(spark, SF, name)
    assert not problems, problems
    assert name in QUERIES


@pytest.mark.parametrize("name", ["alpha101_subset", "alpha_ic_scan"])
def test_sf01_full_width_alpha_parity(spark, name):
    """The two rows-only gate entries get their FULL-WIDTH oracle
    comparison at bench scale here (same mitigated-config run_oracle
    path test_oracle_parity.py uses at sf0.001/0.01) — at sf0.1 each
    oracle runs ~95-120 s."""
    from quantitative_database_and_visualization_platform_spark.plans.alpha_queries import PYTEST_ONLY_ORACLES
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import compare, run_oracle
    from quantitative_database_and_visualization_platform_spark.session import release_managed

    try:
        sdf = QUERIES[name](spark, SF).toArrow()
    finally:
        release_managed()
    odf = run_oracle(SF, PYTEST_ONLY_ORACLES[name])
    problems = compare(sdf, odf)
    assert not problems, problems
