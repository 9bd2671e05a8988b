"""Degenerate-input robustness (new r12): every registered query must
survive an EMPTY corpus — the condition every 100 TB pipeline hits on
some slice (a new partition, a filtered shard, a source with no data
yet) — and still match its oracle on it.

The first run of this sweep found 10 real defects/divergences:
driver-side crashes in the corpus-sized operators
(planes_for_corpus(0) ValueError in embedding_neardup /
embedding_dbscan_sized, a 1/n_nodes ZeroDivision in
pagerank_nation_trade), three NULL-vs-0 oracle divergences (DuckDB's
count_if is NULL over zero rows, Spark's is 0 — global_market_stats,
multi_scalar_subquery, minhash_pr_audit), a phantom 3-row report from
an all-NULL global aggregate (join_skew_report), a disappearing
threshold grid (neardup_threshold_sweep), and the Spark-vs-standard
grouping-sets semantics (cube/rollup emit NO rows over an empty
relation in Spark while DuckDB emits the () grand-total row — pinned
to Spark's contract via HAVING COUNT(*) > 0 in the two oracles).

TIMINGS hygiene: check_query records per-query wall times that
conftest merges into ORACLE_TIMINGS.json (the gate-window cost model);
empty-input timings must never leak into it, so the module snapshots
and restores the TIMINGS dict.
"""

from __future__ import annotations

import pytest

from quantitative_database_and_visualization_platform_spark.plans import ORACLES, QUERIES
from quantitative_database_and_visualization_platform_spark.plans.oracle_check import (
    TIMINGS,
    check_query,
)
from quantitative_database_and_visualization_platform_spark.sources.catalog import TABLES

# exhaustive 293-query sweep: builder tier (r14 smoke split, see conftest)
pytestmark = pytest.mark.full_tier

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _preserve_timings():
    saved = dict(TIMINGS)
    yield
    TIMINGS.clear()
    TIMINGS.update(saved)


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Schema-identical 0-row single-file parquet tables (DuckDB COPY —
    the oracle reads single files, not Spark part-directories)."""
    import duckdb

    out = tmp_path_factory.mktemp("sfempty")
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0)"
                f" TO '{out}/{t}.parquet' (FORMAT PARQUET)"
            )
    finally:
        con.close()
    return str(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_survives_empty_corpus(spark, empty_sf, name):
    problems = check_query(spark, empty_sf, name)
    assert not problems, f"{name} on empty corpus: " + "; ".join(problems)


def test_rows_only_queries_survive_empty_corpus(spark, empty_sf):
    """The two rows-only entries have no oracle; they must still build
    and execute (their check_query path asserts non-empty output, which
    an empty corpus legitimately violates)."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        QUERIES[name](spark, empty_sf).collect()
