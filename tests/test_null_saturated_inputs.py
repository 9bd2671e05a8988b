"""NULL-saturated corpus robustness (new r13): every registered query
must match its oracle on a corpus where ~1-in-7 MEASURE values are NULL
— the condition a 100 TB lake hits routinely (failed parses, sensor
gaps, crawls with no body, embeds that errored) — the sibling regime to
the r12 empty-corpus sweep.

Why this regime exists: NULL semantics are the classic Spark-vs-DuckDB
divergence surface — default null ORDER in sorts/limits (Spark ASC is
nulls-first, DuckDB is nulls-last), concat vs concat_ws, count_if over
all-NULL groups, corr/regr pair deletion, array lambdas over NULL
arrays. Aggregates both engines define identically (SUM/AVG skip NULLs)
pass for free; anything relying on an engine DEFAULT surfaces here.

Design: keys, dates, and group-label columns stay non-NULL (they are
ingest-constrained in a real lake and NULLing them only exercises
GROUP-BY-NULL, which both engines define identically); the mask hits
the measure/payload columns via a deterministic per-(row, column) hash
so the fixture is reproducible within a session. Every fix this sweep
forces must be a no-op on NULL-free data (explicit null ordering,
COALESCE on all-NULL aggregates, IS NOT NULL guards that clean data
already satisfies) — the same contract the empty sweep established.

TIMINGS hygiene: same snapshot/restore as test_degenerate_inputs so
fixture timings never leak into ORACLE_TIMINGS.json's gate-cost model.
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

# measure/payload columns to NULL per table, with the key column the
# deterministic mask is derived from. Keys, dates, and group labels
# (event_type, lang, source, flags, priorities) stay non-NULL.
NULLABLE_MEASURES: dict[str, tuple[str, list[str]]] = {
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice", "p_size"]),
    "orders": ("o_orderkey", ["o_totalprice"]),
    "lineitem": ("l_orderkey", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
    "events": ("event_id", ["value", "props"]),
    "documents": ("doc_id", ["text", "n_chars"]),
    "embeddings": ("vec_id", ["embedding"]),
}
NULL_MOD = 7  # expected NULL density 1/7 per masked column


@pytest.fixture(scope="module", autouse=True)
def _preserve_timings():
    saved = dict(TIMINGS)
    yield
    TIMINGS.clear()
    TIMINGS.update(saved)


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    """sf0.001 tables with deterministic per-(row, column) NULL masks on
    the measure columns (DuckDB COPY — single files for the oracle)."""
    import duckdb

    out = tmp_path_factory.mktemp("sfnull")
    con = duckdb.connect()
    try:
        for t in TABLES:
            src = f"read_parquet('{SRC}/{t}.parquet')"
            if t in NULLABLE_MEASURES:
                key, cols = NULLABLE_MEASURES[t]
                desc = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
                sel = ", ".join(
                    (
                        f"CASE WHEN CAST('0x' || substr(md5({key} || ':{c}'), 1, 8) AS BIGINT)"
                        f" % {NULL_MOD} = 0 THEN NULL ELSE {c} END AS {c}"
                        if c in cols
                        else c
                    )
                    for c, *_ in desc
                )
                q = f"SELECT {sel} FROM {src}"
            else:
                q = f"SELECT * FROM {src}"
            con.execute(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    finally:
        con.close()
    return str(out)


def test_fixture_actually_has_nulls(null_sf):
    import duckdb

    con = duckdb.connect()
    try:
        for t, (key, cols) in NULLABLE_MEASURES.items():
            for c in cols:
                n, nn = con.execute(
                    f"SELECT COUNT(*), COUNT({c}) FROM read_parquet('{null_sf}/{t}.parquet')"
                ).fetchone()
                # the 1/7 hash mask can legitimately miss every row of a
                # tiny table (supplier has 10 rows at sf0.001; (6/7)^10
                # ≈ 0.21) — only tables big enough that an all-clear is
                # implausible ((6/7)^50 ≈ 4e-4) must carry NULLs
                if n >= 50:
                    assert nn < n, f"{t}.{c} mask produced no NULLs"
                assert nn > 0, f"{t}.{c} mask nulled everything"
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_survives_null_saturated_corpus(spark, null_sf, name):
    problems = check_query(spark, null_sf, name)
    assert not problems, f"{name} on NULL-saturated corpus: " + "; ".join(problems)


def test_rows_only_queries_survive_null_saturated_corpus(spark, null_sf):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        QUERIES[name](spark, null_sf).collect()
