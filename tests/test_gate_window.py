"""Gate-window insurance (round-5 verdict item 8).

The round driver hash-verifies only the first ``GATE_WINDOW`` registered
queries (CORRECTNESS_r0{1..4}.json each hold exactly the first 50
registration-order names), and its pandas canonicalizer cannot hash
nested cells (the r4 ``kpl_ladder`` TypeError on an ARRAY column). These
tests red-line both constraints plus the round-5 window contents: every
window slot must carry an oracle (no rows-only slots burned) and every
query that had never had a driver row through round 4 must sit inside
the window.
"""

from __future__ import annotations

import pytest

from quantitative_database_and_visualization_platform_spark.plans import (
    GATE_FIRST,
    GATE_WINDOW,
    ORACLES,
    QUERIES,
)

SF_SMOKE = "/root/testdata/sf0.001"

# every query with no driver correctness row in any of rounds 1-13
# (CORRECTNESS_r0{1..13}.json union: cusum_break_stat took r13 window
# slot 1 and passed, closing the last gap — every registered query now
# carries a cumulative driver row). Each would have to sit in the r14
# window OR in the explicitly-queued next-round spill.
NEVER_DRIVER_VERIFIED: list[str] = []

# round-15 spill: queries ADDED in round 14 after the 50-slot window
# was pinned; must stay in sync with the queue comment in
# plans/__init__.py — they take the FIRST slots of the r15 window.
# (r14 is an optimization round: registrations are frozen, so empty.)
QUEUED_NEXT_ROUND: list[str] = []


def test_window_is_pinned_and_full():
    names = list(QUERIES)
    assert len(GATE_FIRST) == GATE_WINDOW
    assert names[:GATE_WINDOW] == GATE_FIRST


def test_every_window_slot_has_an_oracle():
    """No rows-only query may burn a driver-verifiable slot (r4 burned
    two on alpha_ic_scan/alpha101_subset)."""
    rows_only = [n for n in GATE_FIRST if n not in ORACLES]
    assert rows_only == []


def test_never_verified_queries_are_inside_window():
    """Every never-driver-verified query is either in this round's window
    or explicitly queued for the next — none may silently fall through."""
    outside = [
        n
        for n in NEVER_DRIVER_VERIFIED
        if n not in GATE_FIRST and n not in QUEUED_NEXT_ROUND
    ]
    assert outside == []
    # the spill is an exception list, not a parking lot: nothing queued
    # may also occupy a window slot, and the window must be FULL of
    # never-verified queries while any remain outside
    assert not set(QUEUED_NEXT_ROUND) & set(GATE_FIRST)
    if len(NEVER_DRIVER_VERIFIED) > len(GATE_FIRST):
        assert all(n in NEVER_DRIVER_VERIFIED for n in GATE_FIRST)


def test_oracle_order_mirrors_query_order():
    """Driver may iterate either dict; both must agree on the window."""
    q_order = [n for n in QUERIES if n in ORACLES]
    assert q_order == list(ORACLES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_has_no_timestamptz(name):
    """Schema-only check (LIMIT 0, no execution): DuckDB's
    ``to_timestamp(epoch)`` silently returns TIMESTAMP WITH TIME ZONE,
    which the driver compares tz-aware against Spark's naive timestamps
    and fails schema_match (the r5 ``sliding_window_stats`` red row).
    Red-line every oracle, not just the window — all rotate through
    eventually. Same class as the ARRAY-column rule below."""
    import duckdb
    import pyarrow as pa

    from quantitative_database_and_visualization_platform_spark.sources.catalog import TABLES

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{t}.parquet')"
            )
        schema = con.execute(
            f"SELECT * FROM ({ORACLES[name]}) AS __q LIMIT 0"
        ).arrow().schema
    finally:
        con.close()
    tz_aware = [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.tz is not None
    ]
    assert tz_aware == [], f"{name} oracle emits TIMESTAMPTZ columns {tz_aware}"


def test_compare_rejects_tzaware_oracle():
    """Harness self-test: a deliberately tz-broken oracle must fail the
    LOCAL mirror, not only the driver. Before this round, ``_encode``
    stripped tzinfo so identical instants passed pytest while the driver
    flagged the schema (the r5 ``sliding_window_stats`` hidden failure)."""
    import datetime as dt

    import pyarrow as pa

    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import compare

    naive = pa.table({"t": pa.array([dt.datetime(2020, 1, 1)], pa.timestamp("us"))})
    aware = pa.table(
        {"t": pa.array([dt.datetime(2020, 1, 1)], pa.timestamp("us", tz="UTC"))}
    )
    # naive both sides: fine
    assert compare(naive, naive) == []
    # tz-aware SPARK side (the toArrow artifact of an instant TIMESTAMP
    # output): flagged since r12 — an instant's exported value shifts
    # with the session TZ, so it only matches its oracle under UTC
    problems = compare(aware, naive)
    assert problems and "session-TZ-dependent" in problems[0]
    # tz-aware ORACLE: schema error even though the instants are identical
    problems = compare(naive, aware)
    assert problems and "TIMESTAMPTZ" in problems[0]


@pytest.mark.parametrize("name", GATE_FIRST)
def test_window_query_returns_only_scalar_columns(spark, name):
    """Schema-only check (plan analysis, no job): the driver's pandas
    canonicalizer sort/hashes cell values, so ARRAY/MAP/STRUCT columns
    crash it (r4 kpl_ladder). Every window query must emit flat scalars.

    Also red-lined here: no INSTANT-typed timestamp column (plain
    TIMESTAMP, not NTZ) — an instant derived from the NTZ event-time
    source renders through the session time zone, so its exported value
    depends on the driver's TZ (the r12 hostile-TZ sweep caught five
    queries shifting by the session offset; all event-time outputs are
    TIMESTAMP_NTZ now)."""
    df = QUERIES[name](spark, SF_SMOKE)
    nested = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert nested == [], f"{name} emits nested columns {nested}"
    instants = [
        f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp"
    ]
    assert instants == [], f"{name} emits session-TZ-dependent columns {instants}"


def test_duplicate_registration_raises():
    """Registration is a plain dict, so a name collision used to silently
    REPLACE an already-gated query (round 12 briefly shadowed the r8/r9
    variance_ratio_test / mean_reversion_halflife with new definitions;
    only a downstream golden caught it). The registry must fail at
    import time instead."""
    from quantitative_database_and_visualization_platform_spark.plans.registry import query

    with pytest.raises(ValueError, match="duplicate query registration"):
        @query("pricing_summary")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError
