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

# every query with no driver correctness row in any of rounds 1-4
# (CORRECTNESS_r0*.json ∪ = the first 50 names of the r1-r4 registration
# order; these were positions 51-93)
NEVER_DRIVER_VERIFIED = [
    "tick_bars_minute",
    "catalog_introspection",
    "scalar_function_surface",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_analysis",
    "embedding_topk",
    "embedding_ann_srp",
    "embedding_ann_ivf",
    "corpus_curation",
    "embedding_neardup",
    "text_tfidf_topk",
    "dedup_connected_components",
    "cms_heavy_hitters",
    "dataset_split_train_val",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_frame_sample",
    "asof_join_latest_order",
    "range_join_price_band",
    "latest_event_per_user",
    "pivot_event_matrix",
    "rollup_priority_status",
    "grouping_sets_priority_status",
    "kmv_distinct_sketch",
    "sliding_window_stats",
    "fuzzy_join_part_names",
    "funnel_conversion",
    "json_props_stats",
    "window_function_surface",
    "set_ops_customer_pools",
    "incremental_rollup_maintenance",
    "backtest_decile_longshort",
    "market_index_history",
    "stock_available_range",
    "prev_trading_date",
    "yesterday_winners_performance",
    "winsorize_returns",
    "range_window_dollar_volume",
    "rolling_beta_market",
    "backtest_drawdown",
]


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
    outside = [n for n in NEVER_DRIVER_VERIFIED if n not in GATE_FIRST]
    assert outside == []


def test_oracle_order_mirrors_query_order():
    """Driver may iterate either dict; both must agree on the window."""
    q_order = [n for n in QUERIES if n in ORACLES]
    assert q_order == list(ORACLES)


@pytest.mark.parametrize("name", GATE_FIRST)
def test_window_query_returns_only_scalar_columns(spark, name):
    """Schema-only check (plan analysis, no job): the driver's pandas
    canonicalizer sort/hashes cell values, so ARRAY/MAP/STRUCT columns
    crash it (r4 kpl_ladder). Every window query must emit flat scalars.
    """
    df = QUERIES[name](spark, SF_SMOKE)
    nested = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert nested == [], f"{name} emits nested columns {nested}"
