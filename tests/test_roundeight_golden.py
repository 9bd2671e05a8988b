"""Round-8 regression tests: the three r7 ADVICE fixes (Kaplan-Meier
zero-factor guard, versioned_store torn-legacy classification, pair-query
degenerate-panel guards) plus bit-parity of the global_ntile helper
against the window-function NTILE it replaces."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from quantitative_database_and_visualization_platform_spark.operators.relational import global_ntile
from quantitative_database_and_visualization_platform_spark.plans import QUERIES


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# ADVICE r7 #1 (medium): when d == n_risk at the final event time the
# Kaplan-Meier factor is exactly 0 and the curve must be exactly 0 from
# there on. Spark's ln(0) is NULL and F.sum skips NULLs, so the unguarded
# exp-sum form silently returned a nonzero survival. The sandbox testdata
# never fires this (211 censored rows outlast the last event), so build a
# panel with NO censored survivor: every order ships inside the horizon.
# ---------------------------------------------------------------------------
def test_kaplan_meier_survival_exactly_zero_when_risk_set_exhausts(spark, tmp_path):
    sf = str(tmp_path / "km")
    orders = spark.createDataFrame(
        [(k, f"2024-01-0{k}") for k in (1, 2, 3)],
        "o_orderkey long, o_orderdate string",
    ).select("o_orderkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [(1, "2024-01-02"), (2, "2024-01-04"), (3, "2024-01-06")],
        "l_orderkey long, l_shipdate string",
    ).select("l_orderkey", F.col("l_shipdate").cast("timestamp").alias("l_shipdate"))
    _write(orders, os.path.join(sf, "orders.parquet"))
    _write(li, os.path.join(sf, "lineitem.parquet"))
    rows = {r["t_days"]: r for r in QUERIES["kaplan_meier_ship_times"](spark, sf).collect()}
    # lags are 1, 2, 3 days; at t=3 the last at-risk order ships: d == n_risk
    assert set(rows) == {1, 2, 3}
    assert rows[3]["n_events"] == rows[3]["n_risk"] == 1
    assert rows[3]["survival"] == 0.0  # exactly zero, not exp(partial sum)
    # earlier points follow the textbook product: 2/3, 1/3
    assert abs(rows[1]["survival"] - 2 / 3) < 2e-6
    assert abs(rows[2]["survival"] - 1 / 3) < 2e-6


# ---------------------------------------------------------------------------
# ADVICE r7 #2 (low): a torn PRE-versioned legacy overwrite (crash after
# the delete phase) leaves a store directory holding only _temporary /
# _SUCCESS. That is LOSS of committed state, not bootstrap — read_store
# must raise so the sink cannot silently restart a continuous aggregate
# from one batch's delta.
# ---------------------------------------------------------------------------
def test_versioned_store_raises_on_torn_legacy_overwrite(spark, tmp_path):
    from quantitative_database_and_visualization_platform_spark.streaming.versioned_store import read_store

    store = tmp_path / "store"
    store.mkdir()
    (store / "_temporary").mkdir()
    (store / "_SUCCESS").touch()
    with pytest.raises(Exception):
        read_store(spark, str(store))


def test_versioned_store_bootstrap_classification_still_works(spark, tmp_path):
    from quantitative_database_and_visualization_platform_spark.streaming.versioned_store import (
        commit_store,
        read_store,
    )

    # never created -> bootstrap
    assert read_store(spark, str(tmp_path / "nope")) is None
    # orphan _v_* debris from a crashed FIRST commit (never pointed at)
    # -> still bootstrap
    crashed = tmp_path / "crashed"
    (crashed / "_v_000000000001").mkdir(parents=True)
    assert read_store(spark, str(crashed)) is None
    # a real commit round-trips
    ok = tmp_path / "ok"
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    commit_store(df, str(ok), 7)
    got = read_store(spark, str(ok))
    assert got is not None and got.collect() == df.collect()


# ---------------------------------------------------------------------------
# ADVICE r7 #3 (low): the two pair-trading queries index two[0]/two[1]
# after collecting the two lowest codes; a single-code panel must return
# the empty result with the output schema (the oracle side degrades to
# zero rows), not IndexError on the driver.
# ---------------------------------------------------------------------------
def test_pair_queries_empty_on_single_code_panel(spark, tmp_path):
    sf = str(tmp_path / "single")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d} 10:00:00", 1, "trade", 10.0 + d, f"k={i}")
            for i, d in enumerate(range(1, 11), start=1)
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    _write(ev, os.path.join(sf, "events.parquet"))
    lead = QUERIES["leadlag_cross_correlation"](spark, sf)
    assert lead.count() == 0
    assert lead.columns == ["lag", "n", "xcorr"]
    pairs = QUERIES["pairs_spread_zscore"](spark, sf)
    assert pairs.count() == 0
    assert pairs.columns == ["d", "beta", "spread", "zscore"]


# ---------------------------------------------------------------------------
# global_ntile (r8): bit-parity with the window-function NTILE it replaces
# (the SinglePartition WindowExec fix), across ascending / descending /
# PARTITION BY / N<n shapes and a partition count that forces multi-slice
# offsets.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ntile_df(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.choice("abc")) for i in range(1, 1001)]
    return spark.createDataFrame(rows, "k int, v int, g string").repartition(13)


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_global_ntile_matches_window_ntile_asc(ntile_df):
    exp = ntile_df.withColumn("b", F.ntile(5).over(Window.orderBy("v", "k")))
    got = global_ntile(ntile_df, 5, ["v", "k"], out="b")
    assert _same(exp, got)


def test_global_ntile_matches_window_ntile_desc(ntile_df):
    exp = ntile_df.withColumn("b", F.ntile(4).over(Window.orderBy(F.desc("v"), "k")))
    got = global_ntile(ntile_df, 4, [F.desc("v"), F.col("k")], out="b")
    assert _same(exp, got)


def test_global_ntile_matches_partitioned_window_ntile(ntile_df):
    exp = ntile_df.withColumn(
        "b", F.ntile(3).over(Window.partitionBy("g").orderBy("v", "k"))
    )
    got = global_ntile(ntile_df, 3, ["v", "k"], partition_cols=["g"], out="b")
    assert _same(exp, got)


def test_global_ntile_n_larger_than_rows(spark):
    small = spark.createDataFrame([(i, i) for i in range(1, 4)], "k int, v int")
    exp = small.withColumn("b", F.ntile(10).over(Window.orderBy("v", "k")))
    got = global_ntile(small, 10, ["v", "k"], out="b")
    assert sorted(map(tuple, exp.collect())) == sorted(map(tuple, got.collect()))


def test_global_ntile_plans_range_exchange_not_single_partition(ntile_df):
    got = global_ntile(ntile_df, 5, ["v", "k"], out="b")
    plan = got._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan


# ---------------------------------------------------------------------------
# Same degenerate-input class, found by audit (r8): queries that index a
# bounded driver read must degrade to the oracle's zero-row result on
# empty inputs, not TypeError/IndexError on the driver.
# ---------------------------------------------------------------------------
def test_stratified_sample_empty_corpus(spark, tmp_path):
    sf = str(tmp_path / "empty_docs")
    docs = spark.createDataFrame([], "doc_id long, lang string, text string, source string")
    _write(docs, os.path.join(sf, "documents.parquet"))
    out = QUERIES["stratified_sample_balanced"](spark, sf)
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang"]


def test_trade_reachability_empty_graph(spark, tmp_path):
    sf = str(tmp_path / "empty_trade")
    _write(
        spark.createDataFrame(
            [], "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double"
        ),
        os.path.join(sf, "lineitem.parquet"),
    )
    _write(
        spark.createDataFrame([], "o_orderkey long, o_custkey long"),
        os.path.join(sf, "orders.parquet"),
    )
    _write(
        spark.createDataFrame([], "c_custkey long, c_nationkey int"),
        os.path.join(sf, "customer.parquet"),
    )
    _write(
        spark.createDataFrame([], "s_suppkey long, s_nationkey int"),
        os.path.join(sf, "supplier.parquet"),
    )
    out = QUERIES["trade_reachability_hops"](spark, sf)
    assert out.count() == 0
    assert out.columns == ["nationkey", "hops"]
