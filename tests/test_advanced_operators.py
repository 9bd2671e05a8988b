"""Operator-level tests for the advanced relational operators (as-of
join, band self-join, FINAL dedup, KMV sketch): semantics the oracle
parity suite can't isolate — tolerance behavior, plan shape, and the
brute-force equivalence of the binned band join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quantitative_database_and_visualization_platform_spark.operators.relational import (
    asof_join,
    band_self_join,
    latest_row_per_key,
)
from quantitative_database_and_visualization_platform_spark.pipeline.sketches import (
    kmv_distinct_estimate,
)

SF = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.mark.full_tier  # r14 smoke split (see conftest)
def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2024-01-10T00:00:00"), name="exact-match"),
            Row(k=1, t=_ts("2024-01-11T12:00:00"), name="between"),
            Row(k=1, t=_ts("2024-01-01T00:00:00"), name="before-first"),
            Row(k=2, t=_ts("2024-01-10T00:00:00"), name="other-key"),
            Row(k=3, t=_ts("2024-01-10T00:00:00"), name="no-right-rows"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=_ts("2024-01-05T00:00:00"), px=5.0),
            Row(k=1, rt=_ts("2024-01-10T00:00:00"), px=10.0),
            Row(k=1, rt=_ts("2024-01-12T00:00:00"), px=12.0),
            Row(k=2, rt=_ts("2024-01-09T00:00:00"), px=9.0),
        ]
    )
    out = {
        r["name"]: r
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt", payload=["px"]
        ).collect()
    }
    assert out["exact-match"]["asof_px"] == 10.0  # <= includes the equal timestamp
    assert out["between"]["asof_px"] == 10.0  # backward: latest earlier, not nearest
    assert out["before-first"]["asof_px"] is None  # LEFT: no earlier right row
    assert out["other-key"]["asof_px"] == 9.0  # keys never bleed
    assert out["no-right-rows"]["asof_px"] is None
    assert len(out) == 5  # every left row survives exactly once


@pytest.mark.full_tier  # r14 smoke split (see conftest)
def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=_ts("2024-01-10T00:00:00"), name="stale")]
    )
    right = spark.createDataFrame([Row(k=1, rt=_ts("2024-01-01T00:00:00"), px=1.0)])
    no_tol = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload=["px"]
    ).collect()[0]
    assert no_tol["asof_px"] == 1.0
    with_tol = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        payload=["px"],
        tolerance_seconds=24 * 3600,  # 9 days stale > 1 day tolerance
    ).collect()[0]
    assert with_tol["asof_px"] is None
    assert with_tol["asof_time"] is None


def test_asof_join_matches_whole_rows_atomically(spark):
    """A matched right row holding a NULL in one payload column must emit
    that NULL — NOT inherit the column's value from an OLDER right row
    (per-column last() carries would mix columns of different rows)."""
    left = spark.createDataFrame([Row(k=1, t=_ts("2024-01-10T00:00:00"))])
    right = spark.createDataFrame(
        [
            Row(k=1, rt=_ts("2024-01-05T00:00:00"), px=5.0, qty=50.0),
            # the matching row: qty is NULL and must STAY NULL
            Row(k=1, rt=_ts("2024-01-09T00:00:00"), px=9.0, qty=None),
        ]
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload=["px", "qty"]
    ).collect()[0]
    assert out["asof_px"] == 9.0
    assert out["asof_qty"] is None, "NULL payload column inherited from an older row"
    assert out["asof_time"] == _ts("2024-01-09T00:00:00")


def test_asof_join_rejects_colliding_payload_names(spark):
    left = spark.createDataFrame([Row(k=1, t=_ts("2024-01-10T00:00:00"), px=1.0)])
    right = spark.createDataFrame([Row(k=1, rt=_ts("2024-01-05T00:00:00"), px=5.0)])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", right_time="rt", payload=["px"])


def test_band_self_join_equals_brute_force(spark):
    part = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_retailprice")
    band = 0.5
    binned = band_self_join(part, key="p_partkey", value="p_retailprice", band=band)
    got = {(r["a_key"], r["b_key"]) for r in binned.collect()}
    a, b = part.alias("a"), part.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (F.abs(F.col("a.p_retailprice") - F.col("b.p_retailprice")) <= band),
        )
        .select(F.col("a.p_partkey").alias("ak"), F.col("b.p_partkey").alias("bk"))
        .collect()
    )
    expected = {(r["ak"], r["bk"]) for r in brute}
    assert got == expected
    assert len(got) > 0  # the band is wide enough to produce pairs


def test_band_self_join_plans_no_nested_loop(spark):
    part = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_retailprice")
    plan = (
        band_self_join(part, key="p_partkey", value="p_retailprice", band=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan[:3000]
    assert "Cartesian" not in plan, plan[:3000]


def test_latest_row_per_key_ties_break_deterministically(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=1, payload="old"),
            Row(k=1, v=2, payload="tie-low"),
            Row(k=1, v=2, payload="tie-high"),
        ]
    )
    out = latest_row_per_key(
        df, key=["k"], version=[F.col("v"), F.col("payload")]
    ).collect()
    assert len(out) == 1
    assert out[0]["payload"] == "tie-low"  # desc on payload: 'tie-low' > 'tie-high'


def test_connected_components_chains_and_islands(spark):
    from quantitative_database_and_visualization_platform_spark.pipeline.dedup import (
        connected_components,
    )
    from quantitative_database_and_visualization_platform_spark.session import release_managed

    # chain 1-2-3-4 (pairwise links only), star 10-(11,12,13), island pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        ["a_id", "b_id"],
    )
    try:
        got = {
            r["doc_id"]: r["component"] for r in connected_components(pairs).collect()
        }
    finally:
        release_managed()
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


@pytest.mark.full_tier  # r14 smoke split (see conftest)
def test_connected_components_multi_partition_no_duplicate_rows(spark):
    """Force the >1-edge-partition path (production shape at >500k edges)
    on a chain graph: every node must appear EXACTLY once with the chain
    minimum as its label — a node union-found in several partitions used
    to emit one row per partition (r6 ADVICE high)."""
    from quantitative_database_and_visualization_platform_spark.pipeline.dedup import (
        connected_components,
    )
    from quantitative_database_and_visualization_platform_spark.session import release_managed

    n = 300  # chain 0-1-...-300 plus an island pair, split across ~30 parts
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(1000, 1001)], ["a_id", "b_id"]
    )
    try:
        rows = connected_components(pairs, edges_per_partition=10).collect()
    finally:
        release_managed()
    labels = [(r["doc_id"], r["component"]) for r in rows]
    assert len(labels) == len(set(d for d, _ in labels)) == n + 3
    assert dict(labels) == {**{i: 0 for i in range(n + 1)}, 1000: 1000, 1001: 1000}


def test_kmv_estimate_is_exact_below_k(spark):
    df = spark.range(0, 40).select(
        F.lit("g").alias("g"), (F.col("id") % 37).alias("x")
    )
    out = kmv_distinct_estimate(df, group="g", element="x", k=64).collect()[0]
    assert out["kmv_k"] == 37
    assert out["kmv_estimate"] == 37.0  # below k the sketch IS the exact count


def test_kmv_estimate_accuracy_above_k(spark):
    df = spark.range(0, 20000).select(
        F.lit("g").alias("g"), (F.col("id") % 10000).alias("x")
    )
    out = kmv_distinct_estimate(df, group="g", element="x", k=256).collect()[0]
    assert out["kmv_k"] == 256
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(out["kmv_estimate"] - 10000) / 10000 < 0.25


def test_cms_upper_bound_and_mergeability(spark):
    from quantitative_database_and_visualization_platform_spark.pipeline.sketches import (
        cms_build,
        cms_query,
    )

    df = spark.range(0, 5000).select((F.col("id") % 123).alias("x"))
    sketch = cms_build(df, "x")
    probes = df.filter(F.col("x") < 10).distinct()
    est = {r["x"]: r["cms_estimate"] for r in cms_query(sketch, probes, "x").collect()}
    true = {
        r["x"]: r["c"]
        for r in df.filter(F.col("x") < 10).groupBy("x").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # CMS never under-counts
    assert all(est[k] >= true[k] for k in true)
    # mergeability: sum of per-half sketches == sketch of the union
    a = cms_build(spark.range(0, 2500).select((F.col("id") % 123).alias("x")), "x")
    b = cms_build(spark.range(2500, 5000).select((F.col("id") % 123).alias("x")), "x")
    merged = (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["r"], r["b"]): r["cnt"] for r in sketch.collect()}
    got = {(r["r"], r["b"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_sample_frames_skips_degenerate_payloads(spark):
    """n_frames NULL or < 1 must yield ZERO frame rows — not a fabricated
    frame_idx-0 row with NULL offset/size."""
    from quantitative_database_and_visualization_platform_spark.pipeline.multimodal import (
        sample_frames,
    )

    decoded = spark.createDataFrame(
        [
            Row(doc_id=1, n_frames=0, n_bytes=100),
            Row(doc_id=2, n_frames=None, n_bytes=100),
            Row(doc_id=3, n_frames=4, n_bytes=100),
        ]
    )
    out = sample_frames(decoded, k=3).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert all(r["frame_offset"] is not None and r["frame_nbytes"] is not None for r in out)


def test_asof_join_rejects_reserved_payload_names(spark):
    """Payload columns in the __ scratch namespace would collide with the
    implementation's struct fields (__rt especially, silently corrupting
    asof_time) — must raise, not mis-bind."""
    left = spark.createDataFrame([Row(k=1, t=_ts("2024-01-10T00:00:00"))])
    right = spark.createDataFrame(
        [Row(k=1, rt=_ts("2024-01-05T00:00:00"), __rt=1.0, px=5.0)]
    )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="k", left_time="t", right_time="rt",
                  payload=["__rt", "px"])
