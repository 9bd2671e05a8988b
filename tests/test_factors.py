"""Factor-layer unit tests: alpha pipeline checkpoint parity (the
reference's p{N}.parquet resumability, `Project report.md:775-781`) and
golden-formula spot checks on a tiny hand-computable panel."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
# checkpoint-resumability parity can be exercised at any scale, e.g.
# SPARK_GRAFT_CKPT_SF=/root/testdata/sf0.1 for the end-to-end run (kept
# off the default suite for runtime; the sf0.1 run is recorded in the
# round-4 commit message)
SF_CKPT = os.environ.get("SPARK_GRAFT_CKPT_SF", SF)


import pytest


@pytest.mark.full_tier  # ~80 s: builds the alpha DAG twice (r14 smoke split)
def test_alpha_checkpoints_match_unchcked(spark):
    from quantitative_database_and_visualization_platform_spark.factors.alpha101 import (
        ALPHA_COLS,
        with_alphas,
    )
    from quantitative_database_and_visualization_platform_spark.factors.panel import daily_bars

    bars = daily_bars(spark, SF_CKPT)
    tmp = tempfile.mkdtemp(prefix="qdvp_alpha_ckpt_")
    try:
        direct = (
            with_alphas(bars)
            .select("code", "d", *ALPHA_COLS)
            .orderBy("code", "d")
            .toPandas()
        )
        resumed = (
            with_alphas(bars, checkpoint_dir=tmp)
            .select("code", "d", *ALPHA_COLS)
            .orderBy("code", "d")
            .toPandas()
        )
        assert len(direct) == len(resumed) > 0
        pd.testing.assert_frame_equal(direct, resumed)
        # stage files actually exist (resumability artifact)
        stage1 = spark.read.parquet(f"{tmp}/p1.parquet")
        assert stage1.count() == len(direct)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ema_family_golden(spark):
    """MACD diff on a 3-row panel against hand-computed pandas ewm."""
    from quantitative_database_and_visualization_platform_spark.factors.ema_family import (
        with_ema_family,
    )

    pdf = pd.DataFrame(
        {
            "code": [1, 1, 1],
            "d": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]).date,
            "open": [10.0, 11.0, 12.0],
            "high": [11.0, 12.0, 13.0],
            "low": [9.0, 10.0, 11.0],
            "close": [10.0, 11.0, 12.0],
            "volume": [100, 200, 300],
            "amount": [1000.0, 2200.0, 3600.0],
        }
    )
    out = (
        with_ema_family(spark.createDataFrame(pdf))
        .orderBy("d")
        .select("macd_diff", "kdj_j", "force_13")
        .toPandas()
    )
    c = pdf["close"]
    diff = (c.ewm(span=12, adjust=False).mean() - c.ewm(span=26, adjust=False).mean()) * 2
    assert abs(out["macd_diff"][2] - diff[2]) < 1e-12
    # force index seed: first delta defined as 0
    assert out["force_13"][0] == 0.0


def test_gate_min_periods(spark):
    """gate() reproduces pandas min_periods: NULL until the window fills."""
    from quantitative_database_and_visualization_platform_spark.operators import timeseries as ts

    pdf = pd.DataFrame({"e": [1] * 5, "t": range(5), "x": [1.0, 2.0, 3.0, 4.0, 5.0]})
    w = ts.entity_window("e", "t")
    out = (
        spark.createDataFrame(pdf)
        .select("t", ts.gate(ts.ts_mean("x", 3, w), "x", 3, w).alias("m"))
        .orderBy("t")
        .toPandas()
    )
    expected = pdf["x"].rolling(3).mean()  # min_periods defaults to 3
    assert out["m"].isna().tolist() == expected.isna().tolist()
    assert abs(out["m"][4] - expected[4]) < 1e-12
