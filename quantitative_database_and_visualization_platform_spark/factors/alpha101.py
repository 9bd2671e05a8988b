"""Alpha101 pipeline: the reference's 5-stage TS→CS→TS→CS→TS factor DAG
(`Project report.md:739-773`) for a representative alpha subset; formulas
from `database/functions/alpha101_function.md:5-105`.

Implemented alphas (chosen to cover every operator class):
- alpha_101  (close-open)/((high-low)+0.001)            — pure arithmetic
- alpha_012  sign(delta(volume,1)) * -delta(close,1)    — TS delta/sign
- alpha_041  sqrt(high*low) - vwap                       — arithmetic + vwap
- alpha_054  -((low-close)·open^5)/((low-high)·close^5)  — power arithmetic
- alpha_033  rank(-(1 - open/close))                     — single CS rank
- alpha_006  -corr(open, volume, 10)                     — TS correlation
- alpha_003  -corr(rank(open), rank(volume), 10)         — CS rank → TS corr
- alpha_002  -corr(rank(delta(log(volume),2)), rank((close-open)/open), 6)
- alpha_001  rank(ts_argmax(signedpower(ret<0 ? stddev(ret,20) : close, 2), 5)) - 0.5
- alpha_015  -sum(rank(corr(rank(high), rank(volume), 3)), 3)
             — the full P1(TS)→P2(CS)→P3(TS)→P4(CS)→P5(TS) chain

Null conventions (documented, enforced identically in the DuckDB oracle):
- alpha_001's ternary falls back to close when returns or its trailing
  stddev is not yet defined (reference pandas leaves NaN; NaN inside
  rolling argmax is undefined behavior there — we pick the total
  convention so every window input is non-null).
- log(volume) guarded to volume > 0 (DuckDB throws on LN(0)).
- cross-sectional ranks ignore null inputs (rank null, others unshifted).

Scale shape: the stage alternation is exactly two partitioning axes —
every TS column of a stage shares the partitionBy(code) sort, every CS
column shares the partitionBy(date) shuffle. The subset compiles into ONE
lazy plan (4 exchanges for P1..P5); optional parquet checkpoints between
stages mirror the reference's p{N}.parquet resumability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import crosssection as cs
from ..operators import timeseries as ts

ALPHA_COLS = (
    "alpha_001",
    "alpha_002",
    "alpha_003",
    "alpha_004",
    "alpha_005",
    "alpha_006",
    "alpha_008",
    "alpha_009",
    "alpha_010",
    "alpha_011",
    "alpha_012",
    "alpha_013",
    "alpha_014",
    "alpha_015",
    "alpha_016",
    "alpha_017",
    "alpha_018",
    "alpha_019",
    "alpha_020",
    "alpha_021",
    "alpha_022",
    "alpha_023",
    "alpha_024",
    "alpha_025",
    "alpha_026",
    "alpha_027",
    "alpha_028",
    "alpha_030",
    "alpha_032",
    "alpha_033",
    "alpha_034",
    "alpha_035",
    "alpha_037",
    "alpha_038",
    "alpha_040",
    "alpha_041",
    "alpha_043",
    "alpha_044",
    "alpha_045",
    "alpha_046",
    "alpha_053",
    "alpha_054",
    "alpha_057",
    "alpha_060",
    "alpha_084",
    "alpha_101",
)


def with_alphas(bars: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Append the alpha subset to a (code, d, open, high, low, close,
    volume, amount) daily-bar panel via the staged P1–P5 plan."""

    def ckpt(df: DataFrame, stage: str) -> DataFrame:
        if checkpoint_dir is None:
            return df
        path = f"{checkpoint_dir}/{stage}.parquet"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    w = ts.entity_window("code", "d")
    close, open_, high, low = F.col("close"), F.col("open"), F.col("high"), F.col("low")
    vol = F.col("volume")

    # ---- P1: time-series primitives (partitionBy code) ----
    prev_close = ts.delay(close, 1, w)
    ret = close / prev_close - 1
    log_v = F.when(vol > 0, F.log(vol))
    d1 = ts.delta(close, 1, w)
    p1 = bars.select(
        "*",
        d1.alias("d1"),
        ts.delta(close, 7, w).alias("d7"),
        ret.alias("ret"),
        (F.col("amount") / vol).alias("vwap"),
        (log_v - F.lag(log_v, 2).over(w)).alias("dlv2"),
        ((close - open_) / open_).alias("intraday"),
        ts.ts_stddev(ret, 20, w).alias("std20"),
        (F.signum(ts.delta(vol, 1, w)) * (-1 * d1)).alias("alpha_012"),
        (F.sqrt(high * low) - F.col("amount") / vol).alias("alpha_041"),
        (
            (-1 * ((low - close) * F.pow(open_, 5.0)))
            / ((low - high) * F.pow(close, 5.0))
        ).alias("alpha_054"),
        ((close - open_) / ((high - low) + 0.001)).alias("alpha_101"),
        # alpha_009: trend-confirming conditional on the Δclose channel
        F.when(ts.ts_min(d1, 5, w) > 0, d1)
        .when(ts.ts_max(d1, 5, w) < 0, d1)
        .otherwise(-d1)
        .alias("alpha_009"),
        # alpha_010 core: same conditional, 4-day channel (ranked in P2)
        F.when(ts.ts_min(d1, 4, w) > 0, d1)
        .when(ts.ts_max(d1, 4, w) < 0, d1)
        .otherwise(-d1)
        .alias("a10_core"),
        # alpha_020 gap terms: today's open vs yesterday's H/C/L
        (open_ - ts.delay(high, 1, w)).alias("a20_h"),
        (open_ - ts.delay(close, 1, w)).alias("a20_c"),
        (open_ - ts.delay(low, 1, w)).alias("a20_l"),
        # alpha_023: fade the high only above the 20-day high average
        F.when(ts.ts_mean(high, 20, w) < high, -1 * ts.delta(high, 2, w))
        .otherwise(F.lit(0.0))
        .alias("alpha_023"),
        # alpha_053: reversal of the close-location-value delta
        (
            -1
            * ts.delta(
                ((close - low) - (high - close)) / (close - low), 9, w
            )
        ).alias("alpha_053"),
        # alpha_026 chain: ts_rank both, correlate, roll max (all P1-axis)
        ts.ts_rank(vol.cast("double"), 5, w).alias("a26_trv"),
        ts.ts_rank(high, 5, w).alias("a26_trh"),
        # alpha_060 raw: signed close-location value weighted by volume
        (((close - low) - (high - close)) / (high - low) * vol).alias("a60_raw"),
        ts.ts_argmax(close, 10, w).alias("a60_argmax"),
    )
    a1_base = F.when((F.col("ret") < 0) & F.col("std20").isNotNull(), F.col("std20")).otherwise(
        close
    )
    sp = F.signum(a1_base) * a1_base * a1_base
    so5 = ts.ts_sum(open_, 5, w)
    sr5 = ts.ts_sum("ret", 5, w)
    mom = so5 * sr5
    adv20 = ts.ts_mean(vol.cast("double"), 20, w)
    p1 = p1.select(
        "*",
        ts.ts_argmax(sp, 5, w).alias("a1_argmax"),
        (mom - F.lag(mom, 10).over(w)).alias("a8_raw"),
        (open_ - ts.ts_sum("vwap", 10, w) / 10).alias("a5_dev"),
        (close - F.col("vwap")).alias("a5_cv"),
        ((((-1 * F.col("ret")) * adv20) * F.col("vwap")) * (high - close)).alias("a25_raw"),
        ts.ts_corr("a26_trv", "a26_trh", 5, w).alias("c26"),
        (ts.ts_stddev("ret", 2, w) / ts.ts_stddev("ret", 5, w)).alias("a34_ratio"),
        adv20.alias("adv20"),
        # alpha_011 terms: vwap-close channel extremes + volume delta
        ts.ts_max(F.col("vwap") - close, 3, w).alias("a11_max"),
        ts.ts_min(F.col("vwap") - close, 3, w).alias("a11_min"),
        ts.delta(vol, 3, w).alias("a11_dv"),
        ts.delta("ret", 3, w).alias("a14_dr3"),
        # alpha_018 raw: intraday-vol std + body + close/open correlation
        (
            ts.ts_stddev(F.abs(close - open_), 5, w)
            + (close - open_)
            + ts.ts_corr(close, open_, 10, w)
        ).alias("a18_raw"),
        (-1 * F.signum((close - ts.delay(close, 7, w)) + ts.delta(close, 7, w))).alias(
            "a19_sign"
        ),
        ts.ts_sum("ret", 250, w).alias("a19_sum"),
        ts.ts_corr(high, vol.cast("double"), 5, w).alias("c_hv5corr"),
        ts.ts_stddev(close, 20, w).alias("std20c"),
        ts.ts_mean(close, 100, w).alias("m100"),
        ts.ts_min(close, 100, w).alias("tmin100"),
        ts.delta(close, 3, w).alias("d3c"),
        (F.signum(d1) + F.signum(ts.delay(d1, 1, w)) + F.signum(ts.delay(d1, 2, w))).alias(
            "a30_sgn"
        ),
        ts.ts_sum(vol, 5, w).alias("sv5"),
        ts.ts_sum(vol, 20, w).alias("sv20"),
        ts.ts_rank(vol.cast("double"), 32, w).alias("a35_trv"),
        ts.ts_rank(close + high - low, 16, w).alias("a35_trchl"),
        # null-safe ts_rank: collect_list drops the nulls; gate the rows
        # whose own value is null so both engines emit NULL there
        F.when(F.col("ret").isNotNull(), ts.ts_rank("ret", 32, w)).alias("a35_trret"),
        ts.ts_rank(close, 10, w).alias("a17_trc"),
        (ts.delta(d1, 1, w)).alias("a17_dd1"),
        ts.ts_argmax(close, 30, w).alias("a57_argmax"),
        (F.col("vwap") - ts.ts_max("vwap", 15, w)).alias("a84_dev"),
        # exponent is the RELATIVE 5-day change clamped to ±3: the
        # synthetic panel's raw deltas reach ±50 on near-zero closes, and
        # signedpower with such exponents explodes past double range; on
        # real price data delta(close,5) is percent-scale anyway
        F.greatest(F.least(ts.delta(close, 5, w) / close, F.lit(3.0)), F.lit(-3.0)).alias(
            "rd5"
        ),
        # alpha_021 bollinger ternary channels
        ts.ts_mean(close, 8, w).alias("m8"),
        ts.ts_stddev(close, 8, w).alias("s8"),
        ts.ts_mean(close, 2, w).alias("m2"),
        # alpha_037/038/040/045/046 bases
        (open_ - close).alias("d_oc"),
        (close / open_).alias("a38_co"),
        ts.ts_stddev(high, 10, w).alias("a40_std"),
        ts.ts_mean(ts.delay(close, 5, w), 20, w).alias("a45_m"),
        ts.ts_corr(close, vol.cast("double"), 2, w).alias("a45_c1"),
        ts.ts_sum(close, 5, w).alias("s5c"),
        ts.ts_sum(close, 20, w).alias("s20c"),
        (
            (ts.delay(close, 20, w) - ts.delay(close, 10, w)) / 10
            - (ts.delay(close, 10, w) - close) / 10
        ).alias("a46_sd"),
        ts.delay(close, 5, w).alias("lag5c"),
    )
    # third TS pass: windows over windowed columns
    nd7 = -1 * F.col("d7")
    p1 = p1.select(
        "*",
        (-1 * ts.ts_max("c26", 3, w)).alias("alpha_026"),
        (F.col("c_hv5corr") - F.lag("c_hv5corr", 5).over(w)).alias("a22_d"),
        ((F.col("m100") - F.lag("m100", 100).over(w)) / F.lag(close, 100).over(w)).alias(
            "ratio24"
        ),
        (F.col("a35_trv") * (1 - F.col("a35_trchl")) * (1 - F.col("a35_trret"))).alias(
            "alpha_035"
        ),
        ts.ts_rank(vol.cast("double") / F.col("adv20"), 20, w).alias("a43_a"),
        F.when(nd7.isNotNull(), ts.ts_rank(nd7, 8, w)).alias("a43_b"),
        F.when(
            (vol.cast("double") / F.col("adv20")).isNotNull(),
            ts.ts_rank(vol.cast("double") / F.col("adv20"), 5, w),
        ).alias("a17_trva"),
        F.when(F.col("a84_dev").isNotNull(), ts.ts_rank("a84_dev", 21, w)).alias("a84_tr"),
        F.when(F.col("m8") + F.col("s8") < F.col("m2"), F.lit(-1.0))
        .when(F.col("m2") < F.col("m8") - F.col("s8"), F.lit(1.0))
        .when(vol / F.col("adv20") < 1, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("alpha_021"),
        (ts.ts_corr("adv20", low, 5, w) + (high + low) / 2 - close).alias("a28_x"),
        ts.ts_corr("s5c", "s20c", 2, w).alias("a45_c2"),
        (ts.ts_sum(close, 7, w) / 7 - close).alias("a32_x"),
        ts.ts_corr("vwap", "lag5c", 230, w).alias("a32_c"),
        ts.ts_corr(high, vol.cast("double"), 10, w).alias("a40_c"),
        F.lag("d_oc", 1).over(w).alias("lag_doc"),
        F.when(F.col("a46_sd") > 0.25, F.lit(-1.0))
        .when(F.col("a46_sd") < 0, F.lit(1.0))
        .otherwise(-1 * F.col("d1"))
        .alias("alpha_046"),
    )
    p1 = p1.select(
        "*",
        F.when(
            F.col("ratio24") <= 0.05, -1 * (close - F.col("tmin100"))
        )
        .otherwise(-1 * F.col("d3c"))
        .alias("alpha_024"),
        (F.col("a43_a") * F.col("a43_b")).alias("alpha_043"),
        # signedpower(ts_rank(vwap deviation), relative Δ5 close)
        (F.signum("a84_tr") * F.pow(F.abs("a84_tr"), F.col("rd5"))).alias("alpha_084"),
        ts.ts_corr("lag_doc", close, 200, w).alias("a37_c"),
    )
    p1 = ckpt(p1, "p1")

    # ---- P2: cross-sectional ranks (partitionBy date) ----
    p2 = p1.select(
        "*",
        cs.cs_rank("a1_argmax", "d").alias("r_a1"),
        cs.cs_rank("dlv2", "d").alias("r_dlv2"),
        cs.cs_rank("intraday", "d").alias("r_intraday"),
        cs.cs_rank(F.col("open"), "d").alias("r_open"),
        cs.cs_rank(vol.cast("double"), "d").alias("r_vol"),
        cs.cs_rank(high, "d").alias("r_high"),
        cs.cs_rank(low, "d").alias("r_low"),
        cs.cs_rank(close, "d").alias("r_close"),
        cs.cs_rank("a5_dev", "d").alias("r_a5dev"),
        cs.cs_rank("a5_cv", "d").alias("r_a5cv"),
        (cs.cs_rank(-1 * (1 - open_ / close), "d")).alias("alpha_033"),
        (-1 * cs.cs_rank("a8_raw", "d")).alias("alpha_008"),
        cs.cs_rank("a10_core", "d").alias("alpha_010"),
        cs.cs_rank("a20_h", "d").alias("r20_h"),
        cs.cs_rank("a20_c", "d").alias("r20_c"),
        cs.cs_rank("a20_l", "d").alias("r20_l"),
        cs.cs_rank("a25_raw", "d").alias("alpha_025"),
        cs.cs_rank("a34_ratio", "d").alias("r_a34ratio"),
        cs.cs_rank("d1", "d").alias("r_a34d1"),
        cs.cs_rank("a60_raw", "d").alias("r60_a"),
        cs.cs_rank("a60_argmax", "d").alias("r60_b"),
        cs.cs_rank("a11_max", "d").alias("r11_max"),
        cs.cs_rank("a11_min", "d").alias("r11_min"),
        cs.cs_rank("a11_dv", "d").alias("r11_dv"),
        cs.cs_rank("a14_dr3", "d").alias("r_dr3"),
        (-1 * cs.cs_rank("a18_raw", "d")).alias("alpha_018"),
        cs.cs_rank(1 + F.col("a19_sum"), "d").alias("r_a19"),
        cs.cs_rank(F.round("std20c", 9), "d").alias("r_std20c"),
        cs.cs_rank("a30_sgn", "d").alias("r_a30"),
        cs.cs_rank("a17_trc", "d").alias("r_a17trc"),
        cs.cs_rank("a17_dd1", "d").alias("r_a17dd1"),
        cs.cs_rank("a17_trva", "d").alias("r_a17trva"),
        cs.cs_rank("a57_argmax", "d").alias("r_a57argmax"),
        cs.cs_rank("vwap", "d").alias("r_vwap"),
        cs.cs_scale("a28_x", 1.0, "d").alias("alpha_028"),
        (cs.cs_scale("a32_x", 1.0, "d") + 20 * cs.cs_scale("a32_c", 1.0, "d")).alias(
            "alpha_032"
        ),
        cs.cs_rank(F.round("a37_c", 9), "d").alias("r37_a"),
        cs.cs_rank("d_oc", "d").alias("r37_b"),
        cs.cs_rank("a38_co", "d").alias("r_co"),
        cs.cs_rank(F.round("a40_std", 9), "d").alias("r40"),
        cs.cs_rank("a45_m", "d").alias("r45_a"),
        cs.cs_rank(F.round("a45_c2", 9), "d").alias("r45_b"),
    )
    # rank arithmetic on the P2 outputs (no further window for 005/020;
    # scale() for 060 — another date-axis pass sharing the same exchange)
    p2 = p2.select(
        "*",
        (F.col("r_a5dev") * (-1 * F.abs(F.col("r_a5cv")))).alias("alpha_005"),
        ((-1 * F.col("r20_h")) * F.col("r20_c") * F.col("r20_l")).alias("alpha_020"),
        ((F.col("r11_max") + F.col("r11_min")) * F.col("r11_dv")).alias("alpha_011"),
        (F.col("a19_sign") * (1 + F.col("r_a19"))).alias("alpha_019"),
        (-1 * (F.round("a22_d", 9) * F.col("r_std20c"))).alias("alpha_022"),
        ((1.0 - F.col("r_a30")) * F.col("sv5") / F.col("sv20")).alias("alpha_030"),
        ((-1 * F.col("r_a17trc")) * F.col("r_a17dd1") * F.col("r_a17trva")).alias(
            "alpha_017"
        ),
        (F.col("r37_a") + F.col("r37_b")).alias("alpha_037"),
        ((-1 * F.col("r_a17trc")) * F.col("r_co")).alias("alpha_038"),
        ((-1 * F.col("r40")) * F.round("a40_c", 9)).alias("alpha_040"),
        (-1 * ((F.col("r45_a") * F.round("a45_c1", 9)) * F.col("r45_b"))).alias("alpha_045"),
    )
    p2 = p2.select(
        "*",
        (
            -1 * (2 * cs.cs_scale("r60_a", 1.0, "d") - cs.cs_scale("r60_b", 1.0, "d"))
        ).alias("alpha_060"),
    )
    p2 = ckpt(p2, "p2")

    # ---- P3: correlations/rolling ops over ranked values (code axis) ----
    p3 = p2.select(
        "*",
        (F.col("r_a1") - 0.5).alias("alpha_001"),
        (-1 * ts.ts_corr("r_dlv2", "r_intraday", 6, w)).alias("alpha_002"),
        (-1 * ts.ts_corr("r_open", "r_vol", 10, w)).alias("alpha_003"),
        (-1 * ts.ts_corr(open_, vol.cast("double"), 10, w)).alias("alpha_006"),
        ts.ts_corr("r_high", "r_vol", 3, w).alias("c_hv3"),
        (-1 * ts.ts_rank("r_low", 9, w)).alias("alpha_004"),
        ts.ts_cov("r_close", "r_vol", 5, w).alias("cov_cv5"),
        ts.ts_cov("r_high", "r_vol", 5, w).alias("cov_hv5"),
        ts.ts_corr("r_vol", "r_vwap", 6, w).alias("a27_c"),
        (-1 * ts.ts_corr(high, "r_vol", 5, w)).alias("alpha_044"),
    )
    # alpha_014 = (-1·rank(Δreturns)) · corr(open, volume, 10); the corr
    # is -alpha_006, so the product is rank · alpha_006.
    # alpha_057: close-vwap deviation scaled by the linearly-decayed
    # rank of days-since-high (decay_linear inside the DAG).
    p3 = p3.select(
        "*",
        (F.col("r_dr3") * F.round("alpha_006", 9)).alias("alpha_014"),
        (
            0 - (1 * ((close - F.col("vwap")) / ts.decay_linear("r_a57argmax", 2, w)))
        ).alias("alpha_057"),
        (ts.ts_sum("a27_c", 2, w) / 2.0).alias("a27_s2"),
    )
    p3 = ckpt(p3, "p3")

    # ---- P4: final cross-sectional rank (date axis) ----
    # rank corr/cov outputs at 9dp: short rank-windows produce mass ties
    # at ±1.0 etc., and ulp-level float differences would otherwise split
    # average-tie groups nondeterministically across engines
    p4 = p3.select(
        "*",
        cs.cs_rank(F.round("c_hv3", 9), "d").alias("r_chv3"),
        (-1 * cs.cs_rank(F.round("cov_cv5", 9), "d")).alias("alpha_013"),
        # alpha_034's outer rank: inputs are exact rank rationals, so no
        # pre-rounding is needed for cross-engine tie stability
        cs.cs_rank((1 - F.col("r_a34ratio")) + (1 - F.col("r_a34d1")), "d").alias("alpha_034"),
        (-1 * cs.cs_rank(F.round("cov_hv5", 9), "d")).alias("alpha_016"),
        cs.cs_rank(F.round("a27_s2", 9), "d").alias("r27"),
    )
    p4 = ckpt(p4, "p4")

    # ---- P5: time-series tail (code axis) + rank-threshold ternaries ----
    p5 = p4.select(
        "*",
        (-1 * ts.ts_sum("r_chv3", 3, w)).alias("alpha_015"),
        F.when(F.col("r27") > 0.5, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("alpha_027"),
    )
    return p5
