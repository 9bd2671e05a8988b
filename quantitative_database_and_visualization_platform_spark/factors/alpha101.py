"""Alpha101 pipeline: the reference's 5-stage TS→CS→TS→CS→TS factor DAG
(`Project report.md:739-773`) for ALL 101 alphas; formulas from
`database/functions/alpha101_function.md:5-105`.

Representative operator-class examples:
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
    "alpha_007",
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
    "alpha_029",
    "alpha_030",
    "alpha_031",
    "alpha_032",
    "alpha_033",
    "alpha_034",
    "alpha_035",
    "alpha_036",
    "alpha_037",
    "alpha_038",
    "alpha_039",
    "alpha_040",
    "alpha_041",
    "alpha_042",
    "alpha_043",
    "alpha_044",
    "alpha_045",
    "alpha_046",
    "alpha_047",
    "alpha_048",
    "alpha_049",
    "alpha_050",
    "alpha_051",
    "alpha_052",
    "alpha_053",
    "alpha_054",
    "alpha_055",
    "alpha_056",
    "alpha_057",
    "alpha_058",
    "alpha_059",
    "alpha_060",
    "alpha_061",
    "alpha_062",
    "alpha_063",
    "alpha_064",
    "alpha_065",
    "alpha_066",
    "alpha_067",
    "alpha_068",
    "alpha_069",
    "alpha_070",
    "alpha_071",
    "alpha_072",
    "alpha_073",
    "alpha_074",
    "alpha_075",
    "alpha_076",
    "alpha_077",
    "alpha_078",
    "alpha_079",
    "alpha_080",
    "alpha_081",
    "alpha_082",
    "alpha_083",
    "alpha_084",
    "alpha_085",
    "alpha_086",
    "alpha_087",
    "alpha_088",
    "alpha_089",
    "alpha_090",
    "alpha_091",
    "alpha_092",
    "alpha_093",
    "alpha_094",
    "alpha_095",
    "alpha_096",
    "alpha_097",
    "alpha_098",
    "alpha_099",
    "alpha_100",
    "alpha_101",
)

# Documented deviations from the canonical WorldQuant formulas (each
# mirrored identically in the DuckDB oracle, so the parity row validates
# the variant as implemented — flagged here so consumers know):
# - alpha_084: exponent is delta(close,5)/close clamped to ±3, not raw
#   delta(close,5) — the synthetic panel's raw deltas on near-zero closes
#   overflow signedpower past double range; percent-scale on real prices.
# - alpha_007/alpha_043: the reference's own corrected "amount" variant
#   (its formula table notes the original paper's volume unit is wrong);
#   alpha_007 compares amount against a 20-day mean of amount.
_SYN_IND = "synthetic IndClass (code mod 5/10/20 = sector/industry/subindustry) — testdata has no industry dim"
ALPHA_VARIANTS = {
    "alpha_084": "signedpower exponent clamped relative 5d change (±3)",
    "alpha_007": "amount-based adv20 per reference's corrected formula",
    "alpha_043": "volume/adv20 ratio (reference formula uses amount/adv20)",
    "alpha_048": _SYN_IND,
    "alpha_058": _SYN_IND,
    "alpha_059": _SYN_IND,
    "alpha_056": "cap proxied by close*volume (testdata has no market-cap table)",
    # the full indneutralize family rides the same synthetic classification
    **{
        f"alpha_{n:03d}": _SYN_IND
        for n in (63, 67, 69, 70, 76, 79, 80, 82, 87, 89, 90, 91, 93, 97, 100)
    },
    "alpha_100": _SYN_IND + "; amount/adv20a weighting (reference's corrected-unit formula)",
}


# Columns each rank block must pass through: everything the DAG still
# references AFTER that block (MapInPandas is a Catalyst pruning barrier —
# see with_cs_rank_block). Generated mechanically from the function source
# (quoted column references after each block call, intersected with
# columns defined before it); a stale entry that drops a needed column
# fails analysis loudly, an extra entry only costs width.
_P2_RANK_KEEP = (
    "a100_am", "a10_core", "a11_dv", "a11_max", "a11_min", "a14_dr3",
    "a17_dd1", "a17_trc", "a17_trva", "a18_raw", "a19_sign", "a19_sum",
    "a1_argmax", "a20_c", "a20_h", "a20_l", "a22_d", "a25_raw",
    "a26_trv", "a29_tr", "a30_sgn", "a34_ratio", "a36_c1", "a36_t",
    "a38_co", "a39_dec", "a40_c", "a45_c1", "a45_m", "a47_dv",
    "a47_sh5", "a52_low", "a52_r", "a55_stoch", "a56_ratio", "a56_rc",
    "a57_argmax", "a5_cv", "a5_dev", "a60_argmax", "a60_raw", "a61_c",
    "a61_dev", "a62_c", "a63_dec", "a64_c", "a65_c", "a65_dev",
    "a66_dec1", "a66_tr", "a67_dev", "a69_tr", "a70_dv", "a71_x",
    "a72_dec1", "a72_dec2", "a73_dec1", "a73_tr", "a74_c1", "a74_wp",
    "a75_c1", "a76_dec", "a77_dec1", "a77_dec2", "a78_c", "a79_c",
    "a80_tr", "a81_c", "a82_dec", "a83_hlr", "a83_lag", "a85_c1",
    "a85_c2", "a86_tr", "a87_dec", "a88_y", "a89_tr3", "a8_raw",
    "a90_dev", "a91_dec2", "a92_x", "a93_dec", "a94_dev", "a94_tr",
    "a95_c", "a95_dev", "a96_tr13", "a97_tr6", "a98_dec1", "a99_c1",
    "a99_c2", "adv15", "adv20", "adv20a", "adv30", "adv50",
    "adv81", "alpha_007", "alpha_009", "alpha_012", "alpha_021", "alpha_023",
    "alpha_024", "alpha_026", "alpha_028", "alpha_032", "alpha_035", "alpha_041",
    "alpha_043", "alpha_046", "alpha_048", "alpha_049", "alpha_051", "alpha_053",
    "alpha_054", "alpha_084", "alpha_101", "amount", "close", "code",
    "d", "d1", "d10c", "d5c", "d7", "d_hl3",
    "d_oc", "dlv2", "high", "hl2", "intraday", "low",
    "n67", "n70", "n76", "n79", "n80", "n82",
    "n87", "n90", "n97v", "nv58", "nv59", "open",
    "rk_31c", "rk_36d", "rk_42a", "rk_42b", "rk_47a", "rk_47b",
    "rk_71", "rk_a19", "rk_a33", "rk_a37", "rk_a40", "rk_a45",
    "rk_std20c", "s31", "subind", "sv20", "sv5", "volume",
    "vwap",
)
_P2B_RANK_KEEP = (
    "a29_neg", "a29_tr", "a31_neg", "a39_in", "a69_tr", "a71_sq",
    "a71_x", "a80_tr", "a88_comb", "a88_y", "a89_tr3", "a92_x",
    "a96_tr13", "a97_tr6", "adv20a", "adv50", "adv81", "alpha_005",
    "alpha_007", "alpha_008", "alpha_009", "alpha_010", "alpha_011", "alpha_012",
    "alpha_017", "alpha_018", "alpha_019", "alpha_020", "alpha_021", "alpha_022",
    "alpha_023", "alpha_024", "alpha_025", "alpha_026", "alpha_028", "alpha_030",
    "alpha_032", "alpha_033", "alpha_035", "alpha_036", "alpha_037", "alpha_038",
    "alpha_040", "alpha_041", "alpha_042", "alpha_043", "alpha_045", "alpha_046",
    "alpha_047", "alpha_048", "alpha_049", "alpha_051", "alpha_052", "alpha_053",
    "alpha_054", "alpha_056", "alpha_061", "alpha_064", "alpha_065", "alpha_066",
    "alpha_072", "alpha_073", "alpha_077", "alpha_083", "alpha_084", "alpha_085",
    "alpha_086", "alpha_094", "alpha_099", "alpha_101", "amount", "b62",
    "close", "code", "d", "high", "low", "n67",
    "n70", "n76", "n79", "n80", "n82", "n87",
    "n90", "n97v", "nv58", "nv59", "open", "r100b",
    "r31c", "r39c", "r55", "r60_a", "r60_b", "r62a",
    "r63b", "r67a", "r70a", "r74a", "r74w", "r75a",
    "r75adv", "r76a", "r78a", "r79b", "r81c", "r82a",
    "r87a", "r90a", "r91b", "r92adv", "r93b", "r95a",
    "r95c", "r98a", "r98adv", "r_a1", "r_a34d1", "r_a34ratio",
    "r_a57argmax", "r_adv20", "r_close", "r_dlv2", "r_dr3", "r_high",
    "r_intraday", "r_low", "r_open", "r_vol", "r_vwap", "s31",
    "subind", "volume", "vwap",
)
_P4_RANK_KEEP = (
    "a29_s", "a29_tr", "a31_dec", "a50_c", "a63_dec8", "a69_m",
    "a69_tr", "a74_c2", "a75_c2", "a76_tr19b", "a79_d", "a80_sgn",
    "a80_tr", "a81_lp", "a88_dec1", "a88_y", "a91_tr4", "a97_dec20",
    "a97_tr6", "a98_dec2", "adv20a", "alpha_001", "alpha_002", "alpha_003",
    "alpha_004", "alpha_005", "alpha_006", "alpha_007", "alpha_008", "alpha_009",
    "alpha_010", "alpha_011", "alpha_012", "alpha_014", "alpha_017", "alpha_018",
    "alpha_019", "alpha_020", "alpha_021", "alpha_022", "alpha_023", "alpha_024",
    "alpha_025", "alpha_026", "alpha_028", "alpha_030", "alpha_032", "alpha_033",
    "alpha_035", "alpha_036", "alpha_037", "alpha_038", "alpha_039", "alpha_040",
    "alpha_041", "alpha_042", "alpha_043", "alpha_044", "alpha_045", "alpha_046",
    "alpha_047", "alpha_048", "alpha_049", "alpha_051", "alpha_052", "alpha_053",
    "alpha_054", "alpha_055", "alpha_056", "alpha_057", "alpha_058", "alpha_059",
    "alpha_060", "alpha_061", "alpha_062", "alpha_064", "alpha_065", "alpha_066",
    "alpha_068", "alpha_070", "alpha_071", "alpha_072", "alpha_073", "alpha_077",
    "alpha_082", "alpha_083", "alpha_084", "alpha_085", "alpha_086", "alpha_087",
    "alpha_089", "alpha_090", "alpha_092", "alpha_093", "alpha_094", "alpha_095",
    "alpha_096", "alpha_099", "alpha_101", "amount", "c67", "close",
    "code", "d", "high", "low", "open", "r31c",
    "r63b", "r67a", "r74a", "r75a", "r76a", "r78a",
    "r79b", "r91b", "r98a", "rk_a27", "rk_a34", "rk_chv3",
    "rk_cov_cv5", "rk_cov_hv5", "s31", "sA100", "sB100", "volume",
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
        # round-to-9dp BEFORE the rank (sole consumer): JVM Math.log and
        # DuckDB's libm log can differ by an ulp on the same volume, so
        # two codes with identical (v_t, v_{t-2}) pairs could split their
        # rank tie group — 992 alpha_002 swaps at sf0.1 (round-11
        # mitigated-config alpha parity run)
        F.round(log_v - F.lag(log_v, 2).over(w), 9).alias("dlv2"),
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
        # batch-A bases
        ((high + low) / 2).alias("hl2"),
        ts.ts_min(low, 5, w).alias("tmin_low5"),
        # alpha_055 stochastic position within the 12-day range
        (
            (close - ts.ts_min(low, 12, w))
            / (ts.ts_max(high, 12, w) - ts.ts_min(low, 12, w))
        ).alias("a55_stoch"),
        # alpha_083 range over 5-day mean close
        ((high - low) / (ts.ts_sum(close, 5, w) / 5)).alias("a83_hlr"),
        ts.ts_mean(vol.cast("double"), 180, w).alias("adv180"),
        ts.ts_mean(vol.cast("double"), 60, w).alias("adv60"),
        # amount-based adv20 (the reference's corrected alpha_007 unit)
        ts.ts_mean("amount", 20, w).alias("adv20a"),
        (ts.ts_sum(high, 5, w) / 5).alias("a47_sh5"),
        # synthetic IndClass levels: the reference neutralizes against
        # meta_stock_info.industry (QuantDB.py:48); testdata has no
        # industry dim, so classification is derived from the code key —
        # deterministic and identical on both engines
        (F.col("code") % 5).alias("sector"),
        (F.col("code") % 10).alias("industry"),
        (F.col("code") % 20).alias("subind"),
        # batch-C bases
        ts.delta(close, 5, w).alias("d5c"),
        ts.delta(close, 10, w).alias("d10c"),
        F.lag(vol, 1).over(w).alias("lag_vol"),
        ts.ts_mean(vol.cast("double"), 30, w).alias("adv30"),
        ts.ts_mean(vol.cast("double"), 40, w).alias("adv40"),
        ts.ts_mean(vol.cast("double"), 50, w).alias("adv50"),
        ts.ts_mean(vol.cast("double"), 5, w).alias("adv5"),
        ts.ts_mean(vol.cast("double"), 15, w).alias("adv15"),
        ((-1 * ts.delta(open_, 2, w)) / open_).alias("a73_r"),
        # alpha_092 K-line condition as a 0/1 series
        (((high + low) / 2 + close) < (low + open_)).cast("double").alias("a92_b"),
        # batch-D bases (alphas 63-100 completion)
        ts.ts_mean(vol.cast("double"), 10, w).alias("adv10"),
        ts.ts_mean(vol.cast("double"), 81, w).alias("adv81"),
        ts.ts_mean(vol.cast("double"), 120, w).alias("adv120"),
        ts.ts_mean(vol.cast("double"), 150, w).alias("adv150"),
        (high - ts.ts_min(high, 2, w)).alias("a67_dev"),
        (close - ts.ts_max(close, 4, w)).alias("a90_dev"),
        ts.delta((high + low) / 2, 3, w).alias("d_hl3"),
        ts.delta(open_, 1, w).alias("a82_d"),
        (close * 0.60733 + open_ * (1 - 0.60733)).alias("wp79"),
        (open_ * 0.868128 + high * (1 - 0.868128)).alias("wp80"),
        ts.ts_rank(close, 7, w).alias("a96_tc"),
        ts.ts_rank(low, 7, w).alias("a97_tl"),
        ts.ts_argmin(close, 30, w).alias("a100_am"),
        ts.ts_sum_fixed_expr("open", 12).alias("a64_s1"),
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
        # alpha_018 raw: intraday-vol std + body + close/open correlation.
        # round-to-9dp BEFORE the rank (sole consumer): the three-term
        # float sum accumulates engine-order-dependent ulp error (Spark
        # sequential vs DuckDB segment-tree window sums) — 119 rank
        # swaps at sf0.1 (round-11 mitigated-config alpha parity run)
        F.round(
            ts.ts_stddev(F.abs(close - open_), 5, w)
            + (close - open_)
            + ts.ts_corr(close, open_, 10, w),
            9,
        ).alias("a18_raw"),
        (-1 * F.signum((close - ts.delay(close, 7, w)) + ts.delta(close, 7, w))).alias(
            "a19_sign"
        ),
        ts.ts_sum_fixed_expr("ret", 250).alias("a19_sum"),
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
        # round-to-9dp BEFORE the cross-sectional rank: the 20-day mean is
        # a float accumulation (Spark windows sum sequentially, DuckDB via
        # a segment tree), so two codes with mathematically-tied means can
        # land an ulp apart on one engine and split the tie group — 12
        # rank swaps at sf0.1 (found by the round-11 mitigated-config
        # alpha parity run); its ONLY consumer is the rank, so rounding
        # at creation is lossless for the formula
        F.round(ts.ts_mean(ts.delay(close, 5, w), 20, w), 9).alias("a45_m"),
        ts.ts_corr(close, vol.cast("double"), 2, w).alias("a45_c1"),
        ts.ts_sum(close, 5, w).alias("s5c"),
        ts.ts_sum(close, 20, w).alias("s20c"),
        (
            (ts.delay(close, 20, w) - ts.delay(close, 10, w)) / 10
            - (ts.delay(close, 10, w) - close) / 10
        ).alias("a46_sd"),
        ts.delay(close, 5, w).alias("lag5c"),
        # batch-A second-pass terms (windows over pass-1 columns)
        ts.delta("vwap", 5, w).alias("a47_dv"),
        (-1 * F.col("tmin_low5") + ts.delay("tmin_low5", 5, w)).alias("a52_low"),
        # (sum(ret,240) - sum(ret,20)) / 220: both via the exact
        # fixed-point running sums (the 240-window would otherwise be a
        # second O(rows*240) sliding re-aggregation)
        (
            (ts.ts_sum_fixed_expr("ret", 240) - ts.ts_sum_fixed_expr("ret", 20)) / 220
        ).alias("a52_r"),
        (F.col("vwap") - ts.ts_min("vwap", 16, w)).alias("a61_dev"),
        ts.ts_corr_fixed_expr("vwap", "adv180", 17).alias("a61_c"),
        F.lag("a83_hlr", 2).over(w).alias("a83_lag"),
        ts.ts_sum_fixed_expr("hl2", 19).alias("a99_s1"),
        ts.ts_sum_fixed_expr("adv60", 19).alias("a99_s2"),
        ts.ts_corr_fixed_expr("low", "CAST(volume AS DOUBLE)", 6).alias("a99_c2"),
        # alpha_007: ts_rank of |Δ7 close| over 60 (null-gated like a43_b)
        F.when(F.col("d7").isNotNull(), ts.ts_rank(F.abs("d7"), 60, w)).alias("a7_tr"),
        # alpha_048 terms: lagged Δclose for the 250-day autocorrelation,
        # and the squared-return normalizer (delta(close,1)/delay(close,1)
        # IS the daily return)
        F.lag("d1", 1).over(w).alias("a48_ld1"),
        ts.ts_sum_fixed_expr("(ret * ret)", 250).alias("a48_den"),
        # batch-C second-pass terms
        (-1 * ts.delay("ret", 6, w)).alias("a29_d"),
        (ts.ts_sum_fixed_expr("close", 200) / 200).alias("a36_m200"),
        ts.ts_sum("ret", 2, w).alias("a56_s2"),
        ts.ts_sum_fixed_expr("ret", 10).alias("a56_s10"),
        # cap proxied by close*volume (ALPHA_VARIANTS)
        (F.col("ret") * (close * vol)).alias("a56_rc"),
        ts.ts_sum_fixed_expr("adv60", 8, scale=1_000_000).alias("a65_s"),
        (open_ - ts.ts_min(open_, 13, w)).alias("a65_dev"),
        ((low - F.col("vwap")) / (open_ - F.col("hl2"))).alias("a66_r"),
        ts.delta("vwap", 3, w).alias("a66_dv"),
        ts.ts_rank(close, 3, w).alias("a71_t1"),
        ts.ts_rank("adv180", 12, w).alias("a71_t2"),
        # vwap is NULL on zero-volume days — gate its ts_ranks
        F.when(F.col("vwap").isNotNull(), ts.ts_rank("vwap", 3, w)).alias("a72_t1"),
        ts.ts_rank(vol.cast("double"), 18, w).alias("a72_t2"),
        ts.ts_corr_fixed_expr("hl2", "adv40", 8).alias("a72_c1"),
        ts.delta("vwap", 4, w).alias("a73_d"),
        ts.ts_sum_fixed_expr("adv30", 37, scale=1_000_000).alias("a74_s"),
        (high * 0.0261661 + F.col("vwap") * (1 - 0.0261661)).alias("a74_wp"),
        ts.ts_corr_fixed_expr("vwap", "CAST(volume AS DOUBLE)", 4).alias("a75_c1"),
        (F.col("hl2") - F.col("vwap")).alias("a77_x"),
        ts.ts_corr_fixed_expr("hl2", "adv40", 3).alias("a77_c"),
        (high * 0.876703 + close * (1 - 0.876703)).alias("a85_wp"),
        ts.ts_rank("hl2", 3, w).alias("a85_t1"),
        ts.ts_rank(vol.cast("double"), 10, w).alias("a85_t2"),
        ts.ts_rank(close, 8, w).alias("a88_t1"),
        ts.ts_rank("adv60", 20, w).alias("a88_t2"),
        ts.decay_linear("a92_b", 14, w).alias("a92_dec1"),
        (F.col("vwap") - ts.ts_min("vwap", 11, w)).alias("a94_dev"),
        F.when(F.col("vwap").isNotNull(), ts.ts_rank("vwap", 19, w)).alias("a94_t1"),
        ts.ts_rank("adv60", 4, w).alias("a94_t2"),
        ts.ts_sum_fixed_expr("adv40", 19, scale=1_000_000).alias("a95_s2"),
        (open_ - ts.ts_min(open_, 12, w)).alias("a95_dev"),
        ts.ts_sum_fixed_expr("adv5", 26, scale=1_000_000).alias("a98_s"),
        # batch-D second-pass terms
        ts.ts_rank("adv60", 17, w).alias("a97_ta"),
        ts.ts_rank("adv150", 9, w).alias("a79_t2"),
        ts.ts_sum_fixed_expr("adv120", 12, scale=1_000_000).alias("a64_s2"),
        ts.ts_sum_fixed_expr("adv180", 37, scale=1_000_000).alias("a63_s"),
        ts.ts_sum_fixed_expr("adv10", 49, scale=1_000_000).alias("a81_s"),
        ts.ts_sum_fixed_expr("(low * 0.352233D + vwap * 0.647767D)", 19).alias(
            "a78_s1"
        ),
        ts.delta("vwap", 1, w).alias("a70_dv"),
        (close * 0.369701 + F.col("vwap") * (1 - 0.369701)).alias("wp87"),
        (close * 0.524434 + F.col("vwap") * (1 - 0.524434)).alias("wp93"),
        (low * 0.721001 + F.col("vwap") * (1 - 0.721001)).alias("wp97"),
        ts.decay_linear("a82_d", 14, w).alias("a82_dec"),
        ts.ts_corr_fixed_expr("high", "adv10", 5).alias("a80_c"),
        ts.ts_corr_fixed_expr("low", "adv10", 6).alias("a89_c"),
        ts.ts_corr_fixed_expr("vwap", "adv30", 4).alias("a91_c2"),
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
        ts.ts_corr_fixed_expr("vwap", "lag5c", 230).alias("a32_c"),
        ts.ts_corr(high, vol.cast("double"), 10, w).alias("a40_c"),
        F.lag("d_oc", 1).over(w).alias("lag_doc"),
        F.when(F.col("a46_sd") > 0.25, F.lit(-1.0))
        .when(F.col("a46_sd") < 0, F.lit(1.0))
        .otherwise(-1 * F.col("d1"))
        .alias("alpha_046"),
        # alpha_049/051: same MA-divergence ternary, different thresholds
        F.when(F.col("a46_sd") < -0.1, F.lit(1.0)).otherwise(-1 * F.col("d1")).alias(
            "alpha_049"
        ),
        F.when(F.col("a46_sd") < -0.05, F.lit(1.0)).otherwise(-1 * F.col("d1")).alias(
            "alpha_051"
        ),
        # alpha_007: amount expansion gates the |Δ7| ts_rank reversal
        F.when(
            F.col("adv20a") < F.col("amount"),
            (-1 * F.col("a7_tr")) * F.signum("d7"),
        )
        .otherwise(F.lit(-1.0))
        .alias("alpha_007"),
        ts.ts_corr_fixed_expr("a99_s1", "a99_s2", 8).alias("a99_c1"),
        # sum(adv20,14) kept exact: sum the INTEGER 20-day volume sums,
        # divide once — order-independent on both engines
        (ts.ts_sum("sv20", 14, w) / 20.0).alias("a86_s"),
        ts.ts_corr_fixed_expr("d1", "a48_ld1", 250).alias("a48_c"),
        # batch-C third-pass terms
        F.when(F.col("a29_d").isNotNull(), ts.ts_rank("a29_d", 5, w)).alias("a29_tr"),
        ts.ts_corr_fixed_expr("(-d_oc)", "lag_vol", 15).alias("a36_c1"),
        ts.ts_corr_fixed_expr("vwap", "adv20", 6).alias("a36_c2"),
        ((F.col("a36_m200") - open_) * (close - open_)).alias("a36_t"),
        (vol.cast("double") / F.col("adv20")).alias("a39_va"),
        ts.ts_sum("a56_s2", 3, w).alias("a56_ss"),
        (ts.ts_sum("sv20", 22, w) / 20.0).alias("a62_s"),
        ts.ts_corr_fixed_expr("open", "a65_s", 6).alias("a65_c"),
        ts.decay_linear("a66_dv", 7, w).alias("a66_dec1"),
        ts.decay_linear("a66_r", 11, w).alias("a66_dec2"),
        ts.ts_corr_fixed_expr("a71_t1", "a71_t2", 18, scale=100_000_000).alias("a71_c"),
        ts.ts_corr_fixed_expr("a72_t1", "a72_t2", 6, scale=100_000_000).alias("a72_c2"),
        ts.decay_linear("a72_c1", 10, w).alias("a72_dec1"),
        ts.decay_linear("a73_d", 2, w).alias("a73_dec1"),
        ts.decay_linear("a73_r", 3, w).alias("a73_dec2"),
        ts.ts_corr_fixed_expr("close", "a74_s", 15).alias("a74_c1"),
        ts.decay_linear("a77_x", 20, w).alias("a77_dec1"),
        ts.decay_linear("a77_c", 5, w).alias("a77_dec2"),
        ts.ts_corr_fixed_expr("a85_wp", "adv30", 9).alias("a85_c1"),
        ts.ts_corr_fixed_expr("a85_t1", "a85_t2", 7, scale=100_000_000).alias("a85_c2"),
        ts.ts_corr_fixed_expr("a88_t1", "a88_t2", 8, scale=100_000_000).alias("a88_c2"),
        ts.ts_rank("a92_dec1", 18, w).alias("a92_x"),
        ts.ts_corr_fixed_expr("a94_t1", "a94_t2", 18, scale=100_000_000).alias("a94_c"),
        ts.ts_corr_fixed_expr("a99_s1", "a95_s2", 12).alias("a95_c"),
        ts.ts_corr_fixed_expr("vwap", "a98_s", 4).alias("a98_c1"),
        ts.ts_corr_fixed_expr("adv20", "low", 12).alias("a31_c"),
        # batch-D third-pass terms
        ts.ts_corr_fixed_expr("close", "adv20", 4).alias("a69_c"),
        ts.ts_corr_fixed_expr("vwap", "a63_s", 13).alias("a63_c"),
        ts.ts_corr_fixed_expr("a64_s1", "a64_s2", 16).alias("a64_c"),
        ts.ts_corr_fixed_expr("vwap", "a81_s", 8).alias("a81_c"),
        ts.ts_corr_fixed_expr("a78_s1", "a95_s2", 6).alias("a78_c"),
        ts.ts_corr_fixed_expr("a96_tc", "a94_t2", 3, scale=100_000_000).alias("a96_c"),
        ts.ts_corr_fixed_expr("a72_t1", "a79_t2", 14, scale=100_000_000).alias("a79_c"),
        ts.ts_corr_fixed_expr("a97_tl", "a97_ta", 4, scale=100_000_000).alias("a97_c"),
        ts.decay_linear("a70_dv", 11, w).alias("a76_dec"),
        ts.decay_linear("a89_c", 5, w).alias("a89_dec5"),
        F.when(F.col("a80_c").isNotNull(), ts.ts_rank("a80_c", 5, w)).alias("a80_tr"),
        ts.decay_linear("a91_c2", 2, w).alias("a91_dec2"),
        ts.delta("wp87", 1, w).alias("a87_d"),
        ts.delta("wp93", 2, w).alias("a93_d"),
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
        ts.ts_corr_fixed_expr("lag_doc", "close", 200).alias("a37_c"),
        ts.ts_corr_fixed_expr("close", "a86_s", 6).alias("a86_c"),
        ((F.col("a48_c") * F.col("d1")) / close).alias("a48_num"),
        # batch-C fourth-pass terms
        ts.decay_linear("a39_va", 9, w).alias("a39_dec"),
        (F.col("a56_s10") / F.col("a56_ss")).alias("a56_ratio"),
        ts.ts_corr_fixed_expr("vwap", "a62_s", 9).alias("a62_c"),
        F.when(F.col("a66_dec2").isNotNull(), ts.ts_rank("a66_dec2", 6, w)).alias(
            "a66_tr"
        ),
        ts.decay_linear("a71_c", 4, w).alias("a71_dec1"),
        ts.decay_linear("a72_c2", 2, w).alias("a72_dec2"),
        F.when(F.col("a73_dec2").isNotNull(), ts.ts_rank("a73_dec2", 16, w)).alias(
            "a73_tr"
        ),
        ts.decay_linear("a88_c2", 6, w).alias("a88_dec2"),
        F.when(F.col("a94_c").isNotNull(), ts.ts_rank("a94_c", 2, w)).alias("a94_tr"),
        ts.decay_linear("a98_c1", 7, w).alias("a98_dec1"),
        # batch-D fourth-pass terms
        F.when(F.col("a69_c").isNotNull(), ts.ts_rank("a69_c", 9, w)).alias("a69_tr"),
        ts.ts_argmax("a96_c", 12, w).alias("a96_am"),
        F.when(F.col("a97_c").isNotNull(), ts.ts_rank("a97_c", 18, w)).alias(
            "a97_tr18"
        ),
        F.when(F.col("a89_dec5").isNotNull(), ts.ts_rank("a89_dec5", 3, w)).alias(
            "a89_tr3"
        ),
        ts.decay_linear("a87_d", 2, w).alias("a87_dec"),
        ts.decay_linear("a93_d", 16, w).alias("a93_dec"),
        ts.decay_linear("a63_c", 12, w).alias("a63_dec"),
    )
    p1 = p1.select(
        "*",
        F.when(F.col("a86_c").isNotNull(), ts.ts_rank("a86_c", 20, w)).alias("a86_tr"),
        F.when(F.col("a71_dec1").isNotNull(), ts.ts_rank("a71_dec1", 15, w)).alias(
            "a71_x"
        ),
        F.when(F.col("a88_dec2").isNotNull(), ts.ts_rank("a88_dec2", 2, w)).alias(
            "a88_y"
        ),
        ts.decay_linear("a96_am", 14, w).alias("a96_dec"),
        ts.decay_linear("a97_tr18", 15, w).alias("a97_dec15"),
    )
    p1 = p1.select(
        "*",
        F.when(F.col("a96_dec").isNotNull(), ts.ts_rank("a96_dec", 13, w)).alias(
            "a96_tr13"
        ),
        F.when(F.col("a97_dec15").isNotNull(), ts.ts_rank("a97_dec15", 6, w)).alias(
            "a97_tr6"
        ),
    )
    p1 = ckpt(p1, "p1")

    # ---- P2: cross-sectional stage (partitionBy date) ----
    # Window pass: everything that is NOT a pct rank — the indneutralize
    # demeans, the scale()s, and materialized SOURCE columns for
    # expression-input ranks. This pass owns the stage's single
    # hashpartitioning(d) exchange; the rank blocks below are
    # mapInPandas passes that ride the same physical clustering
    # (with_cs_rank_block contract), so ranking ~85 columns costs ONE
    # vectorized pass instead of ~85 Sort+Window plan passes each
    # buffering the full ~300-column row width.
    p2 = p1.select(
        "*",
        (-1 * (1 - open_ / close)).alias("rk_a33"),
        (1 + F.col("a19_sum")).alias("rk_a19"),
        F.round("std20c", 9).alias("rk_std20c"),
        F.round("a37_c", 9).alias("rk_a37"),
        F.round("a40_std", 9).alias("rk_a40"),
        F.round("a45_c2", 9).alias("rk_a45"),
        (F.col("vwap") - close).alias("rk_42a"),
        (F.col("vwap") + close).alias("rk_42b"),
        (F.lit(1) / close).alias("rk_47a"),
        (high - close).alias("rk_47b"),
        (-1 * F.col("d3c")).alias("rk_31c"),
        F.abs("a36_c2").alias("rk_36d"),
        ((low + open_) - 2 * F.col("vwap")).alias("rk_71"),
        cs.cs_scale("a28_x", 1.0, "d").alias("alpha_028"),
        (cs.cs_scale("a32_x", 1.0, "d") + 20 * cs.cs_scale("a32_c", 1.0, "d")).alias(
            "alpha_032"
        ),
        F.signum(cs.cs_scale("a31_c", 1.0, "d")).alias("s31"),
        # indneutralize family: (date, group) demeans ride the date-axis
        # exchange (hashpartitioning(d) satisfies the clustered
        # distribution on (d, grp) — sort-only, no extra shuffle)
        cs.cs_demean_fixed("vwap", "d", "sector").alias("nv58"),
        cs.cs_demean_fixed("vwap", "d", "industry").alias("nv59"),
        (cs.cs_demean_fixed("a48_num", "d", "subind") / F.col("a48_den")).alias(
            "alpha_048"
        ),
        cs.cs_demean_fixed("adv20", "d", "subind").alias("n67"),
        cs.cs_demean_fixed("close", "d", "industry").alias("n70"),
        cs.cs_demean_fixed("low", "d", "sector").alias("n76"),
        cs.cs_demean_fixed("wp79", "d", "sector").alias("n79"),
        cs.cs_demean_fixed("wp80", "d", "industry").alias("n80"),
        cs.cs_demean_fixed(vol.cast("double"), "d", "sector").alias("n82"),
        cs.cs_demean_fixed("adv81", "d", "industry").alias("n87"),
        cs.cs_demean_fixed("adv40", "d", "subind").alias("n90"),
        cs.cs_demean_fixed("wp97", "d", "industry").alias("n97v"),
    )
    # Rank block: every first-level pct rank in one vectorized pass.
    p2 = cs.with_cs_rank_block(
        p2,
        {
            "r_a1": "a1_argmax",
            "r_dlv2": "dlv2",
            "r_intraday": "intraday",
            "r_open": "open",
            "r_vol": "volume",
            "r_high": "high",
            "r_low": "low",
            "r_close": "close",
            "r_a5dev": "a5_dev",
            "r_a5cv": "a5_cv",
            "alpha_033": "rk_a33",
            "r08": "a8_raw",
            "alpha_010": "a10_core",
            "r20_h": "a20_h",
            "r20_c": "a20_c",
            "r20_l": "a20_l",
            "alpha_025": "a25_raw",
            "r_a34ratio": "a34_ratio",
            "r_a34d1": "d1",
            "r60_a": "a60_raw",
            "r60_b": "a60_argmax",
            "r11_max": "a11_max",
            "r11_min": "a11_min",
            "r11_dv": "a11_dv",
            "r_dr3": "a14_dr3",
            "r18": "a18_raw",
            "r_a19": "rk_a19",
            "r_std20c": "rk_std20c",
            "r_a30": "a30_sgn",
            "r_a17trc": "a17_trc",
            "r_a17dd1": "a17_dd1",
            "r_a17trva": "a17_trva",
            "r_a57argmax": "a57_argmax",
            "r_vwap": "vwap",
            "r37_a": "rk_a37",
            "r37_b": "d_oc",
            "r_co": "a38_co",
            "r40": "rk_a40",
            "r45_a": "a45_m",
            "r45_b": "rk_a45",
            # fixed-point corr outputs are engine-exact, so their ranks
            # need no pre-rounding
            "r42_a": "rk_42a",
            "r42_b": "rk_42b",
            "r47_a": "rk_47a",
            "r47_b": "rk_47b",
            "r47_c": "a47_dv",
            "r52": "a52_r",
            "r55": "a55_stoch",
            "r83": "a83_lag",
            "r61a": "a61_dev",
            "r61b": "a61_c",
            "r99a": "a99_c1",
            "r99b": "a99_c2",
            "r_hl2": "hl2",
            "r29a": "d5c",
            "r31a": "d10c",
            "r31c": "rk_31c",
            "r36a": "a36_c1",
            "r36c": "a29_tr",
            "r36d": "rk_36d",
            "r36e": "a36_t",
            "r39a": "a39_dec",
            "r39c": "a19_sum",
            "r56a": "a56_ratio",
            "r56b": "a56_rc",
            "r62a": "a62_c",
            "r65a": "a65_c",
            "r65b": "a65_dev",
            "r66a": "a66_dec1",
            "r71": "rk_71",
            "r72a": "a72_dec1",
            "r72b": "a72_dec2",
            "r73a": "a73_dec1",
            "r74w": "a74_wp",
            "r74a": "a74_c1",
            "r75a": "a75_c1",
            "r75adv": "adv50",
            "r77a": "a77_dec1",
            "r77b": "a77_dec2",
            "r85a": "a85_c1",
            "r85b": "a85_c2",
            "r92adv": "adv30",
            "r94": "a94_dev",
            "r95a": "a95_dev",
            "r95c": "a95_c",
            "r98a": "a98_dec1",
            "r98adv": "adv15",
            "r63b": "a63_dec",
            "r64a": "a64_c",
            "r64b": "d_hl3",
            "r67a": "a67_dev",
            "r70a": "a70_dv",
            "r76a": "a76_dec",
            "r78a": "a78_c",
            "r79b": "a79_c",
            "r81c": "a81_c",
            "r82a": "a82_dec",
            "r87a": "a87_dec",
            "r90a": "a90_dev",
            "r91b": "a91_dec2",
            "r93b": "a93_dec",
            "r_adv20": "adv20",
            "r100b": "a100_am",
        },
        "d",
        keep=_P2_RANK_KEEP,
    )
    # rank arithmetic on the block outputs (pure projections, no windows)
    p2 = p2.select(
        "*",
        (-1 * F.col("r08")).alias("alpha_008"),
        (-1 * F.col("r18")).alias("alpha_018"),
        F.when(F.col("r61a") < F.col("r61b"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_061"),
        F.when(F.col("r99a") < F.col("r99b"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_099"),
        F.when(F.col("r65a") < F.col("r65b"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_065"),
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
        (F.col("r42_a") / F.col("r42_b")).alias("alpha_042"),
        # alpha_047: low-price effect x amount expansion x intraday
        # strength, less the vwap momentum rank
        (
            ((F.col("r47_a") * (F.col("amount") / F.col("adv20a"))) * (high * F.col("r47_b")))
            / F.col("a47_sh5")
            - F.col("r47_c")
        ).alias("alpha_047"),
        ((F.col("a52_low") * F.col("r52")) * F.col("a26_trv")).alias("alpha_052"),
        # alpha_083: rank(rank(volume)) == rank(volume) for average-tie
        # pct ranks (order- and tie-preserving), so r_vol serves directly
        (
            (F.col("r83") * F.col("r_vol"))
            / (F.col("a83_hlr") / ((F.col("vwap") - close) + 0.001))
        ).alias("alpha_083"),
        F.when(F.col("a86_tr") < F.col("r_a5cv"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_086"),
        (-1 * F.col("r29a")).alias("a29_neg"),
        (-1 * F.col("r31a")).alias("a31_neg"),
        (
            (((2.21 * F.col("r36a")) + (0.7 * F.col("r37_b"))) + (0.73 * F.col("r36c")))
            + F.col("r36d")
            + (0.6 * F.col("r36e"))
        ).alias("alpha_036"),
        (F.col("d7") * (1 - F.col("r39a"))).alias("a39_in"),
        (-1 * (F.col("r56a") * F.col("r56b"))).alias("alpha_056"),
        ((F.col("r_open") * 2) < (F.col("r_hl2") + F.col("r_high")))
        .cast("double")
        .alias("b62"),
        ((F.col("r66a") + F.col("a66_tr")) * -1).alias("alpha_066"),
        (F.col("r71") * F.col("r71")).alias("a71_sq"),
        (F.col("r72a") / F.col("r72b")).alias("alpha_072"),
        (F.greatest("r73a", "a73_tr") * -1).alias("alpha_073"),
        F.least("r77a", "r77b").alias("alpha_077"),
        F.pow(F.col("r85a"), F.col("r85b")).alias("alpha_085"),
        (F.pow(F.col("r94"), F.col("a94_tr")) * -1).alias("alpha_094"),
        (((F.col("r_open") + F.col("r_low")) - F.col("r_high")) - F.col("r_close")).alias(
            "a88_comb"
        ),
        F.when(F.col("r64a") < F.col("r64b"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_064"),
    )
    # second-level ranks (ranks of rank arithmetic): another pandas pass
    # on the same clustering — still no new exchange
    p2 = cs.with_cs_rank_block(
        p2,
        {"r29b": "a29_neg", "r39x": "a39_in", "r62b": "b62"},
        "d",
        keep=_P2B_RANK_KEEP,
    )
    p2 = p2.select(
        "*",
        ((-1 * F.col("r39x")) * (1 + F.col("r39c"))).alias("alpha_039"),
        F.when(F.col("r62a") < F.col("r62b"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_062"),
    )
    # alpha_060's scale() and alpha_100's part-A demean chain consume
    # block outputs but are window ops — they moved to the P4 date-axis
    # window pass so P2 keeps a single exchange.
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
        # batch-A TS-over-rank correlations (exact fixed-point: rank
        # rationals quantized at 1e-8)
        (-1 * ts.ts_corr_fixed_expr("r55", "r_vol", 6, scale=100_000_000)).alias(
            "alpha_055"
        ),
        ts.ts_corr_fixed_expr("r_vol", "r_vwap", 5, scale=100_000_000).alias("a50_c"),
        ts.ts_corr_fixed_expr("nv58", "CAST(volume AS DOUBLE)", 3).alias("a58_c"),
        ts.ts_corr_fixed_expr("nv59", "CAST(volume AS DOUBLE)", 4).alias("a59_c"),
        # batch-C TS-over-rank stage
        ts.ts_min("r29b", 2, w).alias("a29_min2"),
        ts.decay_linear("a31_neg", 10, w).alias("a31_dec"),
        ts.decay_linear("a71_sq", 16, w).alias("a71_dec2"),
        ts.ts_corr_fixed_expr("r_low", "r92adv", 7, scale=100_000_000).alias("a92_c"),
        ts.ts_corr_fixed_expr("r74w", "r_vol", 11, scale=100_000_000).alias("a74_c2"),
        ts.ts_corr_fixed_expr("r_low", "r75adv", 12, scale=100_000_000).alias("a75_c2"),
        ts.ts_corr_fixed_expr("r_open", "r98adv", 20, scale=100_000_000).alias("a98_c2"),
        F.pow(F.col("r95c"), F.lit(5.0)).alias("a95_p"),
        ts.decay_linear("a88_comb", 8, w).alias("a88_dec1"),
        # batch-D TS-over-CS stage: corrs against the neutralized series
        ts.ts_corr_fixed_expr("n70", "adv50", 17).alias("c70"),
        ts.ts_corr_fixed_expr("n76", "adv81", 8).alias("c76"),
        ts.ts_corr_fixed_expr("n82", "open", 17).alias("c82"),
        F.abs(ts.ts_corr_fixed_expr("n87", "close", 13)).alias("c87a"),
        ts.ts_corr_fixed_expr("n90", "low", 5).alias("c90"),
        ts.ts_corr_fixed_expr("n70", "CAST(volume AS DOUBLE)", 9).alias("c91n"),
        ts.ts_corr_fixed_expr("nv59", "adv81", 17).alias("c93"),
        ts.ts_corr_fixed_expr("nv58", "n67", 6).alias("c67"),
        ts.ts_corr_fixed_expr("r_vwap", "r_vol", 3, scale=100_000_000).alias("c96b"),
        ts.ts_corr_fixed_expr("r_high", "r98adv", 8, scale=100_000_000).alias("c68x"),
        ts.ts_corr_fixed_expr("close", "r_adv20", 5).alias("c100"),
        ts.delta("n70", 2, w).alias("a63_d"),
        ts.delta("nv59", 2, w).alias("a69_d"),
        ts.delta("n79", 1, w).alias("a79_d"),
        F.signum(ts.delta("n80", 4, w)).alias("a80_sgn"),
        ts.delta("nv59", 3, w).alias("a89_d"),
        ts.delta("n97v", 3, w).alias("a97_d"),
        # alpha_081: rank((rank(corr))^4) == rank(corr) (x^4 is monotone and
        # tie-preserving on (0,1]), so product(·,14) has argument r81c and
        # log(product) = Σ log(r81c) — an exact fixed-point rolling sum.
        # LN is the one transcendental feeding the fixed-point path: Java
        # Math.log and DuckDB's libm may differ by 1 ulp on the same rank
        # rational, and a quantization-boundary hit would flip the sum;
        # pre-round to 9dp on BOTH engines (same convention as the other
        # non-exact rank inputs) so the quantized integers always agree.
        ts.ts_sum_fixed_expr("ROUND(LN(r81c), 9)", 14).alias("a81_lp"),
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
        # alpha_058/059 decay stage (nulls in the gated corr are dropped
        # from the frame list — mirrored by the oracle's FILTERed list)
        ts.decay_linear("a58_c", 7, w).alias("a58_dec"),
        ts.decay_linear("a59_c", 16, w).alias("a59_dec"),
        F.log("a29_min2").alias("a29_log"),
        ts.decay_linear("a92_c", 6, w).alias("a92_dec2"),
        ts.ts_rank("a71_dec2", 4, w).alias("a71_y"),
        ts.ts_argmin("a98_c2", 8, w).alias("a98_am"),
        F.when(F.col("a95_p").isNotNull(), ts.ts_rank("a95_p", 11, w)).alias("a95_tr"),
        # batch-D second TS pass over the neutralized-corr chains
        F.when(F.col("c70").isNotNull(), ts.ts_rank("c70", 17, w)).alias("a70_tr"),
        F.when(F.col("c76").isNotNull(), ts.ts_rank("c76", 19, w)).alias("a76_tr19"),
        ts.decay_linear("c82", 6, w).alias("a82_dec6"),
        ts.decay_linear("c87a", 4, w).alias("a87_dec4"),
        F.when(F.col("c90").isNotNull(), ts.ts_rank("c90", 3, w)).alias("a90_tr"),
        ts.decay_linear("c91n", 16, w).alias("a91_deca"),
        ts.decay_linear("c93", 19, w).alias("a93_dec19"),
        ts.decay_linear("c96b", 4, w).alias("a96_dec4"),
        F.when(F.col("c68x").isNotNull(), ts.ts_rank("c68x", 13, w)).alias("a68_tr"),
        ts.decay_linear("a63_d", 8, w).alias("a63_dec8"),
        ts.ts_max("a69_d", 4, w).alias("a69_m"),
        ts.decay_linear("a89_d", 10, w).alias("a89_dec10"),
        ts.decay_linear("a97_d", 20, w).alias("a97_dec20"),
        (F.col("c100") - F.col("r100b")).alias("b100"),
    )
    p3 = p3.select(
        "*",
        F.when(
            F.col("a58_dec").isNotNull(), -1 * ts.ts_rank("a58_dec", 5, w)
        ).alias("alpha_058"),
        F.when(
            F.col("a59_dec").isNotNull(), -1 * ts.ts_rank("a59_dec", 8, w)
        ).alias("alpha_059"),
        F.when(F.col("a92_dec2").isNotNull(), ts.ts_rank("a92_dec2", 6, w)).alias(
            "a92_y"
        ),
        F.when(F.col("a98_am").isNotNull(), ts.ts_rank("a98_am", 6, w)).alias(
            "a98_tr"
        ),
        F.when(F.col("r95a") < F.col("a95_tr"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_095"),
        F.greatest("a71_x", "a71_y").alias("alpha_071"),
        # batch-D third TS pass
        ts.decay_linear("a76_tr19", 17, w).alias("a76_dec17"),
        F.when(F.col("a82_dec6").isNotNull(), ts.ts_rank("a82_dec6", 13, w)).alias(
            "a82_tr13"
        ),
        F.when(F.col("a87_dec4").isNotNull(), ts.ts_rank("a87_dec4", 14, w)).alias(
            "a87_tr14"
        ),
        F.when(F.col("a89_dec10").isNotNull(), ts.ts_rank("a89_dec10", 15, w)).alias(
            "a89_tr15"
        ),
        ts.decay_linear("a91_deca", 3, w).alias("a91_decb"),
        F.when(F.col("a93_dec19").isNotNull(), ts.ts_rank("a93_dec19", 7, w)).alias(
            "a93_tr7"
        ),
        F.when(F.col("a96_dec4").isNotNull(), ts.ts_rank("a96_dec4", 8, w)).alias(
            "a96_tr8"
        ),
        F.when(F.col("a68_tr") < F.col("r_a34d1"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_068"),
        (F.pow(F.col("r70a"), F.col("a70_tr")) * -1).alias("alpha_070"),
        (F.pow(F.col("r90a"), F.col("a90_tr")) * -1).alias("alpha_090"),
    )
    p3 = p3.select(
        "*",
        F.least("a92_x", "a92_y").alias("alpha_092"),
        ts.decay_linear("a98_tr", 8, w).alias("a98_dec2"),
        # batch-D fourth TS pass
        F.when(F.col("a76_dec17").isNotNull(), ts.ts_rank("a76_dec17", 19, w)).alias(
            "a76_tr19b"
        ),
        F.when(F.col("a91_decb").isNotNull(), ts.ts_rank("a91_decb", 4, w)).alias(
            "a91_tr4"
        ),
        (F.least("r82a", "a82_tr13") * -1).alias("alpha_082"),
        (F.greatest("r87a", "a87_tr14") * -1).alias("alpha_087"),
        (F.col("a89_tr3") - F.col("a89_tr15")).alias("alpha_089"),
        (F.col("a93_tr7") / F.col("r93b")).alias("alpha_093"),
        (F.greatest("a96_tr8", "a96_tr13") * -1).alias("alpha_096"),
    )
    p3 = ckpt(p3, "p3")

    # ---- P4: final cross-sectional stage (date axis) ----
    # Window pass (owns the date exchange): scale()/demean chains — incl.
    # alpha_060 and alpha_100 part A deferred from P2 — plus materialized
    # rank sources. Corr/cov outputs of the NON-fixed windowed corr are
    # pre-rounded to 9dp: short rank-windows produce mass ties at ±1.0
    # etc., and ulp-level float differences would otherwise split
    # average-tie groups nondeterministically across engines; fixed-point
    # corr outputs are engine-exact and rank unrounded.
    p4 = p3.select(
        "*",
        F.round("c_hv3", 9).alias("rk_chv3"),
        F.round("cov_cv5", 9).alias("rk_cov_cv5"),
        ((1 - F.col("r_a34ratio")) + (1 - F.col("r_a34d1"))).alias("rk_a34"),
        F.round("cov_hv5", 9).alias("rk_cov_hv5"),
        F.round("a27_s2", 9).alias("rk_a27"),
        cs.cs_scale("a29_log", 1.0, "d").alias("a29_s"),
        cs.cs_demean_fixed("b100", "d", "subind").alias("nB100"),
        (
            -1 * (2 * cs.cs_scale("r60_a", 1.0, "d") - cs.cs_scale("r60_b", 1.0, "d"))
        ).alias("alpha_060"),
        # alpha_100 part A: double subindustry demean of the CLV-volume
        # rank (demeaning an already-demeaned series is the formula as
        # written; with fixed-point means both passes are engine-exact)
        cs.cs_demean_fixed("r60_a", "d", "subind").alias("n100a"),
    )
    p4 = p4.select(
        "*",
        cs.cs_scale("nB100", 1.0, "d").alias("sB100"),
        cs.cs_demean_fixed("n100a", "d", "subind").alias("n100b"),
    )
    p4 = p4.select(
        "*",
        cs.cs_scale("n100b", 1.0, "d").alias("sA100"),
    )
    # rank block: one vectorized pass for the final-stage ranks
    p4 = cs.with_cs_rank_block(
        p4,
        {
            "r_chv3": "rk_chv3",
            "r13": "rk_cov_cv5",
            "alpha_034": "rk_a34",
            "r16": "rk_cov_hv5",
            "r27": "rk_a27",
            "r50": "a50_c",
            "r29c": "a29_s",
            "r31dec": "a31_dec",
            "r88dec": "a88_dec1",
            "r74c2": "a74_c2",
            "r75c2": "a75_c2",
            "r98d2": "a98_dec2",
            "r63a": "a63_dec8",
            "r67c": "c67",
            "r69m": "a69_m",
            "r79d": "a79_d",
            "r80s": "a80_sgn",
            "r97d": "a97_dec20",
            "r81lp": "a81_lp",
        },
        "d",
        keep=_P4_RANK_KEEP,
    )
    p4 = p4.select(
        "*",
        (-1 * F.col("r13")).alias("alpha_013"),
        (-1 * F.col("r16")).alias("alpha_016"),
        (F.col("r31dec") + F.col("r31c") + F.col("s31")).alias("alpha_031"),
        F.least(F.col("r88dec"), F.col("a88_y")).alias("alpha_088"),
        F.when(F.col("r74a") < F.col("r74c2"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_074"),
        F.when(F.col("r75a") < F.col("r75c2"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_075"),
        (F.col("r98a") - F.col("r98d2")).alias("alpha_098"),
        ((F.col("r63a") - F.col("r63b")) * -1).alias("alpha_063"),
        (F.pow(F.col("r67a"), F.col("r67c")) * -1).alias("alpha_067"),
        (F.pow(F.col("r69m"), F.col("a69_tr")) * -1).alias("alpha_069"),
        (F.greatest("r76a", "a76_tr19b") * -1).alias("alpha_076"),
        F.when(F.col("r79d") < F.col("r79b"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_079"),
        (F.pow(F.col("r80s"), F.col("a80_tr")) * -1).alias("alpha_080"),
        ((F.col("a91_tr4") - F.col("r91b")) * -1).alias("alpha_091"),
        ((F.col("r97d") - F.col("a97_tr6")) * -1).alias("alpha_097"),
        F.pow(F.col("r78a"), F.col("r50")).alias("alpha_078"),
        F.when(F.col("r81lp") < F.col("r50"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias("alpha_081"),
    )
    p4 = ckpt(p4, "p4")

    # ---- P5: time-series tail (code axis) + rank-threshold ternaries ----
    p5 = p4.select(
        "*",
        (-1 * ts.ts_sum("r_chv3", 3, w)).alias("alpha_015"),
        F.when(F.col("r27") > 0.5, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("alpha_027"),
        (-1 * ts.ts_max("r50", 5, w)).alias("alpha_050"),
        (ts.ts_min("r29c", 5, w) + F.col("a29_tr")).alias("alpha_029"),
        # alpha_100: scaled double-neutralized CLV rank minus scaled
        # neutralized (corr - argmin-rank), weighted by amount expansion
        # against the amount-based adv20 (reference's corrected-unit form)
        (
            -1
            * (
                (1.5 * F.col("sA100") - F.col("sB100"))
                * (F.col("amount") / F.col("adv20a"))
            )
        ).alias("alpha_100"),
    )
    return p5
