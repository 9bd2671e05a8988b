"""Technical / momentum / value factor suites (SURVEY.md §2.9).

Every factor is a composition of the window primitives in
`operators/timeseries.py` over the daily-bar panel — formula definitions
from the reference's `database/functions/basic factor_function.md:6-59`
(window lengths shortened to fit the test panel's date span; the formulas
are parameterized so production lengths are a constructor argument).

Scale shape: ONE shuffle on the entity key serves every factor column in a
suite (all windows share `partitionBy(code).orderBy(d)`), so a 50-factor
build is one exchange + one in-memory sort per partition — the same plan
the reference's 5-stage pipeline runs per stage. min_periods parity with
pandas rolling comes from `gate()` (NULL until the window is full).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, WindowSpec
from pyspark.sql import functions as F

from ..operators import timeseries as ts


def _bars_window() -> WindowSpec:
    return ts.entity_window("code", "d")


def with_derived(bars: DataFrame) -> DataFrame:
    """prev_close / ret / tp (typical price) / tr (true range) / up_day —
    the shared intermediate columns every suite builds on
    (`basic factor_function.md:10,13-14`)."""
    w = _bars_window()
    prev_close = F.lag("close").over(w)
    return bars.select(
        "*",
        prev_close.alias("prev_close"),
        (F.col("close") / prev_close - 1).alias("ret"),
        ((F.col("high") + F.col("low") + F.col("close")) / 3.0).alias("tp"),
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        ).alias("tr"),
        (F.col("close") > prev_close).cast("int").alias("up_day"),
    )


def _mad(x: Column | str, d: int, w: WindowSpec) -> Column:
    """Rolling mean absolute deviation around the window mean (the CCI
    denominator, `basic factor_function.md:15`): two-pass over the frame
    via a collect_list + fold — JVM-side, no Python."""
    c = F.col(x) if isinstance(x, str) else x
    arr = F.collect_list(c).over(ts.rolling(w, d))
    m = F.avg(c).over(ts.rolling(w, d))
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + F.abs(v - m)) / F.size(arr)


def technical_columns(w: WindowSpec) -> dict[str, Column]:
    """Technical factors (`basic factor_function.md:6-28`,
    `factor_db_ddl.md:88-104`). Keys are output column names; values are
    ungated Column expressions (callers gate + round).

    Both the reference window lengths (ma_60, vroc_20, aroon_osc_25,
    amihud_illiq_20, …) and panel-fit shortened twins (vroc_5,
    aroon_osc_10, amihud_10, …) are emitted: the synthetic panel spans
    only ~30 trading days per code, so the 60-day columns are min_periods
    NULL there — the gate hashes them as NULL on both engines — while the
    shortened twins exercise the same operator with real values."""
    close, high, low, vol = F.col("close"), F.col("high"), F.col("low"), F.col("volume")
    ma5 = ts.ts_mean(close, 5, w)
    ma20 = ts.ts_mean(close, 20, w)
    std20 = ts.ts_stddev(close, 20, w)
    # RSI: simple means of up/down moves (the reference's Mean(Up)/Mean(Down))
    d1 = F.col("close") - F.col("prev_close")
    up_move, down_move = F.greatest(d1, F.lit(0.0)), F.greatest(-d1, F.lit(0.0))
    avg_up, avg_down = ts.ts_mean(up_move, 14, w), ts.ts_mean(down_move, 14, w)
    # CCI
    tp, tr = F.col("tp"), F.col("tr")
    cci = (tp - ts.ts_mean(tp, 14, w)) / (0.015 * _mad(tp, 14, w))
    # Williams %R
    h14, l14 = ts.ts_max(high, 14, w), ts.ts_min(low, 14, w)
    # VWAP bias over 10 days (amount/volume are integer-exact sums)
    vwap10 = ts.ts_sum("amount", 10, w) / ts.ts_sum(vol, 10, w)
    # OBV slope: cumulative signed volume, 5-day difference
    obv = ts.cum_sum(F.signum(d1) * vol, w)
    # Ulcer index: sqrt(mean(drawdown^2, 14))
    dd = (close - ts.ts_max(close, 14, w)) / ts.ts_max(close, 14, w) * 100
    # Aroon oscillator: days-since-high vs days-since-low over 10
    aroon_osc = (ts.ts_argmin(low, 10, w) - ts.ts_argmax(high, 10, w)) * 10.0
    # Choppiness: path length vs range over 14
    rng14 = ts.ts_max(high, 14, w) - ts.ts_min(low, 14, w)
    chop = 100 * F.log10(ts.ts_sum(tr, 14, w) / rng14) / F.log10(F.lit(14.0))
    # MFI: money-flow RSI
    mf = tp * vol
    tp_up = (tp > F.lag(tp).over(w)).cast("int")
    pos_mf = ts.ts_sum(mf * tp_up, 14, w)
    neg_mf = ts.ts_sum(mf * (1 - tp_up), 14, w)
    # Amihud illiquidity (ppm): |ret| per unit amount
    amihud = ts.ts_mean(F.abs(F.col("ret")) / F.col("amount") * 1e6, 10, w)
    # reference-length twins (factor_db_ddl.md:88-104 / html sample row)
    ma60 = ts.ts_mean(close, 60, w)
    vwap20 = ts.ts_sum("amount", 20, w) / ts.ts_sum(vol, 20, w)
    return {
        "ma_5": ma5,
        "ma_20": ma20,
        "ma_60": ma60,
        "bias_20": (close - ma20) / ma20,
        "bias_60": (close - ma60) / ma60,
        "boll_upper": ma20 + 2 * std20,
        "boll_lower": ma20 - 2 * std20,
        "rsi_14": 100 * avg_up / (avg_up + avg_down),
        "atr_14": ts.ts_mean(tr, 14, w),
        "natr_14": ts.ts_mean(tr, 14, w) / close * 100,
        "cci_14": cci,
        "wr_14": (h14 - close) / (h14 - l14) * -100,
        "psy_12": ts.ts_sum("up_day", 12, w) / 12.0 * 100,
        "vroc_5": vol / F.lag(vol, 5).over(w) - 1,
        "vroc_20": vol / F.lag(vol, 20).over(w) - 1,
        "obv_slope_5": (obv - F.lag(obv, 5).over(w)) / 5.0,
        "obv_slope_20": (obv - F.lag(obv, 20).over(w)) / 20.0,
        "vwap_bias_10": (close - vwap10) / vwap10,
        "vwap_bias_20": (close - vwap20) / vwap20,
        "ui_14": F.sqrt(ts.ts_mean(dd * dd, 14, w)),
        "aroon_osc_10": aroon_osc,
        "aroon_osc_25": (ts.ts_argmin(low, 25, w) - ts.ts_argmax(high, 25, w)) * 4.0,
        "chop_14": chop,
        "mfi_14": 100 * pos_mf / (pos_mf + neg_mf),
        "amihud_10": amihud,
        "amihud_illiq_20": ts.ts_mean(F.abs(F.col("ret")) / F.col("amount") * 1e6, 20, w),
        "turnover_std_10": ts.ts_stddev(vol.cast("double"), 10, w),
        "turnover_std_20": ts.ts_stddev(vol.cast("double"), 20, w),
        "cv_20": std20 / ma20,
    }


def momentum_columns(w: WindowSpec) -> dict[str, Column]:
    """Momentum suite (`basic factor_function.md:34-44`)."""
    close, high, low, vol = F.col("close"), F.col("high"), F.col("low"), F.col("volume")
    roc5 = close / F.lag(close, 5).over(w) - 1
    # VR: up-day vs down-day volume over 10 (flat days split 50/50)
    up, flat = F.col("up_day"), (F.col("close") == F.col("prev_close")).cast("int")
    down = (1 - up) * (1 - flat)
    v_up = ts.ts_sum(vol * up, 10, w)
    v_down = ts.ts_sum(vol * down, 10, w)
    v_flat = ts.ts_sum(vol * flat, 10, w)
    l20, h20 = ts.ts_min(low, 20, w), ts.ts_max(high, 20, w)
    l60, h60 = ts.ts_min(low, 60, w), ts.ts_max(high, 60, w)
    v_up26 = ts.ts_sum(vol * up, 26, w)
    v_down26 = ts.ts_sum(vol * down, 26, w)
    v_flat26 = ts.ts_sum(vol * flat, 26, w)
    return {
        "roc_5": roc5,
        "roc_20": close / F.lag(close, 20).over(w) - 1,
        "roc_60": close / F.lag(close, 60).over(w) - 1,
        "volatility_10": ts.ts_stddev("ret", 10, w),
        "volatility_20": ts.ts_stddev("ret", 20, w),
        "turnover_mean_5": ts.ts_mean(vol.cast("double"), 5, w),
        "amplitude_mean_5": ts.ts_mean((high - low) / F.col("prev_close"), 5, w),
        "pos_20": (close - l20) / (h20 - l20),
        "pos_60": (close - l60) / (h60 - l60),
        "mom_acc_5": roc5 - F.lag(roc5, 5).over(w),
        "vr_10": (v_up + 0.5 * v_flat) / (v_down + 0.5 * v_flat),
        "vr_26": (v_up26 + 0.5 * v_flat26) / (v_down26 + 0.5 * v_flat26),
        "skew_10": ts.ts_skew("ret", 10, w),
        "skew_20": ts.ts_skew("ret", 20, w),
        "kurt_10": ts.ts_kurt("ret", 10, w),
        "kurt_20": ts.ts_kurt("ret", 20, w),
        "linreg_slope_10": ts.ts_regr_slope(close, 10, w),
        "linear_reg_slope_20": ts.ts_regr_slope(close, 20, w),
    }


def value_columns(w: WindowSpec) -> dict[str, Column]:
    """Value suite (`basic factor_function.md:50-59`). The testdata panel
    has no fundamentals, so the PE/PB analogs are price ratios — the
    *operators* (inverse ratios, ln size, trailing zscores) are the
    reference's."""
    close, open_, low = F.col("close"), F.col("open"), F.col("low")
    vwap_day = F.col("amount") / F.col("volume")
    pe = close / open_
    pb = close / low
    mv = close * F.col("volume")
    return {
        # zero-volume days have no market value: NULL, not -inf (and the
        # explicit guard keeps DuckDB, which throws on LN(0), in parity)
        "ln_market_cap": F.when(mv > 0, F.log(mv)),
        "ep_ttm": 1 / pe,
        "bp_lr": 1 / pb,
        "sp_ttm": vwap_day / close,
        "roe_ttm": pb / pe,
        "pe_zscore_20": ts.ts_zscore(pe, 20, w),
        "pb_zscore_20": ts.ts_zscore(pb, 20, w),
        # reference lengths (`factor_db_ddl.md:121-122`): NULL-gated on
        # the ~30-day synthetic panel, live on real spans
        "pe_zscore_60": ts.ts_zscore(pe, 60, w),
        "pb_zscore_60": ts.ts_zscore(pb, 60, w),
    }


# gate windows: NULL until the underlying column has a full window — the
# pandas min_periods=d semantics the reference relies on (SURVEY §7.3).
# Keyed by factor name: (gate column, window length). Factors built on
# lag() need no gate (lag is NULL-propagating by itself).
TECHNICAL_GATES: dict[str, tuple[str, int]] = {
    "ma_5": ("close", 5),
    "ma_20": ("close", 20),
    "ma_60": ("close", 60),
    "bias_20": ("close", 20),
    "bias_60": ("close", 60),
    "natr_14": ("tr", 14),
    "vwap_bias_20": ("amount", 20),
    "aroon_osc_25": ("high", 25),
    "amihud_illiq_20": ("ret", 20),
    "turnover_std_20": ("volume", 20),
    "boll_upper": ("close", 20),
    "boll_lower": ("close", 20),
    "rsi_14": ("prev_close", 14),
    "atr_14": ("tr", 14),
    "cci_14": ("tp", 14),
    "wr_14": ("close", 14),
    "psy_12": ("up_day", 12),
    "ui_14": ("close", 14),
    "aroon_osc_10": ("high", 10),
    "chop_14": ("tr", 14),
    "mfi_14": ("tp", 14),
    "amihud_10": ("ret", 10),
    "turnover_std_10": ("volume", 10),
    "cv_20": ("close", 20),
    "vwap_bias_10": ("amount", 10),
}

MOMENTUM_GATES: dict[str, tuple[str, int]] = {
    "volatility_10": ("ret", 10),
    "volatility_20": ("ret", 20),
    "turnover_mean_5": ("volume", 5),
    "amplitude_mean_5": ("prev_close", 5),
    "pos_20": ("close", 20),
    "pos_60": ("close", 60),
    "vr_10": ("prev_close", 10),
    "vr_26": ("prev_close", 26),
    "skew_10": ("ret", 10),
    "skew_20": ("ret", 20),
    "kurt_10": ("ret", 10),
    "kurt_20": ("ret", 20),
    "linreg_slope_10": ("close", 10),
    "linear_reg_slope_20": ("close", 20),
}

VALUE_GATES: dict[str, tuple[str, int]] = {
    "pe_zscore_20": ("close", 20),
    "pb_zscore_20": ("close", 20),
    "pe_zscore_60": ("close", 60),
    "pb_zscore_60": ("close", 60),
}


def build_suite(
    derived: DataFrame,
    columns: dict[str, Column],
    gates: dict[str, tuple[str, int]],
) -> DataFrame:
    """Attach a factor suite: gate (min_periods parity) + round (cross-
    engine float determinism) each factor, keep the panel key. Rounding is
    the floor-based fixed-point convention (`registry.round6`) — plain
    ROUND(x, 6) diverges from DuckDB on "...5"-boundary doubles and can
    emit a −0.0 that hashes differently from the other engine's 0.0.

    TWO-PHASE select, deliberately: ``round6`` references its argument
    four times (isnan / +inf / −inf guards + the floor), so applying it
    directly to a window expression plans the whole window tree 4× —
    measured 2–3× slower suite builds in round 3. Materializing the raw
    factor under a name first and rounding the *name reference* in a
    second projection plans each window expression exactly once
    (CollapseProject will not re-inline a multiply-referenced non-cheap
    expression, SPARK-36718)."""
    from ..plans.registry import round6

    w = _bars_window()
    raw_cols: list[Column] = [F.col("code"), F.col("d")]
    for name, expr in columns.items():
        if name in gates:
            gate_col, gate_d = gates[name]
            expr = ts.gate(expr, gate_col, gate_d, w)
        raw_cols.append(expr.alias(name))
    raw = derived.select(*raw_cols)
    return raw.select(
        "code", "d", *[round6(F.col(name)).alias(name) for name in columns]
    )
