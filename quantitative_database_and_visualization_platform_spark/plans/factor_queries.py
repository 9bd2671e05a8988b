"""Factor-suite queries (SURVEY.md §2.9): technical / momentum / value /
recursive-EMA factor builds over the daily-bar panel, each checked against
a DuckDB oracle that re-derives every formula with window SQL (and, for
the recursive EMAs, the closed-form weighted sum — pandas
ewm(span, adjust=False) ≡ Σ_i w_i·x_i with w_1=(1-α)^(n-1),
w_i=α(1-α)^(n-i)).

Reference: `database/functions/basic factor_function.md:6-59`, engine
`database/functions/alpha101_engine.py`, DDL `factor_db_ddl.md:37-133`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..factors.ema_family import EMA_FAMILY_COLS, with_ema_family
from ..factors.panel import O_BARS, O_FUND, bars_table, fundamentals
from ..factors.suites import (
    MOMENTUM_GATES,
    TECHNICAL_GATES,
    VALUE_GATES,
    build_suite,
    momentum_columns,
    technical_columns,
    value_columns,
    with_derived,
)
from ..operators.timeseries import entity_window
from .registry import o_round6, query

_W = "PARTITION BY code ORDER BY d"


def _f(d: int) -> str:
    return f"{_W} ROWS BETWEEN {d - 1} PRECEDING AND CURRENT ROW"


def _o_gate(expr: str, col: str, d: int) -> str:
    """DuckDB twin of operators.timeseries.gate (min_periods parity)."""
    return f"CASE WHEN COUNT({col}) OVER ({_f(d)}) = {d} THEN {expr} END"


# shared derived-column CTEs (prev_close / ret / tp / tr / up_day)
_O_EXT = f"""
    ext AS (
        SELECT *, LAG(close) OVER ({_W}) AS prev_close FROM bars
    ), ext2 AS (
        SELECT *,
               close/prev_close - 1 AS ret,
               (high+low+close)/3.0 AS tp,
               GREATEST(high-low, ABS(high-prev_close), ABS(low-prev_close)) AS tr,
               CAST(close > prev_close AS INT) AS up_day,
               CAST(close = prev_close AS INT) AS flat_day
        FROM ext
    )
"""


# ---------------------------------------------------------------------------
# Technical suite (~20 cols; `basic factor_function.md:6-28`).
# ---------------------------------------------------------------------------
def _o_technical() -> str:
    ma20 = f"AVG(close) OVER ({_f(20)})"
    std20 = f"STDDEV_SAMP(close) OVER ({_f(20)})"
    avg_up = f"AVG(GREATEST(close - prev_close, 0.0)) OVER ({_f(14)})"
    avg_down = f"AVG(GREATEST(prev_close - close, 0.0)) OVER ({_f(14)})"
    h14 = f"MAX(high) OVER ({_f(14)})"
    l14 = f"MIN(low) OVER ({_f(14)})"
    pos_mf = f"SUM(tp * volume * tp_up) OVER ({_f(14)})"
    neg_mf = f"SUM(tp * volume * (1 - tp_up)) OVER ({_f(14)})"
    return f"""
    WITH {O_BARS}, {_O_EXT},
    ext3 AS (
        SELECT *,
               CAST(tp > LAG(tp) OVER ({_W}) AS INT) AS tp_up,
               SUM(SIGN(close - prev_close) * volume)
                   OVER ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv,
               list(tp) OVER ({_f(14)}) AS l_tp,
               AVG(tp) OVER ({_f(14)}) AS m_tp,
               list(high) OVER ({_f(10)}) AS l_h10,
               list(low) OVER ({_f(10)}) AS l_l10,
               list(high) OVER ({_f(25)}) AS l_h25,
               list(low) OVER ({_f(25)}) AS l_l25,
               (close - MAX(close) OVER ({_f(14)}))
                   / MAX(close) OVER ({_f(14)}) * 100 AS dd14
        FROM ext2
    )
    SELECT code, d,
      {o_round6(_o_gate(f"AVG(close) OVER ({_f(5)})", 'close', 5))} AS ma_5,
      {o_round6(_o_gate(ma20, 'close', 20))} AS ma_20,
      {o_round6(_o_gate(f"AVG(close) OVER ({_f(60)})", 'close', 60))} AS ma_60,
      {o_round6(_o_gate(f"(close - {ma20}) / {ma20}", 'close', 20))} AS bias_20,
      {o_round6(_o_gate(
          f"(close - AVG(close) OVER ({_f(60)})) / (AVG(close) OVER ({_f(60)}))",
          'close', 60))} AS bias_60,
      {o_round6(_o_gate(f"{ma20} + 2 * {std20}", 'close', 20))} AS boll_upper,
      {o_round6(_o_gate(f"{ma20} - 2 * {std20}", 'close', 20))} AS boll_lower,
      {o_round6(_o_gate(f"100 * {avg_up} / ({avg_up} + {avg_down})", 'prev_close', 14))} AS rsi_14,
      {o_round6(_o_gate(f"AVG(tr) OVER ({_f(14)})", 'tr', 14))} AS atr_14,
      {o_round6(_o_gate(f"AVG(tr) OVER ({_f(14)}) / close * 100", 'tr', 14))} AS natr_14,
      {o_round6(_o_gate(
          f"(tp - m_tp) / (0.015 * (list_sum(list_transform(l_tp, v -> ABS(v - m_tp))) / len(l_tp)))",
          'tp', 14))} AS cci_14,
      {o_round6(_o_gate(f"({h14} - close) / ({h14} - {l14}) * -100", 'close', 14))} AS wr_14,
      {o_round6(_o_gate(f"SUM(up_day) OVER ({_f(12)}) / 12.0 * 100", 'up_day', 12))} AS psy_12,
      {o_round6(f"volume / LAG(volume, 5) OVER ({_W}) - 1")} AS vroc_5,
      {o_round6(f"volume / LAG(volume, 20) OVER ({_W}) - 1")} AS vroc_20,
      {o_round6(f"(obv - LAG(obv, 5) OVER ({_W})) / 5.0")} AS obv_slope_5,
      {o_round6(f"(obv - LAG(obv, 20) OVER ({_W})) / 20.0")} AS obv_slope_20,
      {o_round6(_o_gate(
          f"(close - SUM(amount) OVER ({_f(10)}) / SUM(volume) OVER ({_f(10)}))"
          f" / (SUM(amount) OVER ({_f(10)}) / SUM(volume) OVER ({_f(10)}))",
          'amount', 10))} AS vwap_bias_10,
      {o_round6(_o_gate(
          f"(close - SUM(amount) OVER ({_f(20)}) / SUM(volume) OVER ({_f(20)}))"
          f" / (SUM(amount) OVER ({_f(20)}) / SUM(volume) OVER ({_f(20)}))",
          'amount', 20))} AS vwap_bias_20,
      {o_round6(_o_gate(f"SQRT(AVG(dd14 * dd14) OVER ({_f(14)}))", 'close', 14))} AS ui_14,
      {o_round6(_o_gate(
          "(CAST(len(l_l10) - list_position(l_l10, list_aggregate(l_l10, 'min')) AS DOUBLE)"
          " - CAST(len(l_h10) - list_position(l_h10, list_aggregate(l_h10, 'max')) AS DOUBLE)) * 10.0",
          'high', 10))} AS aroon_osc_10,
      {o_round6(_o_gate(
          "(CAST(len(l_l25) - list_position(l_l25, list_aggregate(l_l25, 'min')) AS DOUBLE)"
          " - CAST(len(l_h25) - list_position(l_h25, list_aggregate(l_h25, 'max')) AS DOUBLE)) * 4.0",
          'high', 25))} AS aroon_osc_25,
      {o_round6(_o_gate(
          f"100 * LOG10(SUM(tr) OVER ({_f(14)}) / (MAX(high) OVER ({_f(14)}) - MIN(low) OVER ({_f(14)})))"
          f" / LOG10(14.0)",
          'tr', 14))} AS chop_14,
      {o_round6(_o_gate(f"100 * {pos_mf} / ({pos_mf} + {neg_mf})", 'tp', 14))} AS mfi_14,
      {o_round6(_o_gate(f"AVG(ABS(ret) / amount * 1e6) OVER ({_f(10)})", 'ret', 10))} AS amihud_10,
      {o_round6(_o_gate(f"AVG(ABS(ret) / amount * 1e6) OVER ({_f(20)})", 'ret', 20))} AS amihud_illiq_20,
      {o_round6(_o_gate(f"STDDEV_SAMP(CAST(volume AS DOUBLE)) OVER ({_f(10)})", 'volume', 10))} AS turnover_std_10,
      {o_round6(_o_gate(f"STDDEV_SAMP(CAST(volume AS DOUBLE)) OVER ({_f(20)})", 'volume', 20))} AS turnover_std_20,
      {o_round6(_o_gate(f"{std20} / {ma20}", 'close', 20))} AS cv_20
    FROM ext3
    """


@query("factor_technical", oracle=_o_technical())
def factor_technical(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived = with_derived(bars_table(spark, sf_dir))
    return build_suite(derived, technical_columns(entity_window("code", "d")), TECHNICAL_GATES)


# ---------------------------------------------------------------------------
# Momentum suite (`basic factor_function.md:34-44`).
# ---------------------------------------------------------------------------
def _o_momentum() -> str:
    v_up = f"SUM(volume * up_day) OVER ({_f(10)})"
    v_down = f"SUM(volume * (1 - up_day) * (1 - flat_day)) OVER ({_f(10)})"
    v_flat = f"SUM(volume * flat_day) OVER ({_f(10)})"
    l20 = f"MIN(low) OVER ({_f(20)})"
    h20 = f"MAX(high) OVER ({_f(20)})"
    return f"""
    WITH {O_BARS}, {_O_EXT},
    m1 AS (
        SELECT *,
               close / LAG(close, 5) OVER ({_W}) - 1 AS roc5,
               CAST(ROW_NUMBER() OVER ({_W}) AS DOUBLE) AS rn
        FROM ext2
    )
    SELECT code, d,
      {o_round6("roc5")} AS roc_5,
      {o_round6(f"close / LAG(close, 20) OVER ({_W}) - 1")} AS roc_20,
      {o_round6(f"close / LAG(close, 60) OVER ({_W}) - 1")} AS roc_60,
      {o_round6(_o_gate(f"STDDEV_SAMP(ret) OVER ({_f(10)})", 'ret', 10))} AS volatility_10,
      {o_round6(_o_gate(f"STDDEV_SAMP(ret) OVER ({_f(20)})", 'ret', 20))} AS volatility_20,
      {o_round6(_o_gate(f"AVG(CAST(volume AS DOUBLE)) OVER ({_f(5)})", 'volume', 5))} AS turnover_mean_5,
      {o_round6(_o_gate(f"AVG((high - low) / prev_close) OVER ({_f(5)})", 'prev_close', 5))} AS amplitude_mean_5,
      {o_round6(_o_gate(f"(close - {l20}) / ({h20} - {l20})", 'close', 20))} AS pos_20,
      {o_round6(_o_gate(
          f"(close - MIN(low) OVER ({_f(60)})) / (MAX(high) OVER ({_f(60)}) - MIN(low) OVER ({_f(60)}))",
          'close', 60))} AS pos_60,
      {o_round6(f"roc5 - LAG(roc5, 5) OVER ({_W})")} AS mom_acc_5,
      {o_round6(_o_gate(f"({v_up} + 0.5 * {v_flat}) / ({v_down} + 0.5 * {v_flat})", 'prev_close', 10))} AS vr_10,
      {o_round6(_o_gate(
          f"(SUM(volume * up_day) OVER ({_f(26)}) + 0.5 * SUM(volume * flat_day) OVER ({_f(26)}))"
          f" / (SUM(volume * (1 - up_day) * (1 - flat_day)) OVER ({_f(26)})"
          f" + 0.5 * SUM(volume * flat_day) OVER ({_f(26)}))",
          'prev_close', 26))} AS vr_26,
      {o_round6(_o_gate(f"SKEWNESS(ret) OVER ({_f(10)})", 'ret', 10))} AS skew_10,
      {o_round6(_o_gate(f"SKEWNESS(ret) OVER ({_f(20)})", 'ret', 20))} AS skew_20,
      {o_round6(_o_gate(f"KURTOSIS(ret) OVER ({_f(10)})", 'ret', 10))} AS kurt_10,
      {o_round6(_o_gate(f"KURTOSIS(ret) OVER ({_f(20)})", 'ret', 20))} AS kurt_20,
      {o_round6(_o_gate(f"REGR_SLOPE(close, rn) OVER ({_f(10)})", 'close', 10))} AS linreg_slope_10,
      {o_round6(_o_gate(f"REGR_SLOPE(close, rn) OVER ({_f(20)})", 'close', 20))} AS linear_reg_slope_20
    FROM m1
    """


@query("factor_momentum", oracle=_o_momentum())
def factor_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived = with_derived(bars_table(spark, sf_dir))
    return build_suite(derived, momentum_columns(entity_window("code", "d")), MOMENTUM_GATES)


# ---------------------------------------------------------------------------
# Value suite (`basic factor_function.md:50-59`): inverse ratios + ln size
# + trailing zscores.
# ---------------------------------------------------------------------------
def _o_value() -> str:
    pe, pb = "(close/open)", "(close/low)"

    def z(x: str, d: int = 20) -> str:
        return f"({x} - AVG({x}) OVER ({_f(d)})) / STDDEV_SAMP({x}) OVER ({_f(d)})"

    return f"""
    WITH {O_BARS}, {O_FUND},
    vb AS (
        SELECT b.*, fy.dps, fy.yoy_np
        FROM bars b LEFT JOIN fundy fy
          ON b.code = fy.code AND CAST(date_trunc('month', b.d) AS DATE) = fy.mo
    )
    SELECT code, d,
      {o_round6("CASE WHEN close * volume > 0 THEN LN(close * volume) END")} AS ln_market_cap,
      {o_round6(f"1 / {pe}")} AS ep_ttm,
      {o_round6(f"1 / {pb}")} AS bp_lr,
      {o_round6("(amount / volume) / close")} AS sp_ttm,
      {o_round6(f"{pb} / {pe}")} AS roe_ttm,
      {o_round6(_o_gate(z(pe), 'close', 20))} AS pe_zscore_20,
      {o_round6(_o_gate(z(pb), 'close', 20))} AS pb_zscore_20,
      {o_round6(_o_gate(z(pe, 60), 'close', 60))} AS pe_zscore_60,
      {o_round6(_o_gate(z(pb, 60), 'close', 60))} AS pb_zscore_60,
      {o_round6("dps / close")} AS dividend_yield,
      {o_round6("yoy_np")} AS yoy_net_profit
    FROM vb
    """


@query("factor_value", oracle=_o_value())
def factor_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = bars_table(spark, sf_dir)
    joined = bars.withColumn("mo", F.trunc(F.col("d"), "month")).join(
        F.broadcast(fundamentals(bars)), ["code", "mo"], "left"
    )
    derived = with_derived(joined)
    cols = value_columns(entity_window("code", "d"))
    # fundamentals-driven factors (synthetic fixture, see panel.O_FUND)
    cols["dividend_yield"] = F.col("dps") / F.col("close")
    cols["yoy_net_profit"] = F.col("yoy_np")
    return build_suite(derived, cols, VALUE_GATES)


# ---------------------------------------------------------------------------
# Recursive-EMA family: MACD diff/dea, KDJ, TRIX, Force — one applyInPandas
# pass per entity; oracle via the closed-form EMA weighted sums over
# per-code lists (stage-by-stage CTEs, each O(n^2) list math).
# ---------------------------------------------------------------------------
def _o_ema(src: str, alpha: str) -> str:
    """Closed-form ewm(adjust=False) of a list column, as a list."""
    return (
        f"list_transform(range(1, len({src})+1), j -> "
        f"list_sum(list_transform(range(1, j+1), i -> {src}[i] * "
        f"(CASE WHEN i = 1 THEN power(1-({alpha}), j-1) "
        f"ELSE ({alpha}) * power(1-({alpha}), j-i) END))))"
    )


def _o_ema_family() -> str:
    a12, a26, a9, a5, a13 = "2.0/13.0", "2.0/27.0", "2.0/10.0", "2.0/6.0", "2.0/14.0"
    a9m = "2.0/10.0"  # span-9 EMA for the mass index channel width
    return f"""
    WITH {O_BARS},
    ext AS (
        SELECT code, d, close, volume, high - low AS hl,
               MIN(low)  OVER ({_f(9)}) AS ln,
               MAX(high) OVER ({_f(9)}) AS hn,
               COALESCE(volume * (close - LAG(close) OVER ({_W})), 0.0) AS fc
        FROM bars
    ), rsvd AS (
        SELECT code, d, close, fc, hl,
               CASE WHEN hn = ln THEN 50.0 ELSE (close - ln)/(hn - ln)*100 END AS rsv
        FROM ext
    ), percode AS (
        SELECT code,
               list(d ORDER BY d)     AS ds,
               list(close ORDER BY d) AS c,
               list(rsv ORDER BY d)   AS rsvl,
               list(fc ORDER BY d)    AS fcl,
               list(hl ORDER BY d) AS hll
        FROM rsvd GROUP BY code
    ), s1 AS (
        SELECT code, ds,
               {_o_ema('c', a12)}    AS e12,
               {_o_ema('c', a26)}    AS e26,
               {_o_ema('rsvl', a5)}  AS kl,
               {_o_ema('fcl', a13)}  AS forcel,
               {_o_ema('c', a12)}    AS t1,
               {_o_ema('hll', a9m)}  AS e9m
        FROM percode
    ), s2 AS (
        SELECT code, ds, kl, forcel, e9m,
               list_transform(range(1, len(e12)+1), j -> (e12[j] - e26[j]) * 2) AS diffl,
               {_o_ema('kl', a5)} AS dl,
               {_o_ema('t1', a12)} AS t2,
               {_o_ema('e9m', a9m)} AS e99m
        FROM s1
    ), s3 AS (
        SELECT code, ds, kl, dl, forcel, diffl,
               {_o_ema('diffl', a9)} AS deal,
               {_o_ema('t2', a12)}   AS t3,
               list_transform(range(1, len(e9m)+1), j -> e9m[j] / e99m[j]) AS rl
        FROM s2
    ), s4 AS (
        SELECT code, ds, kl, dl, forcel, diffl, deal,
               list_transform(range(1, len(t3)+1),
                              j -> CASE WHEN j = 1 THEN NULL ELSE t3[j]/t3[j-1] - 1 END) AS trixl,
               list_transform(range(1, len(kl)+1), j -> 3*kl[j] - 2*dl[j]) AS jl,
               list_transform(range(1, len(rl)+1),
                              j -> CASE WHEN len(list_filter(
                                       list_slice(rl, greatest(j-9, 1), j),
                                       x -> x IS NOT NULL)) = 10
                                   THEN list_sum(list_slice(rl, j-9, j)) END) AS massl
        FROM s3
    )
    , un AS (
        SELECT code,
               unnest(ds)     AS d,
               unnest(diffl)  AS macd_diff,
               unnest(deal)   AS macd_dea,
               unnest(kl)     AS kdj_k,
               unnest(dl)     AS kdj_d,
               unnest(jl)     AS kdj_j,
               unnest(trixl)  AS trix_12,
               unnest(forcel) AS force_13,
               unnest(massl)  AS mass_10
        FROM s4
    )
    SELECT code, d,
           {o_round6('macd_diff')} AS macd_diff,
           {o_round6('macd_dea')}  AS macd_dea,
           {o_round6('kdj_k')}     AS kdj_k,
           {o_round6('kdj_d')}     AS kdj_d,
           {o_round6('kdj_j')}     AS kdj_j,
           {o_round6('trix_12')}   AS trix_12,
           {o_round6('force_13')}  AS force_13,
           {o_round6('mass_10')}   AS mass_10
    FROM un
    """


@query("factor_ema_family", oracle=_o_ema_family())
def factor_ema_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import round6

    out = with_ema_family(bars_table(spark, sf_dir))
    return out.select(
        "code", "d", *[round6(c).alias(c) for c in EMA_FAMILY_COLS]
    )


# ---------------------------------------------------------------------------
# Similar-K-line search (`QuantDB.py:181-202` end-to-end): the latest
# cross-section's (rsi_14, cci_14, bias_20) feature vector per entity,
# weighted-Euclidean distance to a probe entity, top-3 nearest. One
# factor build + a broadcast one-row probe + TakeOrderedAndProject.
# ---------------------------------------------------------------------------
def _o_kline_sim() -> str:
    ma20 = f"AVG(close) OVER ({_f(20)})"
    avg_up = f"AVG(GREATEST(close - prev_close, 0.0)) OVER ({_f(14)})"
    avg_down = f"AVG(GREATEST(prev_close - close, 0.0)) OVER ({_f(14)})"
    return f"""
    WITH {O_BARS}, {_O_EXT},
    ext3 AS (
        SELECT *, list(tp) OVER ({_f(14)}) AS l_tp, AVG(tp) OVER ({_f(14)}) AS m_tp
        FROM ext2
    ),
    feat AS (
        SELECT code, d,
               {_o_gate(f"100 * {avg_up} / ({avg_up} + {avg_down})", 'prev_close', 14)} AS rsi_14,
               {_o_gate(
                   "(tp - m_tp) / (0.015 * (list_sum(list_transform(l_tp, v -> ABS(v - m_tp))) / len(l_tp)))",
                   'tp', 14)} AS cci_14,
               {_o_gate(f"(close - {ma20}) / {ma20}", 'close', 20)} AS bias_20
        FROM ext3
    ),
    latest AS (
        SELECT * FROM feat
        WHERE d = (SELECT MAX(d) FROM feat)
          AND rsi_14 IS NOT NULL AND cci_14 IS NOT NULL AND bias_20 IS NOT NULL
    ),
    probe AS (SELECT rsi_14 AS p_rsi, cci_14 AS p_cci, bias_20 AS p_bias
              FROM latest WHERE code = 0)
    SELECT code,
           ROUND(sqrt((rsi_14 - p_rsi) * 1.0 * ((rsi_14 - p_rsi) * 1.0)
                 + (cci_14 - p_cci) * 0.5 * ((cci_14 - p_cci) * 0.5)
                 + (bias_20 - p_bias) * 100.0 * ((bias_20 - p_bias) * 100.0)), 6) AS dist
    FROM latest, probe
    WHERE code <> 0
    ORDER BY dist, code LIMIT 3
    """


@query("kline_similarity_search", oracle=_o_kline_sim())
def kline_similarity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries as ts
    from ..operators.relational import top_k

    w = entity_window("code", "d")
    derived = with_derived(bars_table(spark, sf_dir))
    cols = technical_columns(w)
    feat = derived.select(
        "code",
        "d",
        ts.gate(cols["rsi_14"], "prev_close", 14, w).alias("rsi_14"),
        ts.gate(cols["cci_14"], "tp", 14, w).alias("cci_14"),
        ts.gate(cols["bias_20"], "close", 20, w).alias("bias_20"),
    )
    latest = (
        feat.join(F.broadcast(feat.agg(F.max("d").alias("d"))), "d", "left_semi")
        .filter(
            F.col("rsi_14").isNotNull()
            & F.col("cci_14").isNotNull()
            & F.col("bias_20").isNotNull()
        )
    )
    probe = latest.filter(F.col("code") == 0).select(
        F.col("rsi_14").alias("p_rsi"),
        F.col("cci_14").alias("p_cci"),
        F.col("bias_20").alias("p_bias"),
    )
    d_rsi = (F.col("rsi_14") - F.col("p_rsi")) * 1.0
    d_cci = (F.col("cci_14") - F.col("p_cci")) * 0.5
    d_bias = (F.col("bias_20") - F.col("p_bias")) * 100.0
    dist = F.sqrt(d_rsi * d_rsi + d_cci * d_cci + d_bias * d_bias)
    scored = (
        latest.crossJoin(F.broadcast(probe))
        .filter(F.col("code") != 0)
        .select("code", F.round(dist, 6).alias("dist"))
    )
    return top_k(scored, [F.col("dist"), F.col("code")], 3)


# ---------------------------------------------------------------------------
# Daily → weekly resample (the reference stores daily/weekly/monthly bar
# tables, `quant_db_ddl.md:38-64`): period rollup with deterministic
# first/last picks — same pattern as the tick→daily build, one groupBy.
# ---------------------------------------------------------------------------
@query(
    "monthly_bars_rollup",
    oracle=f"""
    WITH {O_BARS},
    flagged AS (
        SELECT code, CAST(date_trunc('month', d) AS DATE) AS mo,
               open, high, low, close, volume, amount,
               ROW_NUMBER() OVER (PARTITION BY code, date_trunc('month', d)
                                  ORDER BY d) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY code, date_trunc('month', d)
                                  ORDER BY d DESC) AS rn_z
        FROM bars
    )
    SELECT code, mo,
           MAX(CASE WHEN rn_a = 1 THEN open END)  AS open,
           MAX(high)                              AS high,
           MIN(low)                               AS low,
           MAX(CASE WHEN rn_z = 1 THEN close END) AS close,
           CAST(SUM(volume) AS BIGINT)            AS volume,
           SUM(CAST(ROUND(amount*100,0) AS BIGINT))/100.0 AS amount,
           CAST(COUNT(*) AS BIGINT)               AS n_days
    FROM flagged
    GROUP BY code, mo
    """,
)
def monthly_bars_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily → monthly resample (the reference stores daily/weekly/monthly
    bar tables, `quant_db_ddl.md:38-64`): the weekly rollup operator with
    a month bucket — deterministic open/close picks, integer-exact sums."""
    from pyspark.sql import Window

    bars = bars_table(spark, sf_dir)
    mo = F.trunc(F.col("d"), "month")
    w_asc = Window.partitionBy("code", mo).orderBy("d")
    w_desc = Window.partitionBy("code", mo).orderBy(F.col("d").desc())
    flagged = bars.select(
        "code",
        mo.alias("mo"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "amount",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_z"),
    )
    return flagged.groupBy("code", "mo").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("open"))).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("close"))).alias("close"),
        F.sum("volume").alias("volume"),
        (F.sum(F.round(F.col("amount") * 100, 0).cast("long")) / 100.0).alias("amount"),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "weekly_bars_rollup",
    oracle=f"""
    WITH {O_BARS},
    flagged AS (
        SELECT code, CAST(date_trunc('week', d) AS DATE) AS wk,
               open, high, low, close, volume, amount,
               ROW_NUMBER() OVER (PARTITION BY code, date_trunc('week', d)
                                  ORDER BY d) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY code, date_trunc('week', d)
                                  ORDER BY d DESC) AS rn_z
        FROM bars
    )
    SELECT code, wk,
           MAX(CASE WHEN rn_a = 1 THEN open END)  AS open,
           MAX(high)                              AS high,
           MIN(low)                               AS low,
           MAX(CASE WHEN rn_z = 1 THEN close END) AS close,
           CAST(SUM(volume) AS BIGINT)            AS volume,
           SUM(CAST(ROUND(amount*100,0) AS BIGINT))/100.0 AS amount,
           CAST(COUNT(*) AS BIGINT)               AS n_days
    FROM flagged
    GROUP BY code, wk
    """,
)
def weekly_bars_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    bars = bars_table(spark, sf_dir)
    wk = F.trunc(F.col("d"), "week")
    w_asc = Window.partitionBy("code", wk).orderBy("d")
    w_desc = Window.partitionBy("code", wk).orderBy(F.col("d").desc())
    flagged = bars.select(
        "code",
        wk.alias("wk"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "amount",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_z"),
    )
    return flagged.groupBy("code", "wk").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("open"))).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("close"))).alias("close"),
        F.sum("volume").alias("volume"),
        (F.sum(F.round(F.col("amount") * 100, 0).cast("long")) / 100.0).alias("amount"),
        F.count(F.lit(1)).alias("n_days"),
    )


# ---------------------------------------------------------------------------
# Boolean-mask factor screener (`pages/3_Smart screener.py:91-126`):
# chained factor conditions including the cross-column MA alignment
# (ma_5 > ma_20), an RSI band, and the micro-cap noise filter — pure
# filter pushdown over the factor build, then top-k.
# ---------------------------------------------------------------------------
def _o_screener() -> str:
    ma5 = f"AVG(close) OVER ({_f(5)})"
    ma20 = f"AVG(close) OVER ({_f(20)})"
    avg_up = f"AVG(GREATEST(close - prev_close, 0.0)) OVER ({_f(14)})"
    avg_down = f"AVG(GREATEST(prev_close - close, 0.0)) OVER ({_f(14)})"
    return f"""
    WITH {O_BARS}, {_O_EXT},
    factors AS (
        SELECT code, d, close, volume,
               {_o_gate(ma5, 'close', 5)} AS ma_5,
               {_o_gate(ma20, 'close', 20)} AS ma_20,
               {_o_gate(f"100 * {avg_up} / ({avg_up} + {avg_down})", 'prev_close', 14)} AS rsi_14
        FROM ext2
    )
    SELECT code, d, close,
           ROUND(ma_5, 6) AS ma_5, ROUND(ma_20, 6) AS ma_20,
           ROUND(rsi_14, 6) AS rsi_14
    FROM factors
    WHERE ma_5 > ma_20            -- MA alignment
      AND rsi_14 BETWEEN 20 AND 80 -- band filter
      AND volume > 50             -- micro-cap noise filter
      AND close > ma_20           -- price above trend
    ORDER BY close DESC, code, d
    LIMIT 100
    """


@query("screener_factor_mask", oracle=_o_screener())
def screener_factor_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import timeseries as ts
    from ..operators.relational import top_k

    w = entity_window("code", "d")
    derived = with_derived(bars_table(spark, sf_dir))
    close, prev = F.col("close"), F.col("prev_close")
    avg_up = ts.ts_mean(F.greatest(close - prev, F.lit(0.0)), 14, w)
    avg_down = ts.ts_mean(F.greatest(prev - close, F.lit(0.0)), 14, w)
    factors = derived.select(
        "code",
        "d",
        "close",
        "volume",
        ts.gate(ts.ts_mean(close, 5, w), "close", 5, w).alias("ma_5"),
        ts.gate(ts.ts_mean(close, 20, w), "close", 20, w).alias("ma_20"),
        ts.gate(100 * avg_up / (avg_up + avg_down), "prev_close", 14, w).alias("rsi_14"),
    )
    screened = factors.filter(
        (F.col("ma_5") > F.col("ma_20"))
        & F.col("rsi_14").between(20, 80)
        & (F.col("volume") > 50)
        & (F.col("close") > F.col("ma_20"))
    ).select(
        "code",
        "d",
        "close",
        F.round("ma_5", 6).alias("ma_5"),
        F.round("ma_20", 6).alias("ma_20"),
        F.round("rsi_14", 6).alias("rsi_14"),
    )
    return top_k(screened, [F.col("close").desc(), F.col("code"), F.col("d")], 100)
