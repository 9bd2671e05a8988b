"""Alpha101 subset query (SURVEY.md §2.9, `alpha101_function.md:5-105`):
the staged P1–P5 pipeline from `factors/alpha101.py`, oracle-checked
against a DuckDB CTE chain that mirrors each stage (window SQL for the TS
stages, average-tie NULLS-LAST ranks for the CS stages, list math for
ts_argmax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..factors.alpha101 import ALPHA_COLS, with_alphas
from ..factors.panel import O_BARS, daily_bars
from .registry import query

_W = "PARTITION BY code ORDER BY d"


def _f(d: int) -> str:
    return f"{_W} ROWS BETWEEN {d - 1} PRECEDING AND CURRENT ROW"


def _o_tsr(lst: str, v: str) -> str:
    """ts_rank over a windowed list (average-tie, matches ts.ts_rank)."""
    return (
        f"(len(list_filter({lst}, y -> y < {v}))"
        f" + len(list_filter({lst}, y -> y <= {v})) + 1) / 2.0 / len({lst})"
    )


def _o_gcorr(x: str, y: str, n: int) -> str:
    """Variance-gated windowed corr — the DuckDB twin of ts.ts_corr."""
    return (
        f"CASE WHEN STDDEV_SAMP({x}) OVER ({_f(n)}) > 0"
        f" AND STDDEV_SAMP({y}) OVER ({_f(n)}) > 0"
        f" THEN CORR({x}, {y}) OVER ({_f(n)}) END"
    )


def _o_rank(x: str) -> str:
    """Average-tie percentile rank within a date; null in → null out,
    non-null ranks unshifted (NULLS LAST ordering)."""
    return (
        f"CASE WHEN {x} IS NOT NULL THEN "
        f"(rank() OVER (PARTITION BY d ORDER BY {x}) "
        f" + (COUNT(*) OVER (PARTITION BY d, {x}) - 1)/2.0) "
        f" / COUNT({x}) OVER (PARTITION BY d) END"
    )


def _o_alphas() -> str:
    return f"""
    WITH {O_BARS},
    e1 AS (
        SELECT *, LAG(close) OVER ({_W}) AS prev_close,
               CASE WHEN volume > 0 THEN LN(volume) END AS log_v,
               close - LAG(close, 1) OVER ({_W}) AS d1,
               close - LAG(close, 7) OVER ({_W}) AS d7,
               LAG(close, 7) OVER ({_W}) AS lag7c,
               amount/volume AS vwap,
               ((close - low) - (high - close)) / (close - low) AS clv,
               ((close - low) - (high - close)) / (high - low) * volume AS a60_raw,
               LAG(close, 5) OVER ({_W}) AS lag5c,
               open - close AS d_oc,
               close / open AS a38_co
        FROM bars
    ), e2 AS (
        SELECT *, close/prev_close - 1 AS ret,
               log_v - LAG(log_v, 2) OVER ({_W}) AS dlv2,
               (close - open)/open AS intraday,
               SIGN(volume - LAG(volume, 1) OVER ({_W})) * (-1 * d1) AS alpha_012,
               SQRT(high*low) - amount/volume AS alpha_041,
               (-1 * ((low - close) * power(open, 5.0)))
                   / ((low - high) * power(close, 5.0)) AS alpha_054,
               (close - open) / ((high - low) + 0.001) AS alpha_101,
               open - LAG(high, 1) OVER ({_W}) AS a20_h,
               open - LAG(close, 1) OVER ({_W}) AS a20_c,
               open - LAG(low, 1) OVER ({_W}) AS a20_l,
               -1 * (clv - LAG(clv, 9) OVER ({_W})) AS alpha_053,
               vwap - close AS vc
        FROM e1
    ), e3 AS (
        SELECT *, STDDEV_SAMP(ret) OVER ({_f(20)}) AS std20,
               MIN(d1) OVER ({_f(5)}) AS tmin5,
               MAX(d1) OVER ({_f(5)}) AS tmax5,
               MIN(d1) OVER ({_f(4)}) AS tmin4,
               MAX(d1) OVER ({_f(4)}) AS tmax4,
               SUM(open) OVER ({_f(5)}) AS so5,
               SUM(ret) OVER ({_f(5)}) AS sr5,
               SUM(vwap) OVER ({_f(10)}) AS sv10,
               AVG(volume) OVER ({_f(20)}) AS adv20,
               AVG(high) OVER ({_f(20)}) AS mh20,
               high - LAG(high, 2) OVER ({_W}) AS dh2,
               STDDEV_SAMP(ret) OVER ({_f(2)}) AS s2r,
               STDDEV_SAMP(ret) OVER ({_f(5)}) AS s5r,
               MAX(vc) OVER ({_f(3)}) AS a11_max,
               MIN(vc) OVER ({_f(3)}) AS a11_min,
               volume - LAG(volume, 3) OVER ({_W}) AS a11_dv,
               ret - LAG(ret, 3) OVER ({_W}) AS a14_dr3,
               STDDEV_SAMP(ABS(close - open)) OVER ({_f(5)}) + (close - open)
                   + (CASE WHEN STDDEV_SAMP(close) OVER ({_f(10)}) > 0
                            AND STDDEV_SAMP(open) OVER ({_f(10)}) > 0
                           THEN CORR(close, open) OVER ({_f(10)}) END) AS a18_raw,
               -1 * SIGN((close - lag7c) + d7) AS a19_sign,
               SUM(ret) OVER ({_f(250)}) AS a19_sum,
               CASE WHEN STDDEV_SAMP(high) OVER ({_f(5)}) > 0
                     AND STDDEV_SAMP(volume) OVER ({_f(5)}) > 0
                    THEN CORR(high, volume) OVER ({_f(5)}) END AS c_hv5corr,
               STDDEV_SAMP(close) OVER ({_f(20)}) AS std20c,
               AVG(close) OVER ({_f(100)}) AS m100,
               MIN(close) OVER ({_f(100)}) AS tmin100,
               close - LAG(close, 3) OVER ({_W}) AS d3c,
               SIGN(d1) + SIGN(LAG(d1, 1) OVER ({_W}))
                   + SIGN(LAG(d1, 2) OVER ({_W})) AS a30_sgn,
               SUM(volume) OVER ({_f(5)}) AS sv5,
               SUM(volume) OVER ({_f(20)}) AS sv20,
               list(volume) OVER ({_f(32)}) AS l_v32,
               list(close + high - low) OVER ({_f(16)}) AS l_chl16,
               list(ret) FILTER (ret IS NOT NULL) OVER ({_f(32)}) AS l_ret32,
               d1 - LAG(d1, 1) OVER ({_W}) AS a17_dd1,
               list(close) OVER ({_f(30)}) AS l_c30,
               vwap - MAX(vwap) OVER ({_f(15)}) AS a84_dev,
               GREATEST(LEAST((close - LAG(close, 5) OVER ({_W})) / close, 3.0), -3.0) AS rd5,
               AVG(close) OVER ({_f(8)}) AS m8,
               STDDEV_SAMP(close) OVER ({_f(8)}) AS s8,
               AVG(close) OVER ({_f(2)}) AS m2,
               STDDEV_SAMP(high) OVER ({_f(10)}) AS a40_std,
               AVG(lag5c) OVER ({_f(20)}) AS a45_m,
               {_o_gcorr('close', 'volume', 2)} AS a45_c1,
               SUM(close) OVER ({_f(5)}) AS s5c,
               SUM(close) OVER ({_f(20)}) AS s20c,
               (LAG(close, 20) OVER ({_W}) - LAG(close, 10) OVER ({_W})) / 10
                   - (LAG(close, 10) OVER ({_W}) - close) / 10 AS a46_sd,
               LAG(d_oc, 1) OVER ({_W}) AS lag_doc,
               SUM(close) OVER ({_f(7)}) / 7 - close AS a32_x,
               {_o_gcorr('vwap', 'lag5c', 230)} AS a32_c,
               {_o_gcorr('high', 'volume', 10)} AS a40_c
        FROM e2
    ), e4 AS (
        SELECT *, CASE WHEN ret < 0 AND std20 IS NOT NULL
                       THEN std20 ELSE close END AS a1b,
               CASE WHEN tmin5 > 0 THEN d1
                    WHEN tmax5 < 0 THEN d1
                    ELSE -d1 END AS alpha_009,
               CASE WHEN tmin4 > 0 THEN d1
                    WHEN tmax4 < 0 THEN d1
                    ELSE -d1 END AS a10_core,
               CASE WHEN mh20 < high THEN -1 * dh2 ELSE 0.0 END AS alpha_023,
               so5 * sr5 AS mom,
               open - sv10/10 AS a5_dev,
               close - vwap AS a5_cv,
               ((((-1 * ret) * adv20) * vwap) * (high - close)) AS a25_raw,
               s2r / s5r AS a34_ratio,
               {_o_tsr('l_v32', 'volume')} AS a35_trv,
               {_o_tsr('l_chl16', '(close + high - low)')} AS a35_trchl,
               CASE WHEN ret IS NOT NULL
                    THEN {_o_tsr('l_ret32', 'ret')} END AS a35_trret,
               c_hv5corr - LAG(c_hv5corr, 5) OVER ({_W}) AS a22_d,
               (m100 - LAG(m100, 100) OVER ({_W}))
                   / LAG(close, 100) OVER ({_W}) AS ratio24,
               list(volume/adv20) FILTER ((volume/adv20) IS NOT NULL)
                   OVER ({_f(20)}) AS l_va20,
               list(-1*d7) FILTER ((-1*d7) IS NOT NULL) OVER ({_f(8)}) AS l_nd7,
               list(volume/adv20) FILTER ((volume/adv20) IS NOT NULL)
                   OVER ({_f(5)}) AS l_va5,
               list(a84_dev) FILTER (a84_dev IS NOT NULL) OVER ({_f(21)}) AS l_dev21
        FROM e3
    ), e5 AS (
        SELECT *, SIGN(a1b) * a1b * a1b AS sp,
               mom - LAG(mom, 10) OVER ({_W}) AS a8_raw,
               a35_trv * (1 - a35_trchl) * (1 - a35_trret) AS alpha_035,
               {_o_tsr('l_va20', '(volume/adv20)')} AS a43_a,
               CASE WHEN (-1*d7) IS NOT NULL
                    THEN {_o_tsr('l_nd7', '(-1*d7)')} END AS a43_b,
               CASE WHEN ratio24 <= 0.05 THEN -1 * (close - tmin100)
                    ELSE -1 * d3c END AS alpha_024,
               CASE WHEN (volume/adv20) IS NOT NULL
                    THEN {_o_tsr('l_va5', '(volume/adv20)')} END AS a17_trva,
               CASE WHEN a84_dev IS NOT NULL
                    THEN {_o_tsr('l_dev21', 'a84_dev')} END AS a84_tr,
               CASE WHEN m8 + s8 < m2 THEN -1.0
                    WHEN m2 < m8 - s8 THEN 1.0
                    WHEN volume / adv20 < 1 THEN -1.0
                    ELSE 1.0 END AS alpha_021,
               {_o_gcorr('adv20', 'low', 5)} + (high + low) / 2 - close AS a28_x,
               {_o_gcorr('s5c', 's20c', 2)} AS a45_c2,
               {_o_gcorr('lag_doc', 'close', 200)} AS a37_c,
               CASE WHEN a46_sd > 0.25 THEN -1.0
                    WHEN a46_sd < 0 THEN 1.0
                    ELSE -1 * d1 END AS alpha_046
        FROM e4
    ), p1 AS (
        SELECT *, list(sp) OVER ({_f(5)}) AS l_sp,
               list(volume) OVER ({_f(5)}) AS l_v5,
               list(high) OVER ({_f(5)}) AS l_h5,
               list(close) OVER ({_f(10)}) AS l_c10,
               a43_a * a43_b AS alpha_043,
               SIGN(a84_tr) * POWER(ABS(a84_tr), rd5) AS alpha_084
        FROM e5
    ), p1b AS (
        SELECT *, CAST(len(l_sp) - list_position(l_sp, list_aggregate(l_sp, 'max'))
                       AS DOUBLE) AS a1_argmax,
               (len(list_filter(l_v5, x -> x < volume))
                + len(list_filter(l_v5, x -> x <= volume)) + 1) / 2.0
                / len(l_v5) AS a26_trv,
               (len(list_filter(l_h5, x -> x < high))
                + len(list_filter(l_h5, x -> x <= high)) + 1) / 2.0
                / len(l_h5) AS a26_trh,
               CAST(len(l_c10) - list_position(l_c10, list_aggregate(l_c10, 'max'))
                    AS DOUBLE) AS a60_argmax,
               {_o_tsr('l_c10', 'close')} AS a17_trc,
               CAST(len(l_c30) - list_position(l_c30, list_aggregate(l_c30, 'max'))
                    AS DOUBLE) AS a57_argmax
        FROM p1
    ), p1c AS (
        SELECT *, CASE WHEN STDDEV_SAMP(a26_trv) OVER ({_f(5)}) > 0
                        AND STDDEV_SAMP(a26_trh) OVER ({_f(5)}) > 0
                       THEN CORR(a26_trv, a26_trh) OVER ({_f(5)}) END AS c26
        FROM p1b
    ), p1d AS (
        SELECT *, -1 * MAX(c26) OVER ({_f(3)}) AS alpha_026 FROM p1c
    ), p2 AS (
        SELECT *,
               {_o_rank('a1_argmax')} AS r_a1,
               {_o_rank('dlv2')} AS r_dlv2,
               {_o_rank('intraday')} AS r_intraday,
               {_o_rank('open')} AS r_open,
               {_o_rank('volume')} AS r_vol,
               {_o_rank('high')} AS r_high,
               {_o_rank('low')} AS r_low,
               {_o_rank('close')} AS r_close,
               {_o_rank('a5_dev')} AS r_a5dev,
               {_o_rank('a5_cv')} AS r_a5cv,
               {_o_rank('(-1 * (1 - open/close))')} AS alpha_033,
               -1 * ({_o_rank('a8_raw')}) AS alpha_008,
               {_o_rank('a10_core')} AS alpha_010,
               {_o_rank('a20_h')} AS r20_h,
               {_o_rank('a20_c')} AS r20_c,
               {_o_rank('a20_l')} AS r20_l,
               {_o_rank('a25_raw')} AS alpha_025,
               {_o_rank('a34_ratio')} AS r_a34ratio,
               {_o_rank('d1')} AS r_a34d1,
               {_o_rank('a60_raw')} AS r60_a,
               {_o_rank('a60_argmax')} AS r60_b,
               {_o_rank('a11_max')} AS r11_max,
               {_o_rank('a11_min')} AS r11_min,
               {_o_rank('a11_dv')} AS r11_dv,
               {_o_rank('a14_dr3')} AS r_dr3,
               -1 * ({_o_rank('a18_raw')}) AS alpha_018,
               {_o_rank('(1 + a19_sum)')} AS r_a19,
               {_o_rank('ROUND(std20c, 9)')} AS r_std20c,
               {_o_rank('a30_sgn')} AS r_a30,
               {_o_rank('a17_trc')} AS r_a17trc,
               {_o_rank('a17_dd1')} AS r_a17dd1,
               {_o_rank('a17_trva')} AS r_a17trva,
               {_o_rank('a57_argmax')} AS r_a57argmax,
               {_o_rank('vwap')} AS r_vwap,
               a28_x * 1.0 / SUM(ABS(a28_x)) OVER (PARTITION BY d) AS alpha_028,
               (a32_x * 1.0 / SUM(ABS(a32_x)) OVER (PARTITION BY d))
                   + 20 * (a32_c * 1.0 / SUM(ABS(a32_c)) OVER (PARTITION BY d)) AS alpha_032,
               {_o_rank('ROUND(a37_c, 9)')} AS r37_a,
               {_o_rank('d_oc')} AS r37_b,
               {_o_rank('a38_co')} AS r_co,
               {_o_rank('ROUND(a40_std, 9)')} AS r40,
               {_o_rank('a45_m')} AS r45_a,
               {_o_rank('ROUND(a45_c2, 9)')} AS r45_b
        FROM p1d
    ), p2b AS (
        SELECT *, r_a5dev * (-1 * ABS(r_a5cv)) AS alpha_005,
               (-1 * r20_h) * r20_c * r20_l AS alpha_020,
               -1 * (2 * (r60_a * 1.0 / SUM(ABS(r60_a)) OVER (PARTITION BY d))
                     - (r60_b * 1.0 / SUM(ABS(r60_b)) OVER (PARTITION BY d))) AS alpha_060,
               (r11_max + r11_min) * r11_dv AS alpha_011,
               a19_sign * (1 + r_a19) AS alpha_019,
               -1 * (ROUND(a22_d, 9) * r_std20c) AS alpha_022,
               (1.0 - r_a30) * sv5 / sv20 AS alpha_030,
               (-1 * r_a17trc) * r_a17dd1 * r_a17trva AS alpha_017,
               r37_a + r37_b AS alpha_037,
               (-1 * r_a17trc) * r_co AS alpha_038,
               (-1 * r40) * ROUND(a40_c, 9) AS alpha_040,
               -1 * ((r45_a * ROUND(a45_c1, 9)) * r45_b) AS alpha_045
        FROM p2
    ), p3 AS (
        SELECT *,
               r_a1 - 0.5 AS alpha_001,
               -1 * CORR(r_dlv2, r_intraday) OVER ({_f(6)}) AS alpha_002,
               -1 * CORR(r_open, r_vol) OVER ({_f(10)}) AS alpha_003,
               -1 * CORR(open, volume) OVER ({_f(10)}) AS alpha_006,
               CORR(r_high, r_vol) OVER ({_f(3)}) AS c_hv3,
               COVAR_SAMP(r_close, r_vol) OVER ({_f(5)}) AS cov_cv5,
               COVAR_SAMP(r_high, r_vol) OVER ({_f(5)}) AS cov_hv5,
               list(r_low) OVER ({_f(9)}) AS l_rlow,
               list(r_a57argmax) OVER ({_f(2)}) AS l_r57,
               {_o_gcorr('r_vol', 'r_vwap', 6)} AS a27_c,
               -1 * ({_o_gcorr('high', 'r_vol', 5)}) AS alpha_044
        FROM p2b
    ), p3b AS (
        SELECT *,
               -1 * ((len(list_filter(l_rlow, x -> x < r_low))
                     + len(list_filter(l_rlow, x -> x <= r_low)) + 1) / 2.0
                     / len(l_rlow)) AS alpha_004,
               r_dr3 * ROUND(alpha_006, 9) AS alpha_014,
               0 - (1 * ((close - vwap)
                   / (list_sum(list_transform(range(1, len(l_r57)+1), i -> l_r57[i] * i))
                      / (len(l_r57) * (len(l_r57)+1) / 2.0)))) AS alpha_057,
               SUM(a27_c) OVER ({_f(2)}) / 2.0 AS a27_s2
        FROM p3
    ), p4 AS (
        SELECT *, {_o_rank('ROUND(c_hv3, 9)')} AS r_chv3,
               -1 * ({_o_rank('ROUND(cov_cv5, 9)')}) AS alpha_013,
               {_o_rank('((1 - r_a34ratio) + (1 - r_a34d1))')} AS alpha_034,
               -1 * ({_o_rank('ROUND(cov_hv5, 9)')}) AS alpha_016,
               {_o_rank('ROUND(a27_s2, 9)')} AS r27
        FROM p3b
    ), p5 AS (
        SELECT *, -1 * SUM(r_chv3) OVER ({_f(3)}) AS alpha_015,
               CASE WHEN r27 > 0.5 THEN -1.0 ELSE 1.0 END AS alpha_027
        FROM p4
    )
    SELECT code, d,
           {', '.join(f'FLOOR({c} * 1000000 + 0.5) / 1000000.0 AS {c}' for c in ALPHA_COLS)}
    FROM p5
    """


# ---------------------------------------------------------------------------
# Alpha-lab IC scan over the WHOLE alpha table (`pages/5_Alpha lab.py:44-55`,
# the 101-column corrwith): unpivot every alpha to long, average-tie rank
# per (date, factor), one groupBy corr per factor — the entire factor set's
# Spearman IC in a single date-axis shuffle instead of a per-column loop.
# ---------------------------------------------------------------------------
def _o_alpha_ic() -> str:
    melt = "\n        UNION ALL ".join(
        f"SELECT code, d, '{c}' AS factor, {c} AS fval FROM alphas" for c in ALPHA_COLS
    )
    rank = (
        "CASE WHEN {x} IS NOT NULL THEN "
        "(rank() OVER (PARTITION BY d, factor ORDER BY {x}) "
        " + (COUNT(*) OVER (PARTITION BY d, factor, {x}) - 1)/2.0) "
        " / COUNT({x}) OVER (PARTITION BY d, factor) END"
    )
    return f"""
    WITH alphas AS ({_o_alphas()}),
    {O_BARS},
    fwd AS (
        SELECT code, d,
               LEAD(close) OVER (PARTITION BY code ORDER BY d) / close - 1 AS fwd_ret
        FROM bars
    ),
    long AS (
        {melt}
    ),
    joined AS (
        SELECT l.code, l.d, l.factor, l.fval, f.fwd_ret
        FROM long l JOIN fwd f ON l.code = f.code AND l.d = f.d
        WHERE f.fwd_ret IS NOT NULL
    ),
    ranked AS (
        SELECT factor, d,
               {rank.format(x='fval')} AS r_f,
               {rank.format(x='fwd_ret')} AS r_r
        FROM joined
    ),
    per_date AS (
        -- degenerate-date gate on DISTINCT COUNTS, not stddev: with
        -- mass-tied ranks the variance is numerically zero on one engine
        -- and a 1e-17 Welford residue on the other, so a stddev>0 gate
        -- (and the engines' own NULL-vs-NaN corr behavior) diverges;
        -- distinct counts are exact integers on both
        SELECT factor, d,
               CASE WHEN COUNT(DISTINCT r_f) > 1
                     AND COUNT(DISTINCT CASE WHEN r_f IS NOT NULL THEN r_r END) > 1
                    THEN CORR(r_f, r_r) END AS ic
        FROM ranked GROUP BY factor, d
    )
    SELECT factor,
           ROUND(SUM(CAST(ROUND(ic*1000000,0) AS BIGINT))/1000000.0
                 / COUNT(ic), 6) AS mean_ic,
           CAST(COUNT(ic) AS BIGINT) AS n_days
    FROM per_date GROUP BY factor
    """


@query("alpha_ic_scan", oracle=_o_alpha_ic())
def alpha_ic_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    bars = daily_bars(spark, sf_dir)
    alphas = alpha101_subset(spark, sf_dir)
    fwd = bars.select(
        "code",
        "d",
        (
            F.lead("close").over(Window.partitionBy("code").orderBy("d")) / F.col("close") - 1
        ).alias("fwd_ret"),
    ).filter(F.col("fwd_ret").isNotNull())
    stack_expr = "stack({}, {}) AS (factor, fval)".format(
        len(ALPHA_COLS), ", ".join(f"'{c}', {c}" for c in ALPHA_COLS)
    )
    long = alphas.selectExpr("code", "d", stack_expr).join(fwd, ["code", "d"])

    def avg_rank(c: str):
        col = F.col(c)
        ordered = Window.partitionBy("d", "factor").orderBy(col.asc_nulls_last())
        r_min = F.rank().over(ordered)
        ties = F.count(col).over(ordered.rangeBetween(Window.currentRow, Window.currentRow))
        n = F.count(col).over(Window.partitionBy("d", "factor"))
        return F.when(col.isNotNull(), (r_min + (ties - 1) / 2.0) / n)

    ranked = long.select(
        "factor", "d", avg_rank("fval").alias("r_f"), avg_rank("fwd_ret").alias("r_r")
    )
    per_date = ranked.groupBy("factor", "d").agg(
        F.when(
            (F.count_distinct("r_f") > 1)
            & (F.count_distinct(F.when(F.col("r_f").isNotNull(), F.col("r_r"))) > 1),
            F.corr("r_f", "r_r"),
        ).alias("ic")
    )
    return per_date.groupBy("factor").agg(
        F.round(
            F.sum(F.round(F.col("ic") * 1_000_000, 0).cast("long")) / 1_000_000.0 / F.count("ic"),
            6,
        ).alias("mean_ic"),
        F.count("ic").alias("n_days"),
    )


@query("alpha101_subset", oracle=_o_alphas())
def alpha101_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_alphas(daily_bars(spark, sf_dir))
    # floor-based 6dp rounding, not ROUND: alpha values are products of
    # rank rationals whose shortest decimal representation often ends in
    # a literal "...5" right at the rounding boundary, and Spark
    # (BigDecimal of the shortest repr, HALF_UP) disagrees with DuckDB
    # (multiply-then-round on the raw double) on exactly those values.
    # floor(x*1e6 + 0.5)/1e6 runs the identical IEEE ops on both engines.
    return out.select(
        "code",
        "d",
        *[(F.floor(F.col(c) * 1_000_000 + 0.5) / 1_000_000.0).alias(c) for c in ALPHA_COLS],
    )
