"""Cross-sectional queries (SURVEY.md §2.6) + the Alpha-lab analytics
layer (§2.4's correlation operators, reference `pages/5_Alpha lab.py`).

Panel construction: events rolled up to a (trade-date, user) daily panel —
the analog of the reference's (trade_date, stock_code) cross-section. The
"factor" is the daily sum of the props k value; the "return" is the
next-day change of the daily value sum (lead over the entity axis).

Scale shape: each query is (a) one groupBy shuffle to build the daily
panel, then (b) one date-partitioned window pass for every cross-sectional
column at once, then (c) one small aggregate — the same two-shuffle plan a
100 TB factor evaluation would run. The Spearman IC is rank-then-Pearson
(`groupBy(date).agg(corr)`), never a per-group Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import crosssection as cs
from ..sources.catalog import load_table
from .registry import query

# --- shared daily panel: (d, user_id, val, k_sum, fwd_ret) ---------------

_O_PANEL = """
    panel AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value*100,0) AS BIGINT))/100.0 AS val,
               CAST(SUM(CAST(regexp_extract(props, '(\\d+)', 1) AS INT)) AS BIGINT) AS k_sum
        FROM events
        WHERE value IS NOT NULL AND props IS NOT NULL
        GROUP BY user_id, CAST(ts AS DATE)
    )
"""

_O_FWD = """
    fwd AS (
        SELECT user_id, d, val, k_sum,
               LEAD(val) OVER (PARTITION BY user_id ORDER BY d) / val - 1 AS fwd_ret
        FROM panel
    )
"""


def _panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # malformed ticks (NULL value/props) are dropped before the panel
    # rollup on BOTH engines (same WHERE in _O_PANEL): an all-NULL
    # (user, day) group otherwise emits a NULL-measure panel row whose
    # cross-sectional rank is engine-defined (Spark nulls-first vs
    # DuckDB nulls-last). Same policy as factors/panel.py daily_bars;
    # no-op on clean data (r13 NULL-saturated sweep).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("props").isNotNull()
    )
    k = F.regexp_extract("props", r"(\d+)", 1).cast("int")
    return ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("val"),
        F.sum(k).alias("k_sum"),
    )


def _with_fwd(panel: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("d")
    return panel.withColumn("fwd_ret", F.lead("val").over(w) / F.col("val") - 1)


def _o_avg_rank(x: str, part: str = "d") -> str:
    """DuckDB twin of cs.cs_rank: average-tie rank / count, in (0, 1]."""
    return (
        f"(rank() OVER (PARTITION BY {part} ORDER BY {x})"
        f" + (COUNT(*) OVER (PARTITION BY {part}, {x}) - 1)/2.0)"
        f" / COUNT({x}) OVER (PARTITION BY {part})"
    )


# ---------------------------------------------------------------------------
# cs_rank / cs_scale / cs_demean / cs_zscore in one date-partitioned pass
# (alpha101_engine.py:90-98, `Project report.md:748-757`). One shuffle on
# the date axis serves all four columns.
# ---------------------------------------------------------------------------
@query(
    "cross_section_ops",
    oracle=f"""
    WITH {_O_PANEL}
    SELECT user_id, d,
           ROUND({_o_avg_rank('k_sum')}, 6) AS k_rank,
           ROUND(val * 1.0 / SUM(ABS(val)) OVER (PARTITION BY d), 6) AS val_scaled,
           ROUND(val - AVG(val) OVER (PARTITION BY d, user_id % 5), 6) AS val_demeaned,
           ROUND((val - AVG(val) OVER (PARTITION BY d))
                 / STDDEV_SAMP(val) OVER (PARTITION BY d), 6) AS val_zscore
    FROM panel
    """,
)
def cross_section_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # industry analog: user_id % 5 buckets entities into 5 "sectors"
    panel = _panel(spark, sf_dir).withColumn("ind", F.col("user_id") % 5)
    return panel.select(
        "user_id",
        "d",
        F.round(cs.cs_rank("k_sum", "d"), 6).alias("k_rank"),
        F.round(cs.cs_scale("val", 1.0, "d"), 6).alias("val_scaled"),
        F.round(cs.cs_demean("val", "d", "ind"), 6).alias("val_demeaned"),
        F.round(cs.cs_zscore("val", "d"), 6).alias("val_zscore"),
    )


# ---------------------------------------------------------------------------
# Daily Spearman Rank-IC + cumulative IC (`pages/5_Alpha lab.py:104-108`,
# `QuantDB.py:265-277`): rank factor and forward return within each date,
# Pearson-corr the ranks per date (== Spearman), then cumsum over dates.
# ---------------------------------------------------------------------------
@query(
    "rank_ic_daily",
    oracle=f"""
    WITH {_O_PANEL}, {_O_FWD},
    ranked AS (
        SELECT d,
               {_o_avg_rank('k_sum')} AS r_f,
               {_o_avg_rank('fwd_ret')} AS r_r
        FROM fwd WHERE fwd_ret IS NOT NULL
    ), daily_ic AS (
        SELECT d, ROUND(CORR(r_f, r_r), 6) AS rank_ic,
               CAST(COUNT(*) AS BIGINT) AS n_entities
        FROM ranked GROUP BY d
    )
    SELECT d, rank_ic, n_entities,
           ROUND(SUM(rank_ic) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW), 6) AS cum_ic
    FROM daily_ic
    """,
)
def rank_ic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _with_fwd(_panel(spark, sf_dir)).filter(F.col("fwd_ret").isNotNull())
    ranked = fwd.select(
        "d",
        cs.cs_rank("k_sum", "d").alias("r_f"),
        cs.cs_rank("fwd_ret", "d").alias("r_r"),
    )
    daily_ic = ranked.groupBy("d").agg(
        F.round(F.corr("r_f", "r_r"), 6).alias("rank_ic"),
        F.count(F.lit(1)).alias("n_entities"),
    )
    # one row per date → the unpartitioned cumulative window is bounded
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily_ic.select(
        "d", "rank_ic", "n_entities", F.round(F.sum("rank_ic").over(w), 6).alias("cum_ic")
    )


# ---------------------------------------------------------------------------
# Batch column-wise Spearman (the 101-column corrwith fan-out,
# `pages/5_Alpha lab.py:51`): unpivot factors to long, rank per (date,
# factor), one groupBy(factor) corr — the 101-correlation matrix in ONE
# shuffle instead of 101 driver-side loops.
# ---------------------------------------------------------------------------
@query(
    "rank_ic_matrix",
    oracle=f"""
    WITH {_O_PANEL}, {_O_FWD},
    long AS (
        SELECT d, 'k_sum' AS factor, CAST(k_sum AS DOUBLE) AS fval, fwd_ret
        FROM fwd WHERE fwd_ret IS NOT NULL
        UNION ALL
        SELECT d, 'val' AS factor, val AS fval, fwd_ret
        FROM fwd WHERE fwd_ret IS NOT NULL
    ), ranked AS (
        SELECT factor, d,
               {_o_avg_rank('fval', 'd, factor')} AS r_f,
               {_o_avg_rank('fwd_ret', 'd, factor')} AS r_r
        FROM long
    ), per_date AS (
        SELECT factor, d, CORR(r_f, r_r) AS ic
        FROM ranked GROUP BY factor, d
    )
    SELECT factor,
           ROUND(SUM(CAST(ROUND(ic*1000000,0) AS BIGINT))/1000000.0
                 / COUNT(ic), 6) AS mean_ic,
           CAST(COUNT(ic) AS BIGINT) AS n_days
    FROM per_date GROUP BY factor
    """,
)
def rank_ic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _with_fwd(_panel(spark, sf_dir)).filter(F.col("fwd_ret").isNotNull())
    long = fwd.selectExpr(
        "d", "stack(2, 'k_sum', CAST(k_sum AS DOUBLE), 'val', val) AS (factor, fval)", "fwd_ret"
    )
    dw = ["d", "factor"]

    def avg_rank(c: str) -> Column:
        col = F.col(c)
        r_min = F.rank().over(Window.partitionBy(*dw).orderBy(col))
        ties = F.count(col).over(Window.partitionBy(*dw, col))
        n = F.count(col).over(Window.partitionBy(*dw))
        return (r_min + (ties - 1) / 2.0) / n

    ranked = long.select("factor", "d", avg_rank("fval").alias("r_f"), avg_rank("fwd_ret").alias("r_r"))
    per_date = ranked.groupBy("factor", "d").agg(F.corr("r_f", "r_r").alias("ic"))
    return per_date.groupBy("factor").agg(
        F.round(
            F.sum(F.round(F.col("ic") * 1_000_000, 0).cast("long")) / 1_000_000.0 / F.count("ic"), 6
        ).alias("mean_ic"),
        F.count("ic").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# Decile bucketing + group mean forward return (`pages/5_Alpha lab.py:129-130`:
# pd.qcut(alpha, 10) → groupby.mean). Deterministic: tie-break on user_id.
# ---------------------------------------------------------------------------
@query(
    "decile_returns",
    oracle=f"""
    WITH {_O_PANEL}, {_O_FWD},
    bucketed AS (
        SELECT d, fwd_ret,
               ntile(10) OVER (PARTITION BY d ORDER BY k_sum, user_id) AS decile
        FROM fwd WHERE fwd_ret IS NOT NULL
    )
    SELECT decile,
           ROUND(SUM(CAST(ROUND(fwd_ret*1000000,0) AS BIGINT))/1000000.0
                 / COUNT(fwd_ret), 6) AS mean_fwd_ret,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM bucketed GROUP BY decile
    """,
)
def decile_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    fwd = _with_fwd(_panel(spark, sf_dir)).filter(F.col("fwd_ret").isNotNull())
    bucketed = fwd.select(
        "d", "fwd_ret", cs.cs_ntile("k_sum", 10, "d", "user_id").alias("decile")
    )
    return bucketed.groupBy("decile").agg(
        F.round(
            F.sum(F.round(F.col("fwd_ret") * 1_000_000, 0).cast("long")) / 1_000_000.0
            / F.count("fwd_ret"),
            6,
        ).alias("mean_fwd_ret"),
        F.count(F.lit(1)).alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# Top/bottom-20 factor exposure on the latest date (`QuantDB.py:279-291`,
# `pages/5_Alpha lab.py:166,178`): head/tail split + unionByName.
# ---------------------------------------------------------------------------
@query(
    "top_bottom_exposure",
    oracle=f"""
    WITH {_O_PANEL},
    latest AS (
        SELECT user_id, k_sum FROM panel
        WHERE d = (SELECT MAX(d) FROM panel)
    ),
    top AS (SELECT 'top' AS side, user_id, k_sum FROM latest
            ORDER BY k_sum DESC, user_id LIMIT 20),
    bottom AS (SELECT 'bottom' AS side, user_id, k_sum FROM latest
               ORDER BY k_sum ASC, user_id LIMIT 20)
    SELECT * FROM top UNION ALL SELECT * FROM bottom
    """,
)
def top_bottom_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import top_k

    panel = _panel(spark, sf_dir)
    # scalar subquery: max date (tiny aggregate broadcast into the filter)
    latest = panel.join(
        F.broadcast(panel.agg(F.max("d").alias("d"))), on="d", how="left_semi"
    ).select("user_id", "k_sum")
    top = top_k(
        latest.select(F.lit("top").alias("side"), "user_id", "k_sum"),
        [F.col("k_sum").desc(), F.col("user_id")],
        20,
    )
    bottom = top_k(
        latest.select(F.lit("bottom").alias("side"), "user_id", "k_sum"),
        [F.col("k_sum").asc(), F.col("user_id")],
        20,
    )
    return top.unionByName(bottom)
