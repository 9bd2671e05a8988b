"""Daily OHLCV bar panel derived from the events stream.

The reference's factor layer runs on per-(stock, trade_date) OHLCV rows
(`database/ddl/quant_db_ddl.md:95-105`). The testdata analog: aggregate
the events stream into daily bars per user — exactly the reference's
tick→bar capability (`Project report.md:391-400`): first/max/min/last as
open/high/low/close, integer-exact volume/amount sums.

Scale shape: one groupBy (code, day) shuffle builds the bars; every factor
suite afterwards reuses a single partitionBy(code) sort. open/close are
picked with row_number flags (deterministic under (ts, event_id) order) so
both engines agree bit-for-bit; no order-dependent first()/last() aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# DuckDB twin of daily_bars, used as a CTE prefix by every factor oracle.
O_BARS = """
    bars AS (
        SELECT user_id AS code, CAST(ts AS DATE) AS d,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_z = 1 THEN value END) AS close,
               CAST(SUM(k) AS BIGINT) AS volume,
               SUM(CAST(ROUND(value*100,0) AS BIGINT) * k)/100.0 AS amount
        FROM (
            SELECT user_id, ts, value, event_id,
                   CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS k,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn_z
            FROM events
            WHERE value IS NOT NULL AND props IS NOT NULL
        )
        GROUP BY user_id, CAST(ts AS DATE)
    )
"""


# Synthetic monthly fundamentals fixture: the reference's dividend_yield /
# yoy_net_profit factors read a fundamentals table (`basic
# factor_function.md:50-59`, `factor_db_ddl.md:123-125`) that the testdata
# does not ship, so the fixture derives deterministic per-(code, month)
# rows from pure integer arithmetic — identical on both engines — covering
# 24 months (2023-01..2024-12) so a year-over-year lag exists for the
# panel's dates. The *operators* (fundamentals join, ratio-to-price, YoY
# growth) are the reference's; only the data is synthetic.
O_FUND = """
    fund AS (
        SELECT c.code, CAST(m.mi AS INT) AS mi,
               CAST(DATE '2023-01-01' + (m.mi * INTERVAL 1 MONTH) AS DATE) AS mo,
               CAST((c.code * 37 + m.mi * 13) % 11 AS DOUBLE) / 10.0 * 0.5 AS dps,
               CAST(1000 + (c.code * 53 + m.mi * 17) % 997 AS DOUBLE) AS net_profit
        FROM (SELECT DISTINCT code FROM bars) c, range(24) m(mi)
    ), fundy AS (
        SELECT f.code, f.mo, f.dps, f.net_profit,
               f.net_profit / p.net_profit - 1 AS yoy_np
        FROM fund f LEFT JOIN fund p ON f.code = p.code AND f.mi = p.mi + 12
    )
"""


def fundamentals(bars: DataFrame) -> DataFrame:
    """(code, mo, dps, net_profit, yoy_np) — see O_FUND for provenance."""
    spark = bars.sparkSession
    codes = bars.select("code").distinct()
    months = spark.range(24).select(
        F.col("id").cast("int").alias("mi"),
        F.add_months(F.lit("2023-01-01").cast("date"), F.col("id").cast("int")).alias(
            "mo"
        ),
    )
    f = codes.crossJoin(F.broadcast(months)).select(
        "code",
        "mo",
        "mi",
        (((F.col("code") * 37 + F.col("mi") * 13) % 11).cast("double") / 10.0 * 0.5).alias(
            "dps"
        ),
        ((F.lit(1000) + (F.col("code") * 53 + F.col("mi") * 17) % 997).cast("double")).alias(
            "net_profit"
        ),
    )
    prev = f.select(
        "code", (F.col("mi") + 12).alias("mi"), F.col("net_profit").alias("np_prev")
    )
    return (
        f.join(prev, ["code", "mi"], "left")
        .select(
            "code",
            "mo",
            "dps",
            "net_profit",
            (F.col("net_profit") / F.col("np_prev") - 1).alias("yoy_np"),
        )
    )


def daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(code, d, open, high, low, close, volume, amount) daily panel."""
    # A tick with no price or no volume payload is a malformed record (the
    # condition a 100 TB lake hits routinely — failed parses, sensor gaps);
    # it must not participate in bar construction: a NULL value elected as
    # the rn_a/rn_z open/close pick would NULL the bar, and downstream
    # factor recursions (EMA, ts_* windows, ranks) have engine-specific
    # NULL semantics. Dropping the row BEFORE the window flags keeps both
    # engines bit-identical (same WHERE in O_BARS) and is a no-op on clean
    # data (r13 NULL-saturated sweep, tests/test_null_saturated_inputs.py).
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("props").isNotNull())
        .withColumn("k", F.regexp_extract("props", r"(\d+)", 1).cast("int"))
    )
    day = F.to_date("ts")
    w_asc = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    flagged = ev.select(
        F.col("user_id").alias("code"),
        day.alias("d"),
        "value",
        "k",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_z"),
    )
    return flagged.groupBy("code", "d").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("value"))).alias("close"),
        F.sum("k").alias("volume"),
        (F.sum(F.round(F.col("value") * 100, 0).cast("long") * F.col("k")) / 100.0).alias(
            "amount"
        ),
    )
