"""Long-tail QuantDB query shapes (SURVEY.md §2.1, §2.3, §2.4, §2.7,
§2.8, §2.10): point lookup, scalar subqueries, two-path fallback
aggregation, survivorship union, the sentiment regex/monetary ETL, the
tick→minute-bar aggregation, and catalog introspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import monetary_text_to_double, normalize_stock_code, sector_id, streak_height
from ..sources.catalog import load_table
from .registry import avg_fixed, o_avg_fixed, o_sum_fixed, query, sum_fixed


# ---------------------------------------------------------------------------
# KPL ladder (`QuantDB.py:406-408` get_kpl_ladder): limit-up boards
# grouped by streak height, each rung carrying the member list — sorted,
# capped top-5 so a rung's payload is bounded at any scale, and emitted
# as a comma-joined STRING (not ARRAY) so every downstream comparer can
# hash the cell; the full membership stays queryable via the grouped
# table.
# ---------------------------------------------------------------------------
@query(
    "kpl_ladder",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS k
        FROM events
    ), labeled AS (
        SELECT user_id, event_type,
               CASE WHEN k % 3 = 0 THEN '首板'
                    WHEN k % 3 = 1 THEN CAST(k % 9 + 1 AS VARCHAR) || '连板'
                    ELSE CAST(k % 5 + 2 AS VARCHAR) || '天' || CAST(k % 9 + 1 AS VARCHAR) || '板'
               END AS streak
        FROM ev WHERE event_type = 'click'
    ), parsed AS (
        SELECT user_id,
               CASE WHEN regexp_extract(streak, '^(\\d+)连板$', 1) <> ''
                    THEN CAST(regexp_extract(streak, '^(\\d+)连板$', 1) AS INT)
                    WHEN regexp_extract(streak, '^\\d+天(\\d+)板$', 1) <> ''
                    THEN CAST(regexp_extract(streak, '^\\d+天(\\d+)板$', 1) AS INT)
                    ELSE 1 END AS height
        FROM labeled
    )
    SELECT CAST(height AS BIGINT) AS height,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_stocks,
           array_to_string(list_sort(list_distinct(list(user_id)))[1:5], ',') AS top_members
    FROM parsed GROUP BY height
    """,
)
def kpl_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.regexp_extract("props", r"(\d+)", 1).cast("int")
    )
    k = F.col("k")
    streak = (
        F.when(k % 3 == 0, F.lit("首板"))
        .when(k % 3 == 1, F.concat((k % 9 + 1).cast("string"), F.lit("连板")))
        .otherwise(
            F.concat(
                (k % 5 + 2).cast("string"), F.lit("天"), (k % 9 + 1).cast("string"), F.lit("板")
            )
        )
    )
    parsed = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("height", streak_height(streak).cast("long"))
        .select("user_id", "height")
    )
    return parsed.groupBy("height").agg(
        F.count_distinct("user_id").alias("n_stocks"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.array_sort(F.collect_set("user_id")), 1, 5),
                lambda x: x.cast("string"),
            ),
        ).alias("top_members"),
    )


# ---------------------------------------------------------------------------
# Point lookup — single row by key, LIMIT 1 (`QuantDB.py:48,118-119`).
# Filter + orderBy + limit: Catalyst pushes the filter to the scan and
# TakeOrderedAndProject returns one row without a global sort.
# ---------------------------------------------------------------------------
@query(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders WHERE o_custkey = 42
    ORDER BY o_orderdate DESC, o_orderkey LIMIT 1
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") == 42)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Scalar subquery in WHERE — peer lookup (`QuantDB.py:153`): customers in
# the same nation as customer 1, top-7 by balance. The scalar value is a
# one-row aggregate joined back (broadcast), never a driver collect.
# ---------------------------------------------------------------------------
@query(
    "scalar_subquery_peer",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_nationkey = (SELECT c_nationkey FROM customer WHERE c_custkey = 1)
      AND c_custkey <> 1
    ORDER BY c_acctbal DESC, c_custkey LIMIT 7
    """,
)
def scalar_subquery_peer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    anchor = customer.filter(F.col("c_custkey") == 1).select(
        F.col("c_nationkey").alias("__nk")
    )
    return (
        customer.join(F.broadcast(anchor), customer["c_nationkey"] == F.col("__nk"))
        .filter(F.col("c_custkey") != 1)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(7)
    )


# ---------------------------------------------------------------------------
# Multiple independent scalar subqueries in one SELECT
# (`QuantDB.py:397-404`): three one-row aggregates cross-joined — each is
# a tiny exchange, the "row" is assembled driver-free.
# ---------------------------------------------------------------------------
@query(
    "multi_scalar_subquery",
    oracle="""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)                        AS order_cnt,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE event_type = 'error') AS error_cnt,
           (SELECT CAST(COALESCE(count_if(l_returnflag = 'R'), 0) AS BIGINT) FROM lineitem)  AS returned_cnt
    """,
)
def multi_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("order_cnt"))
    errors = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .agg(F.count(F.lit(1)).alias("error_cnt"))
    )
    returned = load_table(spark, sf_dir, "lineitem").agg(
        F.count_if(F.col("l_returnflag") == "R").alias("returned_cnt")
    )
    return orders.crossJoin(errors).crossJoin(returned)


# ---------------------------------------------------------------------------
# Two-path fallback aggregation (`QuantDB.py:344-356`): prefer a
# precomputed summary table, aggregate on the fly when it is absent. The
# testdata lakehouse has no summary, so the fallback path runs (the
# try-read is metadata-only).
# ---------------------------------------------------------------------------
@query(
    "fallback_priority_rollup",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           {o_sum_fixed('o_totalprice')} AS total_amount
    FROM orders GROUP BY o_orderpriority
    """,
)
def fallback_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    try:
        summary = spark.read.parquet(f"{sf_dir}/summary_priority.parquet")
        if set(summary.columns) >= {"o_orderpriority", "order_cnt", "total_amount"}:
            return summary.select("o_orderpriority", "order_cnt", "total_amount")
    except Exception:  # noqa: BLE001 — absent summary → dynamic path
        pass
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            sum_fixed("o_totalprice").alias("total_amount"),
        )
    )


# ---------------------------------------------------------------------------
# Survivorship union (`Project report.md:187-191`): active vs delisted
# stored separately; "all ever" = unionByName with missing-column fill.
# ---------------------------------------------------------------------------
@query(
    "union_active_delisted",
    oracle=f"""
    WITH active AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority, 'active' AS liveness
        FROM orders WHERE o_orderstatus <> 'F'
    ), delisted AS (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 'delisted' AS liveness
        FROM orders WHERE o_orderstatus = 'F'
    ), unioned AS (
        SELECT * FROM active UNION ALL SELECT * FROM delisted
    )
    SELECT liveness,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS with_priority,
           {o_sum_fixed('o_totalprice')} AS total_amount
    FROM unioned GROUP BY liveness
    """,
)
def union_active_delisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    active = orders.filter(F.col("o_orderstatus") != "F").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", F.lit("active").alias("liveness")
    )
    # delisted table lacks the priority column — unionByName fills nulls
    delisted = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("delisted").alias("liveness")
    )
    unioned = active.unionByName(delisted, allowMissingColumns=True)
    return unioned.groupBy("liveness").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.count("o_orderpriority").alias("with_priority"),
        sum_fixed("o_totalprice").alias("total_amount"),
    )


# ---------------------------------------------------------------------------
# Sentiment ETL (`Project report.md:731-737`): regex streak parsing +
# monetary text parsing + FULL OUTER sentiment snapshot, composed
# end-to-end. Streak/seal text is synthesized deterministically from the
# events columns (the corpus has no Chinese labels), then parsed back by
# the SAME scalar ops the reference runs.
# ---------------------------------------------------------------------------
@query(
    "sentiment_etl",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, value,
               CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS k
        FROM events
    ), labeled AS (
        SELECT *,
               CASE WHEN k % 3 = 0 THEN '首板'
                    WHEN k % 3 = 1 THEN CAST(k % 9 + 1 AS VARCHAR) || '连板'
                    ELSE CAST(k % 5 + 2 AS VARCHAR) || '天' || CAST(k % 9 + 1 AS VARCHAR) || '板'
               END AS streak,
               CAST(ROUND(value, 1) AS VARCHAR) ||
                   (CASE WHEN k % 2 = 0 THEN '亿' ELSE '万' END) AS seal_text
        FROM ev
    ), parsed AS (
        SELECT user_id, event_type,
               CASE WHEN regexp_extract(streak, '^(\\d+)连板$', 1) <> ''
                    THEN CAST(regexp_extract(streak, '^(\\d+)连板$', 1) AS INT)
                    WHEN regexp_extract(streak, '^\\d+天(\\d+)板$', 1) <> ''
                    THEN CAST(regexp_extract(streak, '^\\d+天(\\d+)板$', 1) AS INT)
                    ELSE 1 END AS height,
               (CASE WHEN contains(seal_text, '亿') THEN 1e8
                     WHEN contains(seal_text, '万') THEN 1e4 ELSE 1.0 END)
                   * CAST(regexp_extract(seal_text, '([-+]?\\d+(\\.\\d+)?)', 1) AS DOUBLE)
                   AS seal_amt
        FROM labeled
    ), ups AS (
        SELECT user_id, CAST(MAX(height) AS BIGINT) AS max_streak,
               {o_sum_fixed('seal_amt', 1)} AS seal_total
        FROM parsed WHERE event_type = 'click' GROUP BY user_id
    ), downs AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS broken_cnt,
               {o_sum_fixed('seal_amt', 1)} AS broken_total
        FROM parsed WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT COALESCE(u.user_id, d.user_id) AS user_id,
           COALESCE(u.max_streak, 0) AS max_streak,
           COALESCE(u.seal_total, 0.0) AS seal_total,
           COALESCE(d.broken_cnt, 0) AS broken_cnt,
           CAST(u.user_id IS NOT NULL AS INT) AS is_limit_up,
           CAST(d.user_id IS NOT NULL AS INT) AS is_limit_broken,
           ROUND(COALESCE(u.seal_total, 0.0)
                 / (COALESCE(u.seal_total, 0.0) + COALESCE(d.broken_total, 0.0)), 6)
               AS net_buy_ratio,
           COALESCE(u.seal_total, 0.0) - COALESCE(d.broken_total, 0.0) AS money_flow_main
    FROM ups u FULL OUTER JOIN downs d ON u.user_id = d.user_id
    """,
)
def sentiment_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.regexp_extract("props", r"(\d+)", 1).cast("int")
    )
    k = F.col("k")
    streak = (
        F.when(k % 3 == 0, F.lit("首板"))
        .when(k % 3 == 1, F.concat((k % 9 + 1).cast("string"), F.lit("连板")))
        .otherwise(
            F.concat(
                (k % 5 + 2).cast("string"), F.lit("天"), (k % 9 + 1).cast("string"), F.lit("板")
            )
        )
    )
    seal_text = F.concat(
        F.round(F.col("value"), 1).cast("string"),
        F.when(k % 2 == 0, F.lit("亿")).otherwise(F.lit("万")),
    )
    parsed = ev.select(
        "user_id",
        "event_type",
        streak_height(streak).alias("height"),
        monetary_text_to_double(seal_text).alias("seal_amt"),
    )
    ups = (
        parsed.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.max("height").cast("long").alias("max_streak"),
            sum_fixed("seal_amt", 1).alias("seal_total"),
        )
    )
    downs = (
        parsed.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("broken_cnt"),
            sum_fixed("seal_amt", 1).alias("broken_total"),
        )
    )
    u, d = ups.alias("u"), downs.alias("d")
    seal = F.coalesce(F.col("seal_total"), F.lit(0.0))
    broken = F.coalesce(F.col("broken_total"), F.lit(0.0))
    return u.join(d, F.col("u.user_id") == F.col("d.user_id"), "full_outer").select(
        F.coalesce(F.col("u.user_id"), F.col("d.user_id")).alias("user_id"),
        F.coalesce(F.col("max_streak"), F.lit(0)).alias("max_streak"),
        seal.alias("seal_total"),
        F.coalesce(F.col("broken_cnt"), F.lit(0)).alias("broken_cnt"),
        F.col("u.user_id").isNotNull().cast("int").alias("is_limit_up"),
        F.col("d.user_id").isNotNull().cast("int").alias("is_limit_broken"),
        F.round(seal / (seal + broken), 6).alias("net_buy_ratio"),
        (seal - broken).alias("money_flow_main"),
    )


# ---------------------------------------------------------------------------
# Tick → minute-bar aggregation (§2.10, `stock_3tick_db_ddl.md:37-45`):
# tumbling 1-minute OHLCV bars — the batch twin of the streaming job in
# streaming/tick_bars.py (same plan modulo the watermark operator).
# ---------------------------------------------------------------------------
@query(
    "tick_bars_minute",
    oracle="""
    SELECT user_id, time_bucket(INTERVAL 1 MINUTE, ts) AS bar_start,
           MIN(value) AS low, MAX(value) AS high,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CAST(regexp_extract(props, '(\\d+)', 1) AS INT)) AS BIGINT) AS volume,
           SUM(CAST(ROUND(value*100,0) AS BIGINT)
               * CAST(regexp_extract(props, '(\\d+)', 1) AS INT))/100.0 AS turnover
    FROM events
    GROUP BY user_id, time_bucket(INTERVAL 1 MINUTE, ts)
    """,
)
def tick_bars_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.regexp_extract("props", r"(\d+)", 1).cast("int")
    )
    return (
        ev.groupBy("user_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("k").alias("volume"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long") * F.col("k")) / 100.0).alias(
                "turnover"
            ),
        )
        .select(
            "user_id", F.col("w.start").alias("bar_start"),
            "low", "high", "n_ticks", "volume", "turnover",
        )
    )


# ---------------------------------------------------------------------------
# Catalog introspection (`QuantDB.py:229,251`, `database_schema.md:17-27`):
# per-table row and column counts — DESCRIBE/system.tables analog.
# ---------------------------------------------------------------------------
_INTROSPECT = ("orders", "lineitem", "customer", "part")


@query(
    "catalog_introspection",
    oracle="\nUNION ALL ".join(
        f"""SELECT '{t}' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM information_schema.columns
                WHERE table_name = '{t}') AS n_cols"""
        for t in _INTROSPECT
    ),
)
def catalog_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    out: DataFrame | None = None
    for t in _INTROSPECT:
        df = load_table(spark, sf_dir, t)
        row = df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            F.lit(len(df.schema.fields)).cast("long").alias("n_cols"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Scalar-function surface (§2.8): code normalization, md5 sector ids,
# signed power — applied to synthesized codes so every scalar helper has
# an oracle row.
# ---------------------------------------------------------------------------
@query(
    "scalar_function_surface",
    oracle="""
    WITH src AS (
        SELECT c_custkey,
               lpad(CAST(c_custkey * 137 % 1000000 AS VARCHAR), 6, '0') AS raw_code,
               c_mktsegment, c_acctbal
        FROM customer
    )
    SELECT c_custkey, raw_code,
           CASE WHEN substring(raw_code, 1, 1) = '6' THEN raw_code || '.SH'
                WHEN substring(raw_code, 1, 1) IN ('0', '3') THEN raw_code || '.SZ'
                ELSE raw_code || '.BJ' END AS norm_code,
           substring(md5('industry' || '|' || c_mktsegment), 1, 16) AS sector_id,
           ROUND(CASE WHEN c_acctbal = 0 THEN 0.0 ELSE sign(c_acctbal) END
                 * power(abs(c_acctbal), 0.5), 6) AS signed_sqrt_bal
    FROM src
    """,
)
def scalar_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import signed_power

    customer = load_table(spark, sf_dir, "customer")
    raw = F.lpad((F.col("c_custkey") * 137 % 1000000).cast("string"), 6, "0")
    return customer.select(
        "c_custkey",
        raw.alias("raw_code"),
        normalize_stock_code(raw).alias("norm_code"),
        sector_id(F.lit("industry"), F.col("c_mktsegment")).alias("sector_id"),
        F.round(signed_power(F.col("c_acctbal"), 0.5), 6).alias("signed_sqrt_bal"),
    )
