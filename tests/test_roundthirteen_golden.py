"""Round-13 goldens.

1. DST-gap truncation: the r12 ADVICE found that ``date_trunc`` on a
   TIMESTAMP_NTZ column promotes to the instant type, and the cast back
   converts through the session time zone — a naive timestamp falling in
   a DST *gap* of the session zone did not round-trip (under
   America/New_York, 2024-03-10 02:30:45 came back 03:30:45). All
   truncation sites now stay in the NTZ/date domain
   (``trunc_ntz_second`` via make_timestamp_ntz; ``cast('date')`` /
   ``F.trunc`` for day/week/month buckets). These goldens pin the fix
   with gap-local timestamps — the r12 hostile-TZ sweep's fixture data
   never exercised a gap instant, which is why the sweep alone passed.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

# spring-forward gap instants: these local wall-clock times DO NOT EXIST
# in the named zone, so any instant-domain round-trip must shift them
GAP_CASES = [
    # (hostile session TZ, gap-local naive timestamp)
    ("America/New_York", dt.datetime(2024, 3, 10, 2, 30, 45)),
    # Chile's gap opens at MIDNIGHT (2024-09-08 00:00→01:00): day/week
    # buckets built through the instant domain shift the DATE itself
    ("America/Santiago", dt.datetime(2024, 9, 8, 0, 30, 15)),
]


@pytest.mark.parametrize("tz,ts", GAP_CASES, ids=[c[0] for c in GAP_CASES])
def test_ntz_truncation_survives_dst_gap(spark, tz, ts):
    from quantitative_database_and_visualization_platform_spark.functions.scalar import trunc_ntz_second

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = spark.createDataFrame([(ts,)], "ts timestamp_ntz").select(
            trunc_ntz_second(F.col("ts")).alias("sec"),
            F.col("ts").cast("date").alias("day"),
            F.trunc(F.col("ts").cast("date"), "week").alias("wk"),
            F.trunc(F.col("ts").cast("date"), "month").alias("mo"),
        )
        row = df.collect()[0]
        assert row["sec"] == ts.replace(microsecond=0)
        assert row["day"] == ts.date()
        # ISO Monday on or before the gap-local date
        assert row["wk"] == ts.date() - dt.timedelta(days=ts.date().weekday())
        assert row["mo"] == ts.date().replace(day=1)
        # regression witness: the OLD instant-domain path shifts the value
        old = spark.createDataFrame([(ts,)], "ts timestamp_ntz").select(
            F.date_trunc("second", "ts").cast("timestamp_ntz").alias("sec")
        ).collect()[0]["sec"]
        assert old != ts.replace(microsecond=0), (
            "date_trunc no longer shifts gap-local instants — the "
            "trunc_ntz_second carve-out can be retired"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_gap_local_queries_under_hostile_tz(spark):
    """The repaired query sites themselves, re-checked against their
    oracles under the hostile zone (same regime as the r12 sweep, now
    covering the sites the gap could bite: latest_event_per_user's
    second-trunc, the day buckets, the week/month bars)."""
    from quantitative_database_and_visualization_platform_spark.plans.oracle_check import check_query

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Santiago")
    try:
        for name in (
            "latest_event_per_user",
            "pivot_event_matrix",
            "incremental_rollup_maintenance",
            "cohort_retention_matrix",
            "weekly_bars_rollup",
            "monthly_bars_rollup",
            "factor_value",
        ):
            problems = check_query(spark, SF, name)
            assert not problems, f"{name} under America/Santiago: {problems}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
