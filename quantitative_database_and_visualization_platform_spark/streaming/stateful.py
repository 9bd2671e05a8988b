"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10): running per-entity accumulators that survive across
micro-batches — the streaming form of the reference's incrementally-
maintained per-stock aggregates.

State design for scale: state is O(1) per entity (three scalars), stored
in the state store keyed by the group; a watermark-driven timeout
(GroupStateTimeout) would evict dead entities in a production job —
NoTimeout here because the test corpus is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_cnt", LongType()),
        StructField("value_cents", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("cents", LongType()),
        StructField("mx", DoubleType()),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    cnt, cents, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        cnt += len(pdf)
        # integer cents: the accumulator is order-independent and exact,
        # so replays/batch boundaries cannot produce float drift
        cents += int(round(pdf["value"].mul(100).round(0).sum()))
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((cnt, cents, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_cnt": [cnt],
            "value_cents": [cents],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming running (count, exact value sum, max) per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming windowFunnel ------------------------------------------------
# The streaming twin of plans/advanced_queries.window_funnel_steps: the
# same 3-slot DP (acc[i] = latest chain-start timestamp of any valid
# (i+1)-deep signup→click→purchase chain within the window), carried in
# the state store per user so levels update incrementally as events
# stream in — exactly what ClickHouse users build as a windowFunnel
# materialized view. State is 3 BIGINTs per user, independent of history
# length.
#
# Ordering contract: the DP is exact when each user's events arrive
# time-ordered ACROSS micro-batches (within-batch disorder is sorted
# away here). A production job tolerating cross-batch disorder would
# buffer behind a watermark before this operator; the parity test feeds
# time-split files so the contract holds and the result equals the batch
# query's.

WF_WINDOW_US = 6 * 3600 * 1_000_000  # keep in sync with the batch query

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_level", IntegerType()),
    ]
)

_FUNNEL_STATE = StructType(
    [
        StructField("b1", LongType()),
        StructField("b2", LongType()),
        StructField("b3", LongType()),
    ]
)


def _funnel_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    b1, b2, b3 = state.get if state.exists else (-1, -1, -1)
    batches = [pdf[["t", "event_id", "lvl"]] for pdf in pdfs]
    if batches:
        allr = pd.concat(batches).sort_values(["t", "event_id"])
        for t, _eid, lvl in allr.itertuples(index=False):
            t, lvl = int(t), int(lvl)
            if lvl == 1:
                b1 = max(b1, t)
            elif lvl == 2 and b1 >= 0 and t - b1 <= WF_WINDOW_US:
                b2 = max(b2, b1)
            elif lvl == 3 and b2 >= 0 and t - b2 <= WF_WINDOW_US:
                b3 = max(b3, b2)
    state.update((b1, b2, b3))
    level = 3 if b3 >= 0 else 2 if b2 >= 0 else 1 if b1 >= 0 else 0
    yield pd.DataFrame({"user_id": [key[0]], "funnel_level": [level]})


def streaming_funnel_levels(events: DataFrame) -> DataFrame:
    """Per-user running windowFunnel level over a stream of events
    (columns: user_id, event_type, ts, event_id)."""
    from pyspark.sql import functions as F

    lvl = (
        F.when(F.col("event_type") == "signup", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
    )
    prepped = events.select(
        "user_id",
        lvl.alias("lvl"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t"),
        "event_id",
    ).filter(F.col("lvl").isNotNull())
    return prepped.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
