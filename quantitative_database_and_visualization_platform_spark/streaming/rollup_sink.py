"""Continuous-aggregate sink: a streaming rollup maintained by MERGING
fixed-point partial aggregates into a stored table on every micro-batch
— the streaming twin of the batch `incremental_rollup_maintenance`
query (hypertable continuous-aggregate semantics; the reference's
nightly factor jobs maintain factor_db the same way,
`Project report.md:741-781`).

Scale design: each micro-batch shuffles only ITS OWN partial rollup
(map-side combined, bucket-count-sized), then merges with the stored
rollup by summing integer partials — exact under any merge order and
any micro-batch boundary placement. foreachBatch delivers batches
AT-LEAST-ONCE, so the merge must also be idempotent per batch_id: the
store carries the last merged batch_id and a replayed batch (same id
re-delivered after a failure between the store rewrite and the
checkpoint commit) is skipped instead of double-counted. The id rides
IN the store file itself so it commits atomically with the data it
describes — a sidecar meta file would reintroduce the torn-write
window it exists to close. The store here is a parquet directory
rewritten per batch (bucket-count-sized, tiny); a production
deployment swaps in a MERGE-capable table format carrying the same
batch_id high-water mark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_rollup(df: DataFrame) -> DataFrame:
    """(day, event_type) partials with integer cents — mergeable exactly."""
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
    )


def start_rollup_sink(events: DataFrame, store_path: str):
    """Start a foreachBatch stream maintaining the rollup at store_path.

    Returns the StreamingQuery. Read the current rollup with
    `read_rollup` — event_cnt/value_total match a from-scratch batch
    rollup of everything ingested so far, whatever the batch boundaries.
    """
    spark = events.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Distinguish "store not created yet" (bootstrap) from every other
        # failure: a transient read error or torn write must RAISE (and be
        # retried by the stream) — treating it as bootstrap would silently
        # discard the accumulated rollup and overwrite it with one batch's
        # delta. An old-format store (no last_batch_id column) keeps its
        # DATA; only the high-water mark is unknown.
        from pyspark.errors import AnalysisException

        try:
            current = spark.read.parquet(store_path)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            current, last = None, None
        else:
            if "last_batch_id" in current.columns:
                last = current.agg(F.max("last_batch_id")).collect()[0][0]
            else:
                last = None
        if last is not None and batch_id <= last:
            # at-least-once replay of an already-merged batch: merging it
            # again would double-count event_cnt/value_cents
            return
        delta = _partial_rollup(batch_df)
        merged = (
            delta
            if current is None
            else current.drop("last_batch_id").unionByName(delta)
        )
        out = (
            merged.groupBy("day", "event_type")
            .agg(
                F.sum("event_cnt").alias("event_cnt"),
                F.sum("value_cents").alias("value_cents"),
            )
            .withColumn("last_batch_id", F.lit(int(batch_id)))
            # the store is bucket-count-sized; collect to driver-side rows
            # ONLY at this cardinality (days × types), then overwrite
            # atomically-enough for a test store. A production job uses
            # MERGE INTO on a transactional table instead of rewrite.
        )
        rows = out.collect()
        spark.createDataFrame(rows, out.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(store_path)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_ckpt")
        .start()
    )


def read_rollup(spark, store_path: str) -> DataFrame:
    return spark.read.parquet(store_path).select(
        "day",
        "event_type",
        "event_cnt",
        (F.col("value_cents") / 100.0).alias("value_total"),
    )
