"""Streaming HLL maintenance: a distinct-count sketch kept current by
MERGING per-micro-batch register partials into a stored register table —
the sketch twin of rollup_sink's continuous aggregate. Register merge is
max(), which is idempotent PER REGISTER but the store rewrite still
rides the batch_id high-water mark so a replayed batch cannot interleave
with a torn rewrite (same at-least-once contract as the rollup sink; the
id commits atomically inside the store file).

Scale design: each micro-batch shuffles only its OWN (group x 256)
register cells; the stored table is group-cardinality x 256 rows
regardless of stream length. Estimates come from the shared
hll_estimate_from_registers collapse, so a streaming deployment reads
cardinalities without ever re-touching raw events — and the same store
can be merged ACROSS streams (max of maxes) for a fleet-wide count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.sketches import hll_estimate_from_registers, hll_registers


def start_hll_sink(events: DataFrame, store_path: str, group: str = "event_type",
                   element: str = "user_id"):
    """Start a foreachBatch stream maintaining per-group HLL registers at
    store_path. Returns the StreamingQuery; read estimates with
    read_hll_estimates."""
    spark = events.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        try:
            current = spark.read.parquet(store_path)
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            current, last = None, None
        else:
            last = current.agg(F.max("last_batch_id")).collect()[0][0]
        if last is not None and batch_id <= last:
            return  # at-least-once replay: already merged
        delta = hll_registers(batch_df, group, element)
        merged = (
            delta
            if current is None
            else current.drop("last_batch_id").unionByName(delta)
        )
        out = (
            merged.groupBy(group, "register")
            .agg(F.max("max_rho").alias("max_rho"))
            .withColumn("last_batch_id", F.lit(int(batch_id)))
        )
        rows = out.collect()  # (groups x 256)-bounded by construction
        spark.createDataFrame(rows, out.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(store_path)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_ckpt")
        .start()
    )


def read_hll_estimates(spark, store_path: str, group: str = "event_type") -> DataFrame:
    regs = spark.read.parquet(store_path).drop("last_batch_id")
    return hll_estimate_from_registers(regs, group)
