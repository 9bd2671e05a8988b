"""Mergeable sketches for pipeline-scale statistics.

KMV (k-minimum-values) distinct-count sketch: hash every element to a
uniform value, keep the k smallest distinct hashes; the k-th smallest
hash h_(k), normalized to [0, 1), estimates the distinct count as
(k-1)/u_(k). Unlike HyperLogLog registers, the k-minima set is exactly
mergeable (union + re-take k smallest), order-independent, and — with a
fixed public hash — **deterministic across engines**, so the estimate
itself can be oracle-checked bit-for-bit against DuckDB, not just
"approximately close".

Hash convention shared with the DuckDB twin: ``md5(cast(x AS string))``,
first 13 hex digits parsed base-16 → an exact integer in [0, 2^52) —
within double precision on both engines, so the final floating-point
estimate ``(k-1) * 2^52 / h_(k)`` is the identical IEEE operation
everywhere.

Scale design (100 TB): the hash projection and DISTINCT are one
map-side-combined shuffle on (group, hash) — cardinality bounded by the
true distinct count, not the row count; the per-group k-smallest pass is
a window over that reduced set. The k-minima per group could further be
merged from per-partition partial top-k (the sketch is mergeable) if the
distinct set itself ever became the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 52  # 13 hex digits: exact in IEEE double on both engines
HASH_SPACE = float(1 << HASH_BITS)


def kmv_hash(c: Column | str) -> Column:
    """Uniform 52-bit deterministic hash of any column via md5 hex."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("long")


def o_kmv_hash(expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash` (hex-literal string cast)."""
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 13) AS BIGINT)"


def kmv_distinct_estimate(
    df: DataFrame, group: str, element: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``element``.

    Output: (group, kmv_k = #minima kept, kmv_estimate). When a group has
    fewer than k distinct hashes the sketch is exact: estimate = n.
    """
    hashed = df.select(F.col(group), kmv_hash(element).alias("__h")).distinct()
    w = Window.partitionBy(group).orderBy("__h")
    minima = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return minima.groupBy(group).agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.max("__h").alias("__kth"),
    ).select(
        F.col(group),
        F.col("kmv_k"),
        F.when(F.col("kmv_k") < k, F.col("kmv_k").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth").cast("double"))
        .alias("kmv_estimate"),
    )


def o_kmv_distinct_estimate(table: str, group: str, element: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct_estimate` (same ops, same order)."""
    return f"""
    WITH __h AS (
      SELECT DISTINCT {group}, {o_kmv_hash(element)} AS h FROM {table}
    ), __r AS (
      SELECT {group}, h, row_number() OVER (PARTITION BY {group} ORDER BY h) AS rn
      FROM __h
    ), __k AS (
      SELECT {group}, CAST(COUNT(*) AS BIGINT) AS kmv_k, MAX(h) AS kth
      FROM __r WHERE rn <= {k} GROUP BY {group}
    )
    SELECT {group}, kmv_k,
           CASE WHEN kmv_k < {k} THEN CAST(kmv_k AS DOUBLE)
                ELSE CAST({k - 1} AS DOUBLE) * CAST({1 << HASH_BITS} AS DOUBLE)
                     / CAST(kth AS DOUBLE) END
             AS kmv_estimate
    FROM __k
    """
