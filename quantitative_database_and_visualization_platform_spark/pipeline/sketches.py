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


CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_build(df: DataFrame, element: str) -> DataFrame:
    """Count-min sketch of an element column: depth×width counter grid,
    row r bucketing by md5(r || value). Deterministic (salted md5, no
    RNG) and exactly mergeable (counter grids add), so sketches built
    per-partition/per-day combine by summing — and the whole build is
    one map-side-combined groupBy over (depth × width) cells.
    """
    rows = [
        df.select(
            F.lit(r).alias("r"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(str(r) + "|"), F.col(element).cast("string"))), 1, 13),
                    16,
                    10,
                ).cast("long")
                % CMS_WIDTH
            ).alias("b"),
        )
        for r in range(CMS_DEPTH)
    ]
    cells = rows[0]
    for other in rows[1:]:
        cells = cells.unionAll(other)
    return cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_query(sketch: DataFrame, probes: DataFrame, element: str) -> DataFrame:
    """Point-estimate the count of each probe value: min over the depth
    rows of that value's bucket counter (classic CMS upper bound).
    The probe side joins the (depth × width ≤ 256-cell) sketch — a
    broadcast join at any scale."""
    probe_cells = probes.select(
        F.col(element),
        F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("r"),
    ).select(
        element,
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit("|"), F.col(element).cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % CMS_WIDTH
        ).alias("b"),
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(element)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


def o_cms(table: str, element: str, probe_filter: str) -> str:
    """DuckDB twin: build + probe in one statement."""
    hash_expr = (
        "CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || CAST({e} AS VARCHAR)), 1, 13) AS BIGINT) % "
        + str(CMS_WIDTH)
    )
    return f"""
    WITH cells AS (
        SELECT r, {hash_expr.format(e=element)} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {table}, range({CMS_DEPTH}) t(r)
        GROUP BY r, b
    ), probes AS (
        SELECT DISTINCT {element} FROM {table} WHERE {probe_filter}
    ), probe_cells AS (
        SELECT p.{element}, t.r, {hash_expr.format(e=f'p.{element}')} AS b
        FROM probes p, range({CMS_DEPTH}) t(r)
    )
    SELECT pc.{element}, MIN(COALESCE(c.cnt, 0)) AS cms_estimate
    FROM probe_cells pc LEFT JOIN cells c ON pc.r = c.r AND pc.b = c.b
    GROUP BY pc.{element}
    """


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
