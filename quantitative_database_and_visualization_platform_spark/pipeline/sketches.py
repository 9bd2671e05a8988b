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


HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
# alpha_m for m = 256 (Flajolet et al. 2007). The whole estimate numerator
# alpha * m^2 * 2^53 is collapsed to ONE Python double injected verbatim
# into both engines (repr round-trips binary64 exactly), so the estimate
# is a single identical IEEE division everywhere — decimal-literal
# parsing rules (Spark DECIMAL vs DuckDB) never enter the plan.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
_HLL_POW53 = float(1 << 53)  # fixed-point scale for the harmonic sum
HLL_NUMERATOR = HLL_ALPHA * float(HLL_M * HLL_M) * _HLL_POW53


def hll_registers(df: DataFrame, group: str, element: str) -> DataFrame:
    """Per-(group, register) HyperLogLog max-rank table.

    Hash split (md5 hex, shared with the DuckDB twin): hex digits 1-2 are
    the 8-bit register index; hex digits 3-15 are a 52-bit value v whose
    leading-zero rank is ``rho = 53 - length(bin(v))`` for v >= 1 (53 for
    v = 0) — ``bin`` drops leading zeros identically on both engines, so
    rho is exact integer arithmetic, no float log2 edge cases.

    One map-side-combined groupBy: at any input scale the shuffle carries
    at most (groups x 256) cells, and the register table is MERGEABLE —
    register maxes from per-source / per-day builds combine by max, which
    :func:`hll_estimate_from_registers` exploits for the merged-union row.
    """
    col = F.col(element)
    reg = F.conv(F.substring(F.md5(col.cast("string")), 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(F.md5(col.cast("string")), 3, 13), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(v)))
    return (
        df.select(F.col(group), reg.alias("register"), rho.alias("rho"))
        .groupBy(group, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_from_registers(regs: DataFrame, group: str) -> DataFrame:
    """Collapse a (group, register, max_rho) table to per-group estimates.

    The harmonic denominator sum(2^-M_j) is accumulated as the EXACT
    integer sum(2^(53 - M_j)) (max 256 * 2^52 < 2^63) plus
    (m - hit) * 2^53 for never-hit registers — integer addition is
    order-independent, so Spark's partial aggregation and DuckDB's
    single-threaded sum agree bit-for-bit. Small-range correction
    (linear counting, E <= 2.5m with empty registers) as in the HLL
    paper.
    """
    agg = regs.groupBy(group).agg(
        F.count(F.lit(1)).alias("registers_hit"),
        # SQL-expr form: the DataFrame shiftleft() only takes a literal
        # bit count, the SQL function accepts a column expression
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - max_rho)")).alias("__s"),
    )
    m = float(HLL_M)
    denom = (
        F.col("__s") + (F.lit(HLL_M) - F.col("registers_hit")).cast("long") * F.lit(1 << 53)
    ).cast("double")
    raw = F.lit(HLL_NUMERATOR) / denom
    zeros = (F.lit(HLL_M) - F.col("registers_hit")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros),
    ).otherwise(raw)
    from ..plans.registry import round6  # deferred: avoids plans<->pipeline cycle

    return agg.select(
        F.col(group),
        F.col("registers_hit"),
        round6(est).alias("hll_estimate"),
    )


def o_hll_regs(table_sql: str, group: str, element: str, name: str = "regs") -> str:
    """DuckDB twin of :func:`hll_registers` as a named CTE body.

    ``table_sql`` is a FROM-able relation providing (group, element).
    """
    h = f"md5(CAST({element} AS VARCHAR))"
    v = f"CAST('0x' || substr({h}, 3, 13) AS BIGINT)"
    return f"""
    {name} AS (
        SELECT {group},
               CAST('0x' || substr({h}, 1, 2) AS INT) AS register,
               MAX(CASE WHEN {v} = 0 THEN 53
                        ELSE 53 - length(bin({v})) END) AS max_rho
        FROM {table_sql}
        GROUP BY {group}, register
    )
    """


def o_hll_collapse(regs_rel: str, group: str) -> str:
    """DuckDB twin of :func:`hll_estimate_from_registers`: CTE chain from a
    (group, register, max_rho) relation to ``hll_out``."""
    return f"""
    hll AS (
        SELECT {group},
               CAST(COUNT(*) AS BIGINT) AS registers_hit,
               SUM((CAST(1 AS BIGINT) << (53 - max_rho))) AS s
        FROM {regs_rel} GROUP BY {group}
    ),
    est AS (
        SELECT {group}, registers_hit,
               CAST({HLL_NUMERATOR!r} AS DOUBLE)
                   / CAST(s + (256 - registers_hit) * (CAST(1 AS BIGINT) << 53) AS DOUBLE)
                   AS raw,
               CAST(256 - registers_hit AS DOUBLE) AS zeros
        FROM hll
    ),
    est2 AS (
        SELECT {group}, registers_hit,
               CASE WHEN raw <= 640.0 AND zeros > 0
                    THEN 256.0 * ln(256.0 / zeros) ELSE raw END AS e
        FROM est
    ),
    hll_out AS (
        SELECT {group}, registers_hit,
               CASE WHEN isnan(e) OR isinf(e) THEN NULL
                    ELSE FLOOR(e*1000000 + 0.5)/1000000.0 END AS hll_estimate
        FROM est2
    )
    """


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


BLOOM_M = 1 << 16  # bits in the filter
BLOOM_K = 4  # salted hash functions


def _bloom_pos(r, element) -> Column:
    """Bit position of hash r for an element column: salted-md5 52-bit
    value mod BLOOM_M (same conv/'0x' convention as the other sketches)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(r.cast("string"), F.lit("|"), element.cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_bits(df: DataFrame, element: str) -> DataFrame:
    """Build the set-bit table of a Bloom filter over ``element``: one
    row per DISTINCT set position (<= BLOOM_M rows total, broadcastable
    at any corpus scale). Mergeable: filters over corpus shards union
    their bit tables (set-OR == DISTINCT of the union)."""
    probes = df.select(
        F.explode(F.array(*[F.lit(r) for r in range(BLOOM_K)])).alias("r"),
        F.col(element).alias("__e"),
    )
    return probes.select(_bloom_pos(F.col("r"), F.col("__e")).alias("pos")).distinct()


def bloom_membership(candidates: DataFrame, bits: DataFrame, element: str) -> DataFrame:
    """Per-candidate Bloom membership via a broadcast JOIN against the
    set-bit table: positive iff ALL BLOOM_K positions are set. The
    relational fallback to :func:`bloom_hit_sql` for filters too large
    to ship as an expression literal (m beyond a few MB); for the
    2^16-bit default the literal-bitmap probe is strictly cheaper (no
    probe join) and the two paths are equivalence-tested. Probe fan-out
    is BLOOM_K rows per DISTINCT candidate — callers should pass the
    candidate VOCABULARY, not the raw occurrence relation."""
    probes = candidates.select(
        F.col(element),
        F.explode(F.array(*[F.lit(r) for r in range(BLOOM_K)])).alias("r"),
    ).select(element, _bloom_pos(F.col("r"), F.col(element)).alias("pos"))
    joined = probes.join(
        F.broadcast(bits.withColumn("__b", F.lit(1))), "pos", "left"
    )
    return joined.groupBy(element).agg(
        (F.min(F.coalesce("__b", F.lit(0))) == 1).alias("bloom_hit")
    )


def o_bloom_pos(r_expr: str, element_expr: str) -> str:
    """DuckDB twin of :func:`_bloom_pos`."""
    return (
        f"CAST('0x' || substr(md5(CAST({r_expr} AS VARCHAR) || '|' || "
        f"CAST({element_expr} AS VARCHAR)), 1, 13) AS BIGINT) % {BLOOM_M}"
    )


def bloom_bitmap(bits: DataFrame) -> list[int]:
    """Collapse a set-bit table to the literal bitmap: BLOOM_M bits as
    BLOOM_M/64 signed longs (Spark long is signed; words with bit 63 set
    wrap to negative). The collect is bounded by the FILTER SIZE (<=
    BLOOM_M rows = 8 KB), never by the corpus — the same bounded-scalar
    class as the repo's other driver reads. This is how a Bloom filter
    actually ships at scale: one broadcast constant, not a join
    relation (Spark's own runtime-filter pushdown broadcasts bloom
    bitmaps the same way)."""
    words = [0] * (BLOOM_M // 64)
    for row in bits.collect():
        p = row["pos"]
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit_sql(element_sql: str, words_col: str = "__bw") -> str:
    """Spark SQL boolean: ALL BLOOM_K salted positions of the element
    are set in the bitmap column ``words_col`` (an array<bigint> literal
    attached once per row via withColumn). Pure expression — O(1) per
    row, no join, no shuffle; arithmetic shiftright is safe because &1
    only reads the lowest bit."""
    tests = []
    for r in range(BLOOM_K):
        pos = (
            f"(CAST(conv(substring(md5(concat('{r}', '|', CAST({element_sql} AS STRING))),"
            f" 1, 13), 16, 10) AS BIGINT) % {BLOOM_M})"
        )
        tests.append(
            f"((shiftright(element_at({words_col},"
            f" CAST(shiftright({pos}, 6) AS INT) + 1),"
            f" CAST(({pos} % 64) AS INT)) & 1) = 1)"
        )
    return "(" + " AND ".join(tests) + ")"


# --- log-binned quantile sketch -------------------------------------------
# The mergeable approximate-quantile sketch a 100 TB profiler runs instead
# of an exact percentile sort: every positive integer value maps to the
# lower bound of its bucket (top FOUR bits kept: bucket lower bound = v
# with all bits below the top four cleared), i.e. each octave [2^k, 2^k+1)
# is subdivided into 8 equal buckets of width 2^(k-3), so the whole
# distribution collapses to <= 8 buckets per octave x 61 octaves
# (~500 counters for the full int64 range). Counts are plain per-bucket
# sums — trivially mergeable across partitions/streams; a quantile query
# walks the ~500-row cumulative series. Relative value error <= 1/8 =
# 12.5% by construction (one bucket width 2^(k-3) over a value >= 2^k;
# the golden test asserts this exact bound). Everything is INTEGER bit
# arithmetic (length of
# the binary string + shifts — verified identical in Spark and DuckDB), so
# both engines produce bit-identical buckets with no transcendental in
# the plan (a log()-based binning would differ in the last ulp across
# libm implementations and flip bucket ids on boundary values).
# Reference analogue: ClickHouse's quantileTiming-style fixed-resolution
# sketches used for dashboard percentiles.


def logbin_lower_bound(v: Column | str) -> Column:
    """Exact bucket lower bound for a positive BIGINT column: keep the top
    4 bits, clear the rest (values < 8 are exact singleton buckets)."""
    c = F.col(v) if isinstance(v, str) else v
    return F.when(c < 8, c).otherwise(
        F.expr(
            f"({_sql_logbin_v(v)} >> (length(bin({_sql_logbin_v(v)}))-1-3)) "
            f"<< (length(bin({_sql_logbin_v(v)}))-1-3)"
        )
    )


def _sql_logbin_v(v: Column | str) -> str:
    if not isinstance(v, str):
        raise TypeError("logbin_lower_bound needs a column NAME (the shift "
                        "amount references it twice in SQL text)")
    return v


def o_logbin_lower_bound(expr: str) -> str:
    """DuckDB twin — same bit arithmetic, same bin()/shift semantics."""
    return (
        f"CASE WHEN {expr} < 8 THEN {expr} "
        f"ELSE ({expr} >> (length(bin({expr}))-1-3)) "
        f"<< (length(bin({expr}))-1-3) END"
    )
