"""Embedding similarity search: brute-force cosine top-k (the exactness
baseline) and SRP-bucketed ANN (the scale path).

The SRP (signed random projection) planes are DETERMINISTIC Rademacher
vectors derived from md5 — plane p, dimension j has weight +1 iff the
first hex digit of md5('p{p}_{j}') has its high bit set. That keeps the
bucketing reproducible across engines (the DuckDB oracle re-derives the
same planes) and across cluster runs (no RNG state to ship).

Scale shape: brute force is one scan + TakeOrderedAndProject per probe —
fine for a single probe, linear in corpus size. The SRP variant buckets
the corpus ONCE (a materializable groupBy key), then a probe touches only
its bucket: candidate set ~ n / 2^planes, and multi-probe (flipping weak
bits) trades recall for fan-out without ever scanning the full corpus.

Sizing the plane count: with FIXED planes, expected bucket size is
n / 2^planes — it grows LINEARLY with the corpus, and every bucketed
self-join (near-dup) pays Σ bucket² ∝ n²/2^planes: the same class of
scale-killer as a fixed-cardinality blocking key. N_PLANES must
therefore grow with log2(n): `planes_for_corpus(n, target)` returns
ceil(log2(n / target)) so the expected bucket holds ~`target` vectors
at any corpus size (e.g. 1e10 vectors / target 256 → 26 planes), and
self-join work stays Σ bucket² ≈ n·target — linear in n. The bench
default N_PLANES=4 is planes_for_corpus(5e3, 512) at the sf0.1 corpus
(~312 vectors/bucket); a production caller passes its own n. More
planes cost recall at fixed
probes — hold bucket size constant and raise `n_probes` instead of
letting buckets grow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 4
DIMS = 64


def planes_for_corpus(n_vectors: int, target_bucket: int = 256) -> int:
    """Plane count that holds the EXPECTED bucket at ~target_bucket
    vectors regardless of corpus size: ceil(log2(n / target)), min 1.

    Rationale (see module docstring): fixed planes ⇒ bucket size
    n/2^planes grows linearly with the corpus and bucketed self-joins
    degrade toward all-pairs; log-scaled planes keep Σ bucket² ≈
    n·target — linear. At 100 TB (~1e10 vectors, target 256) this is 26
    planes — still a cheap 26-bit key.

    Computed float-free as bit_length((n-1) // target) — identical to
    ceil(log2(n/target)) clamped at >= 1 for every n (2^(p-1)·t < n <=
    2^p·t ⟺ (n-1)//t ∈ [2^(p-1), 2^p−1] ⟺ bit_length p), so the DuckDB
    oracle twin (`o_planes_cte`: length(bin(...)) over the same integer)
    re-derives the same count with no libm-boundary risk."""
    if target_bucket <= 0:
        raise ValueError("target_bucket must be positive")
    if n_vectors <= 0:
        # empty corpus (r12 empty-input sweep): any plane count buckets
        # zero vectors identically; 1 keeps the key cheap and the Spark
        # plan construction alive. The oracle twin never evaluates its
        # plane count on an empty corpus (no rows reach the bucket
        # lambda), so the clamp cannot diverge from it.
        return 1
    return max(1, ((n_vectors - 1) // target_bucket).bit_length())


def o_planes_cte(src: str = "embeddings", target_bucket: int = 256) -> str:
    """DuckDB CTE re-deriving planes_for_corpus(COUNT(*)) from the data
    itself: `np(p)` — bin() is the exact-integer bit_length twin."""
    return (
        f"np AS (SELECT GREATEST(1, length(bin((COUNT(*) - 1) // {target_bucket})))"
        f" AS p FROM {src})"
    )


def o_srp_bucket_dyn(vec: str, np_ref: str = "(SELECT p FROM np)", dims: int = DIMS) -> str:
    """DuckDB SRP bucket with a RUNTIME plane count (`np_ref`, e.g. the
    o_planes_cte scalar): the same md5-Rademacher planes as
    o_srp_bucket, built with a nested list_transform lambda instead of
    Python-side unrolling — the oracle twin for corpus-sized plane
    counts the static generator cannot know at registration time."""
    sign = (
        f"CASE WHEN substring(md5('p' || CAST(q AS VARCHAR) || '_' ||"
        f" CAST(i - 1 AS VARCHAR)), 1, 1) >= '8'"
        f" THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"
    )
    dot = (
        f"list_sum(list_transform(range(1, {dims + 1}),"
        f" i -> CAST({vec}[i] AS DOUBLE) * ({sign})))"
    )
    return (
        f"array_to_string(list_transform(range(0, {np_ref}),"
        f" q -> CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END), '')"
    )


def cosine(a: str, b: str) -> Column:
    """Cosine similarity of two float-array columns, accumulated in
    double (cast-first so both engines run the identical IEEE ops)."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    nb = F.sqrt(
        F.expr(
            f"aggregate({b}, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    return dot / (na * nb)


def o_cosine(a: str, b: str, dims: int = DIMS) -> str:
    """DuckDB twin of cosine() (sequential list_sum over the same
    double-cast products)."""
    dot = (
        f"list_sum(list_transform(range(1, {dims + 1}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = f"sqrt(list_sum(list_transform(range(1, {dims + 1}), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform(range(1, {dims + 1}), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    return f"{dot} / ({na} * {nb})"


def _plane_sign(p: int) -> str:
    """Spark SQL: +1/-1 weight of plane p at lambda dimension j."""
    return (
        f"IF(substring(md5(concat('p{p}_', CAST(j AS STRING))), 1, 1) >= '8',"
        f" CAST(1 AS DOUBLE), CAST(-1 AS DOUBLE))"
    )


def srp_bucket(vec: str, n_planes: int = N_PLANES, dims: int = DIMS) -> Column:
    """SRP bucket key: one bit per plane = sign of the Rademacher dot."""
    bits = []
    for p in range(n_planes):
        dot = F.expr(
            f"aggregate(zip_with({vec}, transform(sequence(0, {dims - 1}), j -> {_plane_sign(p)}),"
            f" (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def o_srp_bucket(vec: str, n_planes: int = N_PLANES, dims: int = DIMS) -> str:
    """DuckDB twin of srp_bucket (j is 1-based there: salt uses j-1)."""
    bits = []
    for p in range(n_planes):
        sign = (
            f"CASE WHEN substring(md5('p{p}_' || CAST(i - 1 AS VARCHAR)), 1, 1) >= '8'"
            f" THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END"
        )
        dot = f"list_sum(list_transform(range(1, {dims + 1}), i -> CAST({vec}[i] AS DOUBLE) * ({sign})))"
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(f"({b})" for b in bits)


def srp_probe_buckets(vec: str, n_probes: int = 2, n_planes: int = N_PLANES, dims: int = DIMS) -> Column:
    """Multi-probe SRP: the primary bucket plus `n_probes` variants, each
    flipping ONE of the weakest bits (the planes whose projection has the
    smallest |dot| — exactly the ones a near-boundary neighbor would land
    on the other side of). Probing w extra buckets multiplies the
    candidate set by (1+w)/1 at fixed bucketing cost — the recall knob a
    production ANN run tunes instead of re-bucketing with fewer planes."""
    dots = []
    for p in range(n_planes):
        dots.append(
            F.expr(
                f"aggregate(zip_with({vec}, transform(sequence(0, {dims - 1}), j -> {_plane_sign(p)}),"
                f" (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        )
    primary = F.concat(
        *[F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")) for d in dots]
    )
    # planes ordered by |dot| ascending (ties by plane id): the flip order
    ordered = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("a"), F.lit(p).alias("p"))
                for p, d in enumerate(dots)
            ]
        )
    )
    weakest = F.slice(F.transform(ordered, lambda s: s["p"]), 1, n_probes)

    def flip(j: Column) -> Column:
        ch = F.substr(primary, j + 1, F.lit(1))
        flipped = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
        return F.concat(
            F.substr(primary, F.lit(1), j),
            flipped,
            F.substr(primary, j + 2, F.lit(n_planes)),
        )

    return F.concat(F.array(primary), F.transform(weakest, flip))


def ann_multiprobe(
    corpus: DataFrame,
    probe: DataFrame,
    k: int,
    n_probes: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SRP ANN with multi-probe: corpus bucketed ONCE (materializable),
    probe fans out to its primary + n_probes weakest-bit buckets, exact
    cosine only over the candidate union. Candidate cost ~ (1+n_probes) *
    n / 2^planes."""
    bucketed = corpus.withColumn("bucket", srp_bucket(vec))
    probes = (
        probe.select(
            F.col(vec).alias("__probe"),
            F.explode(srp_probe_buckets(vec, n_probes)).alias("bucket"),
        )
    )
    return (
        bucketed.join(F.broadcast(probes), "bucket")
        .withColumn("cos", F.round(cosine(vec, "__probe"), 6))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
        .drop("__probe")
    )


def l2_dist2(a: str, b: str) -> Column:
    """Squared L2 distance of two float-array columns, accumulated in
    double left-to-right (the DuckDB twin sums the same sequence)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def o_l2_dist2(a: str, b: str, dims: int = DIMS) -> str:
    return (
        f"list_sum(list_transform(range(1, {dims + 1}),"
        f" i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def nearest_centroid(
    vecs: DataFrame, cents: DataFrame, vec: str, id_col: str, out: str = "cid"
) -> DataFrame:
    """Assign each vector to its nearest centroid: broadcast the (small)
    centroid table, distance per pair, keep rank-1 per vector. Distances
    are floor-quantized at 1e-6 before the argmin so a sub-1e-6 float
    divergence between engines becomes a tie broken deterministically by
    centroid id rather than a different cluster."""
    from pyspark.sql import Window

    # floor-quantized integer distance key, not ROUND: the two engines'
    # ROUND implementations disagree on "...5" boundary doubles, and a
    # one-ulp key difference here would flip a cluster assignment
    pairs = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "__dist", F.floor(l2_dist2(vec, "__cent") * 1_000_000 + F.lit(0.5)).cast("long")
    )
    pick = Window.partitionBy(id_col).orderBy("__dist", "__cid")
    return (
        pairs.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .withColumnRenamed("__cid", out)
        .drop("__dist", "__rn", "__cent")
    )


def ivf_centroids(
    assigned: DataFrame, vec: str, cid: str = "cid", scale: int = 1_000_000
) -> DataFrame:
    """One Lloyd refinement with engine-exact means: per (cluster, dim)
    the mean is an integer sum of fixed-point quantized components (order
    independent) divided by the count — both engines produce identical
    centroid bits, so the subsequent argmin assignment cannot drift.
    Scale shape: one posexplode (64x fan-out) + one groupBy for the
    centroid build — a single aggregation pass over the corpus, done once
    per index build, not per probe."""
    per_dim = (
        assigned.select(cid, F.posexplode(vec).alias("dim", "x"))
        .groupBy(cid, "dim")
        .agg(
            F.sum(F.floor(F.col("x").cast("double") * scale + F.lit(0.5)).cast("long")).alias("qs"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            cid,
            "dim",
            ((F.col("qs").cast("double") / F.col("n")) / float(scale)).alias("c"),
        )
    )
    return per_dim.groupBy(cid).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("__cent")
    )


def o_ivf_cents(src: str, cid: str = "cid", dims: int = DIMS, scale: int = 1_000_000) -> str:
    """DuckDB twin of ivf_centroids over an assigned relation `src`."""
    return f"""
        SELECT {cid}, list(c ORDER BY dim) AS cent FROM (
            SELECT {cid}, i - 1 AS dim,
                   (CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS DOUBLE)
                    / COUNT(*)) / {float(scale)!r} AS c
            FROM {src}, range(1, {dims + 1}) t(i)
            GROUP BY {cid}, i
        ) GROUP BY {cid}
    """


def topk_cosine(
    corpus: DataFrame, probe: DataFrame, k: int, vec: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force cosine top-k against a one-row probe (broadcast: the
    probe side is bounded by construction)."""
    p = probe.select(F.col(vec).alias("__probe"))
    scored = corpus.crossJoin(F.broadcast(p)).withColumn(
        "cos", F.round(cosine(vec, "__probe"), 6)
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col)).limit(k).drop("__probe")
