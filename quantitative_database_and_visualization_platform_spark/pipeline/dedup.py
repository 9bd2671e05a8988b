"""Deduplication operators over a document corpus.

- exact: normalize → content hash → per-hash keep-first flags. One
  groupBy-shaped window on the hash; at 100 TB this is a single shuffle
  on a high-cardinality key (no skew: hash keys are uniform).
- MinHash-LSH near-dup: k-word shingles → H salted MinHashes → band keys
  → candidate pairs via the BAND JOIN (groupBy band bucket), exact
  Jaccard verification on candidates only. Never all-pairs: the join
  fans out only within colliding buckets, and AQE's skew-join splits a
  pathological bucket.
- SimHash near-dup: 32-bit signature from salted word hashes weighted by
  term frequency; candidate pairs via the 4-block pigeonhole join, exact
  Hamming verification on candidates.

All hashing is md5-hex based (lexicographic min == numeric min on the
fixed-width hex strings) so the same expressions run on any ANSI-ish
engine — the DuckDB oracles recompute signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import managed_persist

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = N_MINHASH / N_BANDS = 2
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4


def normalized_text(text: Column | str = "text") -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form every
    dedup signature hashes."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(c, " +", " ")))


def with_shingles(df: DataFrame, text: str = "text", k: int = 3, distinct: bool = True) -> DataFrame:
    """Append `shingles`: the k-word shingles of the normalized text
    (empty array when the doc has < k words). The word array is
    materialized ONCE per row — building shingles off a repeated
    split(text) expression re-tokenizes the document per element and
    turns an O(doc) scan into O(doc·len), a ~100× slowdown at corpus
    scale."""
    dedupe = "array_distinct" if distinct else ""
    shingle = f"""{dedupe}(transform(
        sequence(0, size(__w) - {k}),
        i -> concat_ws(' ', {", ".join(f"__w[i + {j}]" for j in range(k))})))"""
    return (
        df.withColumn("__w", F.split(normalized_text(text), " "))
        .withColumn(
            "shingles",
            F.when(F.size("__w") >= k, F.expr(shingle)).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .drop("__w")
    )


def with_minhash_bands(
    df: DataFrame, id_col: str = "doc_id", n_hash: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    """(id, shingles, mh_0..mh_{n-1}, bands): MinHash signature (min of
    salted md5 over the shingle set) + per-band keys.

    Computed as explode → ONE hash aggregate with n_hash `min`s and a
    `collect_set` (rebuilding the shingle set for the verify stage), not
    as per-row array lambdas: projection collapse would inline the
    shingle-building transform into every signature column (n_hash
    rebuilds per row), while the aggregate shape hashes each shingle
    exactly once and combines map-side, so the shuffle carries only
    n_hash minima + the set per doc."""
    exploded = df.select(F.col(id_col), F.explode("shingles").alias("s"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"mh_{i}")
        for i in range(n_hash)
    ] + [F.collect_set("s").alias("shingles")]
    out = exploded.groupBy(id_col).agg(*aggs)
    rows_per_band = n_hash // n_bands
    band_exprs = [
        F.concat(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
        for b in range(n_bands)
    ]
    return out.withColumn("bands", F.array(*band_exprs))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band join: explode band keys, self-join on (band index, key) with
    a < b, distinct pairs. THE scale move: candidates come only from
    colliding buckets, so work is Σ bucket², not n²."""
    bands = sigs.select(id_col, F.posexplode("bands").alias("band", "key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )


def jaccard_verified_pairs(
    candidates: DataFrame, shingled: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard on candidate pairs only. Intersection size via
    array_intersect (hash-based, O(|sa|+|sb|)) — the lambda
    filter/array_contains form is O(|sa|·|sb|) per pair and was the
    dominant cost of the verify stage; both operands are DISTINCT
    shingle sets so the intersect's dedup semantics change nothing."""
    sa = shingled.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("sa"))
    sb = shingled.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("sb"))
    inter = F.expr("CAST(size(array_intersect(sa, sb)) AS DOUBLE)")
    union = F.size("sa") + F.size("sb") - inter
    return (
        candidates.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def prefix_ordered_shingles(
    shingled: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, ordered): each doc's DISTINCT shingles sorted by (global
    frequency asc, shingle asc) — the canonical token order for prefix
    filtering. Rarest-first means prefix tokens land in the smallest
    join buckets. One explode + one groupBy aggregate; the frequency
    side is an aggregate of the same exploded relation (map-side
    combined), so the whole ordering costs two shuffles on (shingle) and
    (doc) regardless of corpus size."""
    tok = shingled.select(id_col, F.explode("shingles").alias("s"))
    freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tok.join(freq, "s")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("cnt", "s"))).alias("os"))
        .select(id_col, F.expr("transform(os, x -> x.s)").alias("ordered"))
    )


def with_prefix(ordered: DataFrame, threshold: float, id_col: str = "doc_id") -> DataFrame:
    """(id, pref): each doc's prefix tokens for an EXACT Jaccard join at
    `threshold` (public prefix-filtering principle: if J(a,b) >= t then a
    and b share at least one token among each set's first
    |s| - ceil(t*|s|) + 1 tokens under any global total order). Callers
    should persist the result before exploding it (Generate collapse
    would re-evaluate the slice per emitted element)."""
    return ordered.select(
        id_col,
        F.expr(
            f"slice(ordered, 1, size(ordered) - CAST(ceil({threshold} * size(ordered)) AS INT) + 1)"
        ).alias("pref"),
        F.size("ordered").alias("n_tok"),
    )


def prefix_filter_candidates(
    pref: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs from shared-prefix-token buckets — rarest tokens,
    so bucket sizes stay small — never an all-pairs product; exact
    Jaccard then verifies candidates only. The PPJoin length filter
    (J >= t forces t*|a| <= |b| and t*|b| <= |a|) prunes
    size-incompatible pairs inside the join before the distinct, which
    cuts the exact-verify workload severalfold at no recall cost. The
    exact-similarity twin of the MinHash band join (which trades
    exactness for fewer candidates)."""
    ptok = pref.select(id_col, "n_tok", F.explode("pref").alias("s"))
    a, b = ptok.alias("a"), ptok.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.n_tok") >= threshold * F.col("a.n_tok"))
            & (F.col("a.n_tok") >= threshold * F.col("b.n_tok")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )


def with_simhash(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 32-bit signature string: bit p is the sign of the
    tf-weighted sum of bit p of each FEATURE's md5 (hex digit p's high
    bit). Features are 3-word shingles, not bare words: with a small
    vocabulary, word-level bits are frequency-correlated across the whole
    corpus, which concentrates the block join into one giant bucket
    (measured: a 3239-doc bucket at 5k docs → ~7.5M candidate pairs);
    shingle features decorrelate the bits and spread the buckets.
    Docs with < 3 words have no features and drop out.
    ONE shuffle: summing ±1 per token OCCURRENCE is already the
    tf-weighted sum, so no per-(id, feature) count stage is needed, and
    the per-id partial sums combine map-side (32 longs per doc crossing
    the wire, not 1.5M feature strings). The persist before explode is a
    materialization barrier: Generate re-evaluates a collapsed
    shingle-building projection per emitted element (O(len²) per doc);
    pinning the arrays first makes the explode a plain iteration
    (measured ~20x on a 5k-doc corpus)."""
    shingled = managed_persist(
        with_shingles(df.select(id_col, text), text=text, distinct=False)
    )
    tokens = shingled.select(F.col(id_col), F.explode("shingles").alias("word"))
    tokens = tokens.withColumn("h", F.md5("word"))
    bit_sums = [
        F.sum(F.when(F.substring("h", p + 1, 1) >= "8", 1).otherwise(-1)).alias(f"s{p}")
        for p in range(SIMHASH_BITS)
    ]
    sums = tokens.groupBy(id_col).agg(*bit_sums)
    sig = F.concat(
        *[F.when(F.col(f"s{p}") >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(SIMHASH_BITS)]
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pigeonhole block join: split the signature into 4 blocks of 8 bits;
    any pair within Hamming distance 3 shares at least one exact block."""
    block = SIMHASH_BITS // SIMHASH_BLOCKS
    blocks = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[F.substring("simhash", b * block + 1, block) for b in range(SIMHASH_BLOCKS)])
        ).alias("blk", "key"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash").alias("a_sig"),
            F.col("b.simhash").alias("b_sig"),
        )
        .distinct()
    )


def hamming(a: str, b: str, bits: int = SIMHASH_BITS) -> Column:
    return F.expr(
        f"aggregate(sequence(1, {bits}), 0, "
        f"(acc, p) -> acc + IF(substring({a}, p, 1) = substring({b}, p, 1), 0, 1))"
    )


def connected_components(
    pairs: DataFrame, a: str = "a_id", b: str = "b_id", max_iter: int = 25
) -> DataFrame:
    """Duplicate-cluster assembly: connected components of the undirected
    near-dup pair graph, component id = minimum doc id reachable. The
    step a curation pipeline runs after any pairwise dedup to pick ONE
    canonical document per cluster (pairs alone can chain: A~B, B~C
    must collapse to one cluster even though A~C was never emitted).

    Iterative min-label propagation with pointer jumping: each round a
    node takes the min of (its label, its neighbors' labels, its label's
    label). The third term is the GraphX-style shortcut — labels chase
    their own assignments, so convergence is O(log diameter) rounds
    rather than O(diameter); near-dup clusters are shallow anyway, but a
    pathological duplication chain stays cheap. Each round is two joins
    + one groupBy on the node key (edges shuffled once per round, labels
    are node-sized); per-round `localCheckpoint` truncates the lineage
    so round N's plan does not replay rounds 1..N-1. The driver-side
    convergence test reads a single aggregated count — no row data
    leaves the executors.
    """
    sym = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    sym = managed_persist(sym)
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # pointer jump: comp is itself a node id — look up ITS label
        hop = labels.select(
            F.col("node").alias("__pj_node"), F.col("comp").alias("pj_comp")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .join(hop, F.col("comp") == F.col("__pj_node"), "left")
            .select(
                "node",
                F.least(
                    "comp",
                    F.coalesce("nbr_comp", "comp"),
                    F.coalesce("pj_comp", "comp"),
                ).alias("comp"),
                (
                    (F.col("nbr_comp") < F.col("comp"))
                    | (F.col("pj_comp") < F.col("comp"))
                )
                .cast("int")
                .alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum("__chg")).collect()[0][0] or 0
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("component"))
