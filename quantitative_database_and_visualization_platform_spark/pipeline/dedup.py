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

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = N_MINHASH / N_BANDS = 2
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4


def normalized_text(text: Column | str = "text") -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form every
    dedup signature hashes."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(c, " +", " ")))


def with_shingles(df: DataFrame, text: str = "text", k: int = 3) -> DataFrame:
    """Append `shingles`: the DISTINCT set of k-word shingles of the
    normalized text (empty array when the doc has < k words)."""
    return df.withColumn("__t", normalized_text(text)).withColumn(
        "shingles",
        F.expr(
            f"""CASE WHEN size(split(__t, ' ')) >= {k} THEN
                  array_distinct(transform(
                    sequence(0, size(split(__t, ' ')) - {k}),
                    i -> concat_ws(' ', {", ".join(f"split(__t, ' ')[i + {j}]" for j in range(k))})))
                ELSE array() END"""
        ),
    ).drop("__t")


def with_minhash_bands(df: DataFrame, n_hash: int = N_MINHASH, n_bands: int = N_BANDS) -> DataFrame:
    """Append `mh_0..mh_{n-1}` (MinHash signature: min of salted md5 over
    the shingle set) and `bands` (array of per-band keys, each the concat
    of rows_per_band consecutive signature entries)."""
    out = df
    for i in range(n_hash):
        out = out.withColumn(
            f"mh_{i}", F.expr(f"array_min(transform(shingles, s -> md5(concat('{i}:', s))))")
        )
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
    """Exact Jaccard on candidate pairs only (intersection via
    filter/contains on the distinct shingle sets)."""
    sa = shingled.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("sa"))
    sb = shingled.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("sb"))
    inter = F.expr("CAST(size(filter(sa, x -> array_contains(sb, x))) AS DOUBLE)")
    union = F.size("sa") + F.size("sb") - inter
    return (
        candidates.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def with_simhash(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 32-bit signature string: bit p is the sign of the
    tf-weighted sum of bit p of each word's md5 (hex digit p's high bit).
    Two shuffles: (id, word) term counts, then per-id bit sums."""
    tokens = df.select(
        F.col(id_col), F.explode(F.split(normalized_text(text), " ")).alias("word")
    )
    tf = tokens.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("h", F.md5("word"))
    bit_sums = [
        F.sum(
            F.when(F.substring("h", p + 1, 1) >= "8", F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s{p}")
        for p in range(SIMHASH_BITS)
    ]
    sums = tf.groupBy(id_col).agg(*bit_sums)
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
