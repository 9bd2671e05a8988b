"""Build N x key-offset replicas of the sf0.1 tables for scale sweeps.

Reproduces the SCALING.md replica method (originally an ad-hoc round-4
session; checked in as of round 11 so the sweeps are re-runnable):

- events: N x the USER universe (user_id / event_id offset per replica,
  identical price paths) - the panel grows along the entity axis,
  exactly how a production universe grows.
- documents: doc_id offset + a per-replica token appended to the text,
  so near-dup structure is preserved instead of degenerating into
  N-way exact-dup cliques.
- embeddings: vec_id offset + a deterministic per-(replica, dim)
  perturbation, so cluster structure is preserved without exact
  duplicates.
- every other table is copied through unchanged (the new-query sweeps
  do not touch them; dimension tables must stay dimension-sized).

Usage: python tools/make_replicas.py N [out_dir]
  (default out_dir: /tmp/spark_graft_replica_{N}x)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quantitative_database_and_visualization_platform_spark.session import get_spark
from quantitative_database_and_visualization_platform_spark.sources.catalog import TABLES, load_table

SRC = "/root/testdata/sf0.1"


# replica key stride: base ids must be strictly below this or offset ids
# collide across replicas (r11 ADVICE: the old int arithmetic also
# silently wrapped at int32 for large N — ids are now offset in LONG).
# event_id carries its own wider stride (event cardinality ≈ 40× user
# cardinality at sf0.1) and is guarded against THAT stride, not the
# shared one (r12 verdict: the guard previously covered only
# user_id/doc_id/vec_id, so a base event_id ≥ 1e9 would have collided
# silently).
STRIDE = 10_000_000
EVENT_STRIDE = 1_000_000_000


def _check_stride(spark, df, col: str, t: str, stride: int = STRIDE) -> None:
    mx = df.agg(F.max(col)).collect()[0][0]
    assert mx is not None and mx < stride, (
        f"{t}.{col} max id {mx} >= replica stride {stride}; "
        f"raise the stride or the replica universe collides"
    )


def build(n: int, out: str) -> None:
    spark = get_spark()
    # LONG replica index: keeps every offset id in int64 for any N that
    # fits memory (int32 wrapped silently at N*stride > 2^31)
    reps = spark.range(n).select(F.col("id").cast("long").alias("r"))
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        df = load_table(spark, SRC, t)
        if t == "events":
            _check_stride(spark, df, "user_id", t)
            _check_stride(spark, df, "event_id", t, EVENT_STRIDE)
            df = df.crossJoin(F.broadcast(reps)).select(
                (F.col("user_id").cast("long") + F.col("r") * STRIDE).alias(
                    "user_id"
                ),
                (F.col("event_id").cast("long") + F.col("r") * EVENT_STRIDE)
                .alias("event_id"),
                *[c for c in df.columns if c not in ("user_id", "event_id")],
            )
        elif t == "documents":
            _check_stride(spark, df, "doc_id", t)
            df = df.crossJoin(F.broadcast(reps)).select(
                (F.col("doc_id").cast("long") + F.col("r") * STRIDE).alias(
                    "doc_id"
                ),
                F.concat(
                    F.col("text"), F.lit(" rtok"), F.col("r").cast("string")
                ).alias("text"),
                *[c for c in df.columns if c not in ("doc_id", "text")],
            )
        elif t == "embeddings":
            _check_stride(spark, df, "vec_id", t)
            df = df.crossJoin(F.broadcast(reps)).select(
                (F.col("vec_id").cast("long") + F.col("r") * STRIDE).alias(
                    "vec_id"
                ),
                F.expr(
                    "transform(embedding, (x, j) ->"
                    " CAST(x + ((r * 31 + j) % 7 - 3) * 0.001 AS FLOAT))"
                ).alias("embedding"),
                *[c for c in df.columns if c not in ("vec_id", "embedding")],
            )
        df.write.mode("overwrite").parquet(dst)
        print(f"{t}: {spark.read.parquet(dst).count()} rows -> {dst}")


if __name__ == "__main__":
    n = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_replica_{n}x"
    build(n, out)
