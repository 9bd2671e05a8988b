"""Multimodal column plumbing: treat image/audio/video payloads as opaque
binary columns with typed metadata, processed in Arrow batches via
mapInPandas.

The real decoders (PIL / torchaudio / pyav) are NOT available in this
environment, so `decode_batch` runs a clearly-marked DETERMINISTIC STUB
that derives plausible metadata from the byte stream; the Spark-side
plumbing — schema, Arrow batch iteration, partition-preserving map — is
real and oracle-checked. Flip `use_real_codec=True` to see exactly where
a production decoder plugs in.

Scale shape: mapInPandas streams Arrow batches through Python without
collecting a partition; binary payloads never hit the driver. Batch size
is governed by spark.sql.execution.arrow.maxRecordsPerBatch, so executor
memory is bounded by batch_size × max_payload, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def attach_blob(df: DataFrame, text: str = "text") -> DataFrame:
    """Materialize the opaque binary payload column (here: the utf-8
    bytes of the text stand in for image/audio bytes)."""
    return df.withColumn("content", F.encode(F.col(text), "UTF-8"))


def decode_batch(batches: Iterator[pd.DataFrame], use_real_codec: bool = False) -> Iterator[pd.DataFrame]:
    """Arrow-batch decoder. STUB by default: metadata is a deterministic
    function of the payload length so the pipeline shape is testable
    without codecs. With ``use_real_codec=True`` and Pillow installed,
    images are decoded for real into the SAME schema (n_frames from
    Pillow's multi-frame API, 1 for stills) — the integration point a
    production deployment flips on. Raises when Pillow is absent so a
    misconfigured cluster fails loudly instead of silently shipping stub
    metadata."""
    if use_real_codec:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decoding needs Pillow, which is not installed "
                "in this environment; run with use_real_codec=False for "
                "the deterministic stand-in"
            ) from e
        import io

        for pdf in batches:
            meta = {"n_bytes": [], "width": [], "height": [], "n_frames": []}
            for payload in pdf["content"]:
                with Image.open(io.BytesIO(payload)) as im:
                    meta["n_bytes"].append(len(payload))
                    meta["width"].append(im.width)
                    meta["height"].append(im.height)
                    meta["n_frames"].append(getattr(im, "n_frames", 1))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), **meta}
            ).astype("int64")
        return
    for pdf in batches:
        n_bytes = pdf["content"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "width": n_bytes % 64 + 16,
                "height": (n_bytes // 7) % 64 + 16,
                "n_frames": n_bytes % 5 + 1,
            }
        )


def decode_documents(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """doc table → decoded metadata via mapInPandas (partition-preserving,
    no shuffle)."""
    import functools

    # a missing payload cannot be decoded: rows with NULL content are
    # excluded BEFORE the Arrow boundary — otherwise every decoder
    # (stub's len(), Pillow's BytesIO) raises inside the Python worker
    # on the first NULL of a batch (r13 NULL-saturated sweep). Callers'
    # oracles carry the matching text IS NOT NULL. No-op on clean data.
    withblob = (
        attach_blob(df)
        .select("doc_id", "content")
        .filter(F.col("content").isNotNull())
    )
    fn = functools.partial(decode_batch, use_real_codec=use_real_codec)
    return withblob.mapInPandas(fn, schema=DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, k: int = 3) -> DataFrame:
    """Frame sampling: one output row per sampled frame, even integer
    stride over [0, n_frames), at most k frames per payload — the
    video-frame-extraction shape of a multimodal training pipeline.

    The frame INDEX/OFFSET arithmetic is real and exact (oracle-checked);
    the pixel decode of each sampled frame is the same documented stub as
    decode_batch. Explode happens JVM-side from a tiny computed index
    array (never the payload), so the fan-out row carries only
    (doc_id, frame_idx, byte offset) — payload bytes are fetched
    per-frame by the downstream decoder, not duplicated k×.

    Degenerate payloads (n_frames NULL or < 1) emit ZERO rows — without
    the filter the `otherwise([0])` branch would fabricate a frame_idx-0
    row with NULL offset/size for a frameless payload.
    """
    decoded = decoded.filter(F.col("n_frames") >= 1)
    n = F.col("n_frames")
    kk = F.least(F.lit(k), n)
    # even stride: idx_i = floor(i * (n-1) / (k'-1)) for k' > 1, else [0]
    idxs = F.when(
        kk > 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), kk - 1),
                lambda i: F.floor(i * (n - 1) / (kk - 1)).cast("long"),
            )
        ),
    ).otherwise(F.array(F.lit(0).cast("long")))
    frame_size = F.floor(F.col("n_bytes") / n).cast("long")
    return (
        decoded.withColumn("frame_idx", F.explode(idxs))
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * frame_size).alias("frame_offset"),
            frame_size.alias("frame_nbytes"),
        )
    )
