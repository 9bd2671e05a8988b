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
    """Arrow-batch decoder. STUB: metadata is a deterministic function of
    the payload length so the pipeline shape is testable without codecs."""
    for pdf in batches:
        if use_real_codec:
            raise NotImplementedError(
                "real image/audio decoding needs PIL/torchaudio, which are "
                "not installed in this environment; the stub below is the "
                "deterministic stand-in"
            )
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


def decode_documents(df: DataFrame) -> DataFrame:
    """doc table → decoded metadata via mapInPandas (partition-preserving,
    no shuffle)."""
    withblob = attach_blob(df).select("doc_id", "content")
    return withblob.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
