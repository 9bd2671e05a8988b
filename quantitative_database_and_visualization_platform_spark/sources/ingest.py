"""Ingest-side sources and sinks (SURVEY.md §2.1): CSV with encoding
fallback, bulk CSV sink, and partition compaction.

The reference bulk-loads zipped CSV tick batches with a GB18030→UTF-8
encoding sniff and bad-line skipping (`Project report.md:453-487`), fans
out over 28 OS processes, and periodically runs `OPTIMIZE TABLE ...
FINAL` (`Project report.md:494-507`). In Spark: file-glob reads are
task-parallel natively, DROPMALFORMED replaces on_bad_lines='skip', and
compaction is a repartition-on-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_with_fallback(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    encodings: tuple[str, ...] = ("GB18030", "UTF-8"),
    **options,
) -> DataFrame:
    """Try each encoding in order (two-pass sniff, mirroring the
    reference's try-GB18030-except-UTF-8 loader).

    The PROBE reads with mode=FAILFAST: under DROPMALFORMED a wrong
    encoding usually decodes to mojibake or silently dropped lines rather
    than raising, so a lenient probe would accept the first encoding for
    any input and the fallback would never trigger. Only after an
    encoding survives the strict probe is the real (lenient,
    DROPMALFORMED) reader returned for the full scan."""
    last_err: Exception | None = None
    for enc in encodings:
        def _reader(mode: str):
            r = spark.read.option("header", "true").option("mode", mode).option(
                "encoding", enc
            )
            for k, v in options.items():
                r = r.option(k, v)
            return r.csv(path, schema=schema) if schema else r.csv(path, inferSchema=True)

        try:
            # strict probe over a bounded prefix: decode/parse failures
            # surface here instead of being silently dropped
            _reader("FAILFAST").limit(100).collect()
            return _reader("DROPMALFORMED")
        except Exception as exc:  # noqa: BLE001 — try the next encoding
            last_err = exc
    raise last_err if last_err else ValueError("no encodings supplied")


def write_csv_bulk(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Bulk CSV sink (the reference's CSVWithNames pipe analog): one file
    per partition, written by executors in parallel — the writer scales
    with the cluster, not the driver."""
    df.write.mode(mode).option("header", "true").csv(path)


def compact_partitions(spark: SparkSession, path: str, n_files: int, sort_cols: list[str] | None = None) -> None:
    """OPTIMIZE ... FINAL analog: rewrite a parquet dataset into n_files
    files (sorted within files for row-group skipping when sort_cols is
    given). Run per-partition-directory at scale so a compaction touches
    only hot partitions, like the reference's per-partition OPTIMIZE loop."""
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(f"{path}__compacted")


def read_zipped_csvs(
    spark: SparkSession,
    zip_glob: str,
    schema: StructType,
    encodings: tuple[str, ...] = ("GB18030", "UTF-8"),
) -> DataFrame:
    """Executor-parallel ZIP→CSV ingest — the reference's actual intake
    shape (zipped tick batches, 28-process pool with a GB18030→UTF-8
    sniff and bad-line skipping, `Project report.md:453-487`).

    Spark has no zip codec, so each archive is read whole via the
    binaryFile source (one task per zip — same parallelism unit as the
    reference's per-zip worker) and decompressed in an Arrow-batched
    mapInPandas: stdlib zipfile + pandas.read_csv per member, trying each
    encoding (a wrong codec raises UnicodeDecodeError — the same strict
    probe as read_csv_with_fallback), bad lines skipped. Zip bytes never
    hit the driver; output rows stream out as Arrow batches.
    """
    from collections.abc import Iterator

    import pandas as pd

    field_names = [f.name for f in schema.fields]

    def unzip_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import io
        import zipfile

        for pdf in batches:
            for blob in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for member in zf.namelist():
                        if not member.lower().endswith(".csv"):
                            continue
                        raw = zf.read(member)
                        for enc in encodings:
                            try:
                                out = pd.read_csv(
                                    io.BytesIO(raw),
                                    encoding=enc,
                                    on_bad_lines="skip",
                                )
                                break
                            except (UnicodeDecodeError, ValueError):
                                continue
                            except Exception:
                                # any other parser failure on this member
                                # is bad data, not a job-fatal error
                                continue
                        else:
                            continue  # undecodable member: skip, don't kill the job
                        # reindex, not out[field_names]: a member missing a
                        # schema column must yield NULLs for it (skip-bad-
                        # data contract), not a KeyError that kills the task
                        yield out.reindex(columns=field_names)

    blobs = spark.read.format("binaryFile").load(zip_glob).select("content")
    return blobs.mapInPandas(unzip_batches, schema=schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read newline-delimited JSON (the standard training-data
    interchange format) with PERMISSIVE corrupt-record capture: malformed
    lines land whole in ``corrupt_col`` instead of failing the job or
    being silently dropped — at pipeline scale a few bad lines per
    shard are certain and must be quarantined, not fatal.

    With an explicit ``schema`` the read is one pass; without one Spark
    runs its sampling inference pass first (fine interactively, pass a
    schema in production so a 100 TB corpus is not scanned twice). The
    corrupt column is appended to the schema automatically when absent.
    """
    if schema is not None and corrupt_col not in schema.fieldNames():
        schema = schema.add(corrupt_col, "string")
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if corrupt_col not in df.columns:
        # inference saw only clean rows: add the column so downstream
        # quarantine splits are schema-stable
        from pyspark.sql import functions as F

        df = df.withColumn(corrupt_col, F.lit(None).cast("string"))
    return df


def split_quarantine(df: DataFrame, corrupt_col: str = "_corrupt_record"):
    """(clean, quarantined) split of a PERMISSIVE jsonl read. The clean
    side drops the corrupt column; the quarantine side keeps only it —
    write it next to the output for replay/debugging.

    The read is cached first: Spark disallows queries whose referenced
    columns are ONLY the internal corrupt-record column on a raw
    JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    the documented pattern is to materialize the parsed rows before
    splitting. At corpus scale, checkpoint the parsed frame to parquet
    once and split from that instead of caching (one scan either way)."""
    from pyspark.sql import functions as F

    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Bulk newline-delimited JSON sink (one file per partition; callers
    control fan-in with coalesce/repartition)."""
    df.write.mode(mode).json(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVED
    schemas (columns added over time): ``mergeSchema`` unions the file
    footers into one schema and back-fills absent columns with NULL —
    the read-side half of additive schema evolution on a lakehouse
    table. Costs one footer pass per file (footers only, not data), so
    turn it on for evolving tables rather than globally."""
    return spark.read.option("mergeSchema", "true").parquet(path)
