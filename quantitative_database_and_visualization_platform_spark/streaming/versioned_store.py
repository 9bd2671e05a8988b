"""Crash-safe store commits for foreachBatch sinks (rollup_sink,
hll_sink): versioned parquet subdirectories plus an atomically-replaced
pointer file, replacing the old delete-then-rewrite parquet overwrite.

The overwrite pattern had a torn window (r6 ADVICE): a crash between
the delete and the commit lost the accumulated store, and the next
batch's PATH_NOT_FOUND branch treated the loss as BOOTSTRAP — silently
restarting a continuous aggregate / HLL sketch from one batch's delta.
Here nothing committed is ever deleted until a newer version's pointer
swap has succeeded:

    store_path/
        _CURRENT            text file naming the committed version dir
        _v_<batch_id>/      one parquet dir per committed rewrite

* Writes go to a NEW ``_v_<batch_id>`` dir; the pointer is committed
  with ``os.replace`` (atomic on POSIX) of a temp file; superseded
  version dirs are garbage-collected only AFTER the swap. A crash at
  any point leaves either the old committed state (pointer untouched)
  or the new one (pointer swapped) — never an empty store.
* Bootstrap is distinguishable from loss: no pointer AND no legacy
  parquet means nothing was ever committed (orphan ``_v_*`` debris from
  a crashed first write is ignored — it was never pointed at).
* Both names are underscore-prefixed because Spark's file listing skips
  ``_``/``.`` paths: a legacy flat-parquet store (the pre-r7 layout)
  stays readable through the same ``read_store`` until its first
  versioned commit migrates it.

This module is the local-filesystem rendition of the contract; a
cluster deployment keeps the identical merge logic and swaps the commit
for MERGE INTO on a transactional table format (Delta/Iceberg), whose
log gives the same atomic-visibility guarantee.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

_POINTER = "_CURRENT"
_VPREFIX = "_v_"


def read_store(spark, store_path: str) -> DataFrame | None:
    """The committed store, or None at bootstrap (never committed).

    Raises on a store that exists but cannot be read (torn legacy write,
    corruption) — the caller must NOT treat that as bootstrap.
    """
    ptr = os.path.join(store_path, _POINTER)
    if os.path.exists(ptr):
        with open(ptr) as f:
            version = f.read().strip()
        return spark.read.parquet(os.path.join(store_path, version))
    # no pointer: legacy flat layout, or bootstrap
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(store_path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None  # never created — true bootstrap
        if (
            "UNABLE_TO_INFER_SCHEMA" in msg or "Unable to infer schema" in msg
        ) and _only_uncommitted_debris(store_path):
            return None  # crashed FIRST commit: v-dirs exist, none committed
        raise


def _only_uncommitted_debris(store_path: str) -> bool:
    """True if store_path holds nothing but orphan ``_v_*`` version dirs
    and dot-hidden temp files (no committed data to protect).

    Deliberately narrower than "all underscore/dot entries": a torn
    PRE-versioned legacy overwrite (crash after the delete phase) leaves
    exactly ``_temporary``/``_SUCCESS`` and nothing else — that is LOSS
    of a committed store, not bootstrap, and must keep raising (the
    pre-r7 sink's stated contract for UNABLE_TO_INFER_SCHEMA)."""
    try:
        names = os.listdir(store_path)
    except OSError:
        return False
    return all(n.startswith(_VPREFIX) or n.startswith(".") for n in names)


def commit_store(df: DataFrame, store_path: str, batch_id: int) -> None:
    """Atomically publish `df` (driver-bounded by the caller's contract)
    as the store's new committed version."""
    spark = df.sparkSession
    # materialize to driver rows first so the version write cannot observe
    # the store it is about to supersede mid-GC (callers keep the store
    # cardinality-bounded: buckets x types / groups x 256)
    rows = df.collect()
    version = f"{_VPREFIX}{int(batch_id):012d}"
    vdir = os.path.join(store_path, version)
    spark.createDataFrame(rows, df.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(vdir)
    tmp = os.path.join(store_path, f".{_POINTER}.{os.getpid()}.{int(batch_id)}")
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(store_path, _POINTER))  # the commit point
    # best-effort GC strictly AFTER the swap: superseded versions and the
    # legacy flat files a migrating store leaves at top level
    for name in os.listdir(store_path):
        p = os.path.join(store_path, name)
        if name.startswith(_VPREFIX) and name != version:
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.isfile(p) and not name.startswith(("_", ".")):
            try:
                os.remove(p)  # legacy part-*.parquet from the flat layout
            except OSError:
                pass
