"""Append-only parquet-store maintenance: compaction.

The streaming stores (the dedup fingerprint store, the media-dhash
store, the polite-crawl robots store) are plain parquet directories
that every micro-batch APPENDS one small file to. Per-batch cost is
flat (SCALE.md §22A), but at ~10^4 batches the term that surfaces is
file listing: 10^4 part files per store turns every `read.parquet`
into a metadata crawl. `compact_store` is the operational answer,
in code.

Safety against a concurrent micro-batch, without a manifest: the
stores' contract is VALUE-IDEMPOTENT union (a fingerprint appearing
twice is the same store — every consumer reads through
`.distinct()`), so compaction can be add-then-delete over a
point-in-time snapshot:

  1. snapshot the *.parquet files present NOW;
  2. read exactly those files, dropDuplicates, write ONE part file
     to a temp dir, fsync it, rename it INTO the store, fsync the
     store directory (rename within one filesystem is atomic on
     POSIX; the fsyncs make it durable across power loss);
  3. delete the snapshot inputs.

Any reader listing the directory between 2 and 3 sees some values
twice — harmless by the union contract. A file appended by a
concurrent batch after the snapshot is never touched. A crash at any
point leaves a store that is a superset-by-file but identical by
value; re-running compact converges. This is the same
publish-then-retire order TxnTable's manifest swap encodes, reduced
to the filesystem because the value algebra makes the manifest
unnecessary.

Reader discipline: the union contract covers duplicate VALUES, not a
list-then-read race — an external reader that listed the directory
before step 3 and opens a retired file after it gets
FileNotFoundException. The stores' own consumers are safe because
compaction runs from the stream's foreachBatch thread (reads of the
store and compaction are serialized per micro-batch); any
out-of-band reader of a live store must set
``spark.sql.files.ignoreMissingFiles=true`` or read a quiesced copy.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid


def _snapshot(store_dir: str) -> list[str]:
    """The *.parquet files present now — the compaction input set.
    Spark part files and prior compaction outputs both match; side
    files (_SUCCESS, .crc) are not data and are left alone."""
    return sorted(
        p
        for p in glob.glob(os.path.join(store_dir, "*.parquet"))
        if os.path.isfile(p)
    )


def compact_store(spark, store_dir: str) -> dict:
    """Compact an append-only parquet store directory to one part
    file. Returns {files_before, files_after, rows}. No-op (and
    cheap) when the store already has <= 1 data file."""
    inputs = _snapshot(store_dir)
    return _compact_files(spark, store_dir, inputs)


def _compact_files(spark, store_dir: str, inputs: list[str]) -> dict:
    """Compaction over an explicit snapshot (separated from
    compact_store so tests can interleave a concurrent append between
    snapshot and swap — the exact race the design must survive)."""
    if len(inputs) <= 1:
        return {
            "files_before": len(inputs),
            "files_after": len(_snapshot(store_dir)),
            "rows": None,
        }
    tmp = os.path.join(
        os.path.dirname(store_dir.rstrip("/")),
        f".compact-tmp-{uuid.uuid4().hex}",
    )
    try:
        df = spark.read.parquet(*inputs).dropDuplicates()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = [
            p for p in glob.glob(os.path.join(tmp, "part-*.parquet"))
        ]
        assert len(parts) == 1, parts
        rows = spark.read.parquet(parts[0]).count()
        # publish BEFORE retiring: fsync the compacted file, rename
        # it into the store (atomic), fsync the store dir so the new
        # entry is durable, then delete the snapshot inputs — any
        # point-in-time listing holds every value at least once
        fd = os.open(parts[0], os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        dest = os.path.join(store_dir, f"compact-{uuid.uuid4().hex}.parquet")
        os.rename(parts[0], dest)
        dfd = os.open(store_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        for p in inputs:
            try:
                os.remove(p)
            except FileNotFoundError:
                pass  # a prior crashed compaction already retired it
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "files_before": len(inputs),
        "files_after": len(_snapshot(store_dir)),
        "rows": rows,
    }
