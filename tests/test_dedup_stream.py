"""Streaming incremental dedup (streaming/dedup_stream.py): the
append-only fingerprint-store screen. Contracts pinned here:
ordered-arrival fresh set == batch keep-min-id keepers, one fresh per
fingerprint, and commit-log replay safety (the decision log is
order-dependent state, so replays must be skipped, not re-screened).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from corrie_spark.operators.dedup import deduplicate_exact
from corrie_spark.streaming.dedup_stream import dedup_decisions, start_dedup_stream
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def _doc_stream(spark, tmp_path, chunk: int):
    """documents as sequential JSON chunk files ordered by doc_id with
    strictly increasing mtimes, so maxFilesPerTrigger=1 yields
    micro-batches in id order (the file source orders candidate files
    by modification time)."""
    import os
    import time

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    rows = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir, exist_ok=True)
    t0 = int(time.time()) - 10_000
    chunk = chunk or len(rows)
    n_files = 0
    for i in range(0, len(rows), chunk):
        p = os.path.join(src_dir, f"{i // chunk:06d}.json")
        with open(p, "w") as f:
            for did, text in rows[i : i + chunk]:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.utime(p, (t0 + i, t0 + i))
        n_files += 1
    src = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    return src, len(rows), n_files


def test_streamed_dedup_ordered_equals_batch_keepers(spark, tmp_path):
    src, n_rows, n_files = _doc_stream(spark, tmp_path, chunk=25)
    assert n_files > 1
    q = start_dedup_stream(
        src,
        str(tmp_path / "store"),
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "commits"),
    )
    q.awaitTermination(180)

    dec = dedup_decisions(spark, str(tmp_path / "decisions"))
    assert dec.count() == n_rows  # every row screened exactly once
    assert dec.select("batch_id").distinct().count() > 1  # genuinely multi-batch

    fresh = sorted(
        r["doc_id"] for r in dec.filter(F.col("status") == "fresh").collect()
    )
    keepers = sorted(
        r["doc_id"]
        for r in deduplicate_exact(
            load(spark, SF_SMOKE, "documents")
        ).select("doc_id").collect()
    )
    assert fresh == keepers  # ordered arrival => keep-min-id exactly

    # one fresh per fingerprint; store is |distinct fp|-sized
    per_fp = (
        dec.groupBy("fp")
        .agg(F.sum((F.col("status") == "fresh").cast("int")).alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_fp)
    assert spark.read.parquet(str(tmp_path / "store")).count() == len(per_fp)


def test_dedup_stream_replay_is_skipped(spark, tmp_path):
    """A replayed batch must NOT re-screen: its fresh fps are already
    in the store, so re-classification would flip fresh ->
    dup_of_corpus. The commit log guards it (the documented recipe
    for order-dependent foreachBatch state)."""
    def run(ckpt):
        s, _n, _nf = _doc_stream(spark, tmp_path / ckpt, chunk=0)  # one batch
        q = start_dedup_stream(
            s,
            str(tmp_path / "store"),
            str(tmp_path / "decisions"),
            str(tmp_path / ckpt / "ckpt"),
            str(tmp_path / "commits"),
        )
        q.awaitTermination(180)

    run("run1")
    before = sorted(
        tuple(r) for r in dedup_decisions(spark, str(tmp_path / "decisions")).collect()
    )
    assert any(r[2] == "fresh" for r in before)
    run("run2")  # same batch ids, same commit log -> skipped
    after = sorted(
        tuple(r) for r in dedup_decisions(spark, str(tmp_path / "decisions")).collect()
    )
    assert after == before
