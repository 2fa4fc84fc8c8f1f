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


# --- streaming MEDIA dedup (codecs -> resampled dHash -> band screen) ------

def _media_stream(spark, tmp_path, rows, chunk: int):
    """Media rows as sequential parquet chunk files with increasing
    mtimes (same ordered-arrival harness as the text stream)."""
    import os
    import time

    from corrie_spark.operators.multimodal import MEDIA_SCHEMA_DDL

    src_dir = str(tmp_path / "msrc")
    os.makedirs(src_dir, exist_ok=True)
    t0 = int(time.time()) - 10_000
    for i in range(0, len(rows), chunk):
        p = os.path.join(src_dir, f"{i // chunk:06d}.parquet")
        spark.createDataFrame(rows[i : i + chunk], MEDIA_SCHEMA_DDL).coalesce(
            1
        ).write.mode("overwrite").parquet(p)
        os.utime(p, (t0 + i, t0 + i))
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (t0 + i, t0 + i))
    return (
        spark.readStream.schema(MEDIA_SCHEMA_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*")
    )


def _media_rows(n=24):
    """A mix of containers with deliberate near-dup structure: base
    pixel streams repeat every 6 ids with tiny perturbations, so
    hamming-near hashes occur across ids; id 13 is a corrupt payload."""
    import numpy as np

    from corrie_spark.operators import jpeg as J
    from corrie_spark.operators import multimodal as M

    rows = []
    for i in range(n):
        w, h = 12, 9
        base = (np.add.outer(np.arange(h) * 31, np.arange(w) * 17) + (i % 6) * 97) % 256
        if i >= 12:
            base = base.copy()
            base[0, 0] = (base[0, 0] + 3) % 256  # small perturbation
        px = base.astype(np.uint8)
        if i == 13:
            rows.append((i, "image/png", b"\x89PNG garbage"))
        elif i % 4 == 0:
            rows.append((i, "image/bmp", M.encode_bmp(w, h, [px[r].tobytes() for r in range(h)])))
        elif i % 4 == 1:
            rows.append((i, "image/png", M.encode_png(w, h, px.tobytes(), color_type=0,
                                                      filters=[r % 5 for r in range(h)])))
        elif i % 4 == 2:
            pal = bytes(range(256)) * 3
            pal = bytes(b for v in range(256) for b in (v, v, v))
            rows.append((i, "image/gif", M.encode_gif(w, h, px.tobytes(), pal)))
        else:
            rows.append((i, "image/jpeg", J.encode_jpeg_baseline(px, quality=95)))
    return rows


def test_streamed_media_dedup_single_row_batches_are_greedy(spark, tmp_path):
    """With 1-row batches the stream IS the greedy keep-first screen:
    replay the same rule over the statically-computed hashes and
    require identical per-id statuses."""
    from corrie_spark.operators.multimodal import MEDIA_SCHEMA_DDL, image_dhash_resampled
    from corrie_spark.streaming.dedup_stream import (
        dedup_decisions,
        start_media_dedup_stream,
    )

    rows = _media_rows(16)
    src = _media_stream(spark, tmp_path, rows, chunk=1)
    q = start_media_dedup_stream(
        src,
        str(tmp_path / "mstore"),
        str(tmp_path / "mdecisions"),
        str(tmp_path / "mckpt"),
        str(tmp_path / "mcommits"),
        max_dist=2,
    )
    q.awaitTermination(240)

    static = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    hashes = {
        r.media_id: (r.dhash if r.ok else None)
        for r in image_dhash_resampled(static).collect()
    }
    kept: list[int] = []
    expected = {}
    for mid in sorted(hashes):
        hv = hashes[mid]
        if hv is None:
            expected[mid] = "undecodable"
        elif any(bin(hv ^ k).count("1") <= 2 for k in kept):
            expected[mid] = "near_dup_of_corpus"
        else:
            expected[mid] = "fresh"
            kept.append(hv)
    got = {
        r.media_id: r.status
        for r in dedup_decisions(spark, str(tmp_path / "mdecisions")).collect()
    }
    assert got == expected
    assert "near_dup_of_corpus" in got.values() and "undecodable" in got.values()
    # store holds exactly the fresh distinct hashes
    store = {r.dhash for r in spark.read.parquet(str(tmp_path / "mstore")).collect()}
    assert store == set(kept)


def test_streamed_media_dedup_batch_rule(spark, tmp_path):
    """Multi-row batches: dup_in_batch fires on exact-hash collapse
    within a batch (keep-min-id); the store screen only sees prior
    batches. Replay the documented rule batch-by-batch."""
    from corrie_spark.operators.multimodal import MEDIA_SCHEMA_DDL, image_dhash_resampled
    from corrie_spark.streaming.dedup_stream import (
        dedup_decisions,
        start_media_dedup_stream,
    )

    rows = _media_rows(24)
    chunk = 8
    src = _media_stream(spark, tmp_path, rows, chunk=chunk)
    q = start_media_dedup_stream(
        src,
        str(tmp_path / "m2store"),
        str(tmp_path / "m2decisions"),
        str(tmp_path / "m2ckpt"),
        str(tmp_path / "m2commits"),
        max_dist=2,
    )
    q.awaitTermination(240)

    static = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    hashes = {
        r.media_id: (r.dhash if r.ok else None)
        for r in image_dhash_resampled(static).collect()
    }
    store: set[int] = set()
    expected = {}
    ids = sorted(hashes)
    for b in range(0, len(ids), chunk):
        batch = ids[b : b + chunk]
        firsts = {}
        for mid in batch:
            hv = hashes[mid]
            if hv is not None and hv not in firsts:
                firsts[hv] = mid
        fresh_hashes = set()
        for mid in batch:
            hv = hashes[mid]
            if hv is None:
                expected[mid] = "undecodable"
            elif any(bin(hv ^ k).count("1") <= 2 for k in store):
                expected[mid] = "near_dup_of_corpus"
            elif firsts[hv] != mid:
                expected[mid] = "dup_in_batch"
            else:
                expected[mid] = "fresh"
                fresh_hashes.add(hv)
        store |= fresh_hashes
    got = {
        r.media_id: r.status
        for r in dedup_decisions(spark, str(tmp_path / "m2decisions")).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# store compaction (round 13): file count drops, state identical,
# concurrent-append survival
# ---------------------------------------------------------------------------


def test_compact_store_reduces_files_and_preserves_state(spark, tmp_path):
    import glob
    import os

    from corrie_spark.streaming.store import compact_store

    store = os.path.join(str(tmp_path), "fp_store")
    for b in range(12):  # 12 "micro-batch" appends
        spark.createDataFrame(
            [(f"fp{b}-{i}",) for i in range(20)] + [("fp-shared",)],
            "fp string",
        ).write.mode("append").parquet(store)
    before = sorted(
        r.fp for r in spark.read.parquet(store).distinct().collect()
    )
    n_before = len(glob.glob(os.path.join(store, "*.parquet")))
    assert n_before >= 12
    stats = compact_store(spark, store)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    assert len(glob.glob(os.path.join(store, "*.parquet"))) == 1
    after = sorted(
        r.fp for r in spark.read.parquet(store).distinct().collect()
    )
    assert after == before
    # dedup of re-appended values happened: 12*20 unique + 1 shared
    assert stats["rows"] == 12 * 20 + 1
    # idempotent: a second compact is a no-op
    stats2 = compact_store(spark, store)
    assert stats2["files_before"] <= 1
    assert sorted(
        r.fp for r in spark.read.parquet(store).distinct().collect()
    ) == before


def test_compact_store_concurrent_append_survives(spark, tmp_path):
    """The race the design must survive: a micro-batch appends AFTER
    the compaction snapshot — its file must be untouched and its
    values present afterwards."""
    import glob
    import os

    from corrie_spark.streaming.store import _compact_files, _snapshot

    store = os.path.join(str(tmp_path), "fp_store")
    for b in range(5):
        spark.createDataFrame(
            [(f"old{b}-{i}",) for i in range(10)], "fp string"
        ).write.mode("append").parquet(store)
    snap = _snapshot(store)
    # concurrent micro-batch lands between snapshot and swap
    spark.createDataFrame(
        [("late-1",), ("late-2",)], "fp string"
    ).write.mode("append").parquet(store)
    stats = _compact_files(spark, store, snap)
    vals = set(r.fp for r in spark.read.parquet(store).distinct().collect())
    assert {"late-1", "late-2"} <= vals
    assert len(vals) == 5 * 10 + 2
    # compacted file + the late batch's file(s) remain
    assert stats["files_after"] == len(glob.glob(os.path.join(store, "*.parquet")))
    assert stats["files_after"] >= 2


def test_compacted_store_feeds_the_stream_identically(spark, tmp_path):
    """Post-compaction, the dedup stream resumes against the
    compacted store with identical decisions: a re-sent known doc is
    dup_of_corpus, a new doc is fresh."""
    import os

    from corrie_spark.streaming.dedup_stream import screen_batch
    from corrie_spark.streaming.store import compact_store

    work = str(tmp_path)
    store = os.path.join(work, "fp_store")
    decisions = os.path.join(work, "decisions")

    def batch(rows):
        return spark.createDataFrame(rows, "doc_id long, url string, text string")

    screen_batch(batch([(1, "u1", "alpha text"), (2, "u2", "beta text")]), store, decisions, 0)
    screen_batch(batch([(3, "u3", "gamma text")]), store, decisions, 1)
    compact_store(spark, store)
    screen_batch(
        batch([(4, "u4", "alpha text"), (5, "u5", "delta text")]),
        store,
        decisions,
        2,
    )
    dec = {
        r.doc_id: r.status
        for r in spark.read.parquet(decisions).collect()
    }
    assert dec[4] == "dup_of_corpus"
    assert dec[5] == "fresh"


def test_compact_every_in_stream_preserves_decisions(spark, tmp_path):
    """compact_every=2: decisions identical to the uncompacted control
    and the store ends with a bounded file count."""
    import glob
    import os

    srcA, n_rows, n_files = _doc_stream(spark, tmp_path / "a", chunk=25)
    q = start_dedup_stream(
        srcA,
        str(tmp_path / "a" / "store"),
        str(tmp_path / "a" / "decisions"),
        str(tmp_path / "a" / "ckpt"),
        str(tmp_path / "a" / "commits"),
        compact_every=2,
    )
    q.awaitTermination(180)
    srcB, _, _ = _doc_stream(spark, tmp_path / "b", chunk=25)
    q2 = start_dedup_stream(
        srcB,
        str(tmp_path / "b" / "store"),
        str(tmp_path / "b" / "decisions"),
        str(tmp_path / "b" / "ckpt"),
        str(tmp_path / "b" / "commits"),
    )
    q2.awaitTermination(180)
    a = {
        (r.doc_id, r.status)
        for r in dedup_decisions(spark, str(tmp_path / "a" / "decisions")).collect()
    }
    b = {
        (r.doc_id, r.status)
        for r in dedup_decisions(spark, str(tmp_path / "b" / "decisions")).collect()
    }
    assert a == b and len(a) == n_rows
    # store state identical by value, with fewer files than batches
    fa = sorted(r.fp for r in spark.read.parquet(str(tmp_path / "a" / "store")).distinct().collect())
    fb = sorted(r.fp for r in spark.read.parquet(str(tmp_path / "b" / "store")).distinct().collect())
    assert fa == fb
    # file-count bound relative to the UNCOMPACTED control (absolute
    # thresholds are partition-count-sensitive: the in-suite flake)
    files_a = len(glob.glob(os.path.join(str(tmp_path / "a" / "store"), "*.parquet")))
    files_b = len(glob.glob(os.path.join(str(tmp_path / "b" / "store"), "*.parquet")))
    assert files_a < files_b
    # with the per-batch coalesce(1) append, post-compaction residue
    # is the compacted file plus at most compact_every appends
    assert files_a <= 3


def test_media_stream_compact_every(spark, tmp_path):
    """compact_every on the MEDIA dedup stream: same decisions as the
    uncompacted control, fewer store files."""
    import glob
    import os
    import struct

    from corrie_spark.streaming.dedup_stream import start_media_dedup_stream

    def media_files(root):
        src = os.path.join(str(root), "src")
        os.makedirs(src, exist_ok=True)
        import json as _json
        import time as _time

        t0 = int(_time.time()) - 10_000
        for b in range(6):
            p = os.path.join(src, f"{b:04d}.json")
            with open(p, "w") as f:
                for k in range(4):
                    mid = b * 4 + k
                    w, h = 8, 8
                    payload = b"IMGFAKE" + struct.pack("<ii", w, h) + bytes(
                        (mid % 3) * 40 for _ in range(w * h)
                    )
                    f.write(_json.dumps({
                        "media_id": mid,
                        "media_type": "fake/image",
                        "payload": payload.hex(),
                    }) + "\n")
            os.utime(p, (t0 + b, t0 + b))
        raw = (
            spark.readStream.schema("media_id long, media_type string, payload string")
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        return raw.select(
            "media_id", "media_type", F.unhex("payload").alias("payload")
        )

    outs = {}
    for name, ce in (("a", 2), ("b", None)):
        q = start_media_dedup_stream(
            media_files(tmp_path / name),
            str(tmp_path / name / "store"),
            str(tmp_path / name / "dec"),
            str(tmp_path / name / "ck"),
            str(tmp_path / name / "cm"),
            compact_every=ce,
        )
        q.awaitTermination(180)
        outs[name] = {
            (r.media_id, r.status)
            for r in spark.read.parquet(str(tmp_path / name / "dec")).collect()
        }
    assert outs["a"] == outs["b"] and len(outs["a"]) == 24
    fa = len(glob.glob(os.path.join(str(tmp_path / "a" / "store"), "*.parquet")))
    fb = len(glob.glob(os.path.join(str(tmp_path / "b" / "store"), "*.parquet")))
    assert fa < fb
