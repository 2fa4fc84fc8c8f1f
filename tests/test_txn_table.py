"""TxnTable: atomic visibility, exactly-once replay, commit races,
orphan invisibility."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from corrie_spark.sinks.txn_table import TxnSink, TxnTable


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_append_read_versions(spark, tmp_path):
    t = TxnTable(str(tmp_path / "t"))
    assert t.version() == -1
    t.append(_df(spark, [1, 2]))
    t.append(_df(spark, [3]))
    assert t.version() == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_orphan_files_invisible_and_vacuumed(spark, tmp_path):
    """A crash between staging and manifest publish leaves data files
    no reader ever sees; vacuum reaps them."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    committed = sorted(r.id for r in t.read(spark).collect())
    # simulate the crash: a data file lands without a manifest
    src = t.live_files()[0]
    shutil.copy(src, os.path.join(t.files_dir, "999999999999-0.parquet"))
    assert sorted(r.id for r in t.read(spark).collect()) == committed
    assert t.vacuum() == 1
    assert sorted(r.id for r in t.read(spark).collect()) == committed


def test_commit_race_retries_next_version(spark, tmp_path):
    """If another committer takes version N first, append retracts its
    files and retries with N+1 — no data loss, no double-publish."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    # occupy version 1 behind the table's back (the "other writer")
    foreign = {"version": 1, "batch_id": None, "files": []}
    with open(os.path.join(t.log_dir, "000000000001.json"), "w") as f:
        json.dump(foreign, f)
    t.append(_df(spark, [2]))
    assert t.version() == 2
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # no orphans left behind by the lost race
    assert t.vacuum() == 0
    # every manifest-referenced file exists (the retraction deleted
    # only the loser's own writer-unique files)
    import os as _os
    assert all(_os.path.exists(p) for p in t.live_files())


def test_exactly_once_epoch_replay(spark, tmp_path):
    """TxnSink keyed on (epoch, per-table seq): a replayed epoch is a
    no-op even with TWO appends to the same table; a fresh epoch
    lands."""
    sink = TxnSink(str(tmp_path / "wh"))

    def run_epoch(eid, ids_a, ids_b):
        sink.start_epoch(eid)
        sink.write("metrics", _df(spark, ids_a))
        sink.write("metrics", _df(spark, ids_b))

    run_epoch(0, [1, 2], [3])
    run_epoch(0, [1, 2], [3])  # crash replay
    got = sorted(r.id for r in sink.table("metrics").read(spark).collect())
    assert got == [1, 2, 3]
    run_epoch(1, [4], [5])
    got = sorted(r.id for r in sink.table("metrics").read(spark).collect())
    assert got == [1, 2, 3, 4, 5]


def test_partial_epoch_resume(spark, tmp_path):
    """Crash after the first of two appends: the replay skips the
    landed append and performs the missing one — the mid-batch window
    BatchCommitLog cannot close."""
    sink = TxnSink(str(tmp_path / "wh"))
    sink.start_epoch(7)
    sink.write("m", _df(spark, [1]))
    # crash here: second write never happened; epoch 7 replays
    sink.start_epoch(7)
    sink.write("m", _df(spark, [1]))   # dup of landed append -> skipped
    sink.write("m", _df(spark, [2]))   # the missing one -> lands
    assert sorted(r.id for r in sink.table("m").read(spark).collect()) == [1, 2]


def test_compact_preserves_data_and_idempotence(spark, tmp_path):
    """Compaction: one replacing snapshot, same rows, old files become
    vacuum-able orphans, and pre-compaction batch_ids still dedupe."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]), batch_id="e0")
    t.append(_df(spark, [2]), batch_id="e1")
    t.append(_df(spark, [3]), batch_id="e2")
    n_before = len(t.live_files())
    t.compact(spark, target_files=1)
    assert len(t.live_files()) == 1 < n_before
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]
    assert t.vacuum() == n_before  # old files orphaned
    # replay of a pre-compaction epoch is still a no-op
    assert t.append(_df(spark, [2]), batch_id="e1") is False
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]
