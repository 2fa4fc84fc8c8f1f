"""TxnTable: atomic visibility, exactly-once replay, commit races,
orphan invisibility."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from corrie_spark.sinks.txn_table import CommitConflict, TxnSink, TxnTable


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
    assert t.vacuum(grace_seconds=0) == 1
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
    assert t.vacuum(grace_seconds=0) == 0
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
    assert t.vacuum(grace_seconds=0) == n_before  # old files orphaned
    # replay of a pre-compaction epoch is still a no-op
    assert t.append(_df(spark, [2]), batch_id="e1") is False
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_compact_cas_raises_on_stale_base(spark, tmp_path):
    """A replacing commit is a compare-and-swap: if any commit lands
    after the compaction's source read, publishing the stale snapshot
    must raise instead of silently dropping the concurrent rows
    (the retry loop is only safe for order-independent appends)."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    base = t.version()
    snapshot = t.read(spark).coalesce(1)  # file list pinned here
    t.append(_df(spark, [2]))  # concurrent append wins the version
    with pytest.raises(CommitConflict):
        t.append(snapshot, replaces=True, expected_version=base + 1)
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2]
    # replaces without a CAS version is an API misuse, not a retry loop
    with pytest.raises(ValueError):
        t.append(snapshot, replaces=True)


def test_compact_retry_includes_concurrent_append(spark, tmp_path, monkeypatch):
    """compact() restarts from a fresh read after a lost CAS — the
    concurrent append's rows end up in the compacted snapshot."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    real_read = TxnTable.read
    injected = {"done": False}

    def racy_read(self, spark_):
        df = real_read(self, spark_)
        if not injected["done"]:
            injected["done"] = True
            TxnTable(self.root).append(_df(spark_, [99]))  # lands after our read
        return df

    monkeypatch.setattr(TxnTable, "read", racy_read)
    t.compact(spark, target_files=1)
    assert len(t.live_files()) == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 99]


def test_vacuum_grace_protects_inflight_writer(spark, tmp_path):
    """An unreferenced data file younger than the grace period is an
    in-flight writer's staged copy (append step 2, manifest not yet
    published) — vacuum must not reap it."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]))
    shutil.copy(t.live_files()[0], os.path.join(t.files_dir, "999999999999-0-x.parquet"))
    assert t.vacuum() == 0  # default grace: young orphan kept
    assert os.path.exists(os.path.join(t.files_dir, "999999999999-0-x.parquet"))
    assert t.vacuum(grace_seconds=0) == 1  # no active writers: reap


def test_vacuum_retain_last_n_snapshots(spark, tmp_path):
    """retain_last_n keeps every file referenced by the last N
    snapshots (time-travel window); manifests are never deleted so
    epoch idempotence survives vacuum."""
    t = TxnTable(str(tmp_path / "t"))
    t.append(_df(spark, [1]), batch_id="e0")
    t.append(_df(spark, [2]), batch_id="e1")
    t.append(_df(spark, [3]), batch_id="e2")
    n_pre = len(t.live_files())
    t.compact(spark, target_files=1)
    # keep the pre-compaction snapshot too: nothing reapable
    assert t.vacuum(retain_last_n=2, grace_seconds=0) == 0
    # shrink the window to the current snapshot: pre-compaction files go
    assert t.vacuum(retain_last_n=1, grace_seconds=0) == n_pre
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]
    # exactly-once replay still holds after vacuum
    assert t.append(_df(spark, [9]), batch_id="e1") is False
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 2, 3]


def test_random_op_sequences_preserve_committed_rows(spark, tmp_path):
    """Stateful property: for random sequences of append / replayed
    append / compact / vacuum, the table's visible rows always equal
    the model (set union of committed batches), and batch-id replays
    are always no-ops — regardless of interleaving."""
    import random

    rng = random.Random(7)
    for case in range(3):
        t = TxnTable(str(tmp_path / f"t{case}"))
        model: dict[str, list[int]] = {}
        next_vals = iter(range(1000))
        ops = [rng.choice(["append", "replay", "compact", "vacuum"]) for _ in range(8)]
        ops[0] = "append"
        for op in ops:
            if op == "append":
                bid = f"b{len(model)}"
                vals = [next(next_vals) for _ in range(rng.randint(1, 3))]
                assert t.append(_df(spark, vals), batch_id=bid) is True
                model[bid] = vals
            elif op == "replay" and model:
                bid = rng.choice(list(model))
                assert t.append(_df(spark, [999]), batch_id=bid) is False
            elif op == "compact":
                t.compact(spark, target_files=1)
            elif op == "vacuum":
                t.vacuum(grace_seconds=0)
            expect = sorted(v for vs in model.values() for v in vs)
            got = sorted(r.id for r in t.read(spark).collect())
            assert got == expect, f"case {case}, after {op}: {got} != {expect}"
