"""TxnTable: manifest-log parquet table with atomic commits.

Closes the one delivery-guarantee gap left by BatchCommitLog (see
sinks/base.py): a crash strictly mid-batch leaves a partial parquet
append that plain directory readers see. Here readers only see files
referenced by a committed manifest, and a manifest is published with
one atomic os.replace — so a batch is either fully visible or not at
all. With the batch_id recorded in the manifest, replayed epochs are
skipped: exactly-once end to end on top of files.

Layout:
    <root>/files/<version>-<i>.parquet     data files
    <root>/_log/<version 12-digit>.json    {"version", "batch_id", "files": [...]}

Commit protocol (same shape as Delta's log, minus compaction):
  1. stage: write the batch as parquet into a scratch dir
  2. move data files under files/ (invisible — no manifest yet)
  3. publish manifest vN+1 via tmp + atomic rename; a concurrent
     committer loses the rename race and retries with the next
     version (single-writer-per-epoch in foreachBatch, so contention
     only happens across queries)

Scale notes: the log is O(#commits) tiny JSON files, read once per
query plan; data-file moves are renames (same filesystem/object-store
prefix); readers pass the explicit file list to spark.read.parquet so
there is no directory listing race. Orphaned staged files (crash
between 2 and 3) are invisible and reaped by vacuum().
"""

from __future__ import annotations

import binascii
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    pass


class TxnTable:
    def __init__(self, root: str):
        self.root = root
        self.files_dir = os.path.join(root, "files")
        self.log_dir = os.path.join(root, "_log")
        os.makedirs(self.files_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    # --- log ----------------------------------------------------------

    def _manifests(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.log_dir) if f.endswith(".json")
        )

    def version(self) -> int:
        ms = self._manifests()
        return int(ms[-1].split(".")[0]) if ms else -1

    def _read_log(self) -> list[dict]:
        out = []
        for name in self._manifests():
            with open(os.path.join(self.log_dir, name)) as f:
                out.append(json.load(f))
        return out

    def committed_batch_ids(self) -> set:
        return {m["batch_id"] for m in self._read_log() if m.get("batch_id") is not None}

    def live_files(self) -> list[str]:
        live: list[str] = []
        for m in self._read_log():
            if m.get("replaces"):
                live = list(m["files"])  # compaction snapshot resets
            else:
                live.extend(m["files"])
        return [os.path.join(self.files_dir, f) for f in live]

    # --- write --------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        batch_id: int | str | None = None,
        max_attempts: int = 20,
        replaces: bool = False,
        expected_version: int | None = None,
    ) -> bool:
        """Atomically append df. Returns False (no-op) if batch_id was
        already committed — the exactly-once replay path. With
        replaces=True the manifest supersedes all earlier data files
        (compaction snapshot).

        The retry-on-lost-race loop is only safe for plain appends
        (order-independent). A read-modify-write commit (compaction)
        must pass expected_version: the manifest is published at
        exactly that version or the call raises CommitConflict — a
        compare-and-swap, so a concurrent append landing first forces
        the caller to restart from a fresh read instead of silently
        republishing a stale snapshot over the new rows."""
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return False
        if replaces and expected_version is None:
            raise ValueError("replaces=True requires expected_version (CAS commit)")

        stage = tempfile.mkdtemp(prefix="stage-", dir=self.root)
        try:
            df.write.mode("overwrite").parquet(os.path.join(stage, "d"))
            staged = [
                f
                for f in os.listdir(os.path.join(stage, "d"))
                if f.endswith(".parquet")
            ]
            # writer-unique token in data-file names: two concurrent
            # committers must NEVER collide on a name — otherwise the
            # race loser's retraction would delete files the winner's
            # manifest already references
            token = f"{os.getpid()}-{binascii.hexlify(os.urandom(4)).decode()}"
            attempts = 1 if expected_version is not None else max_attempts
            for attempt in range(attempts):
                v = expected_version if expected_version is not None else self.version() + 1
                names = [f"{v:012d}-{i}-{token}.parquet" for i in range(len(staged))]
                for src, dst in zip(staged, names):
                    shutil.copy(os.path.join(stage, "d", src), os.path.join(self.files_dir, dst))
                manifest = {"version": v, "batch_id": batch_id, "files": names}
                if replaces:
                    manifest["replaces"] = True
                tmp = os.path.join(self.log_dir, f".tmp-{v:012d}-{os.getpid()}")
                with open(tmp, "w") as f:
                    json.dump(manifest, f)
                final = os.path.join(self.log_dir, f"{v:012d}.json")
                # os.rename fails if final exists? No — it overwrites on
                # POSIX. Use link+unlink: link fails atomically if the
                # version was taken by a concurrent committer.
                try:
                    os.link(tmp, final)
                    os.unlink(tmp)
                    return True
                except FileExistsError:
                    os.unlink(tmp)
                    for n in names:  # lost the race: retract our files
                        os.unlink(os.path.join(self.files_dir, n))
            raise CommitConflict(
                f"lost commit race on {self.root}"
                + ("" if expected_version is not None else f" after {max_attempts} attempts")
            )
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    # --- read ---------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        files = self.live_files()
        if not files:
            raise FileNotFoundError(f"TxnTable {self.root} has no committed data")
        return spark.read.parquet(*files)

    def compact(self, spark: SparkSession, target_files: int = 1, max_attempts: int = 5) -> None:
        """Rewrite all live data as `target_files` files and publish a
        replacing snapshot manifest — the small-file fix for
        high-frequency micro-batch appends. Old files become orphans
        (readers already switched atomically); reap with vacuum().
        Earlier manifests stay in the log, so batch_id idempotence
        survives compaction.

        Concurrency: read-modify-write under optimistic CAS. The file
        list is pinned at read() time against the version observed
        just before; if any commit (append or compaction) lands in
        between, the CAS publish fails and we restart from a fresh
        read of the NEW live set — a concurrent append's rows can
        never be dropped by a stale snapshot."""
        for _ in range(max_attempts):
            base = self.version()
            df = self.read(spark).coalesce(target_files)
            try:
                self.append(df, replaces=True, expected_version=base + 1)
                return
            except CommitConflict:
                continue  # log advanced under us — re-read and retry
        raise CommitConflict(f"compact lost {max_attempts} CAS races on {self.root}")

    # --- maintenance --------------------------------------------------

    def vacuum(self, retain_last_n: int = 1, grace_seconds: float = 3600.0) -> int:
        """Delete data files not referenced by any of the last
        `retain_last_n` committed snapshots (pre-compaction files,
        crashed-writer orphans). Returns the number removed.

        Safety with concurrent writers: an in-flight append copies
        data files (step 2) BEFORE publishing its manifest (step 3) —
        those files are unreferenced but must not be reaped, so any
        file younger than `grace_seconds` is skipped (mtime-based
        retention, as Delta's VACUUM does). Keep the grace period
        above the longest plausible stage->publish window; pass 0 only
        when no writer is active. Manifests are never deleted, so
        batch_id idempotence (exactly-once replay) survives vacuum."""
        import time

        log = self._read_log()
        live: list[str] = []
        snapshots: list[list[str]] = []
        for m in log:
            if m.get("replaces"):
                live = list(m["files"])
            else:
                live.extend(m["files"])
            snapshots.append(list(live))
        keep: set[str] = set()
        for snap in snapshots[-max(1, retain_last_n):]:
            keep.update(snap)
        now = time.time()
        n = 0
        for f in os.listdir(self.files_dir):
            if f in keep:
                continue
            path = os.path.join(self.files_dir, f)
            try:
                if now - os.path.getmtime(path) < grace_seconds:
                    continue  # possibly an in-flight writer's staged copy
                os.unlink(path)
                n += 1
            except FileNotFoundError:
                continue  # concurrent vacuum / writer retraction
        return n


class TxnSink:
    """Sink-protocol adapter: one TxnTable per target table name, with
    the foreachBatch epoch id threaded through for exactly-once.

    An epoch may append to the same table more than once (two INSERT
    statements targeting one table), so the idempotence key is
    (epoch, per-table sequence). That key is stable across crash
    replays because process_batch iterates query groups in sorted
    order — a partially-committed epoch resumes exactly where it
    crashed, skipping the appends that already landed."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        self.current_batch_id: int | None = None
        self._seq: dict[str, int] = {}

    def start_epoch(self, batch_id: int) -> None:
        self.current_batch_id = batch_id
        self._seq = {}

    def table(self, name: str) -> TxnTable:
        return TxnTable(os.path.join(self.base_path, name))

    def write(self, table: str, df: DataFrame) -> None:
        seq = self._seq.get(table, 0)
        self._seq[table] = seq + 1
        key = (
            None
            if self.current_batch_id is None
            else f"{self.current_batch_id}.{seq}"
        )
        self.table(table).append(df, batch_id=key)

    def write_keyed(self, table: str, df: DataFrame, content_key: str) -> None:
        """Failure-path append keyed by chunk CONTENT (writer
        bisection): the idempotence key does not depend on how many
        sink calls preceded it, so a crash replay whose bisection tree
        differs still skips chunks that already landed."""
        key = (
            None
            if self.current_batch_id is None
            else f"{self.current_batch_id}.c{content_key}"
        )
        self.table(table).append(df, batch_id=key)
