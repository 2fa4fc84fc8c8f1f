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
    ) -> bool:
        """Atomically append df. Returns False (no-op) if batch_id was
        already committed — the exactly-once replay path. With
        replaces=True the manifest supersedes all earlier data files
        (compaction snapshot)."""
        if batch_id is not None and batch_id in self.committed_batch_ids():
            return False

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
            for attempt in range(max_attempts):
                v = self.version() + 1
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
            raise CommitConflict(f"lost {max_attempts} commit races on {self.root}")
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    # --- read ---------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        files = self.live_files()
        if not files:
            raise FileNotFoundError(f"TxnTable {self.root} has no committed data")
        return spark.read.parquet(*files)

    def compact(self, spark: SparkSession, target_files: int = 1) -> None:
        """Rewrite all live data as `target_files` files and publish a
        replacing snapshot manifest — the small-file fix for
        high-frequency micro-batch appends. Old files become orphans
        (readers already switched atomically); reap with vacuum().
        Earlier manifests stay in the log, so batch_id idempotence
        survives compaction."""
        self.append(self.read(spark).coalesce(target_files), replaces=True)

    # --- maintenance --------------------------------------------------

    def vacuum(self) -> int:
        """Delete orphaned data files (staged by a crashed writer,
        never referenced by a manifest). Returns the number removed."""
        live = {os.path.basename(p) for p in self.live_files()}
        n = 0
        for f in os.listdir(self.files_dir):
            if f not in live:
                os.unlink(os.path.join(self.files_dir, f))
                n += 1
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
