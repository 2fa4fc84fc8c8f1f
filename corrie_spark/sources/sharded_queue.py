"""Custom streaming source: the reference's sharded-queue contract as
a PySpark DataSourceV2 (Python Data Source API, Spark 4).

SURVEY §7 flags this as the only place real custom-connector code is
needed: the reference consumes RabbitMQ queues named
`<queue>.0..MaxShard` with one consumer goroutine per shard fanned
into a single channel (nanachi consumer.go:223-315), per-shard FIFO
ordering, and at-least-once redelivery from the broker's unacked
window. This source reproduces that contract over a directory layout

    <path>/shard-<n>/<seq>.jsonl     (append-only, seq-ordered files)

which is what a RabbitMQ→disk spool or test harness writes. The same
reader class is the template for a real AMQP-backed reader: only
`_shard_lines` (read lines from a shard beyond an offset) changes.

Semantics mapping:
  - one InputPartition per shard per micro-batch -> per-shard FIFO is
    preserved inside a partition (Spark never reorders within one);
  - offsets are {shard: lines consumed}; Spark checkpoints them and
    replays the uncommitted tail after a crash -> at-least-once,
    exactly the broker's unacked-redelivery window;
  - `maxLinesPerTrigger` bounds a micro-batch (prefetch parity, S2).

Rows match ENVELOPE_STREAM_SCHEMA: (shard, offset, body, delivery_id).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import StructType

SHARD_PREFIX = "shard-"


class ShardSlice(InputPartition):
    def __init__(self, shard: int, start: int, end: int, path: str, index: list[tuple[str, int]] | None = None):
        self.shard = shard
        self.start = start
        self.end = end
        self.path = path
        # [(file path, line count)] in FIFO order, captured at planning
        # time: the executor seeks straight to the overlapping files and
        # never re-reads the already-consumed prefix of the spool
        self.index = index or []


def _shard_dirs(path: str) -> dict[int, str]:
    out = {}
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(SHARD_PREFIX):
                out[int(name[len(SHARD_PREFIX):])] = os.path.join(path, name)
    return out


def _file_lines(path: str) -> Iterator[str]:
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                yield line


class ShardedQueueStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sharded_queue requires option 'path'")
        self.max_lines = int(options.get("maxLinesPerTrigger", 0)) or None
        self._last: dict | None = None  # last offset this reader emitted
        # per-file line-count cache keyed by byte size: spool files are
        # append-only, so an unchanged size means an unchanged count —
        # the offset probe re-reads only files that grew since the last
        # trigger, O(new data) instead of O(total spool)
        self._counts: dict[str, tuple[int, int]] = {}

    def _shard_index(self, shard_dir: str) -> list[tuple[str, int]]:
        """[(file path, non-empty line count)] in seq order (file name
        order = FIFO), recounting only new/grown files."""
        out = []
        for fname in sorted(os.listdir(shard_dir)):
            if not fname.endswith(".jsonl"):
                continue
            p = os.path.join(shard_dir, fname)
            size = os.path.getsize(p)
            cached = self._counts.get(p)
            if cached is not None and cached[0] == size:
                n = cached[1]
            else:
                n = sum(1 for _ in _file_lines(p))
                self._counts[p] = (size, n)
            out.append((p, n))
        return out

    def initialOffset(self) -> dict:
        return {str(s): 0 for s in _shard_dirs(self.path)}

    def latestOffset(self) -> dict:
        """Prefetch parity (S2): advance each shard by at most
        maxLinesPerTrigger per micro-batch. The first call after
        (re)start is uncapped — we don't know the checkpointed start
        yet, and an offset below it would move the stream backward."""
        totals = {
            str(shard): sum(n for _, n in self._shard_index(d))
            for shard, d in sorted(_shard_dirs(self.path).items())
        }
        if self.max_lines is None or self._last is None:
            self._last = totals
            return totals
        out = {
            s: min(n, int(self._last.get(s, 0)) + self.max_lines)
            for s, n in totals.items()
        }
        self._last = out
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        dirs = _shard_dirs(self.path)
        parts = []
        for shard_str, end_off in end.items():
            shard = int(shard_str)
            start_off = int(start.get(shard_str, 0))
            if end_off > start_off and shard in dirs:
                parts.append(
                    ShardSlice(
                        shard, start_off, int(end_off), dirs[shard],
                        index=self._shard_index(dirs[shard]),
                    )
                )
        # Spark requires at least one partition per batch
        return parts or [ShardSlice(-1, 0, 0, self.path)]

    def read(self, partition: ShardSlice) -> Iterator[tuple]:
        """Executor-side: seek via the planning-time file index — only
        files overlapping [start, end) are opened. The index's counts
        are authoritative (a file growing mid-batch cannot shift later
        files' global offsets)."""
        if partition.shard < 0:
            return
        cum = 0
        for fpath, n in partition.index:
            lo, hi = cum, cum + n
            cum = hi
            if hi <= partition.start:
                continue  # fully consumed — never opened
            if lo >= partition.end:
                break
            for j, line in enumerate(_file_lines(fpath)):
                if j >= n:
                    break  # grew mid-batch: excess belongs to the next trigger
                i = lo + j
                if i < partition.start:
                    continue
                if i >= partition.end:
                    break
                yield (partition.shard, i, line, f"{partition.shard}-{i}")

    def commit(self, end: dict) -> None:
        # at-least-once: nothing to ack upstream in the spool layout;
        # a broker-backed subclass acks deliveries <= end here.
        pass


class ShardedQueueDataSource(DataSource):
    """`spark.readStream.format("sharded_queue").option("path", ...)`
    after `spark.dataSource.register(ShardedQueueDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "sharded_queue"

    def schema(self) -> str:
        return "shard int, offset bigint, body string, delivery_id string"

    def streamReader(self, schema: StructType) -> ShardedQueueStreamReader:
        return ShardedQueueStreamReader(self.options)


def register_sharded_queue(spark) -> None:
    spark.dataSource.register(ShardedQueueDataSource)
