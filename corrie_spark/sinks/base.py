"""Sink abstractions for the micro-batch writer.

The reference writes columnar blocks to ClickHouse over native TCP
(lib/data/block.go:95-179); here a Sink is anything that can append a
DataFrame to a named table. ParquetDirSink is the local/test
implementation; jdbc.py builds the ClickHouse JDBC equivalent.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame


class Sink(Protocol):
    def write(self, table: str, df: DataFrame) -> None:
        """Append df to `table`; raise on failure (caller handles
        retry/DLQ semantics)."""
        ...


class ParquetDirSink:
    """Appends to <base>/<table>/ as parquet. The test stand-in for a
    warehouse sink; append-mode parquet is atomic enough per task for
    at-least-once semantics (same contract as the reference's
    ack-after-write, writer/writer.go:177-186)."""

    def __init__(self, base_path: str):
        self.base_path = base_path

    def write(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(os.path.join(self.base_path, table))


class DLQSink:
    """Dead-letter sink (FIXTURES.md F4): stores the RAW original body
    plus a reason, mirroring the reference's failed-queue forward of
    the untouched message (reader/reader.go:167-179)."""

    SCHEMA = "raw_body string, reason string"

    def __init__(self, path: str):
        self.path = path

    def write_dlq(self, df: DataFrame) -> None:
        df.select("raw_body", "reason").write.mode("append").parquet(self.path)


class BatchCommitLog:
    """Marker-file commit log for foreachBatch idempotence.

    Structured Streaming replays the in-flight epoch after a crash
    (at-least-once). Recording each fully-processed batch_id and
    skipping replays upgrades append-only sinks to effectively-once:
    a batch that finished before the crash is never appended twice.
    (A crash strictly MID-batch still leaves a partial append —
    removing that window needs an atomic/transactional table format;
    this is the documented improvement over the reference's plain
    at-least-once acks, writer/writer.go:177-186.)

    Markers are one empty file per epoch in a directory the
    checkpoint does not own, so clearing/corrupting the checkpoint
    does not forget what already landed.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"batch-{batch_id}.committed")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def commit(self, batch_id: int) -> None:
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w"):
            pass
        os.replace(tmp, self._marker(batch_id))  # atomic publish


def sink_from_options(options: dict) -> Sink:
    """Config-driven sink selection (S5's write half): the reference
    picks its transport from etc/corrie.yml; here one option dict
    selects the Sink implementation, so deployments switch transports
    without touching pipeline code (exactly like connect_broker on
    the source side):

      nativeHosts: "h1:9000,h2:9000"  -> NativeTcpSink (native TCP,
          per-partition host round-robin; nativeDatabase/nativeUser/
          nativePassword/blockRows optional)
      jdbcUrl: "jdbc:clickhouse://…"  -> JdbcSink (needs the driver
          jar on the classpath; batchSize optional)
      parquetDir: "/path"             -> ParquetDirSink
    """
    hosts = options.get("nativeHosts")
    if hosts:
        from corrie_spark.sinks.native_tcp import NativeTcpSink

        return NativeTcpSink(
            [h.strip() for h in hosts.split(",") if h.strip()],
            database=options.get("nativeDatabase", "default"),
            username=options.get("nativeUser", "default"),
            password=options.get("nativePassword", ""),
            block_rows=int(options.get("blockRows", 65_536)),
        )
    url = options.get("jdbcUrl")
    if url:
        from corrie_spark.sinks.jdbc import JdbcSink

        return JdbcSink(url, batch_size=int(options.get("batchSize", 100_000)))
    pdir = options.get("parquetDir")
    if pdir:
        return ParquetDirSink(pdir)
    raise ValueError(
        "need option 'nativeHosts' (native TCP), 'jdbcUrl' (JDBC) or 'parquetDir'"
    )
