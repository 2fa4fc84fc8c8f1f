"""Micro-batch writer: the Spark re-expression of the reference's
event loop + send path (writer/writer.go:89-248).

Contract reproduced (SURVEY §2.3-2.4):
  M4  group rows by their INSERT statement         (writer.go:127-138)
  B1  flush in sub-batches of `batch_size` rows    (writer.go:140-142)
  K6  transactional-ish append per sub-batch       (clickhouse.go:89-150)
  K7  per-row error isolation: a failing write is bisected until the
      poison rows are cornered and routed to the DLQ; healthy rows
      still land                                   (writer.go:218-238)
  K8  prepare failure (unknown table / bad SQL) -> whole group to DLQ,
      no retry                                     (writer.go:203-213)
  K9  transient failures retried with decorrelated jitter (1/2-3/2 x
      interval), infinite by default               (writer.go:60,
                                                    retrier.go:108-119)
  K10 at-least-once: this function is called from foreachBatch, whose
      checkpoint commits offsets only after it returns — the Spark
      analog of ack-after-write                    (writer.go:177-186)
  K11 DLQ rows carry the raw original body         (reader.go:167-179)

Invariant (FIXTURES.md F4): every input row of a batch lands in
exactly one of (target table, DLQ) per delivery — never dropped.

Scale notes: grouping iterates DISTINCT queries (bounded by the
number of distinct INSERT shapes, not rows — same cardinality as the
reference's in-memory map); each group's write is a distributed
append. Bisection only materializes the failing sub-batch (at most
`batch_size` rows) on the driver — the failure path, not the hot
path.
"""

from __future__ import annotations

import logging
import random
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from corrie_spark import chtypes, envelope
from corrie_spark.sinks.base import DLQSink, Sink

log = logging.getLogger(__name__)


@dataclass
class WriterConfig:
    # reference defaults: CORRIE_BATCH=1000 (Dockerfile:35), retry 5s
    # with 0.5-1.5x jitter (writer.go:60, retrier.go:108-119). The
    # reference retries tx errors FOREVER; here the default is finite
    # because (a) a data-dependent failure must fall through to
    # bisection/DLQ rather than spin, and (b) Spark's checkpoint
    # replays the whole batch anyway if we raise — the at-least-once
    # durability the infinite loop provided. Set None to retry forever.
    batch_size: int = 1000
    retry_interval_s: float = 5.0
    jitter: tuple[float, float] = (0.5, 1.5)
    max_retries: int | None = 3
    rng: random.Random = field(default_factory=random.Random)


class SchemaRegistry:
    """table name -> [(column, ClickHouse type string)].

    Stand-in for the reference's prepare-time metadata block from the
    server (clickhouse_read_meta.go:10-48): resolving a table that is
    not registered is the 'prepare failed' case (K8).
    """

    def __init__(self, tables: dict[str, list[tuple[str, str]]] | None = None):
        self._tables: dict[str, list[tuple[str, chtypes.CHType]]] = {}
        for name, cols in (tables or {}).items():
            self.register(name, cols)

    def register(self, table: str, columns: list[tuple[str, str]]) -> None:
        self._tables[table] = chtypes.schema_for(columns)

    def resolve(self, table: str) -> list[tuple[str, chtypes.CHType]]:
        if table not in self._tables:
            raise KeyError(f"unknown table: {table!r}")
        return self._tables[table]


class RetriesExhausted(RuntimeError):
    pass


def _retrying(cfg: WriterConfig, fn, *, what: str):
    """K9: decorrelated-jitter retry loop; re-raises after
    max_retries (None = infinite, reference parity)."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - sink errors are opaque
            attempt += 1
            if cfg.max_retries is not None and attempt > cfg.max_retries:
                raise RetriesExhausted(f"{what}: {e}") from e
            lo, hi = cfg.jitter
            delay = cfg.retry_interval_s * cfg.rng.uniform(lo, hi)
            log.warning("%s failed (attempt %d): %s; retrying in %.2fs", what, attempt, e, delay)
            time.sleep(delay)


def _write_with_isolation(
    sink: Sink, dlq: DLQSink, table: str, df: DataFrame, cfg: WriterConfig
) -> None:
    """K7 via bisection: try the whole sub-batch; on persistent
    failure, split and recurse until single poison rows are cornered
    and DLQ'd. Reproduces per-row Exec isolation (writer.go:218-238)
    without paying per-row round trips on the happy path."""
    try:
        _retrying(cfg, lambda: sink.write(table, df), what=f"write {table}")
        return
    except RetriesExhausted:
        rows = df.collect()  # at most batch_size rows — failure path only
        _bisect_rows(sink, dlq, table, df, rows, cfg)


def _bisect_rows(
    sink: Sink, dlq: DLQSink, table: str, template: DataFrame, rows: list[Row], cfg: WriterConfig
) -> None:
    spark = template.sparkSession
    if not rows:
        return
    if len(rows) == 1:
        sub = spark.createDataFrame(rows, template.schema)
        try:
            _retrying(cfg, lambda: sink.write(table, sub), what=f"write {table} (isolated row)")
        except RetriesExhausted:
            dlq.write_dlq(
                sub.select(
                    F.to_json(F.struct(*template.columns)).alias("raw_body"),
                    F.lit(envelope.EXEC_FAILED).alias("reason"),
                )
            )
        return
    mid = len(rows) // 2
    for half in (rows[:mid], rows[mid:]):
        sub = spark.createDataFrame(half, template.schema)
        try:
            _retrying(cfg, lambda s=sub: sink.write(table, s), what=f"write {table} (bisect)")
        except RetriesExhausted:
            _bisect_rows(sink, dlq, table, template, half, cfg)


def process_batch(
    batch_df: DataFrame,
    sink: Sink,
    dlq: DLQSink,
    registry: SchemaRegistry,
    cfg: WriterConfig | None = None,
    body_col: str = "body",
) -> None:
    """The foreachBatch body: parse -> DLQ split -> per-query group ->
    typed bind/coerce -> count-batched writes with error isolation."""
    cfg = cfg or WriterConfig()
    parsed = envelope.parse_envelopes(batch_df, body_col)
    ok, parse_dlq = envelope.split_dlq(parsed, body_col)
    dlq_batches: list[DataFrame] = []
    if parse_dlq.limit(1).count() > 0:  # M2: poison messages
        dlq_batches.append(parse_dlq)

    ok = ok.withColumn("_table", envelope.table_name("query"))
    # M4: distinct INSERT shapes — bounded, reference holds the same
    # set as map keys in memory (writer/types.go:24-25)
    # sorted -> deterministic processing order, so an epoch replays
    # identically (required by exactly-once sinks keyed on
    # (batch_id, per-table sequence), e.g. TxnSink)
    groups = sorted(r["query"] for r in ok.select("query").distinct().collect())
    for query in groups:
        group_df = ok.filter(F.col("query") == query)
        table = group_df.select("_table").first()["_table"]
        try:
            if not table:
                raise KeyError(f"cannot extract table from query: {query!r}")
            schema = registry.resolve(table)
        except KeyError:
            # K8: prepare failure -> whole group to DLQ, no retry
            dlq_batches.append(
                group_df.select(
                    F.col(body_col).alias("raw_body"),
                    F.lit(envelope.PREPARE_FAILED).alias("reason"),
                )
            )
            continue

        # bind positional args to typed columns; rows failing coercion
        # are exec failures (K7's type-mismatch case). Arity must match
        # exactly: the driver rejects a row whose arg count differs
        # from the column count (block.go:95-125), so a short Data
        # array must NOT silently become NULLs.
        bound = group_df
        valid = F.size("data") == F.lit(len(schema))
        cols = []
        for i, (name, ch_t) in enumerate(schema):
            value, ok_flag = chtypes.coerce(F.try_element_at("data", F.lit(i + 1)), ch_t)
            bound = bound.withColumn(f"_v_{name}", value)
            valid = valid & ok_flag
            cols.append(f"_v_{name}")
        bound = bound.withColumn("_valid", valid)

        bad = bound.filter(~F.col("_valid"))
        if bad.limit(1).count() > 0:
            dlq_batches.append(
                bad.select(
                    F.col(body_col).alias("raw_body"),
                    F.lit(envelope.EXEC_FAILED).alias("reason"),
                )
            )
        good = bound.filter(F.col("_valid")).select(
            *[F.col(c).alias(c.removeprefix("_v_")) for c in cols]
        )

        # B1: count-based flush cap. The Spark-native flush unit is the
        # partition (each task appends its partition independently), so
        # the row cap becomes "no partition exceeds batch_size":
        # repartition to ceil(n/batch_size) slices. One distributed
        # write per group, parallel across tasks — no driver loop.
        n = good.count()
        if n == 0:
            continue
        import math

        n_chunks = max(1, math.ceil(n / cfg.batch_size))
        if n > cfg.batch_size:
            good = good.repartition(n_chunks)
        _write_with_isolation(sink, dlq, table, good, cfg)

    for d in dlq_batches:
        _retrying(cfg, lambda d=d: dlq.write_dlq(d), what="write DLQ")
