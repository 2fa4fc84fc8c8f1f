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

Scale notes: the parsed epoch is persisted ONCE and every downstream
pass reads the cache — G distinct INSERT shapes cost exactly G
distributed appends (inherent: G different target schemas) plus a
CONSTANT number of driver-side jobs (one shape/parse census, one
validity census via a single CASE'd expression, one unioned DLQ
append), pinned by tests/test_streaming.py. The per-flush row cap is
`spark.sql.files.maxRecordsPerFile` — a file-writer property, not a
`repartition` shuffle. Bisection streams the failing group through
`toLocalIterator` in chunks of at most `batch_size` rows — bounded
driver memory even when a whole large group fails persistently.
"""

from __future__ import annotations

import hashlib
import logging
import random
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

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


def _content_key(rows: list[Row]) -> str:
    """Deterministic key for a set of rows (order-insensitive md5).
    Failure-path sink appends are keyed by CONTENT, not call order, so
    a crash replay that bisects differently still recognizes a chunk
    that already landed (ADVICE r1: call-order seq keys were
    failure-path-dependent)."""
    h = hashlib.md5()
    for r in sorted(repr(tuple(r)) for r in rows):
        h.update(r.encode())
    return h.hexdigest()[:16]


def _write_rows(
    sink: Sink, table: str, spark: SparkSession, schema: StructType, rows: list[Row], cfg: WriterConfig, what: str
) -> None:
    sub = spark.createDataFrame(rows, schema)
    key = _content_key(rows)
    if hasattr(sink, "write_keyed"):
        _retrying(cfg, lambda: sink.write_keyed(table, sub, key), what=what)
    else:
        _retrying(cfg, lambda: sink.write(table, sub), what=what)


def _write_with_isolation(
    sink: Sink, dlq: DLQSink, table: str, df: DataFrame, cfg: WriterConfig
) -> None:
    """K7 via bisection: try the whole group as one distributed
    append; on persistent failure, stream it driver-side in chunks of
    at most `batch_size` rows (toLocalIterator: one partition in
    flight, never the whole group — bounded driver memory) and bisect
    each failing chunk until poison rows are cornered and DLQ'd.
    Reproduces per-row Exec isolation (writer.go:218-238) without
    per-row round trips on the happy path.

    Delivery on this path is at-least-once: chunk membership depends
    on partition order, so a replay after a mid-bisection crash may
    re-append rows under a different content key (the reference's
    guarantee on the same path — writer.go:177-186); it can never
    lose rows."""
    try:
        _retrying(cfg, lambda: sink.write(table, df), what=f"write {table}")
        return
    except RetriesExhausted:
        pass
    spark = df.sparkSession
    chunk: list[Row] = []
    for row in df.toLocalIterator():
        chunk.append(row)
        if len(chunk) >= cfg.batch_size:
            _bisect_rows(sink, dlq, table, spark, df.schema, list(df.columns), chunk, cfg)
            chunk = []
    if chunk:
        _bisect_rows(sink, dlq, table, spark, df.schema, list(df.columns), chunk, cfg)


def _bisect_rows(
    sink: Sink,
    dlq: DLQSink,
    table: str,
    spark: SparkSession,
    schema: StructType,
    columns: list[str],
    rows: list[Row],
    cfg: WriterConfig,
) -> None:
    if not rows:
        return
    # deterministic intra-chunk order -> deterministic bisection tree
    # (and stable content keys for every subset) given chunk content
    rows = sorted(rows, key=lambda r: repr(tuple(r)))
    if len(rows) == 1:
        try:
            _write_rows(sink, table, spark, schema, rows, cfg, what=f"write {table} (isolated row)")
        except RetriesExhausted:
            dlq.write_dlq(
                spark.createDataFrame(rows, schema).select(
                    F.to_json(F.struct(*columns)).alias("raw_body"),
                    F.lit(envelope.EXEC_FAILED).alias("reason"),
                )
            )
        return
    mid = len(rows) // 2
    for half in (rows[:mid], rows[mid:]):
        try:
            _write_rows(sink, table, spark, schema, half, cfg, what=f"write {table} (bisect)")
        except RetriesExhausted:
            _bisect_rows(sink, dlq, table, spark, schema, columns, half, cfg)


def process_batch(
    batch_df: DataFrame,
    sink: Sink,
    dlq: DLQSink,
    registry: SchemaRegistry,
    cfg: WriterConfig | None = None,
    body_col: str = "body",
) -> None:
    """The foreachBatch body: parse -> DLQ split -> per-query group ->
    typed bind/coerce -> writes with error isolation.

    Single-pass structure: the parsed epoch is persisted once; the
    driver then runs exactly
      job 1  shape census: (parse_ok, query, table) -> row count
      job 2  validity census: ONE CASE'd expression over all resolved
             schemas -> valid count per shape        (skipped if no shape)
      G jobs one distributed append per INSERT shape (cached input)
      job 3  ONE unioned DLQ append for every failure class
             (parse / prepare / exec)                (skipped if clean)
    so driver-side overhead is constant in G and every pass reads the
    cache instead of re-running the parse/coerce lineage.
    """
    cfg = cfg or WriterConfig()
    from pyspark import StorageLevel

    epoch = (
        envelope.parse_envelopes(batch_df, body_col)
        .withColumn("_table", envelope.table_name("query"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # --- job 1: distinct INSERT shapes + parse-failure count.
        # Bounded output: G shapes (the reference holds the same set as
        # map keys in memory, writer/types.go:24-25) + 1.
        census = epoch.groupBy("parse_ok", "query", "_table").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        n_parse_failed = sum(r["n"] for r in census if not r["parse_ok"])
        # sorted -> deterministic processing order, so an epoch replays
        # identically (required by exactly-once sinks keyed on
        # (batch_id, per-table sequence), e.g. TxnSink)
        shapes = sorted((r for r in census if r["parse_ok"]), key=lambda r: r["query"])

        plans: list[dict] = []
        prep_failed: list[str] = []
        for r in shapes:
            query, table = r["query"], r["_table"]
            try:
                if not table:
                    raise KeyError(f"cannot extract table from query: {query!r}")
                schema = registry.resolve(table)
            except KeyError:
                # K8: prepare failure -> whole group to DLQ, no retry
                prep_failed.append(query)
                continue
            plans.append({"query": query, "table": table, "schema": schema, "n": r["n"]})

        # validity: arity must match exactly (the driver rejects a row
        # whose arg count differs from the column count, block.go:95-125
        # — a short Data array must NOT silently become NULLs), and
        # every positional value must pass its column's coercer (K7's
        # type-mismatch case).
        def _validity(schema: list) -> F.Column:
            valid = F.size("data") == F.lit(len(schema))
            for i, (_name, ch_t) in enumerate(schema):
                valid = valid & chtypes.coerce(F.try_element_at("data", F.lit(i + 1)), ch_t)[1]
            return valid

        # --- job 2: per-shape valid counts via a single CASE'd
        # validity expression — one cached scan for ALL shapes.
        n_valid: dict[str, int] = {}
        if plans:
            expr = None
            for p in plans:
                cond = F.col("query") == p["query"]
                expr = F.when(cond, _validity(p["schema"])) if expr is None else expr.when(
                    cond, _validity(p["schema"])
                )
            for row in (
                epoch.filter(F.col("parse_ok"))
                .groupBy("query")
                .agg(F.sum(expr.cast("long")).alias("nv"))
                .collect()
            ):
                n_valid[row["query"]] = row["nv"] or 0

        # --- G distributed appends over the cached epoch. B1's flush
        # cap is a file-writer property (no shuffle): each task appends
        # its cached partition, files capped at batch_size rows.
        spark = batch_df.sparkSession
        prev_cap = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
        spark.conf.set("spark.sql.files.maxRecordsPerFile", str(cfg.batch_size))
        try:
            dlq_frames: list[DataFrame] = []
            if n_parse_failed:  # M2: poison messages
                dlq_frames.append(
                    epoch.filter(~F.col("parse_ok")).select(
                        F.col(body_col).alias("raw_body"),
                        F.lit(envelope.PARSE_ERROR).alias("reason"),
                    )
                )
            for query in prep_failed:
                dlq_frames.append(
                    epoch.filter(F.col("query") == query).select(
                        F.col(body_col).alias("raw_body"),
                        F.lit(envelope.PREPARE_FAILED).alias("reason"),
                    )
                )
            for p in plans:
                nv = n_valid.get(p["query"], 0)
                group_df = epoch.filter(F.col("query") == p["query"])
                valid = _validity(p["schema"])
                if nv < p["n"]:
                    dlq_frames.append(
                        group_df.filter(~valid).select(
                            F.col(body_col).alias("raw_body"),
                            F.lit(envelope.EXEC_FAILED).alias("reason"),
                        )
                    )
                if nv == 0:
                    continue
                good = group_df.filter(valid).select(
                    *[
                        chtypes.coerce(F.try_element_at("data", F.lit(i + 1)), ch_t)[0].alias(name)
                        for i, (name, ch_t) in enumerate(p["schema"])
                    ]
                )
                _write_with_isolation(sink, dlq, p["table"], good, cfg)

            # --- job 3: one DLQ append for every failure class
            if dlq_frames:
                all_dlq = dlq_frames[0]
                for d in dlq_frames[1:]:
                    all_dlq = all_dlq.unionAll(d)
                _retrying(cfg, lambda: dlq.write_dlq(all_dlq), what="write DLQ")
        finally:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", prev_cap)
    finally:
        epoch.unpersist()
