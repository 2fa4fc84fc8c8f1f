"""Native-TCP transport contract: NativeTcpConn/NativeTcpSink driven
over REAL sockets against FakeClickHouseServer — the same fixture
pattern the AMQP seam uses (socket-level fake, client exercised
byte-for-byte). Covers the reference driver lifecycle: hello
handshake, ping/pong, INSERT prefix -> server meta -> block stream ->
empty end marker -> progress/EndOfStream, server exceptions
(auth / unknown table / injected insert failure), ClientCancel, and
the SELECT read path incl. TOTALS/EXTREMES side-channels."""

from __future__ import annotations

import datetime as dt

import pytest

from corrie_spark.sinks.clickhouse_server import FakeClickHouseServer
from corrie_spark.sinks.native_tcp import (
    CHServerException,
    NativeTcpConn,
    NativeTcpSink,
)

EVENTS_SCHEMA = [
    ("event_id", "Int64"),
    ("kind", "String"),
    ("amount", "Float64"),
    ("flags", "Array(Int32)"),
    ("note", "Nullable(String)"),
]


@pytest.fixture()
def server():
    with FakeClickHouseServer() as s:
        s.register_table("events_native", EVENTS_SCHEMA)
        yield s


def _conn(server, **kw) -> NativeTcpConn:
    return NativeTcpConn("127.0.0.1", server.port, **kw).connect()


# --- handshake / ping --------------------------------------------------


def test_hello_exchanges_server_info(server):
    c = _conn(server)
    try:
        assert c.server.name == "corrie-fake-clickhouse"
        assert c.server.revision >= 54058
        assert c.server.timezone == "UTC"
    finally:
        c.close()


def test_hello_bad_credentials_raises_auth_exception():
    with FakeClickHouseServer(users={"alice": "s3cret"}) as s:
        with pytest.raises(CHServerException) as e:
            NativeTcpConn("127.0.0.1", s.port, username="alice", password="wrong").connect()
        assert e.value.code == 516
        ok = NativeTcpConn("127.0.0.1", s.port, username="alice", password="s3cret").connect()
        ok.close()


def test_ping_pong(server):
    with _conn(server) as c:
        assert c.ping() is True
        assert c.ping() is True
    assert server.pings == 2


# --- INSERT lifecycle --------------------------------------------------


def test_insert_roundtrips_typed_blocks(server):
    rows = [
        (1, "click", 0.5, [1, 2], "a"),
        (2, "view", -1.25, [], None),
        (3, "click", 2.0, [7], "c"),
    ]
    with _conn(server) as c:
        res = c.insert_blocks(
            "events_native",
            [n for n, _ in EVENTS_SCHEMA],
            [rows[:2], rows[2:]],  # two wire blocks
        )
    assert server.rows("events_native") == rows
    # the server's progress packet reports the landed rows
    assert sum(p.rows for p in res.progress) == 3


def test_insert_meta_block_drives_types(server):
    """The client never guesses column types: they come from the
    server's meta block (clickhouse_read_meta.go contract)."""
    with _conn(server) as c:
        c._send_query("INSERT INTO events_native (event_id, kind) VALUES")
        meta = c.read_meta()
    assert meta == [("event_id", "Int64"), ("kind", "String")]


def test_insert_unknown_table_is_prepare_failure(server):
    with _conn(server) as c:
        with pytest.raises(CHServerException) as e:
            c.insert_blocks("nope", ["a"], [[(1,)]])
    assert e.value.code == 60  # UNKNOWN_TABLE -> K8 DLQ route, no retry


def test_insert_injected_failure_then_retry_lands(server):
    """K9 at-least-once window: a failed INSERT leaves nothing behind
    (the fake discards the staged rows exactly like a ClickHouse
    exception before commit), and a reconnect+retry succeeds."""
    server.fail_next_inserts(1)
    rows = [(1, "x", 0.0, [], None)]
    with pytest.raises(CHServerException) as e:
        with _conn(server) as c:
            c.insert_blocks("events_native", [n for n, _ in EVENTS_SCHEMA], [rows])
    assert e.value.code == 252
    assert server.rows("events_native") == []
    with _conn(server) as c:  # fresh connection, same payload
        c.insert_blocks("events_native", [n for n, _ in EVENTS_SCHEMA], [rows])
    assert server.rows("events_native") == rows


def test_cancel_discards_in_flight_insert(server):
    c = _conn(server)
    c._send_query("INSERT INTO events_native (event_id, kind, amount, flags, note) VALUES")
    c.read_meta()
    from corrie_spark.sinks.native_format import encode_block

    c._send_data_block(
        encode_block(
            [
                ("event_id", "Int64", [9]),
                ("kind", "String", ["k"]),
                ("amount", "Float64", [0.0]),
                ("flags", "Array(Int32)", [[]]),
                ("note", "Nullable(String)", [None]),
            ]
        )
    )
    c.cancel()  # ClientCancel instead of the end-of-data marker
    import time

    for _ in range(50):  # server handles the cancel asynchronously
        if server.cancelled:
            break
        time.sleep(0.02)
    assert server.cancelled == 1
    assert server.rows("events_native") == []  # staged rows discarded


# --- SELECT read path (R1/R3 transport surface) ------------------------


def test_select_streams_blocks_totals_extremes(server):
    server.set_query_result(
        "SELECT kind, sum(amount) AS s FROM events_native GROUP BY kind WITH TOTALS",
        columns=[("kind", "String", ["click", "view"]), ("s", "Float64", [2.5, -1.25])],
        totals=[("kind", "String", [""]), ("s", "Float64", [1.25])],
        extremes=[("kind", "String", ["click", "view"]), ("s", "Float64", [-1.25, 2.5])],
    )
    with _conn(server) as c:
        res = c.execute(
            "SELECT kind, sum(amount) AS s FROM events_native GROUP BY kind WITH TOTALS"
        )
    assert res.columns == [("kind", "String"), ("s", "Float64")]
    assert res.rows == [("click", 2.5), ("view", -1.25)]
    assert res.totals == [("", 1.25)]
    assert res.extremes == [("click", -1.25), ("view", 2.5)]


def test_ddl_query_round_trip(server):
    with _conn(server) as c:
        res = c.execute("CREATE TABLE t (x Int64) ENGINE = Memory")
    assert res.rows == []
    assert "CREATE TABLE t (x Int64) ENGINE = Memory" in server.queries_seen


# --- Spark sink (distributed path) -------------------------------------


def test_native_tcp_sink_writes_dataframe(spark, server):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1], "x"),
            (2, "b", 2.5, [2, 3], None),
            (3, "c", 3.5, [], "z"),
            (4, "d", 4.5, [4], "w"),
        ],
        "event_id long, kind string, amount double, flags array<int>, note string",
    ).repartition(3)
    sink = NativeTcpSink([f"127.0.0.1:{server.port}"], block_rows=2)
    sink.write("events_native", df)
    got = sorted(server.rows("events_native"))
    assert got == [
        (1, "a", 1.5, [1], "x"),
        (2, "b", 2.5, [2, 3], None),
        (3, "c", 3.5, [], "z"),
        (4, "d", 4.5, [4], "w"),
    ]


def test_native_tcp_sink_raises_on_server_error(spark, server):
    df = spark.createDataFrame([(1,)], "event_id long")
    sink = NativeTcpSink([f"127.0.0.1:{server.port}"])
    with pytest.raises(Exception):  # surfaces through the Spark job
        sink.write("missing_table", df)


def test_streaming_pipeline_into_native_tcp_sink(spark, tmp_path, server):
    """End-to-end: envelope file stream -> foreachBatch micro-batch
    writer -> NATIVE-TCP sink against the socket-level fake server,
    with one injected transient insert failure. DLQ (parse error,
    unknown table) and K9 retry semantics hold unchanged — the sink
    swap is config, exactly like the reference switching transports."""
    from corrie_spark.sinks import DLQSink, SchemaRegistry, WriterConfig
    from corrie_spark.sources import file_envelope_source
    from corrie_spark.streaming import PipelineConfig, start_pipeline
    from tests.test_streaming import METRICS_Q, _rows, _write_stream_file

    server.register_table(
        "db.metrics", [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]
    )
    registry = SchemaRegistry(
        {"db.metrics": [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]}
    )
    src, dlq_path, ckpt = (str(tmp_path / d) for d in ("in", "dlq", "ckpt"))
    rows = [_rows(i, METRICS_Q, [i, i * 0.5, f"t{i % 3}"]) for i in range(20)]
    rows.append({"shard": 0, "offset": 20, "body": "{not json", "delivery_id": "d20"})
    rows.append(_rows(21, "INSERT INTO db.nope (x) VALUES (?)", [1]))
    _write_stream_file(src, "batch0.json", rows)

    server.fail_next_inserts(1)  # transient: first INSERT attempt fails
    q = start_pipeline(
        file_envelope_source(spark, src),
        NativeTcpSink([f"127.0.0.1:{server.port}"]),
        DLQSink(dlq_path),
        registry,
        PipelineConfig(
            checkpoint_dir=ckpt,
            available_now=True,
            writer=WriterConfig(retry_interval_s=0.01, max_retries=2),
        ),
    )
    q.awaitTermination(120)

    got = sorted(server.rows("db.metrics"))
    assert [r[0] for r in got] == list(range(20))  # retry landed all, exactly once
    assert got[3] == (3, 1.5, "t0")
    dlq = spark.read.schema(DLQSink.SCHEMA).parquet(dlq_path)
    assert {r["reason"] for r in dlq.collect()} == {"parse_error", "prepare_failed"}


def test_sink_datetime_and_date_columns(spark, server):
    server.register_table(
        "typed_native",
        [("d", "Date"), ("ts", "DateTime"), ("v", "Int64")],
    )
    df = spark.createDataFrame(
        [
            (dt.date(2026, 8, 13), dt.datetime(2026, 8, 13, 12, 0, 0), 1),
            (dt.date(1970, 1, 1), dt.datetime(1970, 1, 1, 0, 0, 1), 2),
        ],
        "d date, ts timestamp, v long",
    )
    NativeTcpSink([f"127.0.0.1:{server.port}"]).write("typed_native", df)
    got = sorted(server.rows("typed_native"), key=lambda r: r[2])
    assert got[0][0] == dt.date(2026, 8, 13)
    assert got[0][1].replace(tzinfo=None) == dt.datetime(2026, 8, 13, 12, 0, 0)
    assert [r[2] for r in got] == [1, 2]


def test_sink_from_options_selects_transport():
    """S5's write half: one option dict picks the transport, like the
    reference's yml config — native TCP / JDBC / parquet."""
    from corrie_spark.sinks.base import ParquetDirSink, sink_from_options
    from corrie_spark.sinks.jdbc import JdbcSink

    s = sink_from_options({"nativeHosts": "h1:9000,h2:9000", "nativeDatabase": "db"})
    assert isinstance(s, NativeTcpSink)
    assert s.hosts == [("h1", 9000), ("h2", 9000)]
    assert s.database == "db"
    assert isinstance(sink_from_options({"jdbcUrl": "jdbc:clickhouse://h/d"}), JdbcSink)
    assert isinstance(sink_from_options({"parquetDir": "/tmp/t"}), ParquetDirSink)
    with pytest.raises(ValueError):
        sink_from_options({})


def test_sink_round_robins_hosts(spark):
    """K12 load balancing on the native path: partitions alternate
    across the host list (alt_hosts, bootstrap.go:109-121) — with two
    servers up, both receive INSERT traffic and nothing is lost."""
    with FakeClickHouseServer() as s1, FakeClickHouseServer() as s2:
        for s in (s1, s2):
            s.register_table("t", [("x", "Int64")])
        df = spark.createDataFrame([(i,) for i in range(8)], "x long").repartition(4)
        NativeTcpSink(
            [f"127.0.0.1:{s1.port}", f"127.0.0.1:{s2.port}"]
        ).write("t", df)
        a, b = s1.rows("t"), s2.rows("t")
        assert sorted(r[0] for r in a + b) == list(range(8))
        assert a and b  # both hosts actually took traffic


def test_insert_column_named_like_values_keyword(server):
    """The VALUES cut is the reference client's word-boundary regex,
    not a substring search — identifiers containing the letters
    VALUES must parse (and a truly malformed INSERT answers
    SYNTAX_ERROR, never a bare TCP close)."""
    server.register_table("vals", [("total_values", "Int64"), ("x", "Int64")])
    with _conn(server) as c:
        c.insert_blocks("vals", ["total_values", "x"], [[(1, 2), (3, 4)]])
    assert server.rows("vals") == [(1, 2), (3, 4)]


def test_insert_missing_column_closes_conn_cleanly(server):
    """A prepare failure discovered client-side (meta lacks a column)
    cancels + closes the connection — it is mid-INSERT and must not
    be reused half-synchronized."""
    c = _conn(server)
    with pytest.raises(CHServerException) as e:
        c.insert_blocks("events_native", ["event_id", "nope"], [[(1, 2)]])
    assert e.value.code == 16
    assert c._sock is None  # closed, not dangling mid-protocol


def test_bad_host_entry_raises_value_error():
    with pytest.raises(ValueError, match="h1"):
        NativeTcpSink(["h1", "h2:9000"])
