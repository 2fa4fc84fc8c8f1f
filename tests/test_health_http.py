"""HTTP health endpoints (/healthcheck, /status): the reference's
healthcheck listener semantics — static liveness, readiness =
reader-healthy AND db-ping-gate (10x1s in production, shortened
here), state->HTTP mapping 200/429, and the endpoints served DURING a
live streaming query with the ping going to the native-TCP fake
ClickHouse."""

from __future__ import annotations

import urllib.error
import urllib.request

from corrie_spark.sinks.clickhouse_server import FakeClickHouseServer
from corrie_spark.sinks.native_tcp import NativeTcpConn
from corrie_spark.streaming import HealthListener, HealthServer
from corrie_spark.streaming.health_http import ping_gate


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_healthcheck_always_ok():
    with HealthServer() as h:
        assert _get(h.address + "/healthcheck") == (200, "ok")


def test_unknown_path_is_404():
    with HealthServer() as h:
        code, _ = _get(h.address + "/nope")
        assert code == 404


def test_status_ok_when_reader_and_writer_healthy():
    listener = HealthListener()
    pings = []
    with HealthServer(listener, ping=lambda: pings.append(1) or True) as h:
        assert _get(h.address + "/status") == (200, "ok")
    assert len(pings) == 1  # first ping succeeded: no retries


def test_status_nok_when_ping_fails_after_gate():
    """The writer gate retries the ping attempts x interval before
    giving up (writer.go:149-161's 10x1s, shortened for the test) and
    maps warning -> HTTP 429 'nok' (healthcheck.go stateMap)."""
    pings = []
    with HealthServer(
        None, ping=lambda: pings.append(1) and False, ping_attempts=3, ping_interval_s=0.01
    ) as h:
        assert _get(h.address + "/status") == (429, "nok")
    assert len(pings) == 3


def test_status_nok_when_reader_unhealthy():
    listener = HealthListener()
    listener.terminated["q1"] = "boom"  # query died with an exception
    with HealthServer(listener, ping=lambda: True) as h:
        assert _get(h.address + "/status") == (429, "nok")


def test_ping_gate_recovers_mid_gate():
    calls = []

    def flaky() -> bool:
        calls.append(1)
        return len(calls) >= 3

    assert ping_gate(flaky, attempts=10, interval_s=0.01) is True
    assert len(calls) == 3  # stopped at first success


def test_add_custom_check():
    with HealthServer() as h:
        h.add("/custom", lambda: (2, "down"))  # critical -> 500
        assert _get(h.address + "/custom") == (500, "down")


def test_status_during_live_streaming_query(spark, tmp_path):
    """The full reference shape: a running pipeline (reader signal via
    HealthListener) + ClickHouse ping (writer signal via native TCP)
    served over HTTP while the query is live."""
    from corrie_spark.sinks import DLQSink, SchemaRegistry, WriterConfig
    from corrie_spark.sinks.native_tcp import NativeTcpSink
    from corrie_spark.sources import file_envelope_source
    from corrie_spark.streaming import PipelineConfig, start_pipeline
    from tests.test_streaming import METRICS_Q, _rows, _write_stream_file

    with FakeClickHouseServer() as ch:
        ch.register_table(
            "db.metrics", [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]
        )

        def ping() -> bool:
            with NativeTcpConn("127.0.0.1", ch.port) as c:
                return c.ping()

        src = str(tmp_path / "in")
        _write_stream_file(src, "b0.json", [_rows(i, METRICS_Q, [i, 1.0, "t"]) for i in range(5)])
        listener = HealthListener()
        spark.streams.addListener(listener)
        q = None
        try:
            q = start_pipeline(
                file_envelope_source(spark, src),
                NativeTcpSink([f"127.0.0.1:{ch.port}"]),
                DLQSink(str(tmp_path / "dlq")),
                SchemaRegistry(
                    {"db.metrics": [("m_id", "Int64"), ("m_value", "Float64"), ("m_tag", "String")]}
                ),
                PipelineConfig(
                    checkpoint_dir=str(tmp_path / "ckpt"),
                    trigger_seconds=1,
                    writer=WriterConfig(retry_interval_s=0.01, max_retries=1),
                ),
            )
            with HealthServer(listener, ping=ping, ping_attempts=2, ping_interval_s=0.1) as h:
                # live query + reachable warehouse -> passing
                assert _get(h.address + "/status") == (200, "ok")
                assert _get(h.address + "/healthcheck") == (200, "ok")
                # rows actually landed through the native sink
                import time

                deadline = time.time() + 60
                while time.time() < deadline and len(ch.rows("db.metrics")) < 5:
                    time.sleep(0.2)
                assert sorted(r[0] for r in ch.rows("db.metrics")) == list(range(5))
        finally:
            if q is not None:
                q.stop()
            spark.streams.removeListener(listener)


def test_broken_custom_check_answers_500_not_connection_drop():
    with HealthServer() as h:
        h.add("/boom", lambda: 1 / 0)
        code, text = _get(h.address + "/boom")
        assert code == 500
        assert "check failed" in text


def test_status_with_raising_listener_is_nok():
    class Broken(HealthListener):
        def healthy(self):  # noqa: D102
            raise RuntimeError("state store gone")

    with HealthServer(Broken(), ping=lambda: True) as h:
        assert _get(h.address + "/status") == (429, "nok")
