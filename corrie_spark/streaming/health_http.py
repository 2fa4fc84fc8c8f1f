"""HTTP health endpoints: the reference's healthcheck listener.

The reference serves two endpoints from an embedded HTTP server
(vendored kak-tus/healthcheck healthcheck.go, wired in main.go:31-69):

  /healthcheck  static liveness — always passing, body "ok"
  /status       readiness — reader.IsAccessible() AND
                writer.IsAccessible(), checked concurrently
                (main.go:46-69); writer accessibility is a DB ping
                retried up to 10x with 1s sleeps (writer/writer.go:
                149-161); reader's is trivially true (reader.go:
                156-160 TODO). Passing -> "ok", else warning -> "nok".

State -> HTTP code mapping matches healthcheck.go's stateMap:
passing=200 (implicit), warning=429, critical=500.

Here the writer signal is any `ping` callable — e.g. a closure over
NativeTcpConn.ping (the ClickHouse ping the reference uses) — and the
reader signal is HealthListener.healthy() from the live streaming
query. `add(path, fn)` mirrors healthcheck.Add for extra checks.

Stdlib ThreadingHTTPServer on an ephemeral port; checks run per
request (the /status ping gate can legitimately take up to
attempts x interval seconds while the DB is down — same as the
reference)."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from corrie_spark.streaming.pipeline import HealthListener

STATE_PASSING, STATE_WARNING, STATE_CRITICAL = 0, 1, 2
_STATE_HTTP = {STATE_PASSING: 200, STATE_WARNING: 429, STATE_CRITICAL: 500}


def ping_gate(
    ping: Callable[[], bool], attempts: int = 10, interval_s: float = 1.0
) -> bool:
    """writer.go:149-161: ping until success, up to `attempts` tries
    with `interval_s` sleeps after failures."""
    for i in range(attempts):
        try:
            if ping():
                return True
        except Exception:  # noqa: BLE001 — a failed ping is a false ping
            pass
        if i + 1 < attempts:
            time.sleep(interval_s)
    return False


class HealthServer:
    def __init__(
        self,
        listener: HealthListener | None = None,
        ping: Callable[[], bool] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        ping_attempts: int = 10,
        ping_interval_s: float = 1.0,
    ):
        self._checks: dict[str, Callable[[], tuple[int, str]]] = {}
        self.add("/healthcheck", lambda: (STATE_PASSING, "ok"))

        def status() -> tuple[int, str]:
            # reader and writer signals checked concurrently, like
            # main.go's two goroutines + WaitGroup — the ping gate can
            # take seconds and must not serialize after the reader one
            results = {}

            def rd():
                try:
                    results["r"] = listener.healthy() if listener is not None else True
                except Exception:  # noqa: BLE001 — a broken check is a failed check
                    results["r"] = False

            def wr():
                try:
                    results["w"] = (
                        ping_gate(ping, ping_attempts, ping_interval_s)
                        if ping is not None
                        else True
                    )
                except Exception:  # noqa: BLE001
                    results["w"] = False

            ts = [threading.Thread(target=rd), threading.Thread(target=wr)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if results["r"] and results["w"]:
                return STATE_PASSING, "ok"
            return STATE_WARNING, "nok"

        self.add("/status", status)

        checks = self._checks

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                fn = checks.get(self.path)
                if fn is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                try:
                    state, text = fn()
                except Exception as e:  # noqa: BLE001 — a broken check
                    # must still answer HTTP (critical), not drop the
                    # connection on the prober
                    state, text = STATE_CRITICAL, f"check failed: {type(e).__name__}"
                self.send_response(_STATE_HTTP.get(state, 500))
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(text.encode())

            def log_message(self, *a) -> None:  # quiet
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def add(self, path: str, fn: Callable[[], tuple[int, str]]) -> None:
        """healthcheck.Add: register `fn() -> (state, text)` at path."""
        self._checks[path] = fn

    @property
    def address(self) -> str:
        return f"http://{self.host}:{self.port}"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=2)

    def __enter__(self) -> "HealthServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
