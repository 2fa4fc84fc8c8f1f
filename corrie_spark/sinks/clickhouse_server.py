"""In-process ClickHouse native-protocol server.

The sandbox has no ClickHouse, so — exactly like FakeAmqpBroker for
the AMQP seam — this is a real SOCKET-LEVEL implementation of the
server half of the native protocol (the packet grammar documented in
native_tcp.py, from the public kshvakov/clickhouse sources), used as:

  * the contract fixture for NativeTcpConn/NativeTcpSink tests —
    the client is exercised over an actual TCP socket, byte-for-byte;
  * a sandbox stand-in "warehouse" an end-to-end streaming pipeline
    can point its sink at.

Behavior implemented (matching the reference driver's expectations):
  hello      -> ServerHello (name/version/revision/timezone), or
                ServerException(516 AUTHENTICATION_FAILED) on bad
                credentials
  ping       -> ServerPong
  INSERT ... VALUES -> column-meta block (0 rows, typed columns from
                the registered table schema; unknown table ->
                ServerException(60 UNKNOWN_TABLE), unknown column ->
                ServerException(16)), then data blocks until the empty
                end marker, then ServerProgress + ServerEndOfStream.
                Rows land in `self.tables[name]` (thread-safe).
  other query -> canned result if `set_query_result` registered one
                (data block + optional totals/extremes blocks — the
                R1/R3 streamed-SELECT surface), else bare EndOfStream.
  ClientCancel mid-insert -> the partial rows are DISCARDED for the
                current un-terminated block sequence and the
                connection closes (`cancelled` counter increments).

Failure injection for retry/DLQ tests: `fail_next_inserts(n, code)`
makes the next n INSERT attempts answer the end-of-data marker with a
ServerException instead of EndOfStream — the at-least-once window the
writer's K9 retry covers.

One thread per connection; state guarded by a single lock (block
decode is cheap at test scale; this server is a fixture, not a
database).
"""

from __future__ import annotations

import io
import socket
import struct
import threading

from corrie_spark.chtypes import parse_ch_type
from corrie_spark.sinks.native_format import (
    _read_str,
    _read_uvarint,
    _write_str,
    _write_uvarint,
    encode_block,
    read_block,
)
from corrie_spark.sinks.native_tcp import (
    CLIENT_CANCEL,
    CLIENT_DATA,
    CLIENT_HELLO,
    CLIENT_PING,
    CLIENT_QUERY,
    REVISION_WITH_QUOTA_KEY,
    REVISION_WITH_SERVER_TIMEZONE,
    SERVER_DATA,
    SERVER_END_OF_STREAM,
    SERVER_EXCEPTION,
    SERVER_EXTREMES,
    SERVER_HELLO,
    SERVER_PONG,
    SERVER_PROGRESS,
    SERVER_TOTALS,
    _SockReader,
)

SERVER_NAME = "corrie-fake-clickhouse"
SERVER_REVISION = 54213


class FakeClickHouseServer:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        users: dict[str, str] | None = None,
        timezone: str = "UTC",
    ):
        self.host = host
        self.users = users  # None -> accept anything
        self.timezone = timezone
        self.schemas: dict[str, list[tuple[str, str]]] = {}
        self.tables: dict[str, list[tuple]] = {}
        self.query_results: dict[str, dict] = {}
        self.queries_seen: list[str] = []
        self.cancelled = 0
        self.pings = 0
        self._fail_inserts = 0
        self._fail_code = 252
        self._lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(32)
        self.port = self._listener.getsockname()[1]
        self._stopping = False
        self._threads: list[threading.Thread] = []
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    # --- fixture surface ------------------------------------------------

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"

    def register_table(self, name: str, schema: list[tuple[str, str]]) -> None:
        for _, t in schema:
            parse_ch_type(t)  # fail fast on bad fixture schemas
        with self._lock:
            self.schemas[name] = list(schema)
            self.tables.setdefault(name, [])

    def set_query_result(
        self,
        query: str,
        columns: list[tuple[str, str, list]],
        totals: list[tuple[str, str, list]] | None = None,
        extremes: list[tuple[str, str, list]] | None = None,
    ) -> None:
        """Canned SELECT response: `columns` is encode_block input.
        totals/extremes, if given, are sent as ServerTotals /
        ServerExtremes blocks (TOTALS/EXTREMES side-channels, R3)."""
        with self._lock:
            self.query_results[query.strip()] = {
                "columns": columns,
                "totals": totals,
                "extremes": extremes,
            }

    def fail_next_inserts(self, n: int, code: int = 252) -> None:
        with self._lock:
            self._fail_inserts = n
            self._fail_code = code

    def rows(self, table: str) -> list[tuple]:
        with self._lock:
            return list(self.tables.get(table, []))

    def close(self) -> None:
        self._stopping = True
        try:
            self._listener.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=2)

    def __enter__(self) -> "FakeClickHouseServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # --- wire helpers ---------------------------------------------------

    def _send_exception(self, sock, code: int, name: str, message: str) -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, SERVER_EXCEPTION)
        buf.write(struct.pack("<i", code))
        _write_str(buf, name)
        _write_str(buf, f"{name}: {message}")
        _write_str(buf, "")  # stack trace
        buf.write(b"\x00")  # no nested
        sock.sendall(buf.getvalue())

    def _send_data_block(self, sock, block_bytes: bytes, tag: int = SERVER_DATA) -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, tag)
        _write_str(buf, "")  # temporary table name
        buf.write(block_bytes)
        sock.sendall(buf.getvalue())

    def _send_tagged(self, sock, tag: int, payload: bytes = b"") -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, tag)
        buf.write(payload)
        sock.sendall(buf.getvalue())

    def _send_progress(self, sock, rows: int, nbytes: int, total: int = 0) -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, rows)
        _write_uvarint(buf, nbytes)
        _write_uvarint(buf, total)
        self._send_tagged(sock, SERVER_PROGRESS, buf.getvalue())

    # --- connection handling ---------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stopping:
            try:
                conn, _addr = self._listener.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            self._threads.append(t)
            t.start()

    def _serve(self, sock: socket.socket) -> None:
        r = _SockReader(sock)
        try:
            client_revision = self._handle_hello(sock, r)
            if client_revision is None:
                return
            while True:
                packet = _read_uvarint(r)
                if packet == CLIENT_PING:
                    with self._lock:
                        self.pings += 1
                    self._send_tagged(sock, SERVER_PONG)
                elif packet == CLIENT_QUERY:
                    if not self._handle_query(sock, r, client_revision):
                        return
                elif packet == CLIENT_CANCEL:
                    with self._lock:
                        self.cancelled += 1
                    return
                else:
                    self._send_exception(sock, 101, "UNEXPECTED_PACKET", str(packet))
                    return
        except (ConnectionError, OSError):
            return
        except Exception as e:  # noqa: BLE001 — a handler bug must not
            # surface to the peer as a bare TCP close: real ClickHouse
            # answers protocol-level trouble with an exception packet,
            # and the client's retry logic keys off that
            try:
                self._send_exception(sock, 1002, "INTERNAL_ERROR", f"{type(e).__name__}: {e}")
            except OSError:
                pass
            return
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _handle_hello(self, sock, r) -> int | None:
        packet = _read_uvarint(r)
        if packet != CLIENT_HELLO:
            self._send_exception(sock, 101, "UNEXPECTED_PACKET", "want hello")
            return None
        _client_name = _read_str(r)
        _read_uvarint(r)  # major
        _read_uvarint(r)  # minor
        client_revision = _read_uvarint(r)
        _database = _read_str(r)
        username = _read_str(r)
        password = _read_str(r)
        if self.users is not None and self.users.get(username) != password:
            self._send_exception(
                sock, 516, "AUTHENTICATION_FAILED", f"user {username} denied"
            )
            return None
        buf = io.BytesIO()
        _write_uvarint(buf, SERVER_HELLO)
        _write_str(buf, SERVER_NAME)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, SERVER_REVISION)
        if SERVER_REVISION >= REVISION_WITH_SERVER_TIMEZONE:
            _write_str(buf, self.timezone)
        sock.sendall(buf.getvalue())
        return client_revision

    def _read_query_packet(self, r, client_revision: int) -> str:
        _query_id = _read_str(r)
        # client info blob (send_query.go): kind, user, query id,
        # address, iface, os user, hostname, client name+version
        _read_uvarint(r)
        _read_str(r)
        _read_str(r)
        _read_str(r)
        _read_uvarint(r)
        _read_str(r)
        _read_str(r)
        _read_str(r)
        _read_uvarint(r)
        _read_uvarint(r)
        _read_uvarint(r)
        if client_revision >= REVISION_WITH_QUOTA_KEY:
            _read_str(r)
        while _read_str(r):  # settings: name/value pairs, ""-terminated
            _read_str(r)
        _read_uvarint(r)  # state
        _read_uvarint(r)  # compression
        query = _read_str(r)
        # the query packet's trailing empty block
        packet = _read_uvarint(r)
        if packet == CLIENT_DATA:
            _read_str(r)
            read_block(r)
        return query

    def _handle_query(self, sock, r, client_revision: int) -> bool:
        """Returns False when the connection must close (cancel /
        error); True to keep serving."""
        query = self._read_query_packet(r, client_revision)
        with self._lock:
            self.queries_seen.append(query)
        q = query.strip()
        if q.upper().startswith("INSERT"):
            return self._handle_insert(sock, r, q)
        with self._lock:
            canned = self.query_results.get(q)
        if canned is not None:
            self._send_data_block(sock, encode_block(canned["columns"]))
            if canned["totals"] is not None:
                self._send_data_block(sock, encode_block(canned["totals"]), SERVER_TOTALS)
            if canned["extremes"] is not None:
                self._send_data_block(
                    sock, encode_block(canned["extremes"]), SERVER_EXTREMES
                )
        self._send_tagged(sock, SERVER_END_OF_STREAM)
        return True

    def _handle_insert(self, sock, r, query: str) -> bool:
        # "INSERT INTO <table> (c1, c2, ...) VALUES" — the VALUES cut
        # uses the reference client's own regex (\sVALUES\s*( or
        # end-of-statement), NOT a substring search: identifiers may
        # legitimately contain the letters VALUES ("total_values")
        import re

        m = re.match(
            r"(?is)^\s*INSERT\s+INTO\s+(\S+?)\s*(?:\(([^)]*)\))?\s*VALUES\b",
            query,
        )
        if m is None:
            self._send_exception(sock, 62, "SYNTAX_ERROR", f"cannot parse: {query}")
            return False
        table = m.group(1).strip().strip("`")
        cols = (
            [c.strip().strip("`") for c in m.group(2).split(",")]
            if m.group(2) is not None
            else None
        )
        with self._lock:
            schema = self.schemas.get(table)
        if schema is None:
            self._send_exception(sock, 60, "UNKNOWN_TABLE", f"Table {table} doesn't exist")
            return False
        by_name = dict(schema)
        if cols is None:
            cols = [n for n, _ in schema]
        unknown = [c for c in cols if c not in by_name]
        if unknown:
            self._send_exception(
                sock, 16, "NO_SUCH_COLUMN_IN_TABLE", f"No such column {unknown[0]}"
            )
            return False
        # column-meta block: 0 rows, typed columns in statement order
        meta = [(c, by_name[c], []) for c in cols]
        self._send_data_block(sock, encode_block(meta))
        staged: list[tuple] = []
        nbytes = 0
        while True:
            packet = _read_uvarint(r)
            if packet == CLIENT_CANCEL:
                with self._lock:
                    self.cancelled += 1
                return False  # staged rows discarded
            if packet != CLIENT_DATA:
                self._send_exception(sock, 101, "UNEXPECTED_PACKET", str(packet))
                return False
            _read_str(r)  # temp table
            block = read_block(r)
            if not block or not block[0][2]:
                break  # empty block: end of data
            vals = [c[2] for c in block]
            staged.extend(zip(*vals))
            nbytes += sum(len(str(v)) for col in vals for v in col)
        with self._lock:
            if self._fail_inserts > 0:
                self._fail_inserts -= 1
                code = self._fail_code
                fail = True
            else:
                fail = False
        if fail:
            self._send_exception(sock, code, "TOO_MANY_PARTS", "injected failure")
            return False
        with self._lock:
            self.tables.setdefault(table, []).extend(staged)
        self._send_progress(sock, len(staged), nbytes)
        self._send_tagged(sock, SERVER_END_OF_STREAM)
        return True
