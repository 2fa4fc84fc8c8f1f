"""ClickHouse native-TCP transport: the live socket protocol over the
byte-verified block codec (native_format.py).

This closes the last reference-surface seam: the reference talks to
ClickHouse over its native TCP protocol (vendored kshvakov/clickhouse
— clickhouse.go:76-150 prepare/insert lifecycle, 229-275 process loop,
276-305 cancel, connect.go dial, bootstrap.go:158-199 hello). The
packet grammar implemented here, from those public sources:

  client->server packets (uvarint tag first):
    0 Hello   client name, 3 uvarint versions, db, user, password
    1 Query   query_id, client-info blob, quota key (rev>=54060),
              settings (""-terminated), state=2, compress flag, query
              text, then one EMPTY data block
    2 Data    temp-table name ("") + one Native block
    3 Cancel  (nothing follows; connection is then closed)
    4 Ping
  server->client packets:
    0 Hello   server name, 3 uvarint versions, timezone (rev>=54058)
    1 Data    temp-table name + Native block (first block of an INSERT
              response is the column meta: 0 rows, typed columns —
              clickhouse_read_meta.go:10-48)
    2 Exception  int32 code, name, message, stack trace, bool nested
                 (recursive) — clickhouse_exception.go:21-48
    3 Progress   uvarint rows, bytes, total_rows — clickhouse_progress.go
    4 Pong
    5 EndOfStream
    6 ProfileInfo uvarint rows, blocks, bytes, bool applied_limit,
                  uvarint rows_before_limit, bool calc — profile_info.go
    7 Totals    data block (TOTALS row of a WITH TOTALS query)
    8 Extremes  data block (min/max rows)

INSERT lifecycle (clickhouse.go:76-87 + Commit 129-150): send the
query cut at VALUES, read the meta block to learn the server-side
column types, stream data blocks, send the empty block as the
end-of-data marker, then drain progress/profile until EndOfStream.

Compression is intentionally absent — the reference ships with it
disabled (bootstrap.go:123-125 comments out `compress = true`), so the
wire here is the uncompressed Native framing.

Scale shape: `NativeTcpSink.write` ships blocks from EXECUTORS via
foreachPartition — one connection per partition, rows never collect to
the driver; `hosts` round-robins per partition (the reference's
alt_hosts load balancing, bootstrap.go:109-121). The per-block row cap
is the reference's block_size flush unit (K5).
"""

from __future__ import annotations

import io
import socket
import struct
from dataclasses import dataclass, field

from corrie_spark.sinks.native_format import (
    _read_str,
    _read_uvarint,
    _write_str,
    _write_uvarint,
    encode_block,
    encode_empty_block,
    read_block,
)

# protocol.go constants (lib/protocol/protocol.go)
CLIENT_HELLO, CLIENT_QUERY, CLIENT_DATA, CLIENT_CANCEL, CLIENT_PING = 0, 1, 2, 3, 4
(
    SERVER_HELLO,
    SERVER_DATA,
    SERVER_EXCEPTION,
    SERVER_PROGRESS,
    SERVER_PONG,
    SERVER_END_OF_STREAM,
    SERVER_PROFILE_INFO,
    SERVER_TOTALS,
    SERVER_EXTREMES,
) = range(9)
REVISION_WITH_SERVER_TIMEZONE = 54058
REVISION_WITH_QUOTA_KEY = 54060
CLIENT_NAME = "corrie-spark"
CLIENT_REVISION = 54213  # feature level of the reference driver
STATE_COMPLETE = 2


class CHServerException(Exception):
    """Server-side exception packet, surfaced with its code so the
    writer can distinguish prepare failures (K8) from transient ones
    (K9)."""

    def __init__(self, code: int, name: str, message: str, stack: str = "", nested=None):
        super().__init__(f"code: {code}, message: {message}")
        self.code = code
        self.name = name
        self.message = message
        self.stack = stack
        self.nested = nested


@dataclass
class ServerInfo:
    name: str = ""
    version_major: int = 0
    version_minor: int = 0
    revision: int = 0
    timezone: str = ""


@dataclass
class Progress:
    rows: int = 0
    bytes: int = 0
    total_rows: int = 0


@dataclass
class ProfileInfo:
    rows: int = 0
    blocks: int = 0
    bytes: int = 0
    applied_limit: bool = False
    rows_before_limit: int = 0
    calculated_rows_before_limit: bool = False


@dataclass
class QueryResult:
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, ch type)
    rows: list[tuple] = field(default_factory=list)
    totals: list[tuple] = field(default_factory=list)
    extremes: list[tuple] = field(default_factory=list)
    progress: list[Progress] = field(default_factory=list)
    profile: ProfileInfo | None = None


class _SockReader:
    """Exact-read adapter: the block/str/uvarint decoders expect
    read(n) to return n bytes; raw sockets may return fewer.

    BUFFERED: the decoders issue tiny reads (one byte per uvarint
    byte, one word per fixed-width value), and a recv() syscall per
    tiny read costs more than the decode itself — measured 8s of a
    12s 64k-row insert drain. One recv() fills a 64 KiB buffer;
    surplus bytes belong to the same response stream (the protocol is
    a strict request/response alternation per connection, and recv
    returns as soon as ANY bytes arrive, so read-ahead can neither
    deadlock nor steal another request's bytes)."""

    _BUFSIZE = 65536

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""
        self._pos = 0

    def read(self, n: int) -> bytes:
        while len(self._buf) - self._pos < n:
            chunk = self._sock.recv(self._BUFSIZE)
            if not chunk:
                raise ConnectionError("server closed the connection mid-read")
            self._buf = self._buf[self._pos :] + chunk
            self._pos = 0
        out = self._buf[self._pos : self._pos + n]
        self._pos += n
        return out


class NativeTcpConn:
    """One native-protocol connection: hello handshake, ping, queries,
    block-streamed INSERT, cancel. Not thread-safe (the protocol is a
    strict request/response alternation per connection — parallelism
    comes from one connection per partition, not shared sockets)."""

    def __init__(
        self,
        host: str,
        port: int,
        database: str = "default",
        username: str = "default",
        password: str = "",
        connect_timeout_s: float = 10.0,
    ):
        self.host, self.port = host, port
        self.database, self.username, self.password = database, username, password
        self.server = ServerInfo()
        self._sock: socket.socket | None = None
        self._r: _SockReader | None = None
        self._timeout = connect_timeout_s

    # --- connection ----------------------------------------------------

    def connect(self) -> "NativeTcpConn":
        self._sock = socket.create_connection((self.host, self.port), self._timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)  # no_delay
        self._r = _SockReader(self._sock)
        self._hello()
        return self

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None
                self._r = None

    def __enter__(self) -> "NativeTcpConn":
        return self.connect() if self._sock is None else self

    def __exit__(self, *exc) -> None:
        self.close()

    def _send(self, payload: bytes) -> None:
        assert self._sock is not None, "not connected"
        self._sock.sendall(payload)

    # --- handshake (bootstrap.go:158-199) ------------------------------

    def _hello(self) -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, CLIENT_HELLO)
        _write_str(buf, CLIENT_NAME)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, CLIENT_REVISION)
        _write_str(buf, self.database)
        _write_str(buf, self.username)
        _write_str(buf, self.password)
        self._send(buf.getvalue())
        packet = _read_uvarint(self._r)
        if packet == SERVER_EXCEPTION:
            raise self._read_exception()
        if packet != SERVER_HELLO:
            self.close()
            raise ConnectionError(f"unexpected packet [{packet}] in hello")
        s = self.server
        s.name = _read_str(self._r)
        s.version_major = _read_uvarint(self._r)
        s.version_minor = _read_uvarint(self._r)
        s.revision = _read_uvarint(self._r)
        if s.revision >= REVISION_WITH_SERVER_TIMEZONE:
            s.timezone = _read_str(self._r)

    # --- ping (clickhouse_ping.go) -------------------------------------

    def ping(self) -> bool:
        buf = io.BytesIO()
        _write_uvarint(buf, CLIENT_PING)
        self._send(buf.getvalue())
        res = self._process()
        return res is not None

    # --- query send (clickhouse_send_query.go) -------------------------

    def _send_query(self, query: str, query_id: str = "") -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, CLIENT_QUERY)
        _write_str(buf, query_id)
        # client info blob: kind=initial, user, query id, address,
        # iface=TCP, os user, hostname
        _write_uvarint(buf, 1)
        _write_str(buf, "")
        _write_str(buf, "")
        _write_str(buf, "[::ffff:127.0.0.1]:0")
        _write_uvarint(buf, 1)
        _write_str(buf, socket.gethostname())
        _write_str(buf, socket.gethostname())
        _write_str(buf, CLIENT_NAME)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, 1)
        _write_uvarint(buf, CLIENT_REVISION)
        if self.server.revision >= REVISION_WITH_QUOTA_KEY:
            _write_str(buf, "")  # quota key
        _write_str(buf, "")  # settings terminator
        _write_uvarint(buf, STATE_COMPLETE)
        _write_uvarint(buf, 0)  # compression disabled (bootstrap.go:123-125)
        _write_str(buf, query)
        # trailing empty block (sendQuery's writeBlock(&data.Block{}))
        _write_uvarint(buf, CLIENT_DATA)
        _write_str(buf, "")
        buf.write(encode_empty_block())
        self._send(buf.getvalue())

    def _send_data_block(self, block_bytes: bytes) -> None:
        buf = io.BytesIO()
        _write_uvarint(buf, CLIENT_DATA)
        _write_str(buf, "")  # temporary table name
        buf.write(block_bytes)
        self._send(buf.getvalue())

    def cancel(self) -> None:
        """ClientCancel then close (clickhouse.go:276-282): the server
        stops the in-flight query; the connection is not reusable."""
        if self._sock is not None:
            try:
                buf = io.BytesIO()
                _write_uvarint(buf, CLIENT_CANCEL)
                self._send(buf.getvalue())
            finally:
                self.close()

    # --- server->client packet pump ------------------------------------

    def _read_exception(self) -> CHServerException:
        code = struct.unpack("<i", self._r.read(4))[0]
        name = _read_str(self._r)
        message = _read_str(self._r)
        stack = _read_str(self._r)
        (has_nested,) = self._r.read(1)
        nested = self._read_exception() if has_nested else None
        msg = message
        prefix = name + ":"
        if msg.startswith(prefix):
            msg = msg[len(prefix):].strip()
        return CHServerException(code, name, msg, stack, nested)

    def _read_progress(self) -> Progress:
        return Progress(
            rows=_read_uvarint(self._r),
            bytes=_read_uvarint(self._r),
            total_rows=_read_uvarint(self._r),
        )

    def _read_profile(self) -> ProfileInfo:
        p = ProfileInfo()
        p.rows = _read_uvarint(self._r)
        p.blocks = _read_uvarint(self._r)
        p.bytes = _read_uvarint(self._r)
        p.applied_limit = bool(self._r.read(1)[0])
        p.rows_before_limit = _read_uvarint(self._r)
        p.calculated_rows_before_limit = bool(self._r.read(1)[0])
        return p

    def _read_data_block(self) -> list[tuple[str, str, list]]:
        _read_str(self._r)  # temporary table name
        return read_block(self._r)

    def _process(self, result: QueryResult | None = None) -> QueryResult | None:
        """The reference's process() loop (clickhouse.go:229-275):
        drain packets until Pong/EndOfStream, raising on Exception,
        accumulating progress/profile/data into `result`."""
        res = result or QueryResult()
        while True:
            packet = _read_uvarint(self._r)
            if packet == SERVER_PONG:
                return res
            if packet == SERVER_END_OF_STREAM:
                return res
            if packet == SERVER_EXCEPTION:
                raise self._read_exception()
            if packet == SERVER_PROGRESS:
                res.progress.append(self._read_progress())
            elif packet == SERVER_PROFILE_INFO:
                res.profile = self._read_profile()
            elif packet in (SERVER_DATA, SERVER_TOTALS, SERVER_EXTREMES):
                cols = self._read_data_block()
                if cols and not res.columns:
                    res.columns = [(n, t) for n, t, _ in cols]
                rows = _cols_to_rows(cols)
                if packet == SERVER_TOTALS:
                    res.totals.extend(rows)
                elif packet == SERVER_EXTREMES:
                    res.extremes.extend(rows)
                else:
                    res.rows.extend(rows)
            else:
                self.close()
                raise ConnectionError(f"unexpected packet [{packet}] from server")

    # --- public query surface ------------------------------------------

    def execute(self, query: str) -> QueryResult:
        """DDL / SELECT: send, then drain to EndOfStream. SELECT rows
        (and WITH TOTALS / extremes side-channels) come back decoded —
        the R1/R3 transport surface."""
        self._send_query(query)
        return self._process()

    def read_meta(self) -> list[tuple[str, str]]:
        """After the INSERT prefix: wait for the server's column-meta
        block (0 rows, typed columns) — clickhouse_read_meta.go loop
        (progress/profile packets may precede it)."""
        while True:
            packet = _read_uvarint(self._r)
            if packet == SERVER_EXCEPTION:
                raise self._read_exception()
            if packet == SERVER_PROGRESS:
                self._read_progress()
            elif packet == SERVER_PROFILE_INFO:
                self._read_profile()
            elif packet == SERVER_DATA:
                cols = self._read_data_block()
                return [(n, t) for n, t, _ in cols]
            else:
                self.close()
                raise ConnectionError(f"unexpected packet [{packet}] in read_meta")

    def insert_blocks(self, table: str, columns: list[str], row_blocks) -> QueryResult:
        """Full INSERT lifecycle: prefix query cut at VALUES, column
        meta from the server (the client never guesses types — K4's
        type matrix is driven by the server schema, the reference's
        prepare contract), one Native block per element of
        `row_blocks` (an iterable of row-lists), empty-block end
        marker, then drain progress to EndOfStream."""
        try:
            collist = ", ".join(columns)
            self._send_query(f"INSERT INTO {table} ({collist}) VALUES")
            meta = self.read_meta()
            by_name = dict(meta)
            try:
                types = [by_name[c] for c in columns]
            except KeyError as e:
                # the server is waiting for data blocks; abort the
                # in-flight INSERT protocol-correctly before raising
                self.cancel()
                raise CHServerException(
                    16, "NO_SUCH_COLUMN_IN_TABLE", f"no column {e}"
                ) from e
            for rows in row_blocks:
                if not rows:
                    continue
                cols = [
                    (columns[i], types[i], [r[i] for r in rows])
                    for i in range(len(columns))
                ]
                self._send_data_block(encode_block(cols))
            self._send_data_block(encode_empty_block())
            return self._process()
        except BaseException:
            # any failure mid-lifecycle (server exception, encode
            # error, broken pipe) leaves the connection in an unknown
            # protocol state — close so a caller that catches cannot
            # reuse a half-synchronized conn
            self.close()
            raise


def _cols_to_rows(cols: list[tuple[str, str, list]]) -> list[tuple]:
    if not cols:
        return []
    n = len(cols[0][2])
    return [tuple(c[2][i] for c in cols) for i in range(n)]


def _chunks(it, size: int):
    buf: list = []
    for x in it:
        buf.append(tuple(x))
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


class NativeTcpSink:
    """Sink-protocol adapter over the native TCP client.

    write() raises on server exceptions, so the micro-batch writer's
    retry (K9) / bisect (K7) / prepare-failure DLQ (K8) semantics wrap
    it unchanged — the same contract ParquetDirSink and JdbcSink
    satisfy.

    Scale shape: foreachPartition — every executor partition opens its
    own connection to hosts[partition % len(hosts)] (alt_hosts load
    balancing, bootstrap.go:109-121) and streams its rows as Native
    blocks of `block_rows` (K5 flush unit). The driver never sees row
    data; a 1000-executor job is 1000 independent INSERT streams.
    """

    def __init__(
        self,
        hosts: list[str] | str,
        database: str = "default",
        username: str = "default",
        password: str = "",
        block_rows: int = 65_536,
    ):
        if isinstance(hosts, str):
            hosts = [hosts]
        self.hosts = []
        for h in hosts:
            host, sep, port = h.rpartition(":")
            if not sep or not port.isdigit():
                raise ValueError(f"host entry {h!r} must be 'host:port'")
            self.hosts.append((host, int(port)))
        self.database, self.username, self.password = database, username, password
        self.block_rows = block_rows

    def write(self, table: str, df) -> None:
        cols = list(df.columns)
        hosts, db, user, pw = self.hosts, self.database, self.username, self.password
        block_rows = self.block_rows

        def send_partition(pid: int, rows):
            first = next(rows, None)
            if first is None:  # empty partition: no connection at all
                return iter([])
            import itertools

            host, port = hosts[pid % len(hosts)]
            conn = NativeTcpConn(host, port, db, user, pw).connect()
            try:
                conn.insert_blocks(
                    table, cols, _chunks(itertools.chain([first], rows), block_rows)
                )
            finally:
                conn.close()
            return iter([])

        # mapPartitionsWithIndex + count: foreachPartition without the
        # legacy runJob path; partition index feeds host round-robin
        df.rdd.mapPartitionsWithIndex(send_partition).count()
