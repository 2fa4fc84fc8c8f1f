"""ClickHouse Native-format block encoder/decoder.

The reference writes inserts as columnar Native-protocol blocks
(vendor kshvakov/clickhouse lib/data/block.go:158-180 Write — block
info, uvarint column/row counts, then per column: name string, type
string, column body; per-type bodies in lib/data/block_write_column.go).
The live TCP transport over this codec is native_tcp.py (exercised
against the socket-level server in clickhouse_server.py); the BLOCK
ENCODING itself is pure computation, implemented here for real from
the public Native-format layout:

  block_info: uvarint 1, uint8 is_overflows, uvarint 2,
              int32 bucket_num (-1), uvarint 0
  uvarint n_columns, uvarint n_rows
  per column: str name, str CH type name, body:
    (U)Int8/16/32/64      little-endian fixed width
    Float32/64            IEEE 754 LE
    String                per row: uvarint byte-length + bytes
    FixedString(n)        n bytes, zero-padded
    Date                  uint16 days since 1970-01-01
    DateTime[('tz')]      uint32 unix seconds
    Enum8/16              int8/int16 of the mapped value
    UUID                  16 bytes: each half stored byte-reversed
    Decimal(p<=9,s)       int32 scaled; p<=18 int64 scaled
    Nullable(T)           per-row uint8 null mask, then T body with
                          zero-defaults in null slots
    Array(T)              per-row cumulative uint64 offsets, then
                          flattened T body

`write_native_blocks` is the Spark-side plumbing: executors encode
their partitions into block files (no driver collect, no row-at-a-time
Python in the plan — the partition iterator feeds the encoder once per
`block_rows`), which is exactly the unit a live native sink would send
per INSERT. decode_block exists so tests prove encode∘decode = id over
the §1.3 type matrix.
"""

from __future__ import annotations

import datetime as _dt
import io
import re as _re
import struct
import uuid as _uuid

from corrie_spark.chtypes import CHType, UnsupportedTypeError, parse_ch_type

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

_INT_FMT = {
    "Int8": "<b", "Int16": "<h", "Int32": "<i", "Int64": "<q",
    "UInt8": "<B", "UInt16": "<H", "UInt32": "<I", "UInt64": "<Q",
    "Float32": "<f", "Float64": "<d",
}


def _write_uvarint(buf: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_uvarint(buf: io.BytesIO) -> int:
    shift = out = 0
    while True:
        (b,) = buf.read(1)
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7


def _write_str(buf: io.BytesIO, s: str) -> None:
    raw = s.encode("utf-8")
    _write_uvarint(buf, len(raw))
    buf.write(raw)


def _read_str(buf: io.BytesIO) -> str:
    return buf.read(_read_uvarint(buf)).decode("utf-8")


def _to_unix_seconds(v) -> int:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp())
    return int(v)


def _default_for(t: CHType):
    """Zero value written into Nullable null slots (the wire always
    carries a value; the mask says which are real)."""
    if t.base == "String":
        return ""
    if t.base == "FixedString":
        return "\x00" * (t.fixed_len or 0)
    if t.base == "Date":
        return _EPOCH_DATE
    if t.base == "DateTime":
        return 0
    if t.base == "UUID":
        return "00000000-0000-0000-0000-000000000000"
    if t.base.startswith("Enum"):
        return next(iter(t.enum_map))
    if t.base == "Array":
        return []
    return 0


def _encode_body(buf: io.BytesIO, t: CHType, values: list) -> None:
    base = t.base
    if base == "Nullable":
        inner = t.element
        assert inner is not None
        mask = bytes(1 if v is None else 0 for v in values)
        buf.write(mask)
        _encode_body(
            buf, inner, [(_default_for(inner) if v is None else v) for v in values]
        )
        return
    if base == "Array":
        inner = t.element
        assert inner is not None
        off = 0
        for v in values:
            off += len(v)
            buf.write(struct.pack("<Q", off))
        flat: list = []
        for v in values:
            flat.extend(v)
        _encode_body(buf, inner, flat)
        return
    if base in _INT_FMT:
        fmt = _INT_FMT[base]
        for v in values:
            buf.write(struct.pack(fmt, v))
        return
    if base == "String":
        for v in values:
            _write_str(buf, v)
        return
    if base == "FixedString":
        n = t.fixed_len or 0
        for v in values:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            if len(raw) > n:
                raise ValueError(f"FixedString({n}): value of {len(raw)} bytes")
            buf.write(raw.ljust(n, b"\x00"))
        return
    if base == "Date":
        for v in values:
            days = (v - _EPOCH_DATE).days if isinstance(v, _dt.date) else int(v)
            buf.write(struct.pack("<H", days))
        return
    if base == "DateTime":
        for v in values:
            buf.write(struct.pack("<I", _to_unix_seconds(v)))
        return
    if base in ("Enum8", "Enum16"):
        fmt = "<b" if base == "Enum8" else "<h"
        for v in values:
            buf.write(struct.pack(fmt, t.enum_map[v] if isinstance(v, str) else int(v)))
        return
    if base == "UUID":
        for v in values:
            u = _uuid.UUID(v) if isinstance(v, str) else v
            raw = u.bytes
            buf.write(raw[7::-1] + raw[:7:-1])  # both halves byte-reversed
        return
    if base == "IPv4":
        import ipaddress

        # stored little-endian uint32 (column_ipv4 in the driver family)
        for v in values:
            buf.write(struct.pack("<I", int(ipaddress.IPv4Address(v))))
        return
    if base == "IPv6":
        import ipaddress

        for v in values:
            buf.write(ipaddress.IPv6Address(v).packed)  # 16 network-order bytes
        return
    if base == "Decimal":
        import decimal as _dec

        prec, scale = _decimal_ps(t)
        fmt = "<i" if prec <= 9 else "<q"
        q = _dec.Decimal(1).scaleb(-scale)
        for v in values:
            scaled = int(_dec.Decimal(str(v)).quantize(q) * (10**scale))
            buf.write(struct.pack(fmt, scaled))
        return
    if base == "Map":
        # offsets then keys body then values body (flattened entries)
        kt, vt = t.key, t.element
        assert kt is not None and vt is not None
        off = 0
        items = [list(v.items()) if isinstance(v, dict) else list(v) for v in values]
        for v in items:
            off += len(v)
            buf.write(struct.pack("<Q", off))
        _encode_body(buf, kt, [k for v in items for k, _ in v])
        _encode_body(buf, vt, [x for v in items for _, x in v])
        return
    if base == "Tuple":
        # column-wise: each element type's body in order
        assert t.elements is not None
        for i, et in enumerate(t.elements):
            _encode_body(buf, et, [v[i] for v in values])
        return
    raise UnsupportedTypeError(f"native encoding for {t.name}")


def _decimal_ps(t: CHType) -> tuple[int, int]:
    m = _re.match(r"^Decimal\((\d+),\s*(\d+)\)$", t.name)
    if not m:
        raise UnsupportedTypeError(f"malformed Decimal: {t.name}")
    p, s = int(m.group(1)), int(m.group(2))
    if p > 18:
        # p in (18, 38] is Decimal128 on the wire (16-byte int128);
        # silently writing 8 bytes would corrupt the whole block
        raise UnsupportedTypeError(
            f"native Decimal({p},{s}): precision > 18 needs int128 encoding"
        )
    return p, s


def _decode_body(buf: io.BytesIO, t: CHType, n: int) -> list:
    base = t.base
    if base == "Nullable":
        inner = t.element
        assert inner is not None
        mask = buf.read(n)
        vals = _decode_body(buf, inner, n)
        return [None if m else v for m, v in zip(mask, vals)]
    # fixed-width bodies decode from ONE bulk read + iter_unpack:
    # a read(width) + unpack per value costs ~10x the decode itself
    # once the reader is a socket (syscall + GIL per value)
    if base == "Array":
        inner = t.element
        assert inner is not None
        offs = [v for (v,) in struct.iter_unpack("<Q", buf.read(8 * n))]
        flat = _decode_body(buf, inner, offs[-1] if offs else 0)
        out, prev = [], 0
        for o in offs:
            out.append(flat[prev:o])
            prev = o
        return out
    if base in _INT_FMT:
        fmt = _INT_FMT[base]
        w = struct.calcsize(fmt)
        return [v for (v,) in struct.iter_unpack(fmt, buf.read(w * n))]
    if base == "String":
        return [_read_str(buf) for _ in range(n)]
    if base == "FixedString":
        # return the raw n bytes unmodified (the reference driver's
        # behavior): stripping trailing NULs would corrupt values whose
        # real content ends in \x00 — padding is indistinguishable from
        # data at this layer, so callers trim if they know the encoding
        w = t.fixed_len or 0
        return [buf.read(w) for _ in range(n)]
    if base == "Date":
        return [
            _EPOCH_DATE + _dt.timedelta(days=d)
            for (d,) in struct.iter_unpack("<H", buf.read(2 * n))
        ]
    if base == "DateTime":
        return [
            _EPOCH_DT + _dt.timedelta(seconds=s)
            for (s,) in struct.iter_unpack("<I", buf.read(4 * n))
        ]
    if base in ("Enum8", "Enum16"):
        fmt = "<b" if base == "Enum8" else "<h"
        w = struct.calcsize(fmt)
        rev = {num: name for name, num in t.enum_map.items()}
        return [rev[struct.unpack(fmt, buf.read(w))[0]] for _ in range(n)]
    if base == "UUID":
        out = []
        for _ in range(n):
            raw = buf.read(16)
            out.append(str(_uuid.UUID(bytes=raw[7::-1] + raw[:7:-1])))
        return out
    if base == "IPv4":
        import ipaddress

        return [
            str(ipaddress.IPv4Address(struct.unpack("<I", buf.read(4))[0]))
            for _ in range(n)
        ]
    if base == "IPv6":
        import ipaddress

        return [str(ipaddress.IPv6Address(buf.read(16))) for _ in range(n)]
    if base == "Decimal":
        import decimal as _dec

        prec, scale = _decimal_ps(t)
        fmt = "<i" if prec <= 9 else "<q"
        w = struct.calcsize(fmt)
        return [
            _dec.Decimal(struct.unpack(fmt, buf.read(w))[0]).scaleb(-scale)
            for _ in range(n)
        ]
    if base == "Map":
        kt, vt = t.key, t.element
        assert kt is not None and vt is not None
        offs = [v for (v,) in struct.iter_unpack("<Q", buf.read(8 * n))]
        total = offs[-1] if offs else 0
        keys = _decode_body(buf, kt, total)
        vals = _decode_body(buf, vt, total)
        out, prev = [], 0
        for o in offs:
            out.append(dict(zip(keys[prev:o], vals[prev:o])))
            prev = o
        return out
    if base == "Tuple":
        assert t.elements is not None
        cols = [_decode_body(buf, et, n) for et in t.elements]
        return [tuple(c[i] for c in cols) for i in range(n)]
    raise UnsupportedTypeError(f"native decoding for {t.name}")


def encode_block(columns: list[tuple[str, str | CHType, list]]) -> bytes:
    """Encode one Native block: [(name, ch_type, values), ...] with all
    value lists the same length."""
    if not columns:
        raise ValueError("empty block")
    n_rows = len(columns[0][2])
    for name, _t, vals in columns:
        if len(vals) != n_rows:
            raise ValueError(f"column {name}: {len(vals)} rows, expected {n_rows}")
    buf = io.BytesIO()
    # block info (block.go info.write): field 1 is_overflows, field 2
    # bucket_num, 0 terminator
    _write_uvarint(buf, 1)
    buf.write(b"\x00")
    _write_uvarint(buf, 2)
    buf.write(struct.pack("<i", -1))
    _write_uvarint(buf, 0)
    _write_uvarint(buf, len(columns))
    _write_uvarint(buf, n_rows)
    for name, t, vals in columns:
        t = parse_ch_type(t) if isinstance(t, str) else t
        _write_str(buf, name)
        _write_str(buf, t.name)
        _encode_body(buf, t, vals)
    return buf.getvalue()


def encode_empty_block() -> bytes:
    """The zero-column zero-row block: the INSERT end-of-data marker
    and the tail of every query packet (clickhouse.go:140-146 'Send
    empty block as marker of end of data', sendQuery's trailing
    writeBlock(&data.Block{}))."""
    buf = io.BytesIO()
    _write_uvarint(buf, 1)
    buf.write(b"\x00")
    _write_uvarint(buf, 2)
    buf.write(struct.pack("<i", -1))
    _write_uvarint(buf, 0)
    _write_uvarint(buf, 0)  # columns
    _write_uvarint(buf, 0)  # rows
    return buf.getvalue()


def decode_block(raw: bytes) -> list[tuple[str, str, list]]:
    """Inverse of encode_block: [(name, ch_type_name, values), ...]."""
    return read_block(io.BytesIO(raw))


def read_block(buf) -> list[tuple[str, str, list]]:
    """Decode one Native block from any reader exposing read(n) — an
    io.BytesIO for file/test use, a socket reader for the live TCP
    transport (native_tcp.py). The format is self-describing, so no
    length prefix is needed; the stream position ends exactly at the
    block boundary."""
    if _read_uvarint(buf) != 1:
        raise ValueError("bad block info (field 1)")
    buf.read(1)  # is_overflows
    if _read_uvarint(buf) != 2:
        raise ValueError("bad block info (field 2)")
    buf.read(4)  # bucket_num
    if _read_uvarint(buf) != 0:
        raise ValueError("bad block info terminator")
    n_cols = _read_uvarint(buf)
    n_rows = _read_uvarint(buf)
    out = []
    for _ in range(n_cols):
        name = _read_str(buf)
        tname = _read_str(buf)
        out.append((name, tname, _decode_body(buf, parse_ch_type(tname), n_rows)))
    return out


def write_native_blocks(
    df,
    ch_schema: list[tuple[str, str]],
    out_dir: str,
    block_rows: int = 65_536,
) -> None:
    """Distributed Native-block writer: each partition encodes its rows
    into `<out_dir>/part-<pid>-<seq>.native` block files of at most
    `block_rows` rows (K5's flush-by-size, block.go's AppendRow/
    WriteTo unit). No driver collect; encoding cost is where the data
    is. A live native sink would send each file's bytes as one INSERT
    block over the wire."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    names = [n for n, _ in ch_schema]
    types = [t for _, t in ch_schema]
    for t in types:
        parse_ch_type(t)  # fail fast on the driver, not per-task
    sel = df.select(*names)

    def write_partition(pid: int, rows):
        seq = 0
        batch: list[tuple] = []

        def flush():
            nonlocal seq, batch
            if not batch:
                return
            cols = [
                (names[i], types[i], [r[i] for r in batch])
                for i in range(len(names))
            ]
            path = os.path.join(out_dir, f"part-{pid:05d}-{seq:05d}.native")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(encode_block(cols))
            os.replace(tmp, path)
            seq += 1
            batch = []

        for row in rows:
            batch.append(tuple(row))
            if len(batch) >= block_rows:
                flush()
        flush()
        return iter([])

    sel.rdd.mapPartitionsWithIndex(write_partition).count()
