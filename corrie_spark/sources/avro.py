"""Avro Object Container Files (OCF), from the public Apache Avro
1.11 specification — the row-oriented interchange format data
platforms hand each other when parquet isn't on the menu.

Implemented from spec (no avro library in this environment, and the
byte layer is small):
  - binary encoding: zigzag-varint int/long, IEEE float/double (LE),
    len-prefixed bytes/string, 1-byte boolean, null, union as
    varint branch index + value, arrays as counted blocks, and the
    `date` logical type (int days since epoch);
  - container layout: `Obj\\x01` magic, metadata map (avro.schema
    JSON + avro.codec), 16-byte sync marker, then data blocks of
    (object count, byte length, payload, sync) — `null` and
    `deflate` (raw zlib) codecs;
  - schema subset: a record of primitives / nullable ["null", T]
    unions / arrays of primitives — the flat-table shape an
    analytics engine actually ingests. Unsupported schema nodes
    raise AvroError at schema parse, never mid-row.

Two read paths, mirroring the WARC reader (sources/warc.py):
  - `avro_records(files_df)`: (path, content) frame -> typed rows,
    one Arrow stage, bytes never shuffle;
  - `avro_ranges(...)` + `scan_avro_range`: offset-sharded reading —
    a byte range of a big OCF resyncs to the next 16-byte sync
    marker and reads every block that STARTS inside the range (the
    classic container-split rule: block ownership by start offset),
    so one 10 GiB file becomes parallel ~128 MiB tasks.

Poison safety: a block whose deflate stream or datum stream is
corrupt yields one `_error` marker row for its byte span and the
scan resyncs to the next sync marker — data loss is observable
downstream, same stance as the WARC splitter.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

AVRO_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise AvroError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------------------
# schema (subset) — parse once, compile to a field plan
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _norm_type(t) -> dict:
    """Normalize a schema node to {'kind': ..., ...}. Supported:
    primitives, {'type': prim, 'logicalType': 'date'}, ["null", T]
    unions (either order), {'type':'array','items': prim}."""
    if isinstance(t, str):
        if t not in _PRIMITIVES:
            raise AvroError(f"unsupported named type {t!r}")
        return {"kind": t}
    if isinstance(t, list):
        if len(t) != 2 or "null" not in t:
            raise AvroError(f"unsupported union {t!r}")
        other = t[0] if t[1] == "null" else t[1]
        inner = _norm_type(other)
        return {"kind": "union", "null_index": t.index("null"), "inner": inner}
    if isinstance(t, dict):
        if t.get("logicalType") == "date" and t.get("type") == "int":
            return {"kind": "date"}
        if t.get("type") == "array":
            return {"kind": "array", "items": _norm_type(t["items"])}
        if t.get("type") in _PRIMITIVES:
            return {"kind": t["type"]}
    raise AvroError(f"unsupported schema node {t!r}")


def parse_schema(schema_json: str) -> list[tuple[str, dict]]:
    """OCF avro.schema JSON -> [(field_name, plan)] for a flat record."""
    s = json.loads(schema_json)
    if not (isinstance(s, dict) and s.get("type") == "record"):
        raise AvroError("top-level schema must be a record")
    return [(f["name"], _norm_type(f["type"])) for f in s.get("fields", [])]


def _read_datum(plan: dict, buf: memoryview, pos: int):
    k = plan["kind"]
    if k == "null":
        return None, pos
    if k == "boolean":
        if pos >= len(buf):
            raise AvroError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if k in ("int", "long"):
        return zigzag_decode(buf, pos)
    if k == "date":
        import datetime

        days, pos = zigzag_decode(buf, pos)
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=days), pos
    if k == "float":
        if pos + 4 > len(buf):
            raise AvroError("truncated float")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        if pos + 8 > len(buf):
            raise AvroError("truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k in ("bytes", "string"):
        n, pos = zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise AvroError("truncated bytes/string")
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if k == "string" else raw), pos + n
    if k == "union":
        idx, pos = zigzag_decode(buf, pos)
        if idx == plan["null_index"]:
            return None, pos
        return _read_datum(plan["inner"], buf, pos)
    if k == "array":
        out = []
        while True:
            n, pos = zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = zigzag_decode(buf, pos)
            for _ in range(n):
                v, pos = _read_datum(plan["items"], buf, pos)
                out.append(v)
    raise AvroError(f"unreadable kind {k}")


def _write_datum(plan: dict, v, out: bytearray) -> None:
    k = plan["kind"]
    if k == "null":
        return
    if k == "boolean":
        out.append(1 if v else 0)
    elif k in ("int", "long"):
        out += zigzag_encode(int(v))
    elif k == "date":
        import datetime

        out += zigzag_encode((v - datetime.date(1970, 1, 1)).days)
    elif k == "float":
        out += struct.pack("<f", float(v))
    elif k == "double":
        out += struct.pack("<d", float(v))
    elif k == "string":
        raw = v.encode("utf-8")
        out += zigzag_encode(len(raw)) + raw
    elif k == "bytes":
        out += zigzag_encode(len(v)) + bytes(v)
    elif k == "union":
        if v is None:
            out += zigzag_encode(plan["null_index"])
        else:
            out += zigzag_encode(1 - plan["null_index"])
            _write_datum(plan["inner"], v, out)
    elif k == "array":
        if v:
            out += zigzag_encode(len(v))
            for item in v:
                _write_datum(plan["items"], item, out)
        out += zigzag_encode(0)
    else:
        raise AvroError(f"unwritable kind {k}")


# ---------------------------------------------------------------------------
# container layer
# ---------------------------------------------------------------------------


def _write_map(pairs: dict[str, bytes]) -> bytes:
    out = bytearray()
    if pairs:
        out += zigzag_encode(len(pairs))
        for key, val in pairs.items():
            kb = key.encode()
            out += zigzag_encode(len(kb)) + kb
            out += zigzag_encode(len(val)) + val
    out += zigzag_encode(0)
    return bytes(out)


def _read_map(buf: memoryview, pos: int) -> tuple[dict[str, bytes], int]:
    pairs: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(buf, pos)
        if n == 0:
            return pairs, pos
        if n < 0:
            n = -n
            _, pos = zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = zigzag_decode(buf, pos)
            # negative/overlong lengths would walk the cursor backwards
            # (`pos += kl` with kl < 0) and cycle the outer loop forever
            # on a crafted header — same guards _read_datum already has
            if kl < 0 or pos + kl > len(buf):
                raise AvroError("bad map key length")
            key = bytes(buf[pos : pos + kl]).decode()
            pos += kl
            vl, pos = zigzag_decode(buf, pos)
            if vl < 0 or pos + vl > len(buf):
                raise AvroError("bad map value length")
            pairs[key] = bytes(buf[pos : pos + vl])
            pos += vl


def _sync_marker(name: str) -> bytes:
    import hashlib

    return hashlib.md5(f"avro-sync:{name}".encode()).digest()


def encode_ocf(
    schema_json: str,
    records: list[dict],
    codec: str = "null",
    name: str = "fixture",
    block_size: int = 64,
) -> bytes:
    """Fixture/sink encoder: records -> one OCF byte string. `name`
    seeds the (deterministic) sync marker; `block_size` records per
    block so multi-block layouts are exercised at fixture scale."""
    plan = parse_schema(schema_json)
    sync = _sync_marker(name)
    out = bytearray(AVRO_MAGIC)
    out += _write_map(
        {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    )
    out += sync
    for i in range(0, len(records), block_size):
        chunk = records[i : i + block_size]
        body = bytearray()
        for rec in chunk:
            for fname, fplan in plan:
                _write_datum(fplan, rec[fname], body)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate per spec
        elif codec != "null":
            raise AvroError(f"unsupported codec {codec}")
        out += zigzag_encode(len(chunk)) + zigzag_encode(len(payload))
        out += payload + sync
    return bytes(out)


def read_header(data: bytes) -> tuple[list[tuple[str, dict]], str, bytes, int]:
    """OCF header -> (field plan, codec, sync marker, body offset).

    Every corrupt-metadata shape (non-UTF-8 key/codec/schema bytes,
    invalid schema JSON) surfaces as AvroError so callers' poison
    catches hold — a file with valid magic but garbage metadata must
    cost one _error row, never a task death."""
    if data[:4] != AVRO_MAGIC:
        raise AvroError("not an Avro object container file")
    mv = memoryview(data)
    try:
        meta, pos = _read_map(mv, 4)
        schema = meta.get("avro.schema")
        if schema is None:
            raise AvroError("missing avro.schema")
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise AvroError(f"unsupported codec {codec}")
        sync = bytes(mv[pos : pos + 16])
        if len(sync) != 16:
            raise AvroError("truncated header sync")
        return parse_schema(schema.decode()), codec, sync, pos + 16
    except AvroError:
        raise
    except (UnicodeDecodeError, ValueError) as e:  # json.JSONDecodeError is a ValueError
        raise AvroError(f"corrupt header metadata: {e}") from e


_MAX_HEADER = 16 << 20  # growth cap: no sane OCF header exceeds 16 MiB


def read_header_from_file(f) -> tuple[list[tuple[str, dict]], str, bytes, int]:
    """Parse the OCF header from an open file, growing the read
    incrementally: real headers routinely exceed 4 KiB (wide record
    schemas, extra metadata keys), so a fixed-size head read would
    reject legitimate files with 'truncated varint'. Starts at 4 KiB
    and doubles on AvroError until the parse succeeds, EOF, or the
    16 MiB cap (a corrupt-but-valid-magic file costs at most ~12
    bounded retries before the original error is re-raised)."""
    f.seek(0)
    data = f.read(4096)
    if data[:4] != AVRO_MAGIC:  # growth can't fix bad magic
        raise AvroError("not an Avro object container file")
    while True:
        try:
            return read_header(data)
        except AvroError:
            if len(data) >= _MAX_HEADER:
                raise
            more = f.read(len(data))
            if not more:
                raise
            data += more


def _iter_blocks(
    data: bytes, plan, codec: str, sync: bytes, pos: int, end: int | None = None
) -> Iterator[tuple[int, list[dict] | None]]:
    """Yield (block_start_offset, rows | None-for-corrupt) for every
    block starting in [pos, end). Resyncs to the next sync marker on
    corruption — one bad block costs its own bytes."""
    mv = memoryview(data)
    stop = len(data) if end is None else end
    while pos < stop:
        start = pos
        try:
            n, p = zigzag_decode(mv, pos)
            blen, p = zigzag_decode(mv, p)
            if n < 0 or blen < 0 or p + blen + 16 > len(data):
                raise AvroError("bad block frame")
            payload = bytes(mv[p : p + blen])
            if bytes(mv[p + blen : p + blen + 16]) != sync:
                raise AvroError("sync mismatch")
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            rows = []
            body = memoryview(payload)
            q = 0
            for _ in range(n):
                rec = {}
                for fname, fplan in plan:
                    rec[fname], q = _read_datum(fplan, body, q)
                rows.append(rec)
            if q != len(body):
                raise AvroError("trailing bytes in block")
            yield start, rows
            pos = p + blen + 16
        except (AvroError, zlib.error, UnicodeDecodeError):
            nxt = data.find(sync, start + 1)
            if nxt < 0:
                yield start, None  # rest of range unreadable
                return
            yield start, None
            pos = nxt + 16


def iter_ocf(data: bytes) -> Iterator[tuple[int, list[dict] | None]]:
    """Whole-file block iterator (header parsed here)."""
    plan, codec, sync, pos = read_header(data)
    yield from _iter_blocks(data, plan, codec, sync, pos)


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def avro_records(
    files_df: DataFrame,
    out_ddl: str,
    file_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """(path, content) frame -> typed rows. `out_ddl` must name the
    schema's fields (plus the implicit lead columns `_path string,
    _block_offset long, _error boolean, _error_kind string` this
    reader prepends — an unreadable block emits ONE row with
    _error=true, a taxonomy kind, and null fields: the observable-
    data-loss marker). Kind stance: header-level failures classify by
    message (bad magic -> bad-container, declared-unknown codec ->
    unsupported-codec, cut inside the header -> truncated);
    BLOCK-level corruption uniformly reports `bad-framing`, including
    a block cut at EOF — the walk cannot distinguish a truncated tail
    from a corrupt member without trusting the very length field that
    failed, so it does not guess. One Arrow stage; bytes stay
    executor-local and never shuffle."""
    import pandas as pd

    from corrie_spark.errors import classify_error

    full_ddl = (
        "_path string, _block_offset long, _error boolean, "
        "_error_kind string, " + out_ddl
    )
    names = [c.strip().split(" ")[0] for c in out_ddl.split(",")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf[file_col], pdf[content_col]):
                data = bytes(content)
                try:
                    blocks = iter_ocf(data)
                    for off, rows in blocks:
                        if rows is None:
                            # block-level corruption: located container,
                            # broken member framing
                            out.append(
                                {
                                    "_path": path,
                                    "_block_offset": off,
                                    "_error": True,
                                    "_error_kind": "bad-framing",
                                }
                            )
                            continue
                        for rec in rows:
                            r = {
                                "_path": path,
                                "_block_offset": off,
                                "_error": False,
                                "_error_kind": None,
                            }
                            r.update(rec)
                            out.append(r)
                except AvroError as e:
                    out.append(
                        {
                            "_path": path,
                            "_block_offset": 0,
                            "_error": True,
                            "_error_kind": classify_error(str(e)),
                        }
                    )
            cols: dict = {
                "_path": [r["_path"] for r in out],
                "_block_offset": pd.array(
                    [r["_block_offset"] for r in out], dtype="Int64"
                ),
                "_error": [r["_error"] for r in out],
                "_error_kind": [r["_error_kind"] for r in out],
            }
            for n in names:
                vals = [r.get(n) for r in out]
                cols[n] = vals
            yield pd.DataFrame(cols, columns=list(cols))

    return files_df.select(file_col, content_col).mapInPandas(run, full_ddl)


def scan_avro_range(path: str, start: int, length: int) -> list[tuple[int, list | None]]:
    """Offset-sharded read: blocks whose START offset lies in
    [start, start+length), resynced to the first sync marker at or
    after `start` (a range not at the body start skips the partial
    block the previous range owns — the classic container-split
    ownership rule), with the straddling final block finished by
    incremental tail reads. Header is re-read from the file head.
    Returns [(block_offset, rows|None)] — None marks a corrupt span,
    same observability stance as the whole-file path."""
    with open(path, "rb") as f:
        plan, codec, sync, body = read_header_from_file(f)
        f.seek(0, io.SEEK_END)
        file_end = f.tell()
        hi = min(start + length, file_end)
        # 16-byte lookback: the sync marker ANNOUNCING a block that
        # starts inside this range may itself straddle the range
        # start (block_start = sync_end; sync bytes live in the
        # previous range). Without it, such blocks belong to no one.
        lo = max(start - 16, body) if start > body else body
        own_from = max(start, body)  # ownership is by block START
        if own_from >= hi:
            return []
        f.seek(lo)
        buf = bytearray(f.read(min(file_end, hi + (1 << 20)) - lo))

        def ensure(abs_end: int) -> bool:
            """Grow the buffer until it covers [lo, abs_end)."""
            need = min(abs_end, file_end) - lo
            while len(buf) < need:
                f.seek(lo + len(buf))
                chunk = f.read(max(need - len(buf), 1 << 20))
                if not chunk:
                    break
                buf.extend(chunk)
            return len(buf) >= abs_end - lo

        if own_from == body:
            pos = 0
        else:
            # first sync whose END (= a block start) lands in
            # [own_from, hi) — bytearray.find is copy-free, bounded
            # to the range window
            end = hi - lo + 16
            i = buf.find(sync, 0, end)
            while i >= 0 and lo + i + 16 < own_from:
                i = buf.find(sync, i + 1, end)
            if i < 0 or lo + i + 16 >= hi:
                return []  # no block starts inside this range
            pos = i + 16

        out: list[tuple[int, list | None]] = []
        while lo + pos < hi:
            block_start = lo + pos
            try:
                ensure(block_start + 32)  # two varints at most
                # decode the frame varints from a small COPY — a live
                # memoryview of `buf` would forbid ensure()'s extend
                frame = bytes(buf[pos : pos + 32])
                n, fp = zigzag_decode(memoryview(frame), 0)
                blen, fp = zigzag_decode(memoryview(frame), fp)
                p = pos + fp
                if n < 0 or blen < 0 or lo + p + blen + 16 > file_end:
                    raise AvroError("bad block frame")
                if not ensure(lo + p + blen + 16):
                    raise AvroError("truncated block")
                if bytes(buf[p + blen : p + blen + 16]) != sync:
                    raise AvroError("sync mismatch")
                payload = bytes(buf[p : p + blen])
                if codec == "deflate":
                    payload = zlib.decompress(payload, wbits=-15)
                rows = []
                bodymv = memoryview(payload)
                q = 0
                for _ in range(n):
                    rec = {}
                    for fname, fplan in plan:
                        rec[fname], q = _read_datum(fplan, bodymv, q)
                    rows.append(rec)
                if q != len(bodymv):
                    raise AvroError("trailing bytes in block")
                out.append((block_start, rows))
                pos = p + blen + 16
            except (AvroError, zlib.error, UnicodeDecodeError):
                out.append((block_start, None))
                ensure(hi + 16)
                # copy-free resync: bytes(buf).find copied the whole
                # range buffer PER corrupt block — O(range_bytes x
                # n_corrupt) memcpy, measured 298 s for one 58 MiB
                # corrupt-heavy range before this probe-driven fix
                # (SCALE.md section 22); bytearray.find scans in place
                nxt = buf.find(sync, pos + 1)
                if nxt < 0 or lo + nxt + 16 >= hi:
                    break
                pos = nxt + 16
        return out


def avro_ranges(
    spark, paths: list[str], range_bytes: int = 128 << 20, out_ddl: str = ""
) -> DataFrame:
    """Distributed offset-sharded OCF scan: (path, start, length)
    tasks fan out over executors; each task seeks its range and
    resyncs (scan_avro_range). The 1-file-1-task ceiling the plain
    binaryFile path has disappears — a 10 GiB OCF becomes ~80
    parallel tasks, per-task memory = range + one block."""
    import os

    import pandas as pd

    tasks = []
    for p in paths:
        size = os.path.getsize(p)
        s = 0
        while s < size:
            tasks.append((p, s, min(range_bytes, size - s)))
            s += range_bytes
    tdf = spark.createDataFrame(tasks, "path string, start long, length long")
    names = [c.strip().split(" ")[0] for c in out_ddl.split(",")]
    full_ddl = (
        "_path string, _block_offset long, _error boolean, "
        "_error_kind string, " + out_ddl
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, start, length in zip(pdf["path"], pdf["start"], pdf["length"]):
                for off, rows in scan_avro_range(str(path), int(start), int(length)):
                    if rows is None:
                        out.append(
                            {
                                "_path": path,
                                "_block_offset": off,
                                "_error": True,
                                "_error_kind": "bad-framing",
                            }
                        )
                        continue
                    for rec in rows:
                        r = {
                            "_path": path,
                            "_block_offset": off,
                            "_error": False,
                            "_error_kind": None,
                        }
                        r.update(rec)
                        out.append(r)
            cols: dict = {
                "_path": [r["_path"] for r in out],
                "_block_offset": pd.array(
                    [r["_block_offset"] for r in out], dtype="Int64"
                ),
                "_error": [r["_error"] for r in out],
                "_error_kind": [r["_error_kind"] for r in out],
            }
            for n in names:
                cols[n] = [r.get(n) for r in out]
            yield pd.DataFrame(cols, columns=list(cols))

    return tdf.repartition(
        max(len(tasks), spark.sparkContext.defaultParallelism)
    ).mapInPandas(run, full_ddl)


# ---------------------------------------------------------------------------
# schema-derived Spark DDL + the file-reading front door (CLI surface)
# ---------------------------------------------------------------------------

_KIND_DDL = {
    "null": "string",  # always-null field
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
    "date": "date",
}


def ddl_for_plan(plan: list[tuple[str, dict]]) -> str:
    """Field plan -> Spark DDL string (unions map to their nullable
    inner type; arrays to array<inner>)."""

    def one(p: dict) -> str:
        k = p["kind"]
        if k == "union":
            return one(p["inner"])
        if k == "array":
            return f"array<{one(p['items'])}>"
        return _KIND_DDL[k]

    return ", ".join(f"{name} {one(p)}" for name, p in plan)


def read_avro(
    spark, path_glob: str, sharded: bool = False, range_bytes: int = 128 << 20
) -> DataFrame:
    """Read OCF files into typed rows, schema DERIVED from the first
    file's own avro.schema header (all files of one ingest share a
    schema — the OCF contract). `sharded=True` fans each file out as
    offset ranges (local/NFS paths; the binaryFile path handles any
    Hadoop-visible store). Rows lead with (_path, _block_offset,
    _error) — see avro_records."""
    import glob as _glob

    paths = sorted(_glob.glob(path_glob))
    if not paths:
        raise AvroError(f"no files match {path_glob!r}")
    with open(paths[0], "rb") as f:
        plan, _, _, _ = read_header_from_file(f)
    ddl = ddl_for_plan(plan)
    if sharded:
        return avro_ranges(spark, paths, range_bytes=range_bytes, out_ddl=ddl)
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return avro_records(files, ddl)
