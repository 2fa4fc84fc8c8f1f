"""Avro OCF source (sources/avro.py): binary-encoding round trips,
both codecs, the offset-sharded range reader's sharded==whole
contract (incl. sync markers straddling range starts), and poison
safety (corrupt blocks cost their own span, observably).
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

from corrie_spark.sources import avro as A

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {"name": "c", "type": ["null", "string"]},
            {"name": "a", "type": {"type": "array", "items": "int"}},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
        ],
    }
)


def _recs(n: int = 200) -> list[dict]:
    return [
        {
            "k": i * 7 - 3,
            "s": f"st-{i % 3} é",
            "d": i * 1.25,
            "day": datetime.date(1970, 1, 1) + datetime.timedelta(days=i * 13 - 5),
            "c": None if i % 5 == 0 else f"c{i}",
            "a": [i, -i, 2**31 - 1][: (i % 4)],
            "b": bytes([i % 256]) * 3,
            "f": i % 2 == 0,
        }
        for i in range(n)
    ]


def test_zigzag_edges():
    for v in (0, -1, 1, 63, -64, 2**62, -(2**63), 2**63 - 1):
        enc = A.zigzag_encode(v)
        dec, pos = A.zigzag_decode(memoryview(enc), 0)
        assert dec == v and pos == len(enc)
    with pytest.raises(A.AvroError):
        A.zigzag_decode(memoryview(b"\x80\x80"), 0)  # truncated


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(codec):
    recs = _recs()
    blob = A.encode_ocf(SCHEMA, recs, codec=codec, name="rt", block_size=17)
    got = [r for _, rows in A.iter_ocf(blob) for r in rows or ()]
    assert got == recs


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_sharded_equals_whole_all_range_sizes(tmp_path, codec):
    recs = _recs()
    blob = A.encode_ocf(SCHEMA, recs, codec=codec, name="sh", block_size=13)
    p = str(tmp_path / "t.avro")
    with open(p, "wb") as f:
        f.write(blob)
    whole = [r for _, rows in A.iter_ocf(blob) for r in rows]
    # tiny ranges force sync markers to straddle range starts
    for rb in (17, 64, 150, 999, 10**9):
        out = []
        s = 0
        while s < len(blob):
            for off, rows in A.scan_avro_range(p, s, rb):
                assert rows is not None, (rb, off)
                out.append((off, rows))
            s += rb
        out.sort()
        offs = [o for o, _ in out]
        assert len(offs) == len(set(offs)), (rb, "block owned twice")
        assert [r for _, rows in out for r in rows] == whole, rb


def test_corrupt_block_costs_its_own_span():
    recs = _recs()
    blob = A.encode_ocf(SCHEMA, recs, codec="deflate", name="px", block_size=13)
    sync = blob[-16:]
    i2 = blob.find(sync, blob.find(sync) + 1)
    bad = bytearray(blob)
    bad[i2 + 20] ^= 0xFF  # corrupt the second block's payload
    res = list(A.iter_ocf(bytes(bad)))
    n_err = sum(1 for _, rows in res if rows is None)
    n_ok = sum(len(rows) for _, rows in res if rows is not None)
    assert n_err == 1 and n_ok == len(recs) - 13
    # not-an-OCF raises at the header, cleanly
    with pytest.raises(A.AvroError):
        A.read_header(b"PAR1whatever")


def test_unsupported_schema_rejected_at_parse():
    for bad in (
        {"type": "record", "name": "X", "fields": [{"name": "m", "type": {"type": "map", "values": "int"}}]},
        {"type": "record", "name": "X", "fields": [{"name": "u", "type": ["int", "string"]}]},
        {"type": "enum", "name": "E", "symbols": ["A"]},
    ):
        with pytest.raises(A.AvroError):
            A.parse_schema(json.dumps(bad))


def test_avro_records_error_rows(spark, tmp_path):
    recs = _recs(40)
    blob = A.encode_ocf(SCHEMA, recs, codec="null", name="sp", block_size=10)
    df = spark.createDataFrame(
        [("good.avro", bytearray(blob)), ("bad.avro", bytearray(b"nope"))],
        "path string, content binary",
    )
    rows = A.avro_records(
        df,
        "k long, s string, d double, day date, c string, "
        "a array<int>, b binary, f boolean",
    )
    got = rows.collect()
    errs = [r for r in got if r._error]
    ok = [r for r in got if not r._error]
    assert len(errs) == 1 and errs[0]._path == "bad.avro"
    assert len(ok) == 40
    by_k = {r.k: r for r in ok}
    assert by_k[-3].c is None and by_k[-3].f is True  # i=0: null comment
    assert by_k[4].c == "c1" and by_k[4].f is False  # i=1
    assert by_k[-3].day == datetime.date(1969, 12, 27)  # i=0: -5 days

def test_header_larger_than_4k(tmp_path):
    """Real OCF headers routinely exceed 4 KiB (wide schemas, extra
    metadata keys); the file-backed readers grow the header read
    incrementally instead of failing on a fixed-size head."""
    recs = _recs(30)
    base = A.encode_ocf(SCHEMA, recs, codec="null", name="big", block_size=10)
    plan, _codec, sync, body = A.read_header(base)
    meta = A._write_map(
        {
            "avro.schema": SCHEMA.encode(),
            "avro.codec": b"null",
            "corp.padding": b"x" * 20_000,
        }
    )
    blob = A.AVRO_MAGIC + meta + sync + base[body:]
    p = str(tmp_path / "big.avro")
    with open(p, "wb") as f:
        f.write(blob)
    with open(p, "rb") as f:
        plan2, codec2, sync2, body2 = A.read_header_from_file(f)
    assert plan2 == plan and sync2 == sync and body2 > 20_000
    assert [r for _, rows in A.iter_ocf(blob) for r in rows] == recs
    out = []
    s = 0
    while s < len(blob):
        out.extend(A.scan_avro_range(p, s, 5000))
        s += 5000
    out.sort()
    assert [r for _, rows in out for r in rows] == recs


def test_corrupt_header_metadata_is_avro_error():
    sync = b"s" * 16
    # garbage-JSON schema: AvroError, never a bare JSONDecodeError
    bad_json = A.AVRO_MAGIC + A._write_map({"avro.schema": b"{not json"}) + sync
    with pytest.raises(A.AvroError):
        A.read_header(bad_json)
    # non-UTF-8 schema bytes: AvroError, never UnicodeDecodeError
    bad_utf8 = A.AVRO_MAGIC + A._write_map({"avro.schema": b"\xff\xfe\x00{"}) + sync
    with pytest.raises(A.AvroError):
        A.read_header(bad_utf8)
    # negative map-entry length: AvroError, never a backwards-cursor
    # infinite loop
    evil = A.AVRO_MAGIC + A.zigzag_encode(1) + A.zigzag_encode(-5) + b"\x00" * 64
    with pytest.raises(A.AvroError):
        A.read_header(evil)


def test_corrupt_metadata_costs_one_error_row(spark):
    """Valid magic + corrupt metadata must degrade to one _error row,
    not a task death (the poison contract of avro_records)."""
    sync = b"s" * 16
    bad = (
        A.AVRO_MAGIC
        + A._write_map({"avro.schema": b"{nope", "avro.codec": b"null"})
        + sync
    )
    df = spark.createDataFrame(
        [("bad.avro", bytearray(bad))], "path string, content binary"
    )
    got = A.avro_records(df, "k long").collect()
    assert len(got) == 1 and got[0]._error


def test_corrupt_heavy_sharded_equals_whole(tmp_path):
    """Corrupt-heavy resync: every 4th block's payload is flipped and
    the sharded reader must (a) agree with the whole-file reader on
    surviving rows AND error spans at every range size, (b) stay
    copy-free in recovery — the pre-fix bytes(buf).find() made this
    shape O(range_bytes x n_corrupt) memcpy (SCALE.md section 22:
    298 s for one 58 MiB range; 0.96 s after)."""
    recs = _recs(400)
    blob = A.encode_ocf(SCHEMA, recs, name="ch", block_size=5)
    _, _, sync, pos = A.read_header(blob)
    bad = bytearray(blob)
    i, off = 0, pos
    while True:
        nxt = blob.find(sync, off + 1)
        if nxt < 0:
            break
        if i % 4 == 0 and nxt - off > 30:
            bad[off + 12] ^= 0xFF
        off, i = nxt + 16, i + 1
    p = str(tmp_path / "ch.avro")
    with open(p, "wb") as f:
        f.write(bytes(bad))
    whole = list(A.iter_ocf(bytes(bad)))
    w_rows = [r for _, rows in whole if rows is not None for r in rows]
    w_errs = sum(1 for _, rows in whole if rows is None)
    assert w_errs >= 15 and len(w_rows) < len(recs)
    for rb in (97, 512, 4096, 10**9):
        out = []
        s = 0
        while s < len(bad):
            out.extend(A.scan_avro_range(p, s, rb))
            s += rb
        out.sort()
        got_rows = [r for _, rows in out if rows is not None for r in rows]
        got_errs = sum(1 for _, rows in out if rows is None)
        assert got_rows == w_rows, rb
        assert got_errs == w_errs, rb
