"""Native-format block encoder: golden bytes for the frame layout,
encode∘decode = identity over the §1.3 type matrix, and the
distributed writer producing decodable block files."""

from __future__ import annotations

import datetime as dt
import decimal
import glob
import io
import struct

import pytest

from corrie_spark.sinks.native_format import (
    decode_block,
    encode_block,
    write_native_blocks,
)


def test_golden_frame_layout():
    raw = encode_block([("a", "UInt8", [7, 9])])
    buf = io.BytesIO(raw)
    # block info: uvarint 1, is_overflows 0, uvarint 2, bucket -1, 0
    assert buf.read(1) == b"\x01"
    assert buf.read(1) == b"\x00"
    assert buf.read(1) == b"\x02"
    assert struct.unpack("<i", buf.read(4))[0] == -1
    assert buf.read(1) == b"\x00"
    assert buf.read(1) == b"\x01"  # n_columns
    assert buf.read(1) == b"\x02"  # n_rows
    assert buf.read(1) == b"\x01" and buf.read(1) == b"a"  # name
    assert buf.read(1) == b"\x05" and buf.read(5) == b"UInt8"  # type
    assert buf.read(2) == b"\x07\x09"  # little-endian bodies
    assert buf.read() == b""


def test_golden_string_and_int64():
    raw = encode_block([("s", "String", ["hi", ""]), ("n", "Int64", [-2, 3])])
    body = raw[raw.index(b"String") + 6 :]
    assert body.startswith(b"\x02hi\x00")  # uvarint len + bytes per row
    tail = body[4:]
    assert tail[: 1 + 1] == b"\x01n"
    assert tail[2 : 2 + 5 + 1] == b"\x05Int64"
    assert struct.unpack("<q", tail[8:16])[0] == -2
    assert struct.unpack("<q", tail[16:24])[0] == 3


def _body_after_type(raw: bytes, tname: str) -> bytes:
    """Column body bytes immediately after the type-name string."""
    return raw[raw.index(tname.encode()) + len(tname) :]


def test_golden_uint64_beyond_int63():
    """UInt64 >= 2^63 must hit the wire as the raw unsigned LE qword
    (block_write_column.go WriteUInt64 -> binary little-endian), not a
    sign-wrapped int64 from a signed pack path."""
    raw = encode_block([("u", "UInt64", [2**64 - 1, 2**63, 0])])
    body = _body_after_type(raw, "UInt64")
    assert body[0:8] == b"\xff" * 8
    assert body[8:16] == b"\x00" * 7 + b"\x80"  # 2^63 little-endian
    assert body[16:24] == b"\x00" * 8


def test_golden_enum16_negative():
    """Enum16 with a negative mapped value: int16 little-endian two's
    complement (column enum16 write path)."""
    raw = encode_block([("e", "Enum16('x'=-7,'y'=300)", ["x", "y"])])
    body = _body_after_type(raw, "Enum16('x'=-7,'y'=300)")
    assert body[0:2] == struct.pack("<h", -7) == b"\xf9\xff"
    assert body[2:4] == struct.pack("<h", 300) == b"\x2c\x01"


def test_golden_ipv4_little_endian_uint32():
    """IPv4 is stored as a little-endian uint32 of the address value:
    1.2.3.4 = 0x01020304 -> bytes 04 03 02 01."""
    raw = encode_block([("ip", "IPv4", ["1.2.3.4", "255.255.255.255"])])
    body = _body_after_type(raw, "IPv4")
    assert body[0:4] == b"\x04\x03\x02\x01"
    assert body[4:8] == b"\xff\xff\xff\xff"


def test_golden_ipv6_network_order_and_mapped_ipv4():
    """IPv6 is the 16 network-order bytes; an IPv4-mapped address
    (::ffff:1.2.3.4) keeps the ::ffff: prefix layout the reference's
    IP.MarshalBinary produces for 4-byte inputs (ip.go:28-45:
    right-aligned, bytes 10-11 = 0xff)."""
    raw = encode_block([("ip", "IPv6", ["2001:db8::1", "::ffff:1.2.3.4"])])
    body = _body_after_type(raw, "IPv6")
    assert body[0:16] == bytes.fromhex("20010db8000000000000000000000001")
    mapped = body[16:32]
    assert mapped[:10] == b"\x00" * 10
    assert mapped[10:12] == b"\xff\xff"
    assert mapped[12:16] == b"\x01\x02\x03\x04"


def test_golden_array_nullable_masks():
    """Array(Nullable(T)) layout (ClickHouse disallows
    Nullable(Array), and chtypes refuses it like the driver's
    factory): per-row cumulative uint64 offsets first, then the
    FLATTENED Nullable body — all mask bytes, then the values with
    zero-defaults in null slots. Mask precedes values, never
    interleaved."""
    raw = encode_block([("a", "Array(Nullable(Int32))", [[1, None], [3]])])
    body = _body_after_type(raw, "Array(Nullable(Int32))")
    offs = struct.unpack("<2Q", body[0:16])
    assert offs == (2, 3)
    assert body[16:19] == b"\x00\x01\x00"  # flat mask: element 1 null
    flat = struct.unpack("<3i", body[19 : 19 + 12])
    assert flat == (1, 0, 3)  # zero default in the null slot


def test_nullable_array_is_rejected_like_the_driver():
    from corrie_spark.chtypes import UnsupportedTypeError, parse_ch_type

    with pytest.raises(UnsupportedTypeError):
        parse_ch_type("Nullable(Array(Int32))")


MATRIX = [
    ("Int8", [-128, 0, 127]),
    ("Int16", [-32768, 1, 32767]),
    ("Int32", [-(2**31), 2, 2**31 - 1]),
    ("Int64", [-(2**63), 3, 2**63 - 1]),
    ("UInt8", [0, 255, 7]),
    ("UInt16", [0, 65535, 9]),
    ("UInt32", [0, 2**32 - 1, 11]),
    ("UInt64", [0, 2**64 - 1, 13]),
    ("Float32", [0.0, 0.5, -2.25]),
    ("Float64", [0.0, 1e300, -0.125]),
    ("String", ["", "héllo", "a" * 300]),
    # last value ends in a REAL \x00: decode must return the raw
    # padded bytes, not rstrip (padding is indistinguishable from data)
    ("FixedString(4)", ["ab", "abcd", "", "a\x00"]),
    ("Date", [dt.date(1970, 1, 1), dt.date(2026, 8, 13), dt.date(1999, 12, 31)]),
    (
        "DateTime",
        [
            dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc),
            dt.datetime(2026, 8, 13, 12, 30, 1, tzinfo=dt.timezone.utc),
            dt.datetime(2001, 2, 3, 4, 5, 6, tzinfo=dt.timezone.utc),
        ],
    ),
    ("Enum8('A'=1,'N'=2,'R'=3)", ["A", "R", "N"]),
    ("Enum16('x'=-7,'y'=300)", ["y", "x", "y"]),
    (
        "UUID",
        [
            "00000000-0000-0000-0000-000000000000",
            "123e4567-e89b-12d3-a456-426614174000",
            "ffffffff-ffff-ffff-ffff-ffffffffffff",
        ],
    ),
    ("Decimal(9,2)", [decimal.Decimal("1.25"), decimal.Decimal("-3.10"), decimal.Decimal("0.00")]),
    ("Decimal(18,6)", [decimal.Decimal("123456.654321"), decimal.Decimal("-1.000001"), decimal.Decimal("0.000000")]),
    ("IPv4", ["0.0.0.0", "192.168.1.255", "255.255.255.255"]),
    ("IPv6", ["::", "2001:db8::1", "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"]),
    ("Nullable(IPv4)", ["10.0.0.1", None, "127.0.0.1"]),
    ("Nullable(Int32)", [1, None, -5]),
    ("Nullable(String)", [None, "x", None]),
    ("Nullable(DateTime)", [None, dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc), None]),
    ("Array(Int64)", [[1, 2, 3], [], [-9]]),
    ("Array(String)", [["a", "b"], [""], []]),
    ("Array(Nullable(Int32))", [[1, None], [], [None]]),
    ("Map(String, Int64)", [{"a": 1, "b": 2}, {}, {"z": -1}]),
    ("Map(Int32, String)", [{1: "x"}, {2: "y", 3: "z"}, {}]),
    ("Tuple(Int64, String)", [(1, "a"), (2, "b"), (-3, "")]),
    ("Tuple(String, Nullable(Int32), Array(Int64))", [("a", 1, [1]), ("b", None, []), ("", 0, [2, 3])]),
]


@pytest.mark.parametrize("ch_type,values", MATRIX, ids=[t for t, _ in MATRIX])
def test_roundtrip_type_matrix(ch_type, values):
    raw = encode_block([("c", ch_type, values)])
    [(name, tname, got)] = decode_block(raw)
    assert name == "c"
    if ch_type == "Date":
        assert got == values
    elif ch_type.startswith("FixedString"):
        n = int(ch_type[len("FixedString("):-1])
        assert got == [
            (v.encode() if isinstance(v, str) else bytes(v)).ljust(n, b"\x00")
            for v in values
        ]
    elif ch_type.startswith("DateTime") or ch_type == "Nullable(DateTime)":
        assert [None if v is None else v.timestamp() for v in values] == [
            None if g is None else g.timestamp() for g in got
        ]
    elif ch_type.startswith("Float32"):
        assert got == pytest.approx(values)
    else:
        assert got == values


def test_multi_column_block_roundtrip():
    cols = [
        ("id", "Int64", [1, 2, 3]),
        ("name", "String", ["a", "b", "c"]),
        ("score", "Nullable(Float64)", [0.5, None, 2.0]),
        ("tags", "Array(String)", [["x"], [], ["y", "z"]]),
    ]
    out = decode_block(encode_block(cols))
    assert [(n, t) for n, t, _ in out] == [
        ("id", "Int64"),
        ("name", "String"),
        ("score", "Nullable(Float64)"),
        ("tags", "Array(String)"),
    ]
    assert [v for _, _, v in out] == [c[2] for c in cols]


def test_ragged_block_rejected():
    with pytest.raises(ValueError):
        encode_block([("a", "Int64", [1, 2]), ("b", "Int64", [1])])


def test_fixed_string_overflow_rejected():
    with pytest.raises(ValueError):
        encode_block([("f", "FixedString(2)", ["abc"])])


def test_decimal128_rejected_not_corrupted():
    """Decimal(p>18) needs int128 on the wire; silently writing 8
    bytes would corrupt the block, so the encoder must refuse."""
    from corrie_spark.chtypes import UnsupportedTypeError

    with pytest.raises(UnsupportedTypeError):
        encode_block([("d", "Decimal(38,10)", [decimal.Decimal("1.5")])])


def test_write_native_blocks_distributed(spark, tmp_path):
    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id",
        "CAST(id AS STRING) AS name",
        "CAST(id % 5 AS INT) AS grp",
    )
    out = str(tmp_path / "blocks")
    write_native_blocks(
        df,
        [("id", "Int64"), ("name", "String"), ("grp", "Nullable(Int32)")],
        out,
        block_rows=100,
    )
    files = sorted(glob.glob(out + "/*.native"))
    # 4 partitions x 250 rows @ 100-row blocks -> 3 files per partition
    assert len(files) == 12
    rows = []
    for f in files:
        cols = decode_block(open(f, "rb").read())
        assert cols[0][1] == "Int64" and len(cols) == 3
        rows.extend(zip(*[v for _, _, v in cols]))
    assert len(rows) == 1000
    assert sorted(r[0] for r in rows) == list(range(1000))
    assert all(r[1] == str(r[0]) and r[2] == r[0] % 5 for r in rows)


# --- property-based roundtrip (hypothesis) ---------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _scalar_cases = st.sampled_from(
        [
            ("Int64", st.integers(-(2**63), 2**63 - 1)),
            ("Int32", st.integers(-(2**31), 2**31 - 1)),
            ("UInt64", st.integers(0, 2**64 - 1)),
            ("Float64", st.floats(allow_nan=False, width=64)),
            ("String", st.text(max_size=50)),
            (
                "Date",
                st.dates(dt.date(1970, 1, 1), dt.date(2100, 1, 1)),
            ),
        ]
    )

    @settings(max_examples=60, deadline=None)
    @given(case=_scalar_cases, data=st.data())
    def test_property_roundtrip_scalars(case, data):
        ch_type, strat = case
        values = data.draw(st.lists(strat, min_size=0, max_size=25))
        [(_, _, got)] = decode_block(encode_block([("c", ch_type, values)]))
        assert got == values

    @settings(max_examples=40, deadline=None)
    @given(
        values=st.lists(
            st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
            max_size=25,
        )
    )
    def test_property_roundtrip_nullable(values):
        [(_, _, got)] = decode_block(
            encode_block([("c", "Nullable(Int32)", values)])
        )
        assert got == values

    @settings(max_examples=40, deadline=None)
    @given(
        values=st.lists(
            st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8), max_size=15
        )
    )
    def test_property_roundtrip_arrays(values):
        [(_, _, got)] = decode_block(encode_block([("c", "Array(Int64)", values)]))
        assert got == values
