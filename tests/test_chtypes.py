"""Unit tests: ClickHouse type matrix (SURVEY §1.3, FIXTURES.md F2):
parser coverage, edge-row coercion (int bounds, uint64 >= 2^63,
FixedString pad/overflow, Enum idents, UUID/IP formats, Nullable,
Array offsets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corrie_spark import chtypes


# --- parser ---------------------------------------------------------------

@pytest.mark.parametrize(
    "ch,ddl",
    [
        ("Int8", "tinyint"),
        ("Int64", "bigint"),
        ("UInt8", "smallint"),
        ("UInt32", "bigint"),
        ("UInt64", "decimal(20,0)"),
        ("Float32", "float"),
        ("String", "string"),
        ("Date", "date"),
        ("DateTime", "timestamp"),
        ("DateTime('Europe/Moscow')", "timestamp"),
        ("UUID", "string"),
        ("IPv4", "string"),
        ("Array(Int64)", "array<bigint>"),
        ("Array(Nullable(String))", "array<string>"),
        ("Nullable(Int32)", "int"),
        ("FixedString(8)", "binary"),
        ("Enum8('a'=1,'b'=2)", "string"),
        ("Decimal(20,4)", "decimal(20,4)"),
    ],
)
def test_parse(ch, ddl):
    assert chtypes.parse_ch_type(ch).spark_ddl == ddl


def test_parse_nullable_flag_and_enum_map():
    t = chtypes.parse_ch_type("Nullable(Int32)")
    assert t.nullable
    e = chtypes.parse_ch_type("Enum16('x y'=10,'z'=-3)")
    assert e.enum_map == {"x y": 10, "z": -3}


@pytest.mark.parametrize("bad", ["Nullable(Array(Int8))", "Frob", "Map(String)", "Tuple()"])
def test_parse_unsupported(bad):
    with pytest.raises(chtypes.UnsupportedTypeError):
        chtypes.parse_ch_type(bad)


# --- coercion -------------------------------------------------------------

def _coerce(spark, values: list[str | None], ch_type: str):
    t = chtypes.parse_ch_type(ch_type)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    val, ok = chtypes.coerce(F.col("v"), t)
    return [(r["val"], r["ok"]) for r in df.select(val.alias("val"), ok.alias("ok")).collect()]


def test_int_bounds(spark):
    got = _coerce(spark, ["127", "-128", "128", "-129", "abc", None], "Int8")
    assert [(v, o) for v, o in got] == [
        (127, True), (-128, True), (None, False), (None, False), (None, False), (None, False),
    ]


def test_uint_range(spark):
    got = _coerce(spark, ["0", "255", "256", "-1"], "UInt8")
    assert [o for _, o in got] == [True, True, False, False]


def test_uint64_above_2_63(spark):
    from decimal import Decimal

    got = _coerce(spark, ["18446744073709551615", "9223372036854775808", "-1"], "UInt64")
    assert got[0] == (Decimal(2**64 - 1), True)
    assert got[1] == (Decimal(2**63), True)
    assert got[2][1] is False


def test_fixed_string_pad_and_overflow(spark):
    got = _coerce(spark, ["abc", "12345678", "123456789"], "FixedString(8)")
    assert got[0] == (bytearray(b"abc\x00\x00\x00\x00\x00"), True)
    assert got[1] == (bytearray(b"12345678"), True)
    assert got[2][1] is False  # longer than N is an error (fixed_string.go:44-51)


def test_enum_name_and_code(spark):
    got = _coerce(spark, ["a", "b", "1", "2", "zzz", "9"], "Enum8('a'=1,'b'=2)")
    assert got == [("a", True), ("b", True), ("a", True), ("b", True), (None, False), (None, False)]


def test_datetime_formats(spark):
    got = _coerce(spark, ["2006-01-02", "2006-01-02 15:04:05", "0", "2038-01-19 03:14:08", "nope"], "DateTime")
    assert [o for _, o in got] == [True, True, True, True, False]
    assert got[1][0].isoformat().startswith("2006-01-02T15:04:05")


def test_uuid_and_ip(spark):
    got = _coerce(spark, ["123E4567-e89b-12d3-a456-426614174000", "not-a-uuid"], "UUID")
    assert got[0] == ("123e4567-e89b-12d3-a456-426614174000", True)
    assert got[1][1] is False
    ip4 = _coerce(spark, ["1.2.3.4", "255.255.255.255", "256.1.1.1", "x"], "IPv4")
    assert [o for _, o in ip4] == [True, True, False, False]
    ip6 = _coerce(spark, ["::1", "2001:db8::ff00:42:8329", "1.2.3.4", "zz"], "IPv6")
    assert [o for _, o in ip6] == [True, True, True, False]


def test_bool_to_wire(spark):
    got = _coerce(spark, ["true", "1", "false", "0", "maybe"], "Bool")
    assert got == [(True, True), (True, True), (False, True), (False, True), (None, False)]
    df = spark.createDataFrame([(True,), (False,)], "b boolean")
    wire = [r[0] for r in df.select(chtypes.bool_to_wire(F.col("b"))).collect()]
    assert wire == [1, 0]  # UInt8 on the wire (clickhouse.go:190-195)


def test_nullable_accepts_null(spark):
    got = _coerce(spark, [None, "5", "x"], "Nullable(Int32)")
    assert got == [(None, True), (5, True), (None, False)]


def test_array_offsets_model(spark):
    # envelope arrays arrive as JSON array strings (array.go:29-51 model)
    got = _coerce(spark, ['["1","2","3"]', "[]", '["1","x"]', "notjson"], "Array(Int64)")
    assert got[0] == ([1, 2, 3], True)
    assert got[1] == ([], True)
    assert got[2][1] is False  # bad element -> invalid
    assert got[3][1] is False


def test_array_element_validity_uses_coercer(spark):
    """Element validity comes from the element coercer's `valid` flag,
    not value non-nullness (array.go recursion): catches range/format
    errors whose coerced value is non-null, and null elements inside
    non-Nullable element types."""
    # UInt8 range error: "-5"/"256" try_cast to non-null but are invalid
    got = _coerce(spark, ['["1","-5"]', '["255","256"]', '["0","255"]'], "Array(UInt8)")
    assert [o for _, o in got] == [False, False, True]
    # FixedString overflow coerces to a non-null value but is invalid
    got = _coerce(spark, ['["abc","123456789"]'], "Array(FixedString(8))")
    assert got[0][1] is False
    # malformed UUID / IPv4 pass through as non-null strings
    got = _coerce(spark, ['["not-a-uuid"]'], "Array(UUID)")
    assert got[0][1] is False
    got = _coerce(spark, ['["256.1.1.1"]'], "Array(IPv4)")
    assert got[0][1] is False
    # null element: invalid inside Array(T) (CH arrays hold no NULLs),
    # valid inside Array(Nullable(T))
    got = _coerce(spark, ['[null,"1"]'], "Array(Int64)")
    assert got[0][1] is False
    got = _coerce(spark, ['[null,"1"]'], "Array(Nullable(Int64))")
    assert got[0] == ([None, 1], True)


def test_map_value_validity_uses_coercer(spark):
    """Same recursion for Map values: a range-invalid value whose
    coerced form is non-null must invalidate the row."""
    got = _coerce(spark, ['{"a":"300"}', '{"a":"200"}'], "Map(String, UInt8)")
    assert [o for _, o in got] == [False, True]


def test_map_type_parse_and_coerce(spark):
    """Beyond-parity Map(K,V) (reference rejects Map, column.go:141):
    JSON-object envelope values coerce to map<k,v>; a value failing
    the inner coercion or malformed JSON invalidates the row."""
    from pyspark.sql import functions as F

    from corrie_spark.chtypes import coerce, parse_ch_type

    t = parse_ch_type("Map(String, Int64)")
    assert t.spark_ddl == "map<string,bigint>"
    df = spark.createDataFrame(
        [('{"a":"1","b":"2"}',), ('{"a":"x"}',), (None,), ("not json",)], "c string"
    )
    v, ok = coerce(F.col("c"), t)
    rows = df.select(v.alias("v"), ok.alias("ok")).collect()
    assert rows[0].ok and rows[0].v == {"a": 1, "b": 2}
    assert not rows[1].ok and not rows[2].ok and not rows[3].ok

    nested = parse_ch_type("Map(String, Array(Int32))")
    assert nested.spark_ddl == "map<string,array<int>>"


def test_tuple_type_parse_and_coerce(spark):
    """Beyond-parity Tuple(...) (reference rejects Tuple): JSON-array
    envelope values coerce positionally to struct<_1,...>; wrong arity
    or a failing element invalidates the row."""
    from pyspark.sql import functions as F

    from corrie_spark.chtypes import coerce, parse_ch_type

    t = parse_ch_type("Tuple(Int64, String, Float64)")
    assert t.spark_ddl == "struct<_1:bigint,_2:string,_3:double>"
    df = spark.createDataFrame(
        [('["1","a","2.5"]',), ('["x","a","2.5"]',), ('["1","a"]',), (None,)],
        "c string",
    )
    v, ok = coerce(F.col("c"), t)
    rows = df.select(v.alias("v"), ok.alias("ok")).collect()
    assert rows[0].ok and rows[0].v.asDict() == {"_1": 1, "_2": "a", "_3": 2.5}
    assert not any(r.ok for r in rows[1:])
    nested = parse_ch_type("Tuple(Array(Int32), Map(String, Int64))")
    assert nested.spark_ddl == "struct<_1:array<int>,_2:map<string,bigint>>"


def test_datetime_column_timezone(spark):
    """DateTime('tz') applies the column/server timezone to TEXT input
    (reinterpret wall-clock in tz -> UTC instant) and on read
    (datetime.go:21); epoch-seconds input is already absolute and must
    NOT be shifted."""
    t = chtypes.parse_ch_type("DateTime('Asia/Tokyo')")
    assert t.tz == "Asia/Tokyo"
    got = _coerce(spark, ["2026-01-15 09:00:00", "3600", "nope"], "DateTime('Asia/Tokyo')")
    # 09:00 Tokyo == 00:00 UTC (UTC session renders the instant directly)
    assert got[0][1] is True and got[0][0].isoformat().startswith("2026-01-15T00:00:00")
    # epoch seconds: absolute instant, no tz shift
    assert got[1][1] is True and got[1][0].isoformat().startswith("1970-01-01T01:00:00")
    assert got[2][1] is False

    # read-side: render the stored instant back in the column tz
    df = spark.createDataFrame([("2026-01-15 09:00:00",)], "v string")
    val, _ok = chtypes.coerce(F.col("v"), t)
    back = df.select(chtypes.datetime_in_column_tz(val, t).alias("w")).first()["w"]
    assert back.isoformat().startswith("2026-01-15T09:00:00")

    # tz-less DateTime unchanged (session tz = UTC)
    plain = _coerce(spark, ["2026-01-15 09:00:00"], "DateTime")
    assert plain[0][0].isoformat().startswith("2026-01-15T09:00:00")
