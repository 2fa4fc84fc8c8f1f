"""ClickHouse type-string parser -> Spark types + coercion expressions.

Re-implements the type surface the reference's vendored driver parses
from server metadata (lib/column/column.go:21-142; SURVEY §1.3) as a
pure mapping module. At the sink edge each incoming string value (the
envelope's Data slots) is coerced to the Spark type equivalent to the
ClickHouse column type, with the same validation semantics:

  - unsigned ints widen (no unsigned in Spark); UInt64 -> DECIMAL(20,0)
    so values >= 2^63 survive (value_converter.go:48-53)
  - FixedString(N) errors when longer than N, zero-pads when shorter
    (fixed_string.go:44-51) — here: validity flag + rpad
  - Enum8/16 accepts the symbolic name or the numeric code, rejects
    unknown idents (enum.go:39-75)
  - UUID is the canonical 36-char form (uuid.go:21-39)
  - IPv4/IPv6 validated textually (ip.go:28-45)
  - Bool -> UInt8 0/1 on the wire (clickhouse.go:190-195)
  - Array(T) / Nullable(T) recurse (array.go:103-149, nullable.go)

Types the reference rejects (column.go:141: Decimal, Map, Tuple,
nested non-scalar arrays) ARE supported here — they are native Spark
types and cost nothing (SURVEY §1.3 engine decision).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# parse: ClickHouse type string -> CHType
# ---------------------------------------------------------------------------

_SIMPLE_TO_SPARK = {
    "Int8": "tinyint",
    "Int16": "smallint",
    "Int32": "int",
    "Int64": "bigint",
    # unsigned widening per SURVEY §1.3
    "UInt8": "smallint",
    "UInt16": "int",
    "UInt32": "bigint",
    "UInt64": "decimal(20,0)",
    "Float32": "float",
    "Float64": "double",
    "String": "string",
    "Date": "date",
    "DateTime": "timestamp",
    "UUID": "string",
    "IPv4": "string",
    "IPv6": "string",
    "Bool": "boolean",
}

_UNSIGNED_RANGE = {"UInt8": 255, "UInt16": 65535, "UInt32": 4294967295}
_SIGNED_RANGE = {
    "Int8": (-128, 127),
    "Int16": (-32768, 32767),
    "Int32": (-2147483648, 2147483647),
    "Int64": (-(2**63), 2**63 - 1),
}


@dataclass(frozen=True)
class CHType:
    """A parsed ClickHouse type. `spark_ddl` is the Spark SQL DDL type."""

    name: str  # normalized CH name, e.g. "Nullable(Int32)"
    base: str  # head symbol, e.g. "Nullable", "Array", "Int32", "Enum8"
    spark_ddl: str
    nullable: bool = False
    fixed_len: int | None = None
    enum_map: dict[str, int] = field(default_factory=dict, hash=False)
    element: "CHType | None" = None
    key: "CHType | None" = None  # Map key type
    elements: "tuple[CHType, ...] | None" = None  # Tuple member types
    tz: str | None = None  # DateTime('tz') column/server timezone


class UnsupportedTypeError(ValueError):
    """Raised for type strings the engine cannot map (parity with the
    driver's fmt.Errorf at column.go:141)."""


_ENUM_RE = re.compile(r"^Enum(8|16)\s*\((.*)\)$", re.S)
_ENUM_ITEM_RE = re.compile(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)")
_FIXED_RE = re.compile(r"^FixedString\s*\((\d+)\)$")
_DECIMAL_RE = re.compile(r"^Decimal\s*\((\d+)\s*,\s*(\d+)\)$")
_ARRAY_RE = re.compile(r"^Array\s*\((.*)\)$", re.S)
_MAP_RE = re.compile(r"^Map\s*\((.*)\)$", re.S)
_TUPLE_RE = re.compile(r"^Tuple\s*\((.*)\)$", re.S)
_NULLABLE_RE = re.compile(r"^Nullable\s*\((.*)\)$", re.S)
_DT_TZ_RE = re.compile(r"^DateTime\s*\(\s*'([^']*)'\s*\)$")


def parse_ch_type(s: str) -> CHType:
    """Parse a ClickHouse type string (the driver's factory switch,
    column.go:21-142, extended with Decimal/Map per engine decision)."""
    s = s.strip()
    if s in _SIMPLE_TO_SPARK:
        return CHType(name=s, base=s, spark_ddl=_SIMPLE_TO_SPARK[s])
    m = _DT_TZ_RE.match(s)
    if m:
        return CHType(name=s, base="DateTime", spark_ddl="timestamp", tz=m.group(1))
    m = _NULLABLE_RE.match(s)
    if m:
        inner = parse_ch_type(m.group(1))
        if inner.base in ("Nullable", "Array"):
            # driver: Nullable(Array) / Nullable(Nullable) unsupported
            raise UnsupportedTypeError(f"Nullable({inner.base}(...)) not supported")
        return CHType(
            name=f"Nullable({inner.name})",
            base="Nullable",
            spark_ddl=inner.spark_ddl,
            nullable=True,
            fixed_len=inner.fixed_len,
            enum_map=inner.enum_map,
            element=inner,
        )
    m = _ARRAY_RE.match(s)
    if m:
        inner = parse_ch_type(m.group(1))
        return CHType(
            name=f"Array({inner.name})",
            base="Array",
            spark_ddl=f"array<{inner.spark_ddl}>",
            element=inner,
        )
    m = _FIXED_RE.match(s)
    if m:
        n = int(m.group(1))
        return CHType(name=f"FixedString({n})", base="FixedString", spark_ddl="binary", fixed_len=n)
    m = _ENUM_RE.match(s)
    if m:
        width, body = m.groups()
        mapping = {k.replace("\\'", "'"): int(v) for k, v in _ENUM_ITEM_RE.findall(body)}
        if not mapping:
            raise UnsupportedTypeError(f"empty enum: {s}")
        return CHType(
            name=f"Enum{width}({body.strip()})",
            base=f"Enum{width}",
            spark_ddl="string",
            enum_map=mapping,
        )
    m = _DECIMAL_RE.match(s)
    if m:
        p, sc = int(m.group(1)), int(m.group(2))
        return CHType(name=f"Decimal({p},{sc})", base="Decimal", spark_ddl=f"decimal({p},{sc})")
    m = _MAP_RE.match(s)
    if m:
        parts = _split_top_level(m.group(1))
        if len(parts) != 2:
            raise UnsupportedTypeError(f"malformed Map type: {s!r}")
        kt = parse_ch_type(parts[0])
        vt = parse_ch_type(parts[1])
        return CHType(
            name=f"Map({kt.name}, {vt.name})",
            base="Map",
            spark_ddl=f"map<{kt.spark_ddl},{vt.spark_ddl}>",
            element=vt,
            key=kt,
        )
    m = _TUPLE_RE.match(s)
    if m:
        parts = _split_top_level(m.group(1))
        if not parts:
            raise UnsupportedTypeError(f"empty Tuple: {s!r}")
        ts = tuple(parse_ch_type(p) for p in parts)
        ddl = ",".join(f"_{i + 1}:{t.spark_ddl}" for i, t in enumerate(ts))
        return CHType(
            name=f"Tuple({', '.join(t.name for t in ts)})",
            base="Tuple",
            spark_ddl=f"struct<{ddl}>",
            elements=ts,
        )
    raise UnsupportedTypeError(f"unsupported ClickHouse type: {s!r}")


def _split_top_level(body: str) -> list[str]:
    """Split on commas outside parentheses (nested type args)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i].strip())
            start = i + 1
    tail = body[start:].strip()
    if tail:
        parts.append(tail)
    return parts


# ---------------------------------------------------------------------------
# coerce: string Column -> (value Column, valid Column)
# ---------------------------------------------------------------------------

_UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)
_IPV4_RE = r"^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"
_IPV6_RE = r"^[0-9a-fA-F:]+(:[0-9]{1,3}(\.[0-9]{1,3}){3})?$"


def coerce(c: Column, t: CHType) -> tuple[Column, Column]:
    """Build (value, valid) expressions coercing a STRING column to `t`.

    `valid` is false where the reference driver would return a write
    error for the value (type mismatch, enum ident unknown, fixed
    string overflow, unsigned out of range). NULL input is valid only
    for Nullable types (nullable.go:28-64).
    """
    if t.base == "Nullable":
        assert t.element is not None
        v, ok = coerce(c, t.element)
        return F.when(c.isNull(), F.lit(None).cast(t.element.spark_ddl)).otherwise(v), (
            c.isNull() | ok
        )

    not_null = c.isNotNull()

    if t.base in _SIGNED_RANGE:
        lo, hi = _SIGNED_RANGE[t.base]
        as_big = c.try_cast("bigint")
        in_range = as_big.isNotNull() & (as_big >= lo) & (as_big <= hi)
        # try_cast on the value too: ANSI mode would raise CAST_OVERFLOW
        # on out-of-range rows even though `valid` is false for them
        return as_big.try_cast(t.spark_ddl), not_null & in_range
    if t.base in _UNSIGNED_RANGE:
        hi = _UNSIGNED_RANGE[t.base]
        as_big = c.try_cast("bigint")
        in_range = as_big.isNotNull() & (as_big >= 0) & (as_big <= hi)
        return as_big.try_cast(t.spark_ddl), not_null & in_range
    if t.base == "UInt64":
        as_dec = c.try_cast("decimal(20,0)")
        ok = as_dec.isNotNull() & (as_dec >= 0) & (as_dec <= F.lit(str(2**64 - 1)).cast("decimal(20,0)"))
        return as_dec, not_null & ok
    if t.base in ("Float32", "Float64"):
        v = c.try_cast(t.spark_ddl)
        return v, not_null & v.isNotNull()
    if t.base == "String":
        return c, not_null
    if t.base == "FixedString":
        n = t.fixed_len or 0
        raw = c.cast("binary")
        blen = F.octet_length(raw)
        # zero-pad shorter values; longer is an error (fixed_string.go:44-51)
        pad = F.unhex(F.repeat(F.lit("00"), F.greatest(F.lit(0), F.lit(n) - blen)))
        return F.concat(raw, pad), not_null & (blen <= n)
    if t.base == "Date":
        v = c.try_cast("date")
        return v, not_null & v.isNotNull()
    if t.base == "DateTime":
        # driver accepts '2006-01-02' and '2006-01-02 15:04:05'
        # (datetime.go:41-68) plus epoch seconds. A bare integer is
        # ALWAYS epoch seconds (never a year): absolute instant. A
        # DateTime('tz') column applies the column/server timezone to
        # TEXT forms only (datetime.go:21 reads through the server
        # TZ): the wall-clock string is reinterpreted in t.tz and
        # stored as the UTC instant.
        is_epoch = c.rlike(r"^[+-]?[0-9]+$")
        txt = F.when(~is_epoch, c).otherwise(F.lit(None)).try_cast("timestamp")
        if t.tz:
            txt = F.to_utc_timestamp(txt, t.tz)
        v = F.coalesce(txt, c.try_cast("bigint").cast("timestamp"))
        return v, not_null & v.isNotNull()
    if t.base in ("Enum8", "Enum16"):
        mapping = F.create_map(
            *[F.lit(x) for kv in t.enum_map.items() for x in kv]
        )
        rev = {v: k for k, v in t.enum_map.items()}
        rev_mapping = F.create_map(*[F.lit(x) for kv in rev.items() for x in kv])
        as_int = c.try_cast("int")
        # accept name (must be known) or numeric code (must be known)
        by_name_ok = mapping[c].isNotNull()
        by_code = rev_mapping[as_int]
        value = F.when(by_name_ok, c).otherwise(by_code)
        return value, not_null & (by_name_ok | by_code.isNotNull())
    if t.base == "UUID":
        ok = c.rlike(_UUID_RE)
        return F.lower(c), not_null & ok
    if t.base == "IPv4":
        return c, not_null & c.rlike(_IPV4_RE)
    if t.base == "IPv6":
        return c, not_null & (c.rlike(_IPV4_RE) | c.rlike(_IPV6_RE))
    if t.base == "Bool":
        lowered = F.lower(c)
        v = (
            F.when(lowered.isin("true", "1"), F.lit(True))
            .when(lowered.isin("false", "0"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
        return v, not_null & v.isNotNull()
    if t.base == "Decimal":
        v = c.try_cast(t.spark_ddl)
        return v, not_null & v.isNotNull()
    if t.base == "Array":
        assert t.element is not None
        # envelope arrays arrive as JSON array strings; parse then cast
        parsed = F.from_json(c, "array<string>")
        elem_t = t.element
        val = F.transform(parsed, lambda x: coerce(x, elem_t)[0])
        # per-element validity via the element coercer itself (array.go
        # recursion): catches range/format errors whose coerced value is
        # non-null, and rejects null elements unless elem_t is Nullable
        ok_all = F.forall(
            F.transform(parsed, lambda x: coerce(x, elem_t)[1]),
            lambda b: b,
        )
        return val, not_null & parsed.isNotNull() & ok_all
    if t.base == "Map":
        # beyond-parity (reference rejects Map, column.go:141): envelope
        # maps arrive as JSON object strings; parse string->string then
        # coerce the values (JSON object keys are strings already)
        assert t.element is not None and t.key is not None
        parsed = F.from_json(c, "map<string,string>")
        elem_t = t.element
        val = F.transform_values(parsed, lambda _k, v: coerce(v, elem_t)[0])
        ok_vals = F.forall(
            F.transform(F.map_values(parsed), lambda v: coerce(v, elem_t)[1]),
            lambda b: b,
        )
        key_t = t.key
        keys_ok = F.forall(
            F.transform(F.map_keys(parsed), lambda k: coerce(k, key_t)[1]),
            lambda b: b,
        )
        return val, not_null & parsed.isNotNull() & ok_vals & keys_ok
    if t.base == "Tuple":
        # beyond-parity (reference rejects Tuple): envelope tuples
        # arrive as JSON array strings; positional coercion, exact
        # arity (same contract as the row-level Data array)
        assert t.elements is not None
        parsed = F.from_json(c, "array<string>")
        vs, oks = [], []
        for i, et in enumerate(t.elements):
            v_i, ok_i = coerce(F.try_element_at(parsed, F.lit(i + 1)), et)
            vs.append(v_i.alias(f"_{i + 1}"))
            oks.append(ok_i)
        valid = not_null & parsed.isNotNull() & (F.size(parsed) == len(t.elements))
        for ok_i in oks:
            valid = valid & ok_i
        return F.struct(*vs), valid
    raise UnsupportedTypeError(f"no coercion for {t.name}")


def datetime_in_column_tz(c: Column, t: CHType) -> Column:
    """Read-side twin of the DateTime('tz') coercion: render a stored
    UTC instant as wall-clock in the column/server timezone — the
    reference driver applies the server TZ on every read
    (lib/column/datetime.go:21). No-op for tz-less DateTime (UTC
    sessions everywhere in this engine)."""
    return F.from_utc_timestamp(c, t.tz) if t.tz else c


def bool_to_wire(c: Column) -> Column:
    """Bool -> UInt8 0/1 at the sink edge (clickhouse.go:190-195)."""
    return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("smallint")


def schema_for(columns: list[tuple[str, str]]) -> list[tuple[str, CHType]]:
    """Parse a [(col_name, ch_type_string), ...] table definition."""
    return [(name, parse_ch_type(ts)) for name, ts in columns]
