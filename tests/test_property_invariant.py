"""Property-based invariant (SURVEY §5 item 4): for ANY batch of
random envelopes over the type matrix — valid, type-mismatched,
arity-mismatched, poison JSON, unknown tables, non-INSERT SQL —
every input row lands in exactly one of (target table, DLQ).
Nothing is dropped, nothing is duplicated.

The reference's own invariant: send-or-DLQ then ack
(writer/writer.go:177-186). Shapes are drawn by hypothesis; each
example runs a real process_batch micro-batch.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from corrie_spark.sinks import DLQSink, ParquetDirSink, SchemaRegistry
from corrie_spark.sinks.writer import process_batch

REGISTRY = SchemaRegistry(
    {
        "p.ints": [("a", "Int64"), ("b", "Nullable(Int32)")],
        "p.mixed": [("s", "String"), ("f", "Float64"), ("e", "Enum8('x'=1,'y'=2)")],
    }
)

_VALID_INTS = st.tuples(
    st.integers(-(2**62), 2**62), st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))
).map(lambda t: ("INSERT INTO p.ints (a, b) VALUES (?, ?)", list(t)))

_VALID_MIXED = st.tuples(
    st.text(alphabet=st.characters(codec="ascii", exclude_characters='"\\'), max_size=8),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.sampled_from(["x", "y", "1", "2"]),
).map(lambda t: ("INSERT INTO p.mixed (s, f, e) VALUES (?, ?, ?)", list(t)))

# type mismatch (string where int), bad enum ident, arity mismatch
_BAD_ROW = st.sampled_from(
    [
        ("INSERT INTO p.ints (a, b) VALUES (?, ?)", ["not-an-int", 1]),
        ("INSERT INTO p.mixed (s, f, e) VALUES (?, ?, ?)", ["s", "1.5", "zzz"]),
        ("INSERT INTO p.ints (a, b) VALUES (?, ?)", [1]),
        ("INSERT INTO p.ints (a, b) VALUES (?, ?)", [1, 2, 3]),
    ]
)
# unknown table / non-INSERT -> prepare failure
_BAD_GROUP = st.sampled_from(
    [
        ("INSERT INTO p.nope (x) VALUES (?)", [1]),
        ("SELECT 1", [1]),
    ]
)

_ENVELOPE = st.one_of(_VALID_INTS, _VALID_MIXED, _BAD_ROW, _BAD_GROUP).map(
    lambda qa: json.dumps(
        {"Query": qa[0], "Data": [None if v is None else str(v) for v in qa[1]]}
    )
)
_POISON = st.sampled_from(['{"Query": unparseable', "", "[1,2]", '{"Data": [1]}'])

_BATCH = st.lists(st.one_of(_ENVELOPE, _POISON), min_size=1, max_size=25)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bodies=_BATCH)
def test_every_row_lands_exactly_once(spark, tmp_path_factory, bodies):
    tmp = tmp_path_factory.mktemp("prop")
    sink = ParquetDirSink(str(tmp / "out"))
    dlq = DLQSink(str(tmp / "dlq"))
    batch = spark.createDataFrame(
        [(i % 3, i, b, f"d{i}") for i, b in enumerate(bodies)],
        "shard int, offset long, body string, delivery_id string",
    )
    process_batch(batch, sink, dlq, REGISTRY)

    landed = 0
    for table in ("p.ints", "p.mixed"):
        try:
            landed += spark.read.parquet(str(tmp / "out" / table)).count()
        except Exception:
            pass  # table never written in this example
    try:
        landed += spark.read.parquet(str(tmp / "dlq")).count()
    except Exception:
        pass
    assert landed == len(bodies), (
        f"{len(bodies)} in, {landed} accounted for — rows dropped or duplicated"
    )


# --- chtypes recursion property (r2: element validity via coercer) -----

import re

from pyspark.sql import functions as F

from corrie_spark.chtypes import coerce, parse_ch_type

_ELEM = st.one_of(
    st.none(),
    st.integers(-300, 600).map(str),
    st.sampled_from(["abc", "1.5", "", "+7", "007", "255", "256", "-1"]),
)


def _uint8_ok(e: str | None) -> bool:
    return (
        e is not None
        and re.fullmatch(r"[+-]?[0-9]+", e) is not None
        and 0 <= int(e) <= 255
    )


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(elems=st.lists(_ELEM, max_size=6))
def test_array_uint8_validity_matches_model(spark, elems):
    """Array(UInt8) row validity == every element passes the UInt8
    coercer — for ANY element mix (nulls, range errors, non-numerics).
    The pure-python model is the spec; the Column expression must
    agree exactly (array.go recursion semantics)."""
    body = json.dumps(elems)
    df = spark.createDataFrame([(body,)], "v string")
    val, ok = coerce(F.col("v"), parse_ch_type("Array(UInt8)"))
    row = df.select(val.alias("val"), ok.alias("ok")).first()
    assert row["ok"] == all(_uint8_ok(e) for e in elems)
    if row["ok"]:
        assert row["val"] == [int(e) for e in elems]


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    kv=st.dictionaries(
        st.text(alphabet="abcxyz", min_size=1, max_size=3),
        st.one_of(st.integers(-10, 300).map(str), st.just("zz")),
        max_size=4,
    )
)
def test_map_uint8_value_validity_matches_model(spark, kv):
    """Map(String, UInt8): row validity == every VALUE passes the
    UInt8 coercer (keys are strings, always valid here)."""
    body = json.dumps(kv)
    df = spark.createDataFrame([(body,)], "v string")
    val, ok = coerce(F.col("v"), parse_ch_type("Map(String, UInt8)"))
    row = df.select(val.alias("val"), ok.alias("ok")).first()
    assert row["ok"] == all(_uint8_ok(e) for e in kv.values())
    if row["ok"]:
        assert dict(row["val"]) == {k: int(v) for k, v in kv.items()}
