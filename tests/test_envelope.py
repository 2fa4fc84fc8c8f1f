"""Unit tests: envelope parse/coercion (M1/M3) per FIXTURES.md F1 and
the reference's UseNumber int-first semantics (writer.go:261-273)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from corrie_spark import envelope


def _parse_one(spark, body: str):
    df = spark.createDataFrame([(body,)], "body string")
    return envelope.parse_envelopes(df).first()


def test_parse_valid(spark):
    body = json.dumps({"Query": "INSERT INTO db.t (a) VALUES (?);", "Data": ["1"]})
    r = _parse_one(spark, body)
    assert r["parse_ok"] and r["query"].startswith("INSERT") and r["data"] == ["1"]


def test_parse_number_kept_exact(spark):
    # UseNumber semantics: int64 (and beyond-uint64) literals survive
    # exactly; floats are canonicalized ("1.50" -> "1.5") which keeps
    # both int-ness and value — the two properties coercion relies on
    body = (
        '{"Query": "INSERT INTO db.t (a) VALUES (?)",'
        ' "Data": [9223372036854775807, 1.50, 18446744073709551616]}'
    )
    r = _parse_one(spark, body)
    assert r["data"] == ["9223372036854775807", "1.5", "18446744073709551616"]


def test_parse_poison_variants(spark):
    for body in ["{not json", "null", "[]", '{"Query": "x"}', '{"Data": []}', ""]:
        r = _parse_one(spark, body)
        assert not r["parse_ok"], body


def test_split_dlq_raw_body(spark):
    df = spark.createDataFrame([("{bad",), ('{"Query":"INSERT INTO t (a) VALUES (?)","Data":["1"]}',)], "body string")
    ok, dlq = envelope.split_dlq(envelope.parse_envelopes(df))
    assert ok.count() == 1
    row = dlq.first()
    assert row["raw_body"] == "{bad" and row["reason"] == "parse_error"


def test_coerce_numeric_branches(spark):
    cases = [
        ("1", 1, None, None),  # int branch
        ("-42", -42, None, None),
        ("9223372036854775807", 9223372036854775807, None, None),
        ("1.0", None, 1.0, None),  # Go ParseInt rejects "1.0" -> float
        ("1.5", None, 1.5, None),
        ("1e3", None, 1000.0, None),
        ("9223372036854775808", None, 9.223372036854776e18, None),  # overflow -> float
        ("abc", None, None, "abc"),  # raw string branch
        ("", None, None, ""),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "v string")
    out = df.select(envelope.coerce_numeric(F.col("v")).alias("c")).collect()
    got = [(r["c"]["i"], r["c"]["f"], r["c"]["s"]) for r in out]
    assert got == [(i, f, s) for _, i, f, s in cases]


def test_table_name_and_prefix(spark):
    df = spark.createDataFrame(
        [("INSERT INTO db.tbl (a, b) VALUES (?, ?);",), ("insert into plain VALUES (?)",), ("SELECT 1",)],
        "q string",
    )
    rows = df.select(
        envelope.table_name("q").alias("t"), envelope.insert_prefix("q").alias("p")
    ).collect()
    assert rows[0]["t"] == "db.tbl" and rows[0]["p"] == "INSERT INTO db.tbl (a, b)"
    assert rows[1]["t"] == "plain"
    assert rows[2]["t"] == ""  # non-INSERT -> no routing key


def test_encode_parse_roundtrip(spark):
    df = spark.createDataFrame([(7, 2.5, "x")], "a int, b double, c string")
    body = df.select(
        envelope.encode_envelope("INSERT INTO db.t (a,b,c) VALUES (?,?,?)",
                                 [F.col("a"), F.col("b"), F.col("c")]).alias("body")
    )
    r = envelope.parse_envelopes(body).first()
    assert r["parse_ok"] and r["data"] == ["7", "2.5", "x"]


def test_assign_shard_uniform_and_sticky(spark):
    """M5 parity: random shard is in-range and spreads; sticky shard
    is a pure function of the key (same key -> same shard, the
    x-shard header contract)."""
    from corrie_spark.sources.envelopes import assign_shard

    df = spark.range(300).withColumnRenamed("id", "k")
    rand = assign_shard(df, num_shards=3)
    shards = [r.shard for r in rand.collect()]
    assert set(shards) <= {0, 1, 2} and len(set(shards)) == 3

    sticky = assign_shard(df, num_shards=3, sticky_key="k")
    a = {r.k: r.shard for r in sticky.collect()}
    b = {r.k: r.shard for r in sticky.collect()}
    assert a == b and set(a.values()) <= {0, 1, 2}


def test_parameterized_sql_binding(spark):
    """K3 parity (placeholder binding, stmt.go:104-155): Spark-native
    parameterized SQL — named and positional markers bind server-side
    with proper quoting, no string interpolation."""
    df = spark.createDataFrame([(1, "a'b"), (2, "plain")], "id int, s string")
    df.createOrReplaceTempView("k3_t")
    named = spark.sql("SELECT id FROM k3_t WHERE s = :v", args={"v": "a'b"}).collect()
    assert [r.id for r in named] == [1]
    positional = spark.sql("SELECT id FROM k3_t WHERE id > ?", args=[1]).collect()
    assert [r.id for r in positional] == [2]


def test_placeholder_binding_matrix(spark):
    """K3 edge-case matrix (reference textual substitution with
    quoting, stmt.go:104-155 + quote(), helpers.go:119-135): the
    quirky inputs that break naive string interpolation must bind
    correctly through Spark parameterized SQL — escaped quotes,
    backslashes, newlines, placeholder-looking strings, unicode,
    NULLs, and named-marker reuse."""
    tricky = [
        (1, "a'b"),            # single quote
        (2, "a''b"),           # doubled quote
        (3, "a\\'b"),          # backslash-quote (the classic injection shape)
        (4, 'he said "hi"'),   # double quotes
        (5, "line1\nline2"),   # newline
        (6, "tab\tend"),       # tab
        (7, "?"),              # looks like a positional marker
        (8, ":v"),             # looks like a named marker
        (9, "100% legit_"),    # LIKE metacharacters stay literal under =
        (10, "héllo⊕wörld"),   # unicode
        (11, None),            # NULL
    ]
    df = spark.createDataFrame(tricky, "id int, s string")
    df.createOrReplaceTempView("k3_matrix")

    # every tricky value round-trips through a bound equality
    for id_, s in tricky:
        if s is None:
            continue
        got = spark.sql(
            "SELECT id FROM k3_matrix WHERE s = :v", args={"v": s}
        ).collect()
        assert [r.id for r in got] == [id_], f"binding failed for {s!r}"

    # positional markers bind in order, values never re-parsed as SQL
    got = spark.sql(
        "SELECT id FROM k3_matrix WHERE s = ? OR s = ?", args=["?", ":v"]
    ).collect()
    assert sorted(r.id for r in got) == [7, 8]

    # named-marker REUSE: one arg referenced twice (stmt.go binds by
    # name, not position — so must Spark)
    got = spark.sql(
        "SELECT id FROM k3_matrix WHERE length(s) = length(:v) AND s = :v",
        args={"v": "a'b"},
    ).collect()
    assert [r.id for r in got] == [1]

    # NULL binds as SQL NULL (IS NULL matches, = does not)
    got = spark.sql(
        "SELECT count(*) AS n FROM k3_matrix WHERE s = :v OR (:v IS NULL AND s IS NULL)",
        args={"v": None},
    ).collect()
    assert got[0].n == 1

    # typed binding: int64, double, decimal, date survive with types
    from datetime import date
    from decimal import Decimal

    row = spark.sql(
        "SELECT :i AS i, :f AS f, :d AS d, :dt AS dt",
        args={"i": 2**60, "f": 1.5, "d": Decimal("12.34"), "dt": date(2026, 8, 13)},
    ).collect()[0]
    assert row.i == 2**60 and row.f == 1.5
    assert row.d == Decimal("12.34") and row.dt == date(2026, 8, 13)
