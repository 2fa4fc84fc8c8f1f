"""Chat-template rendering + loss-mask spans (operators/chat.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import chat as C

_DDL = "messages array<struct<role string, content string>>"


def _one(spark, msgs):
    df = spark.createDataFrame([(msgs,)], _DDL)
    return df.select(
        C.render_chat("messages").alias("s"),
        C.assistant_spans("messages").alias("sp"),
    ).collect()[0]


def test_render_and_spans_slice_exactly(spark):
    r = _one(
        spark,
        [
            ("system", "Be good."),
            ("user", "hi"),
            ("assistant", "hello!"),
            ("user", "more, please"),
            ("assistant", "ok — done"),
        ],
    )
    assert r.s.startswith("<|system|>\nBe good.<|end|>\n<|user|>\nhi<|end|>\n")
    assert len(r.sp) == 2
    assert [r.s[sp.start : sp.end] for sp in r.sp] == ["hello!", "ok — done"]


def test_no_assistant_messages_empty_spans(spark):
    r = _one(spark, [("system", "x"), ("user", "y")])
    assert r.sp == []
    assert r.s == "<|system|>\nx<|end|>\n<|user|>\ny<|end|>\n"


def test_empty_conversation(spark):
    r = _one(spark, [])
    assert r.s == "" and r.sp == []


def test_unicode_offsets_are_characters(spark):
    r = _one(spark, [("user", "héllo ☃"), ("assistant", "çool ☃☃")])
    (sp,) = r.sp
    assert r.s[sp.start : sp.end] == "çool ☃☃"


def test_chat_query_plan_is_jvm_only(spark):
    """The SFT prep stage must stay whole-stage-codegen: no Python."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_audit import audit

    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["q_chat_render"](spark, SF_SMOKE)
    a = audit(df._jdf.queryExecution().executedPlan().toString())
    assert not a["python"] and not a["cartesian"]


def test_fim_reassembles_to_original(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "short"), (3, "x")], "doc_id long, t string"
    )
    lo = F.lit(3)
    hi = F.lit(7)
    out = df.select("t", C.fim_transform(F.col("t"), lo, hi).alias("f")).collect()
    for r in out:
        pre = r.f.split("<|fim_prefix|>")[1].split("<|fim_suffix|>")[0]
        suf = r.f.split("<|fim_suffix|>")[1].split("<|fim_middle|>")[0]
        mid = r.f.split("<|fim_middle|>")[1]
        assert pre + mid + suf == r.t  # PSM permutation, nothing lost


def test_fim_degenerate_windows(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("hello",)], "t string")
    # lo == hi: empty middle; lo=0: empty prefix; hi=len: empty suffix
    r = df.select(
        C.fim_transform(F.col("t"), F.lit(2), F.lit(2)).alias("a"),
        C.fim_transform(F.col("t"), F.lit(0), F.lit(5)).alias("b"),
    ).collect()[0]
    assert r.a == "<|fim_prefix|>he<|fim_suffix|>llo<|fim_middle|>"
    assert r.b == "<|fim_prefix|><|fim_suffix|><|fim_middle|>hello"


def test_pack_with_offsets_tiles_each_shard(spark):
    from pyspark.sql import functions as F

    from corrie_spark.operators.packing import pack_with_offsets

    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 50) for i in range(40)], "doc_id long, sz long"
    )
    out = pack_with_offsets(df, "doc_id", "sz", budget=500, salt="t").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    total = 0
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.offset_in_shard)
        # offsets tile: each row starts where the previous ended
        pos = 0
        for r in rows:
            assert r.offset_in_shard == pos
            pos += r.sz
        total += len(rows)
    assert total == 40
