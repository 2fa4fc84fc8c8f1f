"""Pandas-UDF tier equivalence + Kafka sink configuration."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from corrie_spark.functions.vectorized import (
    cosine_to_query_pandas,
    l2_normalize_expr,
    l2_normalize_pandas,
)
from corrie_spark.sinks.kafka import kafka_writer_options, to_kafka_records
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def test_l2_normalize_jvm_vs_pandas(spark):
    """The JVM expression and the Arrow pandas UDF must agree (same
    IEEE ops, different accumulation order -> tiny tolerance)."""
    emb = load(spark, SF_SMOKE, "embeddings").limit(50)
    both = emb.select(
        "vec_id",
        l2_normalize_expr(F.col("embedding")).alias("jvm"),
        l2_normalize_pandas(F.col("embedding")).alias("pd"),
    ).collect()
    for r in both:
        assert max(abs(a - b) for a, b in zip(r.jvm, r.pd)) < 1e-12
        norm = sum(x * x for x in r.jvm) ** 0.5
        assert abs(norm - 1.0) < 1e-9


def test_cosine_kernel_matches_int_path(spark):
    """The pandas cosine kernel tracks the quantized-integer JVM path
    (quantization error << 1e-3 at scale 2^15)."""
    from corrie_spark.operators.similarity import cosine_from_int, int_dot, int_norm_sq, quantize

    emb = load(spark, SF_SMOKE, "embeddings")
    [q] = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    scored = emb.filter(F.col("vec_id") < 20).select(
        "vec_id",
        cosine_to_query_pandas(
            F.col("embedding"), F.lit(q.embedding).cast("array<double>")
        ).alias("pd_cos"),
        cosine_from_int(
            int_dot(quantize(F.col("embedding")), quantize(F.lit(q.embedding))),
            int_norm_sq(quantize(F.col("embedding"))),
            int_norm_sq(quantize(F.lit(q.embedding))),
        ).alias("int_cos"),
    ).collect()
    for r in scored:
        assert r.pd_cos == pytest.approx(r.int_cos, abs=1e-3)


def test_kafka_options_confirmed_publish():
    opts = kafka_writer_options("broker:9092", "failed")
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.enable.idempotence"] == "true"
    relaxed = kafka_writer_options("broker:9092", "t", confirmed=False)
    assert "kafka.acks" not in relaxed


def test_kafka_record_projection_preserves_shard_key(spark):
    df = spark.createDataFrame(
        [(0, '{"Query":"q","Data":[1]}'), (2, "body2")], "shard int, body string"
    )
    rec = to_kafka_records(df)
    assert rec.columns == ["key", "value"]
    rows = {r.key: r.value for r in rec.collect()}
    assert rows["0"].startswith('{"Query"') and rows["2"] == "body2"


def test_dlq_kafka_projection_accepts_split_dlq_frame(spark):
    """The K11 forward must consume the real DLQ contract
    (raw_body, reason) produced by envelope.split_dlq — not a
    hypothetical `body` column."""
    import json

    from corrie_spark import envelope
    from corrie_spark.sinks.kafka import dlq_to_kafka_records

    bodies = spark.createDataFrame(
        [('{"Query":"INSERT INTO t (a) VALUES (?)","Data":["1"]}',), ('{"truncated',)],
        "body string",
    )
    _ok, dlq = envelope.split_dlq(envelope.parse_envelopes(bodies))
    assert set(dlq.columns) >= {"raw_body", "reason"}
    rec = dlq_to_kafka_records(dlq)
    assert rec.columns == ["value"]
    rows = [json.loads(r.value) for r in rec.collect()]
    assert len(rows) == 1
    assert rows[0]["raw"] == '{"truncated'
    assert rows[0]["reason"]
