"""Oracle-checked Avro OCF ingestion (sources/avro.py): fixture
container files are built IN-PLAN from the orders table (both codecs,
every supported schema kind: long/string/double/date logical/nullable
union/int array/bytes/boolean), ingested back through the real block
walk, and every projected value is replayed closed-form by the oracle
from the orders rows — encoder, zigzag varints, codec layer, datum
reader and the date logical type are all value-gated in one loop.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.queries.registry import register
from corrie_spark.tables import load

AVRO_FIXTURE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "OrderRow",
        "fields": [
            {"name": "orderkey", "type": "long"},
            {"name": "custkey", "type": "long"},
            {"name": "status", "type": "string"},
            {"name": "total", "type": "double"},
            {"name": "odate", "type": {"type": "int", "logicalType": "date"}},
            {"name": "comment", "type": ["null", "string"]},
            {"name": "flags", "type": {"type": "array", "items": "int"}},
            {"name": "blob", "type": "bytes"},
            {"name": "ok_flag", "type": "boolean"},
        ],
    }
)


def avro_fixture_rec(okey: int, ckey: int, status: str, total: float, odate) -> dict:
    """One fixture record, every rule id-keyed (mirrored closed-form
    by _AVRO_ORACLE): nullable comment (utf-8 with a non-ASCII char),
    a 0..3-element int array, id-sized bytes."""
    import hashlib

    k = okey % 4
    return {
        "orderkey": okey,
        "custkey": ckey,
        "status": status,
        "total": total,
        "odate": odate,
        "comment": None if okey % 5 == 0 else f"c-é-{okey}",
        "flags": [(okey + j * 7) % 1000 for j in range(k)],
        "blob": hashlib.md5(f"avro-blob:{okey}".encode()).digest()[: 1 + okey % 7],
        "ok_flag": okey % 2 == 0,
    }


_AVRO_ORACLE = """
SELECT o_orderkey AS orderkey,
       o_custkey AS custkey,
       o_orderstatus AS status,
       o_totalprice AS total,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE 'c-é-' || CAST(o_orderkey AS VARCHAR) END AS comment,
       CAST(o_orderkey % 4 AS BIGINT) AS n_flags,
       CAST(CASE o_orderkey % 4
            WHEN 0 THEN 0
            WHEN 1 THEN o_orderkey % 1000
            WHEN 2 THEN o_orderkey % 1000 + (o_orderkey + 7) % 1000
            ELSE o_orderkey % 1000 + (o_orderkey + 7) % 1000
                 + (o_orderkey + 14) % 1000 END AS BIGINT) AS flags_sum,
       CAST(1 + o_orderkey % 7 AS BIGINT) AS blob_len,
       o_orderkey % 2 = 0 AS ok_flag
FROM orders
"""


@register("q_avro_ingest", oracle=_AVRO_ORACLE,
          python_stages="applyInPandas OCF fixture build + from-spec Avro block walk (mapInPandas)")
def q_avro_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File ingestion end-to-end: orders rows
    -> 32 fixture OCFs (codec alternating null/deflate per file,
    multi-block layouts, every supported schema kind incl. the date
    logical type and a nullable utf-8 union) -> the from-spec block
    walk -> typed rows, value-gated field by field against the source
    table. Scale: build and parse are one Arrow stage each over
    executor-local bytes; for single big OCFs the offset-sharded
    range reader (sources/avro.scan_avro_range, sync-marker resync)
    removes the 1-file-1-task ceiling — pinned sharded==whole by
    tests/test_avro.py."""
    import pandas as pd

    from corrie_spark.sources import avro as A

    orders = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("o_odate"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def mk(batches):
        # one OCF per Arrow batch — shuffle-free: the builder rides
        # the repartitioned scan, file membership is irrelevant to
        # the (multiset) output contract
        for pdf in batches:
            if not len(pdf):
                continue
            recs = [
                avro_fixture_rec(
                    int(r.o_orderkey),
                    int(r.o_custkey),
                    str(r.o_orderstatus),
                    float(r.o_totalprice),
                    r.o_odate,
                )
                for r in pdf.itertuples()
            ]
            grp = int(recs[0]["orderkey"])
            blob = A.encode_ocf(
                AVRO_FIXTURE_SCHEMA,
                recs,
                codec="null" if grp % 2 == 0 else "deflate",
                name=f"orders-{grp}",
                block_size=50,
            )
            yield pd.DataFrame([{"path": f"orders-{grp}.avro", "content": blob}])

    files = orders.mapInPandas(mk, "path string, content binary")
    rows = A.avro_records(
        files,
        "orderkey long, custkey long, status string, total double, "
        "odate date, comment string, flags array<int>, blob binary, "
        "ok_flag boolean",
    )
    return rows.where(~F.col("_error")).select(
        "orderkey",
        "custkey",
        "status",
        "total",
        F.col("odate").cast("string").alias("odate"),
        "comment",
        F.size("flags").cast("long").alias("n_flags"),
        F.aggregate(
            "flags", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("flags_sum"),
        F.length("blob").cast("long").alias("blob_len"),
        "ok_flag",
    )
