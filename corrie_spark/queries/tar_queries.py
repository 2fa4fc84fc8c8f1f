"""Oracle-checked WebDataset tar-shard ingestion queries.

Fixture shards are built distributed from `documents` (one
applyInPandas group = one .tar / .tar.gz shard, the WebDataset
layout: `{key}.txt` + `{key}.json` + `{key}.cls` per sample, keys
zero-padded doc ids), so the DuckDB oracle replays every extracted
field closed-form from the parquet without touching a tar byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corrie_spark.queries.dedup_queries import _memo
from corrie_spark.queries.registry import register
from corrie_spark.sources import tar_wds as T
from corrie_spark.tables import load

_N_SHARDS = 8

_WDS_ORACLE = """
SELECT doc_id,
       md5(text) AS text_md5,
       CAST(doc_id % 10 AS BIGINT) AS cls,
       CAST(length(text) AS BIGINT) AS n_from_json,
       CAST(3 AS BIGINT) AS n_parts
FROM documents
"""


def _shared_wds_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture shards -> real reader, memoized. Shards alternate plain
    .tar / gzipped .tar.gz by group so both container paths stay live
    under the one gate."""
    import pandas as pd

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")

        def mk(key, pdf):
            grp = int(key[0])
            gz = grp % 2 == 1
            blob = T.build_wds_shard(
                list(zip((int(i) for i in pdf["doc_id"]), pdf["text"])),
                gz=gz,
            )
            ext = "tar.gz" if gz else "tar"
            return pd.DataFrame(
                [{"path": f"shard-{grp:05d}.{ext}", "content": blob}]
            )

        files = (
            docs.withColumn("_grp", F.col("doc_id") % _N_SHARDS)
            .groupBy("_grp")
            .applyInPandas(mk, "path string, content binary")
        )
        recs = T.wds_records(files).persist()
        recs.count()
        return recs

    return _memo(spark, sf_dir, "wds_records", build)


@register("q_wds_ingest", oracle=_WDS_ORACLE)
def q_wds_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard ingestion through the from-spec ustar reader:
    distributed shard build (txt/json/cls triple per sample, half the
    shards gzipped) -> member walk (checksums validated) -> basename-
    key sample grouping -> one row per sample with txt decoded, the
    json sidecar parseable (gated via get_json_object) and the opaque
    part's bytes in `payload`. The oracle replays every field
    closed-form from `documents`. Scale: one shard = one task (the
    WebDataset convention), one Arrow stage, bytes never shuffle."""
    recs = _shared_wds_records(spark, sf_dir)
    return recs.where(F.col("error").isNull()).select(
        F.col("key").cast("long").alias("doc_id"),
        F.md5("txt").alias("text_md5"),
        F.col("payload").cast("string").cast("long").alias("cls"),
        F.get_json_object("json", "$.n").cast("long").alias("n_from_json"),
        F.col("n_parts"),
    )
