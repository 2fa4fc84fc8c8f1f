"""Oracle-checked multimodal queries: documents -> synthetic media
corpus (JVM-side binary payloads) -> mapInPandas decode + feature
extraction (Arrow-batched python stage).

The fake codec is deterministic arithmetic on doc_id (see
operators/multimodal.py synth_media), so DuckDB can compute the
expected features in CLOSED FORM — the oracle check covers the whole
chain: binary encoding expressions, Arrow transfer, python decode,
pandas batch shape. A real-codec deployment swaps decode_payload and
keeps every Spark-side piece.

Scale note: both queries are shuffle-free map pipelines — the only
cost at 100 TB is the Arrow transfer of the payload bytes, which is
the irreducible cost of any python-side decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from corrie_spark.operators import multimodal as M
from corrie_spark.queries.registry import register
from corrie_spark.tables import load

# closed-form mirrors of synth_media's parameters
_W = "(8 + doc_id % 8)"
_H = "(4 + doc_id % 4)"

_IMG_ORACLE = f"""
SELECT
  doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'fake/image' WHEN 1 THEN 'fake/audio'
       ELSE 'fake/video' END AS media_type,
  CASE WHEN doc_id % 3 = 0 THEN CAST({_W} AS BIGINT) END AS width,
  CASE WHEN doc_id % 3 = 0 THEN CAST({_H} AS BIGINT) END AS height,
  CASE WHEN doc_id % 3 = 0 THEN CAST({_W} * {_H} AS BIGINT) END AS n_bytes,
  CASE WHEN doc_id % 3 = 0 THEN
    CAST(list_sum(list_transform(range(0, {_W} * {_H}),
         i -> ((doc_id + i) * 31 + 7) % 256)) AS DOUBLE) / ({_W} * {_H})
  END AS mean_pixel,
  doc_id % 3 = 0 AS ok
FROM documents
"""


@register("q_multimodal_image_features", oracle=_IMG_ORACLE)
def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over the synthetic media
    corpus; non-image rows surface as ok=false (K7-style per-row
    isolation instead of task failure)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return M.image_features(M.synth_media(docs))


_AUD_ORACLE = f"""
SELECT
  doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'fake/image' WHEN 1 THEN 'fake/audio'
       ELSE 'fake/video' END AS media_type,
  CASE WHEN doc_id % 3 = 1 THEN CAST(16000 AS BIGINT) END AS sample_rate,
  CASE WHEN doc_id % 3 = 1 THEN CAST({_W} * 100 AS BIGINT) END AS n_samples,
  CASE WHEN doc_id % 3 = 1 THEN CAST({_W} * 100 AS DOUBLE) / 16000 END AS duration_s,
  CASE WHEN doc_id % 3 = 1 THEN
    CAST(list_sum(list_transform(range(0, {_W} * 100),
         i -> ((doc_id + i) * 17 + 3) % 256)) AS DOUBLE) / ({_W} * 100)
  END AS mean_amp,
  doc_id % 3 = 1 AS ok
FROM documents
"""


@register("q_multimodal_audio_features", oracle=_AUD_ORACLE)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + features (sample rate, duration, mean amplitude)
    over the same corpus; image/video rows -> ok=false."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return M.audio_features(M.synth_media(docs))


_FRAME_ORACLE = f"""
SELECT
  doc_id AS media_id,
  f.frame_idx,
  CAST({_W} * {_H} AS BIGINT) AS frame_bytes,
  CAST(list_sum(list_transform(range(f.frame_idx * {_W} * {_H}, (f.frame_idx + 1) * {_W} * {_H}),
       i -> ((doc_id + i) * 13 + 11) % 256)) AS DOUBLE) / ({_W} * {_H}) AS mean_val,
  CAST(list_min(list_transform(range(f.frame_idx * {_W} * {_H}, (f.frame_idx + 1) * {_W} * {_H}),
       i -> ((doc_id + i) * 13 + 11) % 256)) AS BIGINT) AS min_val,
  CAST(list_max(list_transform(range(f.frame_idx * {_W} * {_H}, (f.frame_idx + 1) * {_W} * {_H}),
       i -> ((doc_id + i) * 13 + 11) % 256)) AS BIGINT) AS max_val
FROM documents, (SELECT CAST(unnest([0, 2]) AS BIGINT) AS frame_idx) f
WHERE doc_id % 3 = 2
"""


@register("q_multimodal_frame_stats", oracle=_FRAME_ORACLE)
def q_multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample (every 2nd of 4 frames) fused with per-frame
    pixel stats — the explode-then-featurize stage of a video
    pipeline, checked in closed form against the fake codec's
    arithmetic. Shuffle-free map pipeline like the other media ops."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return M.frame_stats(M.synth_media(docs), every_k=2)
