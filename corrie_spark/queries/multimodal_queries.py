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


_RC_W, _RC_H, _RC_N = 5, 3, 16  # bmp 5x3 (odd width -> real row padding), wav 16 samples

_REAL_CODEC_ORACLE = f"""
SELECT
  doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
       ELSE 'image/x-portable-pixmap' END AS media_type,
  TRUE AS ok,
  CASE WHEN doc_id % 3 <> 1 THEN CAST({_RC_W} AS BIGINT) END AS width,
  CASE WHEN doc_id % 3 <> 1 THEN CAST({_RC_H} AS BIGINT) END AS height,
  CASE WHEN doc_id % 3 = 0 THEN
    CAST(list_sum(list_transform(range(0, {_RC_W * _RC_H}),
         i -> (doc_id * 7 + i) % 256)) AS DOUBLE) / {_RC_W * _RC_H}
  WHEN doc_id % 3 = 2 THEN
    CAST(list_sum(list_transform(range(0, {_RC_W * _RC_H * 3}),
         i -> (doc_id * 7 + i) % 256)) AS DOUBLE) / {_RC_W * _RC_H * 3}
  END AS mean_pixel,
  CASE WHEN doc_id % 3 = 1 THEN CAST({_RC_N} AS BIGINT) END AS n_samples,
  CASE WHEN doc_id % 3 = 1 THEN
    CAST(list_sum(list_transform(range(0, {_RC_N}),
         i -> abs((doc_id * 13 + i) % 1024 - 512))) AS DOUBLE) / {_RC_N}
  END AS mean_amp
FROM documents
"""


@register("q_multimodal_real_codecs", oracle=_REAL_CODEC_ORACLE)
def q_multimodal_real_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container codecs through the whole oracle gate, routed
    by doc_id % 3: 8-bpp BMPs (odd width, so the spec's 4-byte row
    padding and bottom-up storage are actually exercised), 16-bit
    PCM WAVs, and binary P6 PPMs (comment-tolerant header parse);
    the features come back through the REAL parsers
    (_decode_bmp / _decode_wav / _decode_ppm — struct+numpy) and
    must match DuckDB's closed-form expectations exactly. This is the
    part of the real-codec seam this environment CAN close natively;
    compressed formats stay behind the documented PIL/av stub."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 3 == 0:
                    rows = [
                        bytes((did * 7 + (r * _RC_W + c)) % 256 for c in range(_RC_W))
                        for r in range(_RC_H)
                    ]
                    out.append(
                        {"media_id": did, "media_type": "image/bmp",
                         "payload": M.encode_bmp(_RC_W, _RC_H, rows)}
                    )
                elif did % 3 == 1:
                    samples = [(did * 13 + i) % 1024 - 512 for i in range(_RC_N)]
                    out.append(
                        {"media_id": did, "media_type": "audio/wav",
                         "payload": M.encode_wav_pcm(8000, samples)}
                    )
                else:
                    px = bytes((did * 7 + i) % 256 for i in range(_RC_W * _RC_H * 3))
                    out.append(
                        {"media_id": did, "media_type": "image/x-portable-pixmap",
                         "payload": M.encode_ppm(_RC_W, _RC_H, px)}
                    )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "payload"])

    media = docs.mapInPandas(build, M.MEDIA_SCHEMA_DDL)
    img = M.image_features(media.filter(F.col("media_type") != "audio/wav")).select(
        "media_id",
        "media_type",
        "ok",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_pixel",
        F.lit(None).cast("long").alias("n_samples"),
        F.lit(None).cast("double").alias("mean_amp"),
    )
    aud = M.audio_features(media.filter(F.col("media_type") == "audio/wav")).select(
        "media_id",
        "media_type",
        "ok",
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("double").alias("mean_pixel"),
        F.col("n_samples").cast("long").alias("n_samples"),
        "mean_amp",
    )
    return img.unionByName(aud)
