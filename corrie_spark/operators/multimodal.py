"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas stages over mapInPandas.

Design for 100 TB:
  - media bytes live in a BinaryType column next to typed metadata
    (media_type, width/height/sample_rate/...), so relational
    filters/joins prune and push down WITHOUT touching bytes — a
    metadata-only query never deserializes a single payload;
  - all byte-touching stages are mapInPandas (Arrow batch transfer,
    one python process per task, zero shuffle): throughput scales
    with executors and `spark.sql.execution.arrow.maxRecordsPerBatch`
    bounds batch memory;
  - decode is pluggable: the real codecs (PIL/libav/...) are not in
    this environment, so `decode_payload` dispatches to a
    deterministic FAKE codec for the `fake/*` media types and raises
    NotImplementedError for real ones — the Spark-side contract
    (schemas, batching, partitioning) is identical either way.

Fake wire format (deterministic, self-describing):
  images: b"FAKEIMG" + width:int32le + height:int32le + pixels (w*h bytes)
  audio:  b"FAKEAUD" + sample_rate:int32le + n_samples:int32le + samples
  video:  b"FAKEVID" + n_frames:int32le + frame_size:int32le + frames
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.functions import bind


def _byte_mean(data: bytes) -> float:
    """Exact mean of raw bytes via numpy: int64-accumulated sum (no
    float rounding, no per-byte python loop), one float division —
    bit-identical to sum(data)/len(data) and ~50x faster."""
    if not data:
        return 0.0
    arr = np.frombuffer(data, dtype=np.uint8)
    return float(arr.sum(dtype=np.int64) / arr.size)

MEDIA_SCHEMA_DDL = "media_id bigint, media_type string, payload binary"

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FAKEIMG", b"FAKEAUD", b"FAKEVID"

IMAGE_FEATURES_DDL = (
    "media_id bigint, media_type string, width int, height int, "
    "n_bytes int, mean_pixel double, ok boolean"
)
AUDIO_FEATURES_DDL = (
    "media_id bigint, media_type string, sample_rate int, n_samples int, "
    "duration_s double, mean_amp double, ok boolean"
)
FRAME_SAMPLE_DDL = "media_id bigint, frame_idx int, frame binary"
RESIZE_DDL = "media_id bigint, media_type string, payload binary, width int, height int"


# ---------------------------------------------------------------------------
# fake codec (the pluggable seam; real codecs replace these functions)
# ---------------------------------------------------------------------------

def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    px = bytes(((seed + i) * 31 + 7) % 256 for i in range(width * height))
    return IMG_MAGIC + struct.pack("<ii", width, height) + px


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    samples = bytes(((seed + i) * 17 + 3) % 256 for i in range(n_samples))
    return AUD_MAGIC + struct.pack("<ii", sample_rate, n_samples) + samples


def encode_fake_video(n_frames: int, frame_size: int, seed: int) -> bytes:
    frames = bytes(((seed + i) * 13 + 11) % 256 for i in range(n_frames * frame_size))
    return VID_MAGIC + struct.pack("<ii", n_frames, frame_size) + frames


def decode_payload(media_type: str, payload: bytes) -> dict:
    """Decode seam. `fake/*` types use the deterministic codec; real
    types would dispatch to PIL/soundfile/av here — unavailable in
    this environment, so they raise (clearly-marked stub)."""
    if media_type.startswith("fake/"):
        if payload[:7] == IMG_MAGIC:
            w, h = struct.unpack("<ii", payload[7:15])
            return {"kind": "image", "width": w, "height": h, "data": payload[15:]}
        if payload[:7] == AUD_MAGIC:
            sr, n = struct.unpack("<ii", payload[7:15])
            return {"kind": "audio", "sample_rate": sr, "n_samples": n, "data": payload[15:]}
        if payload[:7] == VID_MAGIC:
            nf, fs = struct.unpack("<ii", payload[7:15])
            return {"kind": "video", "n_frames": nf, "frame_size": fs, "data": payload[15:]}
        raise ValueError("bad fake payload header")
    raise NotImplementedError(
        f"real decoder for {media_type!r} not available in this environment "
        "(plug PIL/soundfile/av into decode_payload)"
    )


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas — Arrow-batched, shuffle-free)
# ---------------------------------------------------------------------------

def image_features(df: DataFrame) -> DataFrame:
    """Decode + per-image features. Corrupt/undecodable payloads yield
    ok=false rows instead of failing the task (K7-style isolation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                row = {"media_id": mid, "media_type": mtype, "width": None,
                       "height": None, "n_bytes": None, "mean_pixel": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        data = d["data"]
                        row.update(
                            width=d["width"], height=d["height"], n_bytes=len(data),
                            mean_pixel=_byte_mean(data), ok=True,
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "payload").mapInPandas(run, IMAGE_FEATURES_DDL)


def audio_features(df: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                row = {"media_id": mid, "media_type": mtype, "sample_rate": None,
                       "n_samples": None, "duration_s": None, "mean_amp": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "audio":
                        data = d["data"]
                        row.update(
                            sample_rate=d["sample_rate"], n_samples=d["n_samples"],
                            duration_s=d["n_samples"] / d["sample_rate"],
                            mean_amp=_byte_mean(data), ok=True,
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "payload").mapInPandas(run, AUDIO_FEATURES_DDL)


def resize_images(df: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Nearest-neighbor resize of fake images (the transform-and-
    rewrite-payload pattern: output is again a media column)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "image":
                    continue
                w, h, data = d["width"], d["height"], d["data"]
                # nearest-neighbor via one numpy gather, no python loop
                ys = np.arange(new_height) * h // new_height
                xs = np.arange(new_width) * w // new_width
                idx = (ys[:, None] * w + xs[None, :]).ravel()
                px = np.frombuffer(data, dtype=np.uint8)[idx].tobytes()
                out.append(
                    {"media_id": mid, "media_type": mtype,
                     "payload": IMG_MAGIC + struct.pack("<ii", new_width, new_height) + px,
                     "width": new_width, "height": new_height}
                )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "payload", "width", "height"])

    return df.select("media_id", "media_type", "payload").mapInPandas(run, RESIZE_DDL)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every k-th frame (one row per sampled
    frame) — the fan-out stage before per-frame feature extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "video":
                    continue
                fs = d["frame_size"]
                for idx in range(0, d["n_frames"], every_k):
                    out.append(
                        {"media_id": mid, "frame_idx": idx,
                         "frame": d["data"][idx * fs : (idx + 1) * fs]}
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "media_type", "payload").mapInPandas(run, FRAME_SAMPLE_DDL)


FRAME_STATS_DDL = (
    "media_id bigint, frame_idx int, frame_bytes int, "
    "mean_val double, min_val int, max_val int"
)


def frame_stats(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sample videos and compute per-frame pixel stats in one
    python stage (sample + feature-extract fused: the frame bytes
    never cross a second Arrow boundary). All per-frame math is one
    numpy reshape over the whole clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "video":
                    continue
                fs, nf = d["frame_size"], d["n_frames"]
                frames = np.frombuffer(d["data"], dtype=np.uint8)[: nf * fs].reshape(nf, fs)
                for idx in range(0, nf, every_k):
                    fr = frames[idx]
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "frame_bytes": fs,
                            "mean_val": float(fr.sum(dtype=np.int64) / fr.size),
                            "min_val": int(fr.min()),
                            "max_val": int(fr.max()),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_bytes", "mean_val", "min_val", "max_val"],
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(run, FRAME_STATS_DDL)


# ---------------------------------------------------------------------------
# synthetic corpus builder (tests / demos; expression-level, no python)
# ---------------------------------------------------------------------------

def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media corpus from any keyed table: id % 3
    picks image/audio/video; payloads built JVM-side so the corpus
    itself needs no python stage."""
    mid = F.col(id_col).cast("bigint")
    kind = (mid % 3).cast("int")
    w = (8 + mid % 8).cast("int")
    h = (4 + mid % 4).cast("int")

    def le32(c: Column) -> Column:
        # int32 little-endian bytes, JVM-side
        return F.unhex(
            F.concat(
                *[
                    F.lpad(F.hex(F.shiftright(c.cast("int"), 8 * i) % 256), 2, "0")
                    for i in range(4)
                ]
            )
        )

    def rep_bytes(n: Column, seed: Column, a: int, b: int) -> Column:
        # bytes(((seed + i) * a + b) % 256 for i in range(n)).
        # The sequence is an arithmetic progression mod 256 (step a,
        # start (seed*a+b)%256), i.e. a ROTATION of the fixed 256-byte
        # cycle (j*a)%256 — so instead of per-byte transform/hex/join
        # (O(n) string ops per row) we take ONE substring of a repeated
        # constant: start index j0 = start * a^-1 mod 256 (a odd ->
        # invertible). ~20x less JVM work per payload, identical bytes.
        a_inv = pow(a, -1, 256)
        cycle_hex = "".join(f"{(j * a) % 256:02x}" for j in range(256))
        start = (seed * a + b) % 256
        j0 = (start * a_inv) % 256
        # 8 repetitions cover j0 + n for every payload size used here
        return F.unhex(
            F.repeat(F.lit(cycle_hex), 8).substr(
                (j0.cast("int") * 2 + 1), (n.cast("int") * 2)
            )
        )

    img = F.concat(F.lit(IMG_MAGIC), le32(w), le32(h), rep_bytes(w * h, mid, 31, 7))
    aud = F.concat(
        F.lit(AUD_MAGIC), le32(F.lit(16000)), le32(w * 100), rep_bytes(w * 100, mid, 17, 3)
    )
    vid = F.concat(
        F.lit(VID_MAGIC), le32(F.lit(4)), le32(w * h), rep_bytes(F.lit(4) * w * h, mid, 13, 11)
    )
    return df.select(
        mid.alias("media_id"),
        F.when(kind == 0, F.lit("fake/image"))
        .when(kind == 1, F.lit("fake/audio"))
        .otherwise(F.lit("fake/video"))
        .alias("media_type"),
        F.when(kind == 0, img).when(kind == 1, aud).otherwise(vid).alias("payload"),
    )
