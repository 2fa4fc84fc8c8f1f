"""JPEG APPn metadata (JFIF/EXIF) + orientation-normalized dHash:
parse roundtrips over both TIFF byte orders, the 8-orientation
transform algebra, and the crawl-dedup payoff — a rotated re-post of
the same photo pairs with its upright twin in dhash_near_pairs once
orientation normalization is on (and does NOT without it)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from corrie_spark.operators import jpeg as J
from corrie_spark.operators import multimodal as M


def _block_img(seed: int, h: int = 16, w: int = 24) -> np.ndarray:
    # 8x8-block-constant image: DC-only JPEG, decodes EXACTLY, so the
    # orientation round trip is bit-precise (no AC loss in the way)
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                seed * 37 + by * 91 + bx * 53
            ) % 256
    return img


def test_exif_parse_roundtrip_both_byte_orders():
    for bo in ("II", "MM"):
        app1 = J.build_exif_app1(7, "2025:12:31 23:59:58", byte_order=bo)
        jp = J.insert_app_segments(
            J.encode_jpeg_baseline(_block_img(1)), [(0xE1, app1)]
        )
        md = J.parse_jpeg_metadata(jp)
        assert md["has_exif"] and md["orientation"] == 7
        assert md["datetime"] == "2025:12:31 23:59:58"
        assert md["has_jfif"] and (md["x_density"], md["y_density"]) == (1, 1)
        assert (md["width"], md["height"]) == (24, 16)
        assert md["progressive"] is False
        assert md["n_app_segments"] == 2  # APP1 + the encoder's JFIF APP0


def test_metadata_walk_never_touches_entropy_stream():
    # corrupt every byte after SOS: metadata parse must still succeed
    jp = bytearray(
        J.insert_app_segments(
            J.encode_jpeg_baseline(_block_img(2)), [(0xE1, J.build_exif_app1(3))]
        )
    )
    i = jp.index(b"\xff\xda")
    sos_len = int.from_bytes(jp[i + 2 : i + 4], "big")
    for p in range(i + 2 + sos_len, len(jp)):
        jp[p] = 0xAA
    md = J.parse_jpeg_metadata(bytes(jp))
    assert md["orientation"] == 3


def test_orientation_transforms_invert():
    g = np.arange(48).reshape(6, 8)
    for o in range(1, 9):
        stored = J.unapply_exif_orientation(g, o)
        assert (J.apply_exif_orientation(stored, o) == g).all()
    # 6 and 8 actually rotate (not involutions): stored differs
    assert J.unapply_exif_orientation(g, 6).shape == (8, 6)


def test_progressive_flag_surfaces():
    md = J.parse_jpeg_metadata(J.encode_jpeg_progressive(_block_img(3)))
    assert md["progressive"] is True


def test_rotated_twin_pairs_when_normalized(spark):
    # the crawl reality: the same photo re-posted rotated 90 degrees
    # with an EXIF orientation tag. Normalized dHash must land both
    # copies on the SAME hash; unnormalized must not.
    upright = _block_img(9)
    plain = J.encode_jpeg_baseline(upright, quality=90)
    rotated = J.insert_app_segments(
        J.encode_jpeg_baseline(J.unapply_exif_orientation(upright, 6), quality=90),
        [(0xE1, J.build_exif_app1(orientation=6))],
    )
    media = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(plain)), (2, "image/jpeg", bytearray(rotated))],
        "media_id long, media_type string, payload binary",
    )
    norm = M.image_dhash_resampled(media, normalize_orientation=True)
    rows = {r.media_id: r.dhash for r in norm.collect()}
    assert rows[1] == rows[2]
    pairs = M.dhash_near_pairs(
        norm.select("media_id", "dhash"), max_dist=0
    ).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    # without normalization the rotated copy hashes differently
    raw = {r.media_id: r.dhash for r in M.image_dhash_resampled(media).collect()}
    assert raw[1] != raw[2]
