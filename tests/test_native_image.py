"""Native image-codec shim (sources/native_image.py + _native_image.c):
per-fixture-class parity between the libjpeg/libpng dispatch and the
from-spec pure decoders, the round-13 verdict's ask #1.

Parity contract being pinned:
- JPEG, DC-only class (what every oracle-gated fixture uses):
  BIT-EXACT, gray and 4:2:0 color, all five fixture qualities,
  baseline AND progressive.
- JPEG, AC-bearing class: libjpeg's scaled-integer IDCT is allowed
  1 LSB per YCbCr component vs the from-spec float IDCT (T.81
  conformance is tolerance-based); after the shared double-precision
  RGB conversion that bounds RGB divergence at 2.
- PNG (lossless): BIT-EXACT everywhere — gray/RGB/alpha-strip/
  palette, every filter type, Adam7 interlace.
- Poison: the dispatcher falls back to the pure decoder, so error
  TYPES AND MESSAGES are always the pure decoder's (DLQ parity by
  construction).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from corrie_spark.operators import jpeg as J
from corrie_spark.operators import multimodal as M
from corrie_spark.sources import native_image as NI

pytestmark = pytest.mark.skipif(
    not NI.image_shim_enabled(),
    reason="native image shim not buildable in this environment",
)

QUALITIES = (40, 55, 70, 85, 100)


def _dc_gray(seed: int) -> np.ndarray:
    img = np.zeros((16, 24), dtype=np.uint8)
    for b in range(6):
        r, c = divmod(b, 3)
        img[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (seed * 11 + b * 37) % 256
    return img


def _dc_color(seed: int) -> np.ndarray:
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    for t in range(2):
        img[:, t * 16 : t * 16 + 16] = [
            (seed * 13 + t * 29) % 256,
            (seed * 17 + t * 41) % 256,
            (seed * 19 + t * 53) % 256,
        ]
    return img


def test_jpeg_dc_only_bit_exact_all_qualities():
    """The oracle fixture class: native must equal pure byte-for-byte
    or the driver's correctness gates would depend on the env."""
    for q in QUALITIES:
        for enc in (J.encode_jpeg_baseline, J.encode_jpeg_progressive):
            p = enc(_dc_gray(q), quality=q)
            assert J.decode_jpeg(p) == J.decode_jpeg_py(p), (q, enc)
            p = enc(_dc_color(q), quality=q, subsampling=(2, 2))
            assert J.decode_jpeg(p) == J.decode_jpeg_py(p), (q, enc)


def test_jpeg_dc_only_444_bit_exact():
    for q in (40, 100):
        p = J.encode_jpeg_baseline(_dc_color(q), quality=q, subsampling=(1, 1))
        assert J.decode_jpeg(p) == J.decode_jpeg_py(p)


def test_jpeg_ac_parity_within_one_lsb():
    rng = np.random.RandomState(7)
    for q in (40, 85):
        p = J.encode_jpeg_baseline(
            rng.randint(0, 256, (24, 40), dtype=np.uint8), quality=q
        )
        a = np.frombuffer(J.decode_jpeg(p)["data"], dtype=np.uint8)
        b = np.frombuffer(J.decode_jpeg_py(p)["data"], dtype=np.uint8)
        assert a.shape == b.shape
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1, q
        p = J.encode_jpeg_baseline(
            rng.randint(0, 256, (24, 40, 3), dtype=np.uint8), quality=q
        )
        a = np.frombuffer(J.decode_jpeg(p)["data"], dtype=np.uint8)
        b = np.frombuffer(J.decode_jpeg_py(p)["data"], dtype=np.uint8)
        # RGB conversion amplifies a 1-LSB luma/chroma step by <= 1.772
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 2, q


def test_jpeg_poison_raises_pure_typed_errors():
    rng = np.random.RandomState(9)
    good = J.encode_jpeg_baseline(
        rng.randint(0, 256, (16, 16), dtype=np.uint8), quality=70
    )
    for bad in (good[: len(good) // 2], b"\x12\x34" * 100, b"\x00\x01"):
        with pytest.raises(ValueError) as ei_d:
            J.decode_jpeg(bad)
        with pytest.raises(ValueError) as ei_p:
            J.decode_jpeg_py(bad)
        # the fallback design makes the dispatcher surface the PURE
        # decoder's message — DLQ reasons are env-independent
        assert str(ei_d.value) == str(ei_p.value)


def test_jpeg_corrupt_entropy_matches_pure_verdict():
    """libjpeg only WARNS on corrupt entropy data; the shim turns
    warnings into errors and the dispatcher re-runs pure — so the
    final verdict (decode vs raise, and the exact pixels when pure
    decodes) is always the pure decoder's."""
    rng = np.random.RandomState(5)
    good = J.encode_jpeg_baseline(
        rng.randint(0, 256, (16, 16), dtype=np.uint8), quality=70
    )
    bad = good[:-10] + bytes([good[-10] ^ 0xFF]) + good[-9:]
    try:
        want = J.decode_jpeg_py(bad)
    except ValueError as e:
        with pytest.raises(ValueError) as ei:
            J.decode_jpeg(bad)
        assert str(ei.value) == str(e)
    else:
        assert J.decode_jpeg(bad) == want


def test_png_bit_exact_full_envelope():
    rng = np.random.RandomState(3)
    for ct, nch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for interlace in (False, True):
            w, h = 13, 9
            px = rng.randint(0, 256, w * h * nch, dtype=np.uint8).tobytes()
            filters = None if interlace else [i % 5 for i in range(h)]
            p = M.encode_png(
                w, h, px, color_type=ct, filters=filters, interlace=interlace
            )
            assert M._decode_png(p) == M._decode_png_py(p), (ct, interlace)


def test_png_palette_bit_exact():
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, 3 * 16, dtype=np.uint8).tobytes()
    idx = rng.randint(0, 16, 13 * 9, dtype=np.uint8).tobytes()
    p = M.encode_png(13, 9, idx, color_type=3, palette=pal)
    assert M._decode_png(p) == M._decode_png_py(p)


def test_png_poison_raises_pure_typed_errors():
    rng = np.random.RandomState(6)
    good = M.encode_png(8, 8, rng.randint(0, 256, 64, dtype=np.uint8).tobytes())
    bad_crc = bytearray(good)
    bad_crc[30] ^= 0xFF
    for bad in (bytes(bad_crc), good[:40], b"\x00" * 64, b"GIF89a"):
        with pytest.raises(ValueError) as ei_d:
            M._decode_png(bad)
        with pytest.raises(ValueError) as ei_p:
            M._decode_png_py(bad)
        assert str(ei_d.value) == str(ei_p.value)


def test_decode_payload_routes_through_dispatch():
    """End-to-end through the media seam both dispatchers sit behind."""
    q = 70
    p = J.encode_jpeg_baseline(_dc_gray(q), quality=q)
    assert M.decode_payload("image/jpeg", p) == J.decode_jpeg_py(p)
    rng = np.random.RandomState(8)
    png = M.encode_png(8, 8, rng.randint(0, 256, 64, dtype=np.uint8).tobytes())
    assert M.decode_payload("image/png", png) == M._decode_png_py(png)


def test_off_mode_uses_pure(monkeypatch):
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "off")
    assert not NI.image_shim_enabled()
    q = 55
    p = J.encode_jpeg_baseline(_dc_gray(q), quality=q)
    assert J.decode_jpeg(p) == J.decode_jpeg_py(p)


def test_require_mode_passes_when_buildable(monkeypatch):
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "require")
    assert NI.image_shim_enabled()


def test_shim_cached_on_disk():
    path = NI.shim_path()
    assert path is not None and os.path.exists(path)
    # sha-keyed name: editing the C source invalidates cleanly
    assert "corrie_native_image-" in os.path.basename(path)


def test_png_16bit_bit_exact_and_msb_rule():
    """16-bit PNGs (round-14 envelope widening): the pure decoder
    keeps each big-endian sample's MSB after unfiltering — the libpng
    strip_16 convention — so native == pure bit-exact, and the MSB
    rule itself is pinned against hand-built samples."""
    import numpy as np

    rng = np.random.RandomState(12)
    for ct, nch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        for interlace in (False, True):
            w, h = 9, 7
            hi = rng.randint(0, 256, w * h * nch, dtype=np.uint8)
            lo = rng.randint(0, 256, w * h * nch, dtype=np.uint8)
            px = np.empty(2 * w * h * nch, dtype=np.uint8)
            px[0::2] = hi  # big-endian: MSB first
            px[1::2] = lo
            filters = None if interlace else [i % 5 for i in range(h)]
            p = M.encode_png(
                w, h, px.tobytes(), color_type=ct, filters=filters,
                interlace=interlace, depth=16,
            )
            pure = M._decode_png_py(p)
            assert M._decode_png(p) == pure, (ct, interlace)
            # MSB rule: the decoded bytes are exactly the high bytes
            # (alpha channels stripped for ct 4/6)
            want = hi.reshape(-1, nch)
            if ct in (4, 6):
                want = want[:, : nch - 1]
            assert pure["data"] == want.ravel().tobytes(), (ct, interlace)


def test_png_invalid_depth_color_raises_both_paths():
    import struct as _s
    import zlib as _z

    # spec-invalid 4-bit RGB IHDR: both paths must reject it the
    # same way (dispatcher falls back to pure's typed error)
    ihdr = _s.pack(">IIBBBBB", 4, 1, 4, 2, 0, 0, 0)
    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(
            ">I", _z.crc32(t + d) & 0xFFFFFFFF
        )
    raw = _z.compress(b"\x00\xa0")
    p = (M.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
         + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG"):
        M._decode_png(p)
    with pytest.raises(ValueError, match="unsupported PNG"):
        M._decode_png_py(p)


def test_jpeg_restart_markers_dc_only_bit_exact():
    """DRI/RSTn streams through the dispatcher: DC-only parity holds
    with restart markers live (libjpeg resets DC predictors at RSTn
    exactly like the from-spec decoder)."""
    for q in (40, 85):
        p = J.encode_jpeg_baseline(_dc_gray(q), quality=q, restart_interval=2)
        assert J.decode_jpeg(p) == J.decode_jpeg_py(p), q


def test_png_sub8bit_bit_exact_both_paths():
    """1/2/4-bit grey + palette (round-14 widening): pure unpacks
    MSB-first rows and scales grey by 255/(2^d-1) (the libpng
    expand_gray convention) or passes palette indices to the PLTE
    lookup; native (expand_gray_1_2_4_to_8 / palette_to_rgb) must be
    bit-exact, across plain and Adam7 layouts."""
    rng = np.random.RandomState(21)
    for depth in (1, 2, 4):
        for ct in (0, 3):
            for interlace in (False, True):
                w, h = 13, 9
                px = rng.randint(0, 1 << depth, w * h, dtype=np.uint8)
                kw = dict(color_type=ct, interlace=interlace, depth=depth)
                if ct == 3:
                    kw["palette"] = rng.randint(
                        0, 256, 3 * (1 << depth), dtype=np.uint8
                    ).tobytes()
                if not interlace:
                    kw["filters"] = [i % 5 for i in range(h)]
                p = M.encode_png(w, h, px.tobytes(), **kw)
                pure = M._decode_png_py(p)
                assert M._decode_png(p) == pure, (depth, ct, interlace)
                if ct == 0:
                    want = (
                        px.astype(int) * (255 // ((1 << depth) - 1))
                    ).astype(np.uint8).tobytes()
                else:
                    pal = np.frombuffer(
                        kw["palette"], dtype=np.uint8
                    ).reshape(-1, 3)
                    want = pal[px].ravel().tobytes()
                assert pure["data"] == want, (depth, ct, interlace)


def test_jpeg_ycck_cmyk_dc_only_bit_exact():
    """Adobe 4-component JPEGs (round-14 widening): raw YCCK planes
    from libjpeg (null conversion) + the shared python conversion
    must equal the pure decoder bit-for-bit on the DC-only class, at
    4:4:4 and 4:2:0, and the transform-0 (stored-CMYK) arm too."""
    def dc4(seed):
        img = np.zeros((16, 32, 4), dtype=np.uint8)
        for t in range(2):
            img[:, t * 16 : (t + 1) * 16] = [
                (seed * 13 + t * 29) % 256, (seed * 17 + t * 41) % 256,
                (seed * 19 + t * 53) % 256, (seed * 23 + t * 31) % 256,
            ]
        return img

    for q in (40, 70, 100):
        for sub in ((1, 1), (2, 2)):
            p = J.encode_jpeg_baseline(dc4(q), quality=q, subsampling=sub)
            assert J.adobe_transform(p) == 2
            assert J.decode_jpeg(p) == J.decode_jpeg_py(p), (q, sub)
    # transform 0: patch the APP14 transform byte — planes are then
    # stored CMYK directly; both paths must agree on the change
    p = J.encode_jpeg_baseline(dc4(7), quality=85, subsampling=(1, 1))
    patched = bytearray(p)
    at = patched.index(b"Adobe") + 11
    patched[at] = 0
    patched = bytes(patched)
    assert J.adobe_transform(patched) == 0
    d0, d2 = J.decode_jpeg_py(patched), J.decode_jpeg_py(p)
    assert d0 != d2  # the transform byte is live
    assert J.decode_jpeg(patched) == d0


def test_jpeg_ycck_ac_parity_bounded():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 24, 4), dtype=np.uint8)
    p = J.encode_jpeg_baseline(img, quality=80, subsampling=(1, 1))
    a = np.frombuffer(J.decode_jpeg(p)["data"], dtype=np.uint8).astype(int)
    b = np.frombuffer(J.decode_jpeg_py(p)["data"], dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2


def test_jpeg_ycck_progressive_bit_exact():
    """Progressive 4-component: the SOF2 scan script over YCCK planes
    decodes bit-identically to its baseline twin, and native == pure."""
    img = np.zeros((16, 32, 4), dtype=np.uint8)
    for t in range(2):
        img[:, t * 16 : (t + 1) * 16] = [10 + t * 40, 100, 150, 200]
    p = J.encode_jpeg_progressive(img, quality=70, subsampling=(2, 2))
    b = J.encode_jpeg_baseline(img, quality=70, subsampling=(2, 2))
    assert J.adobe_transform(p) == 2
    assert J.decode_jpeg_py(p) == J.decode_jpeg_py(b)
    assert J.decode_jpeg(p) == J.decode_jpeg_py(p)


def test_gif_lzw_c_twin_bit_exact_fuzz():
    """The shim's from-spec C LZW core (no giflib — zero foreign-ABI
    risk) must equal the pure decoder bit-for-bit: structured repeats
    (dict growth + the K-K-K case), random indices across palette
    sizes, truncation cuts, and the same typed error on garbage."""
    rng = np.random.RandomState(5)
    for trial in range(60):
        n = rng.randint(1, 400)
        ncol = int(rng.choice([2, 4, 16, 256]))
        mcs = max(2, (ncol - 1).bit_length())
        idx = rng.randint(0, ncol, n).astype(np.uint8)
        if trial % 3 == 0:
            idx = np.tile(idx[: max(1, n // 4)], 4)[:n]
        blocks = M._gif_lzw_encode(idx.tobytes(), mcs)
        raw = bytearray()
        p = 0
        while p < len(blocks) and blocks[p] != 0:
            ln = blocks[p]
            raw += blocks[p + 1 : p + 1 + ln]
            p += 1 + ln
        pure = bytes(M._gif_lzw_decode_py(bytes(raw), mcs))
        disp = bytes(M._gif_lzw_decode(bytes(raw), mcs))
        assert pure == disp == idx.tobytes(), (trial, mcs, n)
        for cut in (1, 7, len(raw) // 2):
            assert bytes(M._gif_lzw_decode_py(bytes(raw[:cut]), mcs)) == bytes(
                M._gif_lzw_decode(bytes(raw[:cut]), mcs)
            )
    g = bytes(rng.randint(0, 256, 100, dtype=np.uint8))
    with pytest.raises(ValueError) as e1:
        M._gif_lzw_decode_py(g, 4)
    with pytest.raises(ValueError) as e2:
        M._gif_lzw_decode(g, 4)
    assert str(e1.value) == str(e2.value)


def test_gif_still_and_animation_through_dispatch():
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 8, 9 * 6).astype(np.uint8)
    pal = bytes(rng.randint(0, 256, 8 * 3, dtype=np.uint8))
    gif = M.encode_gif(9, 6, idx.tobytes(), pal)
    d = M._decode_gif(gif)
    palv = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    assert d["data"] == palv[idx].ravel().tobytes()
