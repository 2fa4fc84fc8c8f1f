"""Baseline JPEG codec (operators/jpeg.py): the decoder is validated
three independent ways so an encoder bug cannot silently cancel a
decoder bug — (1) a hand-assembled byte stream with hand-computed
expected pixels, (2) a direct cosine-sum IDCT cross-check against the
matrix IDCT the decoder uses, (3) closed-form DC-only chains replayed
with plain-python arithmetic. Roundtrip bounds then cover the full
AC path.

These tests pin decode_jpeg_py (the from-spec decoder) directly: it
is the semantics reference the native libjpeg dispatch is measured
against, and its exact AC pixel values are its own contract — the
dispatching decode_jpeg may differ by 1 LSB on AC blocks (T.81
tolerance). tests/test_native_image.py covers the dispatcher:
bit-exact on the DC-only oracle class, bounded on AC, fallback on
poison."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from corrie_spark.operators import jpeg as J
from corrie_spark.operators.multimodal import decode_payload


def _rhu(x):
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5 + 1e-9)


# --- 1. hand-assembled stream (decoder-only evidence) ----------------------

def _seg(m, body):
    return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body


def _hand_jpeg() -> bytes:
    """8x8 grayscale, DQT all ones, Annex-K DC/AC luma tables, single
    DC-only block with diff=5. Entropy bits hand-derived from the
    canonical code construction: DC category 3 -> code 100 (len 3),
    magnitude bits 101; AC EOB (symbol 0x00) -> code 1010 (len 4);
    1-padded to 0x96 0xBF."""
    zz_ones = bytes([1] * 64)
    dqt = _seg(0xDB, bytes([0x00]) + zz_ones)
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS)
        + bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS),
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes([0x96, 0xBF]) + b"\xff\xd9"


def test_hand_assembled_dc_block():
    d = J.decode_jpeg_py(_hand_jpeg())
    # DC=5, q=1 -> IDCT constant 5/8 -> round 1 -> +128 = 129
    px = np.frombuffer(d["data"], dtype=np.uint8)
    assert d["width"] == d["height"] == 8 and d["channels"] == 1
    assert (px == 129).all()


# --- 2. IDCT cross-check (independent formulation) -------------------------

def _idct_direct(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT as the literal double cosine sum —
    shares no code with the decoder's matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4
    return out


def test_matrix_idct_matches_direct_sum():
    rng = np.random.default_rng(7)
    coef = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)
    matrix = J._A.T @ coef @ J._A
    assert np.abs(matrix - _idct_direct(coef)).max() < 1e-9


# --- 3. DC-only closed form ------------------------------------------------

def _dc_decode(c: int, q0: int) -> int:
    dcq = _rhu(8 * (c - 128) / q0)
    return int(np.clip(_rhu(dcq * q0 / 8) + 128, 0, 255))


@pytest.mark.parametrize("quality", [10, 40, 50, 75, 90, 100])
def test_gray_dc_only_exact(quality):
    q0 = int(J.scale_quant(J.QUANT_LUMA, quality)[0])
    blocks = [(7 + 31 * b) % 256 for b in range(6)]  # 3x2 blocks
    img = np.zeros((16, 24), dtype=np.uint8)
    for b, c in enumerate(blocks):
        r, col = divmod(b, 3)
        img[r * 8 : r * 8 + 8, col * 8 : col * 8 + 8] = c
    out = np.frombuffer(
        J.decode_jpeg_py(J.encode_jpeg_baseline(img, quality=quality))["data"],
        dtype=np.uint8,
    ).reshape(16, 24)
    for b, c in enumerate(blocks):
        r, col = divmod(b, 3)
        blk = out[r * 8 : r * 8 + 8, col * 8 : col * 8 + 8]
        assert (blk == _dc_decode(c, q0)).all()


def test_color_420_dc_only_exact():
    quality = 65
    qy = int(J.scale_quant(J.QUANT_LUMA, quality)[0])
    qc = int(J.scale_quant(J.QUANT_CHROMA, quality)[0])
    # two 16x16 constant-YCbCr MCU tiles
    tiles = [(120, 90, 200), (30, 180, 60)]
    ycc = np.zeros((16, 32, 3), dtype=np.uint8)
    for t, (y, cb, cr) in enumerate(tiles):
        ycc[:, t * 16 : t * 16 + 16] = (y, cb, cr)
    dec = J.decode_jpeg_py(J.encode_jpeg_baseline(ycc, quality=quality, subsampling=(2, 2)))
    rgb = np.frombuffer(dec["data"], dtype=np.uint8).reshape(16, 32, 3)
    for t, (y, cb, cr) in enumerate(tiles):
        yd, cbd, crd = _dc_decode(y, qy), _dc_decode(cb, qc), _dc_decode(cr, qc)
        r = np.clip(np.floor(yd + 1.402 * (crd - 128) + 0.5), 0, 255)
        g = np.clip(
            np.floor(yd - 0.344136 * (cbd - 128) - 0.714136 * (crd - 128) + 0.5), 0, 255
        )
        b = np.clip(np.floor(yd + 1.772 * (cbd - 128) + 0.5), 0, 255)
        tile = rgb[:, t * 16 : t * 16 + 16]
        assert (tile == np.array([r, g, b], dtype=np.uint8)).all()


# --- roundtrip bounds (AC path, odd dims, restarts) ------------------------

def test_gray_roundtrip_bounded_error():
    rng = np.random.default_rng(11)
    base = np.add.outer(np.arange(23) * 4, np.arange(33) * 2) % 200
    img = (base + rng.integers(0, 8, size=base.shape)).astype(np.uint8)
    dec = J.decode_jpeg_py(J.encode_jpeg_baseline(img, quality=98))
    out = np.frombuffer(dec["data"], dtype=np.uint8).reshape(23, 33)
    assert (dec["width"], dec["height"]) == (33, 23)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_quality_all_ones_near_lossless():
    # quality=100 -> every quant entry 1: only DCT float rounding left
    rng = np.random.default_rng(13)
    img = rng.integers(60, 196, size=(16, 16), dtype=np.uint8)  # away from clip
    dec = J.decode_jpeg_py(J.encode_jpeg_baseline(img, quality=100))
    out = np.frombuffer(dec["data"], dtype=np.uint8).reshape(16, 16)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_restart_markers_change_bytes_not_pixels():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    plain = J.encode_jpeg_baseline(img, quality=85)
    rst = J.encode_jpeg_baseline(img, quality=85, restart_interval=2)
    assert b"\xff\xd0" in rst and b"\xff\xd0" not in plain
    a = J.decode_jpeg_py(plain)["data"]
    b = J.decode_jpeg_py(rst)["data"]
    assert a == b


def test_color_444_roundtrip_bounded():
    rng = np.random.default_rng(19)
    ycc = rng.integers(80, 176, size=(17, 19, 3), dtype=np.uint8)
    dec = J.decode_jpeg_py(J.encode_jpeg_baseline(ycc, quality=97, subsampling=(1, 1)))
    rgb = np.frombuffer(dec["data"], dtype=np.uint8).reshape(17, 19, 3)
    exp = J.ycbcr_to_rgb(
        ycc[..., 0].astype(float), ycc[..., 1].astype(float), ycc[..., 2].astype(float)
    )
    # chroma quant at q97 is small; allow codec loss on top of color space
    assert np.abs(rgb.astype(int) - exp.astype(int)).max() <= 16


def test_byte_stuffing_roundtrip():
    # random blocks at quality 100 produce long entropy streams that
    # hit 0xFF bytes with high probability; decode must still match
    # within the 1-2 LSB of DCT float rounding
    for seed in range(4):
        img = np.random.default_rng(seed).integers(0, 256, size=(8, 8), dtype=np.uint8)
        enc = J.encode_jpeg_baseline(img, quality=100)
        out = np.frombuffer(J.decode_jpeg_py(enc)["data"], dtype=np.uint8).reshape(8, 8)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


# --- format edges ----------------------------------------------------------

def test_sequential_scan_inside_sof2_rejected():
    # a baseline stream with SOF0 flipped to SOF2 is NOT a valid
    # progressive stream (its single scan spans Ss=0..Se=63, which
    # progressive forbids) — the progressive decoder must reject it,
    # not decode garbage
    enc = bytearray(J.encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="DC scan"):
        J.decode_jpeg_py(bytes(enc))


def test_truncated_and_garbage_raise():
    enc = J.encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        J.decode_jpeg_py(enc[:20])
    with pytest.raises(ValueError):
        J.decode_jpeg_py(b"\x00\x01\x02\x03")


def test_decode_payload_dispatch():
    img = np.full((8, 8), 200, dtype=np.uint8)
    enc = J.encode_jpeg_baseline(img, quality=90)
    d = decode_payload("image/jpeg", enc)
    assert d["kind"] == "image" and d["width"] == 8 and d["channels"] == 1


def test_sof1_extended_sequential_accepted():
    enc = bytearray(J.encode_jpeg_baseline(np.full((8, 8), 99, dtype=np.uint8)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC1
    d = J.decode_jpeg_py(bytes(enc))
    assert d["width"] == 8


# --- progressive (SOF2) -----------------------------------------------------


@pytest.mark.parametrize("quality", [55, 90])
@pytest.mark.parametrize("shape", ["gray", "color420", "color444"])
def test_progressive_bit_identical_to_baseline(quality, shape):
    # same pixels through both encoders must DECODE bit-identically:
    # the progressive scan script (DC/AC split, 2-level successive
    # approximation) carries exactly the baseline's quantized
    # coefficients. Odd dims exercise the non-interleaved component
    # block grid (narrower than the MCU-padded allocation).
    rng = np.random.default_rng(quality)
    if shape == "gray":
        img = rng.integers(0, 256, (19, 23)).astype(np.uint8)
        sub = (1, 1)
    else:
        img = rng.integers(0, 256, (17, 25, 3)).astype(np.uint8)
        sub = (2, 2) if shape == "color420" else (1, 1)
    base = J.decode_jpeg_py(J.encode_jpeg_baseline(img, quality=quality, subsampling=sub))
    prog = J.decode_jpeg_py(J.encode_jpeg_progressive(img, quality=quality, subsampling=sub))
    assert (base["width"], base["height"], base["channels"]) == (
        prog["width"], prog["height"], prog["channels"])
    assert base["data"] == prog["data"]


def test_progressive_eobrun_hand_stream():
    # hand-assembled 16x8 gray progressive stream with a custom AC
    # table carrying an EOB1 symbol (0x10): block 1 codes one AC
    # coefficient then EOBRUN=2 covering itself and block 2 — the
    # EOBn>1 path the Annex-K-table encoder can't emit.
    dqt = bytes([0x00]) + bytes([1] * 64)           # all-ones table
    sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    dht = bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([2, 3])       # DC: mags 2,3
    dht += bytes([0x10]) + bytes([0, 2] + [0] * 14) + bytes([0x02, 0x10])  # AC
    sos_dc = bytes([1, 1, 0x00, 0, 0, 0x00])
    # DC scan bits: blk1 mag2('00')+val 3('11'); blk2 mag2('00')+diff 2('10')
    dc_data = bytes([0b00110010])
    sos_ac = bytes([1, 1, 0x00, 1, 63, 0x00])
    # AC scan bits: blk1 (0,2)('00')+val 2('10'); EOB1('01')+1 extra bit 0
    # -> eobrun covers blk2 entirely; pad with 1s
    ac_data = bytes([0b00100101])
    stream = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof) + _seg(0xC4, dht)
              + _seg(0xDA, sos_dc) + dc_data + _seg(0xDA, sos_ac) + ac_data
              + b"\xff\xd9")
    d = J.decode_jpeg_py(stream)
    assert (d["width"], d["height"], d["channels"]) == (16, 8, 1)
    # expected: block1 coef {DC=3, zigzag#1=2}, block2 coef {DC=5}
    got = np.frombuffer(d["data"], np.uint8).reshape(8, 16)
    for bx, coefvec in enumerate(([3, 2], [5])):
        coef = np.zeros(64, dtype=np.int64)
        for k, v in enumerate(coefvec):
            coef[J.ZIGZAG[k]] = v
        px = J._A.T @ coef.reshape(8, 8).astype(np.float64) @ J._A
        exp = np.clip(J._round_half_up(px) + 128.0, 0, 255).astype(np.uint8)
        assert (got[:, bx * 8 : bx * 8 + 8] == exp).all()


def test_progressive_via_decode_payload():
    img = np.full((10, 12), 77, dtype=np.uint8)
    d = decode_payload("image/jpeg", J.encode_jpeg_progressive(img, quality=80))
    assert d["kind"] == "image" and (d["width"], d["height"]) == (12, 10)


def test_ycck_convention_pins():
    """The Adobe 4-component convention chain, pinned on physical
    anchors: white paper (stored CMY=255 -> complement 0 -> Y'=0,
    K=255) decodes to RGB 255; full black ink (K=0) to RGB 0; pure
    cyan ink to (0, 255, 255)."""
    import numpy as np

    def solid(y, cb, cr, k):
        img = np.zeros((8, 8, 4), dtype=np.uint8)
        img[:] = [y, cb, cr, k]
        p = J.encode_jpeg_baseline(img, quality=100, subsampling=(1, 1))
        return np.frombuffer(
            J.decode_jpeg_py(p)["data"], dtype=np.uint8
        ).reshape(8, 8, 3)

    assert (solid(0, 128, 128, 255) == 255).all()  # white paper
    assert (solid(0, 128, 128, 0) == 0).all()      # solid K ink
    ycc = J.rgb_to_ycbcr(np.full((8, 8, 3), [255, 0, 0], dtype=np.uint8))
    img = np.dstack([ycc, np.full((8, 8, 1), 255, dtype=np.uint8)])
    p = J.encode_jpeg_baseline(
        img.astype(np.uint8), quality=100, subsampling=(1, 1)
    )
    got = np.frombuffer(
        J.decode_jpeg_py(p)["data"], dtype=np.uint8
    ).reshape(8, 8, 3)[4, 4]
    assert got[0] <= 2 and got[1] >= 253 and got[2] >= 253  # cyan
