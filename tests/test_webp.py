"""WebP VP8L (operators/webp.py): writer-twin round trips, a
hand-written spec-convention pin, poison safety, and — decisive —
differential validation against the real libwebp (present in this
environment) in BOTH directions across image classes that exercise
the predictor/color transforms, palette, color cache and LZ77 paths.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hashlib

import pytest

from corrie_spark.operators import webp as WP

_LIBWEBP_NAME = ctypes.util.find_library("webp")


def _load_libwebp():
    if not _LIBWEBP_NAME:
        return None
    try:
        lib = ctypes.CDLL(_LIBWEBP_NAME)
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    except OSError:
        return None


_REF = _load_libwebp()
needs_ref = pytest.mark.skipif(_REF is None, reason="no libwebp")


def ref_encode(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.c_void_p()
    n = _REF.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n
    try:
        return ctypes.string_at(out, n)
    finally:
        _REF.WebPFree(out)


def ref_decode(blob: bytes) -> tuple[int, int, bytes]:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _REF.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    assert p
    try:
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)
    finally:
        _REF.WebPFree(p)


def _rgb(salt: str, w: int, h: int, mode: str) -> bytes:
    out = bytearray()
    for i in range(w * h):
        if mode == "gradient":
            r, g, b = (i * 3) % 256, (i * 7) % 256, (i * 11) % 256
        elif mode == "palette":
            k = int(hashlib.md5(f"{salt}:{i // 4}".encode()).hexdigest()[:2], 16) % 5
            r, g, b = [(10, 20, 30), (200, 100, 0), (0, 0, 0),
                       (255, 255, 255), (55, 99, 155)][k]
        elif mode == "noise":
            d = hashlib.md5(f"{salt}:{i}".encode()).digest()
            r, g, b = d[0], d[1], d[2]
        else:  # repeats: LZ77-heavy
            j = i % 37
            r, g, b = (j * 5) % 256, (j * 9) % 256, (j * 13) % 256
        out += bytes((r, g, b))
    return bytes(out)


# ---------------------------------------------------------------------------
# twin + hand pin
# ---------------------------------------------------------------------------


def test_twin_roundtrip():
    for w, h in ((1, 1), (7, 5), (16, 9), (31, 2), (64, 64)):
        rgb = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
        blob = WP.encode_webp_lossless(w, h, rgb)
        d = WP.decode_webp_py(blob)
        assert (d["kind"], d["width"], d["height"]) == ("image", w, h)
        assert d["data"] == rgb


def test_hand_written_bitstream_pin():
    """1x1 image built bit-by-bit FROM THE SPEC TEXT, independently of
    the module's BitWriter (the round-12 shared-convention lesson):
    5-byte header (sig 0x2F, 14+14 zero size bits, alpha 0, version
    0), no transform/cache/meta bits, five SIMPLE prefix codes —
    green 8-bit symbol 0x12, red 1-bit symbol 1, blue symbol 0,
    alpha symbol 1, distance symbol 0 — single-symbol codes read
    ZERO bits, so the one pixel costs no further bits."""
    bits = []

    def put(v, n):
        for i in range(n):
            bits.append((v >> i) & 1)

    put(0, 3)  # no transform, no cache, no meta
    # green: simple, 1 symbol, 8-bit-first, 0x12
    put(1, 1); put(0, 1); put(1, 1); put(0x12, 8)  # noqa: E702
    for sym in (1, 0, 1, 0):  # red, blue, alpha, distance (1-bit first)
        put(1, 1); put(0, 1); put(0, 1); put(sym, 1)  # noqa: E702
    body = bytearray([0x2F, 0, 0, 0, 0])
    acc = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        acc[i >> 3] |= b << (i & 7)
    body += acc
    w, h, pix = WP.decode_vp8l(bytes(body))
    assert (w, h) == (1, 1)
    assert pix == [(1 << 24) | (1 << 16) | (0x12 << 8) | 0]


def test_poison_streams_raise_not_crash():
    rgb = bytes(range(48)) * 2  # 4x8 RGB
    blob = WP.encode_webp_lossless(4, 8, rgb)
    with pytest.raises(WP.WebpError):
        WP.decode_webp(b"RIFX" + blob[4:])
    with pytest.raises(WP.WebpError):
        WP.decode_webp(blob[:20])  # truncated
    with pytest.raises(WP.WebpError):
        WP.decode_vp8l(b"\x30" + bytes(10))  # bad signature
    # lossy VP8 is the documented seam
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(WP.WebpError, match="lossy"):
        WP.decode_webp(lossy)
    # corrupt interior bytes: must raise or mis-decode, never hang/crash
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0xFF
    try:
        WP.decode_webp(bytes(bad))
    except WP.WebpError:
        pass


# ---------------------------------------------------------------------------
# differential vs libwebp
# ---------------------------------------------------------------------------


@needs_ref
@pytest.mark.parametrize("mode", ["gradient", "palette", "noise", "repeats"])
def test_decode_real_libwebp_streams(mode):
    """Real encoder output (predictor + color transforms, subtract
    green, palette, color cache, LZ77 2D distances) decodes
    byte-exactly."""
    for w, h in ((1, 1), (13, 7), (40, 33), (64, 48), (129, 65)):
        rgb = _rgb(mode, w, h, mode)
        rgba = b"".join(rgb[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))
        blob = ref_encode(rgba, w, h)
        d = WP.decode_webp_py(blob)
        assert (d["width"], d["height"]) == (w, h), (mode, w, h)
        assert d["data"] == rgb, (mode, w, h)
        assert WP.decode_webp(blob) == d  # dispatching entry agrees


@needs_ref
def test_reference_decodes_our_twin():
    rgb = _rgb("tw", 20, 10, "gradient")
    blob = WP.encode_webp_lossless(20, 10, rgb)
    w, h, rgba = ref_decode(blob)
    assert (w, h) == (20, 10)
    assert rgba == b"".join(
        rgb[3 * i : 3 * i + 3] + b"\xff" for i in range(200)
    )


@needs_ref
def test_decode_fuzz_vs_reference():
    """Random-content images across aspect ratios: every libwebp
    lossless stream decodes identically."""
    for trial in range(40):
        d = hashlib.md5(b"wh:%d" % trial).digest()
        w = 1 + d[0] % 50
        h = 1 + d[1] % 50
        rgb = _rgb(f"f{trial}", w, h, ("noise", "palette", "gradient", "repeats")[trial % 4])
        rgba = b"".join(rgb[3 * i : 3 * i + 3] + b"\xff" for i in range(w * h))
        blob = ref_encode(rgba, w, h)
        got = WP.decode_webp_py(blob)
        assert got["data"] == rgb, trial


def test_decode_payload_dispatch():
    from corrie_spark.operators.multimodal import decode_payload

    rgb = _rgb("dp", 6, 5, "gradient")
    d = decode_payload("image/webp", WP.encode_webp_lossless(6, 5, rgb))
    assert d["kind"] == "image" and d["data"] == rgb


def test_native_decode_dispatch_parity(monkeypatch):
    """decode_webp (libwebp when loadable) == decode_webp_py on twin
    and real streams, and CORRIE_NATIVE_CODECS=off forces the pure
    path through the dispatching entry."""
    rgb = _rgb("dsp", 11, 8, "gradient")
    blob = WP.encode_webp_lossless(11, 8, rgb)
    assert WP.decode_webp(blob) == WP.decode_webp_py(blob)
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "off")
    assert WP.decode_webp(blob)["data"] == rgb


def test_native_encoder_arm_matches_twin():
    rgb = _rgb("arm", 9, 6, "repeats")
    twin = WP.decode_webp_py(WP.encode_webp_lossless(9, 6, rgb))["data"]
    native = WP.encode_webp_native(9, 6, rgb)
    if native is None:
        pytest.skip("no libwebp")
    assert WP.decode_webp_py(native)["data"] == twin == rgb
