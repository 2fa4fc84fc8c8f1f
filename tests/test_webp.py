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


# --- animation (ANIM/ANMF chunk walk) --------------------------------------


def test_animation_roundtrip_composite():
    """Writer twin -> decoder: frame rects composite onto the
    background canvas; durations and loop count survive the walk."""
    import numpy as np

    frames = [
        (4 * f, 0, 4, 4, bytes([40 + 50 * f] * 48), 30 + f, 0)
        for f in range(3)
    ]
    p = WP.encode_webp_animation(12, 4, frames, bg_rgb=(7, 7, 7), loop_count=5)
    assert WP.is_animated_webp(p)
    d = WP.decode_webp_animation(p)
    assert d["kind"] == "video"
    assert d["n_frames"] == 3
    assert d["frame_size"] == 12 * 4 * 3
    assert d["durations_ms"] == [30, 31, 32]
    assert d["loop_count"] == 5
    arr = np.frombuffer(d["data"], dtype=np.uint8).reshape(3, 4, 12, 3)
    # frame 0: rect 0 painted, rest background
    assert (arr[0, :, :4] == 40).all() and (arr[0, :, 4:] == 7).all()
    # frame 2: all three rects painted (accumulating, no dispose)
    assert (arr[2, :, :4] == 40).all()
    assert (arr[2, :, 4:8] == 90).all()
    assert (arr[2, :, 8:] == 140).all()


def test_animation_dispose_to_background():
    import numpy as np

    frames = [
        (0, 0, 4, 4, bytes([10] * 48), 20, 1),  # dispose after snapshot
        (4, 0, 4, 4, bytes([200] * 48), 20, 0),
    ]
    p = WP.encode_webp_animation(8, 4, frames, bg_rgb=(50, 50, 50))
    d = WP.decode_webp_animation(p)
    arr = np.frombuffer(d["data"], dtype=np.uint8).reshape(2, 4, 8, 3)
    assert (arr[0, :, :4] == 10).all()
    # frame 1 snapshot: rect 0 restored to background, rect 1 painted
    assert (arr[1, :, :4] == 50).all() and (arr[1, :, 4:] == 200).all()


def test_animation_container_layout_hand_pinned():
    """The chunk grammar restated BYTE-BY-BYTE from the public
    container spec, independently of the writer: VP8X flags bit 1,
    24-bit LE canvas w-1/h-1; ANIM background in [B,G,R,A] order +
    u16 loop; ANMF x/2, y/2, w-1, h-1, duration, flags byte."""
    p = WP.encode_webp_animation(
        300, 200,
        [(2, 4, 5, 3, bytes([9] * 45), 0x01020A, 1)],
        bg_rgb=(0x11, 0x22, 0x33),
        loop_count=0x0405,
    )
    assert p[:4] == b"RIFF" and p[8:12] == b"WEBP"
    assert p[12:16] == b"VP8X"
    vp8x = p[20:30]
    assert vp8x[0] == 0x02  # animation flag only
    assert vp8x[4:7] == (300 - 1).to_bytes(3, "little")
    assert vp8x[7:10] == (200 - 1).to_bytes(3, "little")
    assert p[30:34] == b"ANIM"
    anim = p[38:44]
    assert anim[:4] == bytes([0x33, 0x22, 0x11, 0xFF])  # B,G,R,A
    assert anim[4:6] == (0x0405).to_bytes(2, "little")
    assert p[44:48] == b"ANMF"
    anmf = p[52:68]
    assert anmf[0:3] == (1).to_bytes(3, "little")   # x/2
    assert anmf[3:6] == (2).to_bytes(3, "little")   # y/2
    assert anmf[6:9] == (4).to_bytes(3, "little")   # w-1
    assert anmf[9:12] == (2).to_bytes(3, "little")  # h-1
    assert anmf[12:15] == (0x01020A).to_bytes(3, "little")
    assert anmf[15] == (1 << 1) | 1  # no-blend + dispose


def test_animation_poison():
    good = WP.encode_webp_animation(
        8, 4, [(0, 0, 4, 4, bytes([1] * 48), 10, 0)]
    )
    # lossy VP8 sub-frame -> documented seam error
    lossy = good.replace(b"VP8L", b"VP8 ")
    with pytest.raises(WP.WebpError, match="lossy VP8"):
        WP.decode_webp_animation(lossy)
    # frame rect outside the canvas
    bad = bytearray(good)
    off = bad.index(b"ANMF") + 8
    bad[off : off + 3] = (40).to_bytes(3, "little")  # x = 80 > canvas
    with pytest.raises(WP.WebpError, match="outside canvas"):
        WP.decode_webp_animation(bytes(bad))
    # missing ANIM chunk
    no_anim = good[:30] + good[44:]
    with pytest.raises(WP.WebpError, match="missing VP8X/ANIM"):
        WP.decode_webp_animation(no_anim)
    # stills are not animations: both the probe and decode agree
    still = WP.encode_webp_lossless(4, 4, bytes(48))
    assert not WP.is_animated_webp(still)
    with pytest.raises(WP.WebpError):
        WP.decode_webp_animation(still)


def test_animation_routes_as_video_via_decode_payload():
    from corrie_spark.operators.multimodal import decode_payload

    p = WP.encode_webp_animation(
        8, 4, [(0, 0, 4, 4, bytes([1] * 48), 10, 0)] * 2
    )
    d = decode_payload("image/webp", p)
    assert d["kind"] == "video" and d["n_frames"] == 2
    still = WP.encode_webp_lossless(4, 4, bytes(48))
    assert decode_payload("image/webp", still)["kind"] == "image"


def test_webp_metadata_scan():
    """Header-only container scan (the parse_jpeg_metadata twin):
    dims, kind, EXIF orientation/datetime through the shared TIFF-IFD
    parser (Exif prefix tolerated both ways), animation frame count
    and summed durations — no pixel decode."""
    from corrie_spark.operators.jpeg import build_exif_app1

    exif = build_exif_app1(
        orientation=6, datetime_str="2026:01:02 03:04:05", byte_order="MM"
    )[6:]
    p = WP.encode_webp_with_exif(5, 4, bytes(60), exif)
    m = WP.webp_metadata(p)
    assert (m["width"], m["height"], m["kind"]) == (5, 4, "lossless")
    assert m["has_exif"] and m["orientation"] == 6
    assert m["datetime"] == "2026:01:02 03:04:05"
    # with the Exif\0\0 prefix stored verbatim (writer convention B)
    p2 = WP.encode_webp_with_exif(5, 4, bytes(60), b"Exif\x00\x00" + exif)
    assert WP.webp_metadata(p2)["orientation"] == 6
    # the EXIF chunk never disturbs pixel decode
    assert WP.decode_webp(p)["width"] == 5
    # plain still: dims from the VP8L header, no metadata flags
    still = WP.encode_webp_lossless(7, 3, bytes(63))
    ms = WP.webp_metadata(still)
    assert (ms["width"], ms["height"]) == (7, 3)
    assert not ms["has_exif"] and not ms["animated"]
    # animation: frame count + total duration, no decode
    frames = [
        (0, 0, 4, 4, bytes([1] * 48), 30, 0),
        (4, 0, 4, 4, bytes([2] * 48), 45, 0),
    ]
    ma = WP.webp_metadata(WP.encode_webp_animation(8, 4, frames))
    assert ma["animated"] and ma["n_frames"] == 2
    assert ma["total_duration_ms"] == 75
    with pytest.raises(WP.WebpError):
        WP.webp_metadata(b"RIFFxxxxNOPE")
