"""WebP lossless (VP8L) — from-spec decoder + fixture writer twin.

Sources: the public "WebP Lossless Bitstream Specification" and the
RIFF container layout (both published by the WebP project); no code
from libwebp — the installed libwebp.so.7 is used ONLY as the
differential-validation witness in tests/test_webp.py (the round-12b
lesson: reference streams catch convention bugs twin tests cannot).

Decoder coverage: the full VP8L feature set — all four transforms
(predictor / color / subtract-green / color-indexing incl. pixel
bundling), color cache, meta prefix codes (the "huffman image"),
simple and normal prefix codes with the code-length code, LZ77
backward references through the 120-entry 2D distance map — plus the
extended container's ANIMATION walk (VP8X/ANIM/ANMF: frame metadata,
durations, loop count, background-dispose compositing of VP8L
sub-frames onto the canvas, the GIF89a-path twin). Lossy VP8 pixel
decode (still or animation frame) stays the documented external seam
(ValueError -> poison row upstream, same stance as exotic PNG
variants).

Output contract matches the sibling decoders in
operators/multimodal.py: {"kind": "image", "width", "height",
"data": RGB triples top-down} (alpha stripped after decode, like the
PNG path).

Scale shape: runs inside the existing mapInPandas image stages —
per-payload local work, bytes never shuffle. Bulk decode IS wired to
libwebp: `decode_webp` dispatches the VP8L pixel path through
`sources/native.py` (policy env CORRIE_NATIVE_CODECS) when the
library loads, with this from-spec decoder as the always-available
fallback and differential twin — see `decode_webp` below and
tests/test_webp.py's native==pure parity cases.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_webp",
    "decode_webp_py",
    "decode_webp_animation",
    "encode_webp_lossless",
    "encode_webp_animation",
    "encode_webp_with_exif",
    "is_animated_webp",
    "webp_metadata",
    "WebpError",
]


class WebpError(ValueError):
    pass


# --------------------------------------------------------------------------
# bit io (VP8L is LSB-first little-endian)
# --------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if self.pos + k > self.n:
            raise WebpError("truncated VP8L bitstream")
        v = 0
        p = self.pos
        d = self.data
        for i in range(k):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + k
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise WebpError("truncated VP8L bitstream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


# --------------------------------------------------------------------------
# canonical prefix codes (DEFLATE convention: codes assigned in symbol
# order within ascending lengths; code bits read MSB-of-code first
# from the LSB-first stream)
# --------------------------------------------------------------------------


class _Prefix:
    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise WebpError("empty prefix code")
        if len(used) == 1:
            # single-symbol code: reads ZERO bits (the spec/libwebp
            # trivial-code rule)
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        used.sort()
        kraft = sum(1 << (15 - ln) for ln, _ in used)
        if kraft != 1 << 15:
            raise WebpError("invalid prefix code (Kraft)")
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = used[0][0]
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        self.table = table
        self.max_len = used[-1][0]

    def decode(self, bits: _Bits) -> int:
        if self.table is None:
            return self.single
        code = 0
        ln = 0
        t = self.table
        mx = self.max_len
        while ln < mx:
            code = (code << 1) | bits.read1()
            ln += 1
            s = t.get((ln, code))
            if s is not None:
                return s
        raise WebpError("corrupt prefix code stream")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    if bits.read1():  # simple code
        num_symbols = bits.read1() + 1
        first_8 = bits.read1()
        lengths = [0] * alphabet_size
        s0 = bits.read(8 if first_8 else 1)
        if s0 >= alphabet_size:
            raise WebpError("simple-code symbol out of range")
        if num_symbols == 2:
            s1 = bits.read(8)
            if s1 >= alphabet_size:
                raise WebpError("simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1  # single symbol -> trivial 0-bit code
        return _Prefix(lengths)
    # normal: code-length code first
    num_clc = 4 + bits.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = bits.read(3)
    clc = _Prefix(clc_lengths)
    # symbol count bound
    if bits.read1():
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
        if max_symbol > alphabet_size:
            raise WebpError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.decode(bits)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat = bits.read(2) + 3
                fill = prev_len
            elif code_len == 17:
                repeat = bits.read(3) + 3
                fill = 0
            else:
                repeat = bits.read(7) + 11
                fill = 0
            if symbol + repeat > alphabet_size:
                raise WebpError("code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Prefix(lengths)


# --------------------------------------------------------------------------
# LZ77 helpers
# --------------------------------------------------------------------------


def _lz77_value(code: int, bits: _Bits) -> int:
    """length/distance prefix decode (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


# the spec's 120-entry plane-code table: byte = (dy << 4) | (8 - dx)
_DIST_MAP = bytes(
    [
        0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
        0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
        0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
        0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
        0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
        0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
        0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
        0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
        0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
        0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
        0x4F, 0x10, 0x20, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
        0x40, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x60, 0x70,
    ]
)


def _plane_code_to_distance(width: int, plane_code: int) -> int:
    if plane_code > len(_DIST_MAP):
        return plane_code - len(_DIST_MAP)
    code = _DIST_MAP[plane_code - 1]
    yoff = code >> 4
    xoff = 8 - (code & 0xF)
    dist = yoff * width + xoff
    return dist if dist >= 1 else 1


# --------------------------------------------------------------------------
# entropy-coded image (pixels as (a, r, g, b) ints packed in one u32)
# --------------------------------------------------------------------------


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


_CACHE_MULT = 0x1E35A7BD


def _decode_image_stream(
    bits: _Bits, w: int, h: int, level0: bool
) -> tuple[list[int], list]:
    """Returns (pixels as u32 ARGB, transforms list) — transforms only
    ever non-empty at level 0."""
    transforms = []
    seen_types = set()
    xsize = w
    if level0:
        while bits.read1():
            ttype = bits.read(2)
            if ttype in seen_types:
                raise WebpError("duplicate transform")
            seen_types.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                size_bits = bits.read(3) + 2
                tw = _subsample(xsize, size_bits)
                th = _subsample(h, size_bits)
                timg, _ = _decode_image_stream(bits, tw, th, False)
                # xsize AT READ TIME: a transform read after a
                # color-indexing transform operates on the bundled
                # image and must invert at that width
                transforms.append((ttype, size_bits, timg, xsize))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, xsize))
            else:  # color indexing (palette)
                psize = bits.read(8) + 1
                pimg, _ = _decode_image_stream(bits, psize, 1, False)
                # delta-summed palette entries, per channel mod 256
                palette = []
                prev = 0
                for p in pimg:
                    cur = (
                        (((prev >> 24) + (p >> 24)) & 0xFF) << 24
                        | ((((prev >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8
                        | (((prev & 0xFF) + (p & 0xFF)) & 0xFF)
                    )
                    palette.append(cur)
                    prev = cur
                if psize <= 2:
                    wb = 3
                elif psize <= 4:
                    wb = 2
                elif psize <= 16:
                    wb = 1
                else:
                    wb = 0
                transforms.append((3, (wb, xsize, palette), None, xsize))
                xsize = _subsample(xsize, wb)  # bundled width

    # color cache
    cache_bits = 0
    if bits.read1():
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix codes
    meta_img = None
    meta_bits_ = 0
    num_groups = 1
    if level0 and bits.read1():
        meta_bits_ = bits.read(3) + 2
        mw = _subsample(xsize, meta_bits_)
        mh = _subsample(h, meta_bits_)
        meta_img, _ = _decode_image_stream(bits, mw, mh, False)
        num_groups = 1 + max(((p >> 8) & 0xFFFF) for p in meta_img)

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(bits, green_size)
        r = _read_prefix_code(bits, 256)
        b = _read_prefix_code(bits, 256)
        a = _read_prefix_code(bits, 256)
        d = _read_prefix_code(bits, 40)
        groups.append((g, r, b, a, d))

    npix = xsize * h
    out: list[int] = [0] * npix
    pos = 0
    mrow_w = _subsample(xsize, meta_bits_) if meta_img is not None else 0
    group = groups[0]
    last_meta_idx = -1
    while pos < npix:
        if meta_img is not None:
            x = pos % xsize
            y = pos // xsize
            mi = (y >> meta_bits_) * mrow_w + (x >> meta_bits_)
            if mi != last_meta_idx:
                last_meta_idx = mi
                group = groups[(meta_img[mi] >> 8) & 0xFFFF]
        gcode, rcode, bcode, acode, dcode = group
        s = gcode.decode(bits)
        if s < 256:
            red = rcode.decode(bits)
            blue = bcode.decode(bits)
            alpha = acode.decode(bits)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_value(s - 256, bits)
            dist_code = dcode.decode(bits)
            dist = _plane_code_to_distance(xsize, _lz77_value(dist_code, bits))
            if dist > pos or pos + length > npix:
                raise WebpError("backward reference out of range")
            src = pos - dist
            if cache_bits:
                for _ in range(length):
                    px = out[src]
                    out[pos] = px
                    cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                    src += 1
                    pos += 1
            else:
                for _ in range(length):
                    out[pos] = out[src]
                    src += 1
                    pos += 1
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _add_pixels(a: int, p: int) -> int:
    return (
        ((((a >> 24) + (p >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (p & 0xFF)) & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(l: int, t: int, tl: int) -> int:
    # sum over channels of |L-TL| - |T-TL|; T wins ties (the spec's
    # pa_minus_pb <= 0 convention)
    d = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        d += abs(lc - tlc) - abs(tc - tlc)
    return t if d <= 0 else l


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= _clamp(v) << sh
    return out


def _cas_half(lt: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (lt >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc division
        out |= _clamp(a + half) << sh
    return out


def _inv_predictor(pix: list[int], w: int, h: int, size_bits: int, timg: list[int]) -> None:
    tw = _subsample(w, size_bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # left
            elif x == 0:
                pred = pix[i - w]  # top
            else:
                mode = (timg[(y >> size_bits) * tw + (x >> size_bits)] >> 8) & 0xFF
                l = pix[i - 1]
                t = pix[i - w]
                tl = pix[i - w - 1]
                # TR is the linear-array neighbour i-w+1 ALWAYS: for
                # the last column that wraps to the CURRENT row's
                # leftmost pixel (already reconstructed) — the
                # conformance behavior the reference decoder defines
                tr = pix[i - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l, t, tl)
                elif mode == 12:
                    pred = _cas_full(l, t, tl)
                elif mode == 13:
                    pred = _cas_half(_avg2(l, t), tl)
                else:
                    raise WebpError(f"bad predictor mode {mode}")
            pix[i] = _add_pixels(pix[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color(pix: list[int], w: int, h: int, size_bits: int, timg: list[int]) -> None:
    tw = _subsample(w, size_bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = timg[(y >> size_bits) * tw + (x >> size_bits)]
            # ColorCodeToMultipliers convention: bits 0-7 (the BLUE
            # channel) = green_to_red, 8-15 (GREEN) = green_to_blue,
            # 16-23 (RED) = red_to_blue
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = pix[i]
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r = (r + _delta(g2r, g)) & 0xFF
            b = (b + _delta(g2b, g) + _delta(r2b, r)) & 0xFF
            pix[i] = (px & 0xFF000000) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pix: list[int]) -> None:
    for i, px in enumerate(pix):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_palette(pix: list[int], h: int, info) -> list[int]:
    wb, full_w, palette = info
    if wb == 0:
        out = []
        for px in pix:
            idx = (px >> 8) & 0xFF
            if idx >= len(palette):
                out.append(0)  # out-of-range index -> transparent black (libwebp rule)
            else:
                out.append(palette[idx])
        return out
    packed_w = _subsample(full_w, wb)
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    out = [0] * (full_w * h)
    for y in range(h):
        for px_x in range(packed_w):
            val = (pix[y * packed_w + px_x] >> 8) & 0xFF
            for k in range(per):
                x = px_x * per + k
                if x >= full_w:
                    break
                idx = (val >> (k * ibits)) & mask
                out[y * full_w + x] = palette[idx] if idx < len(palette) else 0
    return out


# --------------------------------------------------------------------------
# container + entry points
# --------------------------------------------------------------------------


def _find_vp8l(payload: bytes) -> bytes:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise WebpError("not a WebP file")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            raise WebpError("lossy VP8 not decoded natively (external seam)")
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            # well-formed animations route through is_animated_webp ->
            # decode_webp_animation before reaching here; landing here
            # means the still-image entry was called directly or the
            # container is malformed (e.g. ANMF without the VP8X flag)
            raise WebpError(
                "animated WebP chunk in still-image decode "
                "(use decode_webp_animation)"
            )
        pos += 8 + size + (size & 1)
    raise WebpError("no VP8L chunk")


def decode_vp8l(body: bytes) -> tuple[int, int, list[int]]:
    """VP8L chunk payload -> (width, height, ARGB u32 pixels)."""
    if not body or body[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    bits = _Bits(body)
    bits.read(8)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read1()  # alpha hint
    if bits.read(3) != 0:
        raise WebpError("unknown VP8L version")
    pix, transforms = _decode_image_stream(bits, w, h, True)
    for ttype, p1, p2, txs in reversed(transforms):
        if ttype == 3:
            pix = _inv_palette(pix, h, p1)
        elif ttype == 2:
            _inv_subtract_green(pix)
        elif ttype == 1:
            _inv_color(pix, txs, h, p1, p2)
        else:
            _inv_predictor(pix, txs, h, p1, p2)
    if len(pix) != w * h:
        raise WebpError("transform chain size mismatch")
    return w, h, pix


def decode_webp(payload: bytes) -> dict:
    """RIFF WebP -> the multimodal decoder contract (RGB triples,
    top-down; alpha stripped like the PNG path). Dispatching entry:
    the container walk (and the lossy-VP8/animation seam decision)
    stays in python, then VP8L pixel decode goes to libwebp when
    loadable (sources/native.py policy env applies) with the
    from-spec decoder as fallback and differential twin — the same
    dispatch shape as zstd/brotli."""
    body = _find_vp8l(payload)  # typed errors + seam policy here
    from corrie_spark.sources import native

    if native.webp_enabled():
        res = native.webp_decode_rgba(payload)
        if res is None:
            raise WebpError("corrupt VP8L stream (native)")
        w, h, rgba = res
        data = bytearray(w * h * 3)
        for i in range(w * h):
            data[3 * i : 3 * i + 3] = rgba[4 * i : 4 * i + 3]
        return {"kind": "image", "width": w, "height": h, "data": bytes(data)}
    return decode_webp_py(payload)


def decode_webp_py(payload: bytes) -> dict:
    """The from-spec path (always available; the differential twin)."""
    w, h, pix = decode_vp8l(_find_vp8l(payload))
    data = bytearray(w * h * 3)
    for i, px in enumerate(pix):
        data[3 * i] = (px >> 16) & 0xFF
        data[3 * i + 1] = (px >> 8) & 0xFF
        data[3 * i + 2] = px & 0xFF
    return {"kind": "image", "width": w, "height": h, "data": bytes(data)}


# --------------------------------------------------------------------------
# writer twin (fixtures): no transforms, no cache, flat 8-bit literal
# codes per channel — any conformant decoder accepts it; the heavy
# decode paths are exercised by the differential tests against
# libwebp, this exists so fixtures build without that library.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, ln: int) -> None:
        """prefix codes go MSB-first into the LSB-first stream."""
        for i in range(ln - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _write_flat8_code(bw: _BitWriter) -> None:
    """Normal prefix code with lengths [8]*256 (+ implicit zeros): the
    flat byte code (canonical code == symbol value). Code-length code:
    symbol 8 -> '0', symbol 16 -> '1' (both length 1)."""
    bw.write(0, 1)  # normal code
    bw.write(12 - 4, 4)  # num_code_lengths = 12 (covers syms 16 and 8)
    # kOrder[:12] = 17,18,0,1,2,3,4,5,16,6,7,8 — lengths 3 bits each
    for sym in [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8]:
        bw.write(1 if sym in (8, 16) else 0, 3)
    # use max_symbol so trailing zeros need no tokens; it counts
    # code-length TOKENS read (one literal + 43 repeat-16s = 44)
    bw.write(1, 1)
    bw.write(2, 3)  # length_nbits = 2 + 2*2 = 6
    bw.write(42, 6)  # max_symbol = 2 + 42 = 44 tokens
    # canonical CLC: symbol 8 -> code 0, symbol 16 -> code 1 (len 1)
    bw.write_code(0, 1)  # literal length 8 (symbol #0)
    # 255 more eights via repeat-16 (repeat previous non-zero length)
    left = 255  # 6*42 + 3: greedy min(6, left) never strands a <3 tail
    while left:
        take = min(6, left)
        bw.write_code(1, 1)  # CLC symbol 16
        bw.write(take - 3, 2)
        left -= take


def _vp8l_chunk(width: int, height: int, rgb: bytes) -> bytes:
    """The writer twin's VP8L chunk (fourcc + size + body + pad) —
    shared by the still-image wrapper and the ANMF frame embedder."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transform ... (first transform-present bit)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    for _ in range(4):  # green, red, blue, alpha
        _write_flat8_code(bw)
    # distance code: simple, single symbol 0 (never used)
    bw.write(1, 1)
    bw.write(0, 1)  # num_symbols = 1
    bw.write(0, 1)  # 1-bit first symbol
    bw.write(0, 1)  # symbol 0
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(255, 8)  # alpha
    body = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return chunk


def encode_webp_lossless(width: int, height: int, rgb: bytes) -> bytes:
    """Writer twin: one VP8L stream, literal pixels under flat 8-bit
    codes, alpha 255. `rgb` is width*height RGB triples."""
    chunk = _vp8l_chunk(width, height, rgb)
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------------------------
# animation: the extended container's ANIM/ANMF chunk walk (the
# round-13 verdict's ask #2). Frame METADATA + VP8L sub-frame decode
# + canvas compositing are deterministic pure python, exactly like
# the GIF89a animation path in operators/multimodal.py; lossy VP8
# pixel decode inside a frame stays the documented external seam.
# Layouts from the public "WebP Container Specification": VP8X
# (flags byte bit 1 = animation, canvas w-1/h-1 as 24-bit LE), ANIM
# (background color in [B,G,R,A] byte order + u16 loop count), ANMF
# (x/2, y/2, w-1, h-1, duration ms as 24-bit LE, flags byte with
# blending=bit1 / disposal=bit0, then the frame's image chunks).
# --------------------------------------------------------------------------


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _r24(data: bytes, off: int) -> int:
    return data[off] | (data[off + 1] << 8) | (data[off + 2] << 16)


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    return (
        fourcc + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def encode_webp_animation(
    canvas_w: int,
    canvas_h: int,
    frames: list,
    bg_rgb: tuple = (255, 255, 255),
    loop_count: int = 0,
) -> bytes:
    """Writer twin: animated WebP. `frames` is a list of
    (x, y, fw, fh, rgb_bytes, duration_ms, dispose_to_bg) — x and y
    must be even (the container stores them divided by 2). Frames are
    written no-blend (opaque VP8L sub-frames make blend/no-blend
    composite identically anyway)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    vp8x = bytes([0x02]) + b"\x00\x00\x00" + _u24(canvas_w - 1) + _u24(canvas_h - 1)
    r, g, b = bg_rgb
    anim = bytes([b, g, r, 255]) + struct.pack("<H", loop_count)
    chunks = [_riff_chunk(b"VP8X", vp8x), _riff_chunk(b"ANIM", anim)]
    for x, y, fw, fh, rgb_f, dur, dispose in frames:
        if x % 2 or y % 2:
            raise ValueError("ANMF frame offsets must be even")
        if x + fw > canvas_w or y + fh > canvas_h:
            raise ValueError("frame rect outside canvas")
        hdr = (
            _u24(x // 2) + _u24(y // 2) + _u24(fw - 1) + _u24(fh - 1)
            + _u24(int(dur)) + bytes([(1 << 1) | (1 if dispose else 0)])
        )
        chunks.append(_riff_chunk(b"ANMF", hdr + _vp8l_chunk(fw, fh, rgb_f)))
    payload = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def is_animated_webp(payload: bytes) -> bool:
    """Cheap top-level routing probe (the GIF image-block-count
    twin): VP8X animation flag set AND an ANMF chunk present."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return False
    pos = 12
    flagged = False
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"VP8X" and size >= 1:
            flagged = bool(payload[pos + 8] & 0x02)
        elif fourcc == b"ANMF":
            return flagged
        pos += 8 + size + (size & 1)
    return False


def decode_webp_animation(payload: bytes) -> dict:
    """Animated WebP -> the video decoder contract (full canvas RGB
    snapshots, top-down, one per frame — the same shape the GIF89a /
    AVI / MP4 paths emit, so frame_stats / video fingerprints / the
    media dedup screens consume animations unchanged), plus
    `durations_ms` and `loop_count` from the container. Compositing
    per spec: paint the frame rect at (x, y) — sub-frames here are
    opaque VP8L so blend and no-blend coincide — snapshot, then
    disposal 1 restores the rect to the ANIM background color.
    Each sub-frame's VP8L chunk decodes through decode_webp (so the
    native libwebp dispatch applies per frame); lossy VP8 sub-frames
    raise the documented-seam error."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise WebpError("not a WebP file")
    pos = 12
    canvas_w = canvas_h = None
    bg = (255, 255, 255)
    loop_count = 0
    saw_anim = False
    frames: list[tuple] = []
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WebpError("truncated WebP chunk")
        if fourcc == b"VP8X":
            if size < 10:
                raise WebpError("short VP8X chunk")
            if not body[0] & 0x02:
                raise WebpError("VP8X animation flag not set")
            canvas_w = _r24(body, 4) + 1
            canvas_h = _r24(body, 7) + 1
        elif fourcc == b"ANIM":
            if size < 6:
                raise WebpError("short ANIM chunk")
            bg = (body[2], body[1], body[0])  # stored B,G,R,A
            (loop_count,) = struct.unpack_from("<H", body, 4)
            saw_anim = True
        elif fourcc == b"ANMF":
            if size < 16:
                raise WebpError("short ANMF chunk")
            fx = _r24(body, 0) * 2
            fy = _r24(body, 3) * 2
            fw = _r24(body, 6) + 1
            fh = _r24(body, 9) + 1
            dur = _r24(body, 12)
            flags = body[15]
            frames.append((fx, fy, fw, fh, dur, flags, body[16:]))
        pos += 8 + size + (size & 1)
    if canvas_w is None or not saw_anim:
        raise WebpError("animated WebP missing VP8X/ANIM chunk")
    if not frames:
        raise WebpError("animated WebP has no ANMF frames")

    import numpy as np

    canvas = np.empty((canvas_h, canvas_w, 3), dtype=np.uint8)
    canvas[:] = bg
    snaps: list[bytes] = []
    durations: list[int] = []
    for fx, fy, fw, fh, dur, flags, sub in frames:
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise WebpError("ANMF frame rect outside canvas")
        # frame image chunks: find the VP8L (skipping ALPH etc.);
        # re-wrap it as a standalone RIFF so the still-image
        # dispatcher (native libwebp when loadable) decodes it
        spos = 0
        vp8l = None
        while spos + 8 <= len(sub):
            sc = sub[spos : spos + 4]
            (ssize,) = struct.unpack_from("<I", sub, spos + 4)
            if sc == b"VP8L":
                vp8l = sub[spos : spos + 8 + ssize + (ssize & 1)]
                break
            if sc == b"VP8 ":
                raise WebpError(
                    "lossy VP8 animation frame not decoded natively "
                    "(external seam)"
                )
            spos += 8 + ssize + (ssize & 1)
        if vp8l is None:
            raise WebpError("ANMF frame has no VP8L chunk")
        still = b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l
        d = decode_webp(still)
        if d["width"] != fw or d["height"] != fh:
            raise WebpError("ANMF frame dims disagree with VP8L stream")
        rect = np.frombuffer(d["data"], dtype=np.uint8).reshape(fh, fw, 3)
        canvas[fy : fy + fh, fx : fx + fw] = rect
        snaps.append(canvas.tobytes())
        durations.append(dur)
        if flags & 1:  # disposal: restore rect to background color
            canvas[fy : fy + fh, fx : fx + fw] = bg
    return {
        "kind": "video",
        "n_frames": len(snaps),
        "frame_size": canvas_w * canvas_h * 3,
        "width": canvas_w,
        "height": canvas_h,
        "data": b"".join(snaps),
        "durations_ms": durations,
        "loop_count": loop_count,
    }


_ENC_LIB: list = []  # memoized [handle-or-None]; loaded once per process


def _enc_lib():
    if _ENC_LIB:
        return _ENC_LIB[0]
    import ctypes
    import ctypes.util

    lib = None
    name = ctypes.util.find_library("webp")
    if name:
        try:
            lib = ctypes.CDLL(name)
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
        except (OSError, AttributeError):
            lib = None
    _ENC_LIB.append(lib)
    return lib


def encode_webp_native(width: int, height: int, rgb: bytes) -> bytes | None:
    """Real-encoder fixture arm: libwebp's lossless encoder via ctypes
    when loadable (returns None otherwise — callers fall back to the
    writer twin). Real streams carry predictor/color transforms, color
    cache and LZ77 references, so routing half the fixture docs
    through this arm puts the decoder's heavy paths under the
    closed-form oracle, not just under the differential tests."""
    import ctypes

    lib = _enc_lib()
    if lib is None:
        return None
    rgba = bytearray()
    for i in range(width * height):
        rgba += rgb[3 * i : 3 * i + 3] + b"\xff"
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(
        bytes(rgba), width, height, width * 4, ctypes.byref(out)
    )
    if not n:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


# --------------------------------------------------------------------------
# container metadata (header-only scan; EXIF rides the extended
# container as its own chunk — the JPEG APP1 machinery parses it)
# --------------------------------------------------------------------------


def encode_webp_with_exif(
    width: int, height: int, rgb: bytes, exif_tiff: bytes
) -> bytes:
    """Writer twin: extended-container still (VP8X with the EXIF
    flag) carrying a VP8L image plus an EXIF chunk. `exif_tiff` is
    the APP1-style body (with or without the 'Exif\\x00\\x00'
    prefix — stored as given, the convention writers vary on)."""
    vp8x = bytes([0x08]) + b"\x00\x00\x00" + _u24(width - 1) + _u24(height - 1)
    payload = (
        b"WEBP"
        + _riff_chunk(b"VP8X", vp8x)
        + _vp8l_chunk(width, height, rgb)
        + _riff_chunk(b"EXIF", exif_tiff)
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def webp_metadata(payload: bytes) -> dict:
    """Header-only WebP container scan (never decodes pixels — the
    parse_jpeg_metadata twin): canvas dims, lossy/lossless kind,
    animation flag + frame count + total duration, EXIF orientation/
    datetime (chunk body through the shared TIFF-IFD parser,
    'Exif\\x00\\x00' prefix tolerated), XMP/ICC presence."""
    from corrie_spark.operators.jpeg import _parse_exif_tiff

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise WebpError("not a WebP file")
    out: dict = {
        "kind": None,
        "width": None,
        "height": None,
        "animated": False,
        "n_frames": 0,
        "total_duration_ms": 0,
        "has_exif": False,
        "has_xmp": False,
        "has_icc": False,
    }
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X" and size >= 10:
            flags = body[0]
            out["animated"] = bool(flags & 0x02)
            out["has_icc"] = bool(flags & 0x20)
            out["has_xmp"] = bool(flags & 0x04)
            out["width"] = _r24(body, 4) + 1
            out["height"] = _r24(body, 7) + 1
        elif fourcc == b"VP8L" and size >= 5 and body[0] == 0x2F:
            out["kind"] = "lossless"
            if out["width"] is None:
                v = int.from_bytes(body[1:5], "little")
                out["width"] = (v & 0x3FFF) + 1
                out["height"] = ((v >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8 ":
            out["kind"] = out["kind"] or "lossy"
        elif fourcc == b"ANMF" and size >= 16:
            out["n_frames"] += 1
            out["total_duration_ms"] += _r24(body, 12)
            if out["kind"] is None and b"VP8L" in body[16:24]:
                out["kind"] = "lossless"
        elif fourcc == b"EXIF":
            out["has_exif"] = True
            tiff = body[6:] if body[:6] == b"Exif\x00\x00" else body
            out.update(_parse_exif_tiff(tiff))
        pos += 8 + size + (size & 1)
    return out
