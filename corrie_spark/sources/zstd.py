"""Zstandard (RFC 8878) — pure-python, from the public spec, both
directions:

  decode_frame / decompress : a COMPLETE decoder — raw/RLE/compressed
      blocks, all four literals types (incl. FSE-compressed Huffman
      weight descriptions and 4-stream layouts), all three sequence
      symbol modes (predefined / RLE / FSE-compressed) plus
      repeat-mode, the repeat-offset ring with the literals_length==0
      twist, backward bitstreams, and the optional XXH64 content
      checksum. External-dictionary frames (a nonzero DID, or content
      referencing a skippable-frame dictionary) raise ZstdError — the
      documented seam, since dictionaries ship out-of-band.
  encode_frame : the deterministic writer twin for fixtures — raw /
      RLE / compressed blocks, raw / RLE / direct-weight-Huffman
      literals, and RLE-mode sequence sections (hand-chosen
      (ll, ml, offset) triples with per-sequence extra bits), so the
      full sequence-execution machinery is exercised without an FSE
      *encoder*. Real FSE/predefined-mode streams are covered by the
      decoder and cross-validated against the reference `zstd` CLI
      in tests/test_zstd.py when the binary is present.

Why from-spec: no zstandard module ships in this environment (the
round-9..11 tripwire), yet .warc.zst crawl archives and
`Content-Encoding: zstd` HTTP bodies are real ingestion surfaces.
Reference behavior: kak-tus/corrie has no compression surface at all
(its transport delegates to vendored drivers), so this closes a
beyond-parity gap, same stance as sources/warc.py's RFC 1952 reader.

Scale: everything here is per-frame byte-local work inside the same
Arrow ingest stages that hold the gzip machinery — no shuffles, no
driver involvement; a corrupt frame costs its own error row.
"""

from __future__ import annotations

import struct

__all__ = [
    "ZstdError",
    "ZstdTruncated",
    "decompress",
    "decode_frame",
    "encode_frame",
    "frames_at",
    "xxh64",
]

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
SKIPPABLE_LO = 0x184D2A50  # magics 0x184D2A50..5F


class ZstdError(ValueError):
    pass


class ZstdTruncated(ZstdError):
    """The buffer ended mid-frame — more bytes would complete it.

    A dedicated type (not message matching) so the sharded range
    scanner can distinguish "grow the buffer, the frame straddles the
    range tail" from "corrupt frame, resync" without depending on the
    wording of any error message."""


# ---------------------------------------------------------------------------
# XXH64 (the frame checksum; public algorithm by Y. Collet)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        # hot loop: locals + inlined round (the checksum taxes every
        # frame; measured 2.3x over the helper-call form)
        p1, p2, m64 = _P1, _P2, _M64
        nblocks = (n // 32) * 32
        i = nblocks
        for l1, l2, l3, l4 in struct.iter_unpack(
            "<QQQQ", memoryview(data)[:nblocks]
        ):
            v1 = (v1 + l1 * p2) & m64
            v1 = (((v1 << 31) | (v1 >> 33)) * p1) & m64
            v2 = (v2 + l2 * p2) & m64
            v2 = (((v2 << 31) | (v2 >> 33)) * p1) & m64
            v3 = (v3 + l3 * p2) & m64
            v3 = (((v3 << 31) | (v3 >> 33)) * p1) & m64
            v4 = (v4 + l4 * p2) & m64
            v4 = (((v4 << 31) | (v4 >> 33)) * p1) & m64
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ _round(0, k), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    return h ^ (h >> 32)


# ---------------------------------------------------------------------------
# backward bitstream (FSE / Huffman payloads are read from the END)
# ---------------------------------------------------------------------------


class _BackBits:
    """RFC 8878 bitstreams are written LSB-first and read backward:
    the final byte carries a 1-bit sentinel above the last data bit.
    `read(n)` consumes the n bits just below the cursor and returns
    them as an integer (the window's own LSB order preserved)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("bitstream sentinel missing")
        self.data = data
        self.bitpos = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.bitpos - n
        if pos < 0:
            # past the stream start: remaining bits, zero-filled low
            # (the FSE weight-stream flush reads tolerate this; real
            # overruns are caught by the callers' length checks)
            avail = max(self.bitpos, 0)
            window = int.from_bytes(self.data[: (avail + 7) // 8], "little")
            window &= (1 << avail) - 1
            self.bitpos = pos
            return (window << (-pos)) & ((1 << n) - 1)
        first_byte = pos // 8
        last_byte = (self.bitpos + 7) // 8
        window = int.from_bytes(self.data[first_byte:last_byte], "little")
        self.bitpos = pos
        return (window >> (pos - first_byte * 8)) & ((1 << n) - 1)

    @property
    def exhausted(self) -> bool:
        return self.bitpos <= 0


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def read_ncount(data: bytes, pos: int, max_symbol: int) -> tuple[list[int], int, int]:
    """FSE normalized-count header (RFC 8878 §4.1.1): returns
    (counts, accuracy_log, new_pos). `counts` entries are >= -1;
    -1 means "less than one" (one table cell, placed from the top).
    This section is read FORWARD, bit-packed LSB-first."""
    bitpos = pos * 8
    total_bits = len(data) * 8

    def peek(n: int) -> int:
        if n == 0:
            return 0
        first = bitpos // 8
        last = min((bitpos + n + 7) // 8, len(data))
        window = int.from_bytes(data[first:last], "little")
        return (window >> (bitpos - first * 8)) & ((1 << n) - 1)

    if bitpos + 4 > total_bits:
        raise ZstdTruncated("truncated FSE header")
    accuracy_log = peek(4) + 5
    bitpos += 4
    if accuracy_log > 9:
        raise ZstdError(f"FSE accuracy log {accuracy_log} too large")
    table_size = 1 << accuracy_log
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy_log + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbol:
        if prev_zero:
            # 2-bit repeat flags: each value 3 adds 3 zeros and reads
            # another pair
            while True:
                if bitpos + 2 > total_bits:
                    raise ZstdTruncated("truncated FSE repeat flags")
                rep = peek(2)
                bitpos += 2
                counts.extend([0] * rep)
                if rep < 3:
                    break
            prev_zero = False
            if len(counts) > max_symbol:
                break
            continue
        maxv = (2 * threshold - 1) - remaining
        low = peek(nb_bits - 1)
        if low < maxv:
            bitpos += nb_bits - 1
            value = low
        else:
            value = peek(nb_bits)
            bitpos += nb_bits
            if value >= threshold:
                value -= maxv
        count = value - 1  # -1 encodes "less than one"
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("corrupt FSE normalized counts")
    return counts, accuracy_log, (bitpos + 7) // 8


def build_fse_table(
    counts: list[int], accuracy_log: int
) -> list[tuple[int, int, int]]:
    """Decoding table: per state (symbol, nb_bits, baseline). Spread
    via the (size/2 + size/8 + 3) step; "less than one" symbols get
    the top cells (RFC 8878 §4.1.1)."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    for sym, c in enumerate(counts):
        if c == -1:
            symbols[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    posn = 0
    for sym, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[posn] = sym
            posn = (posn + step) & mask
            while posn > high:
                posn = (posn + step) & mask
    if posn != 0:
        raise ZstdError("FSE table spread mismatch")
    next_count = [c if c > 0 else 1 for c in counts] + [0]
    seen = [0] * len(next_count)
    table: list[tuple[int, int, int]] = [(0, 0, 0)] * size
    # baseline accounting: the i-th occurrence (in state order) of a
    # symbol with count c sits at x = c + i; nb = AL - floor(log2(x));
    # baseline = (x << nb) - size
    occur = [0] * (len(counts) + 1)
    for state in range(size):
        sym = symbols[state]
        c = counts[sym] if counts[sym] > 0 else 1
        x = c + occur[sym]
        occur[sym] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        baseline = (x << nb) - size
        table[state] = (sym, nb, baseline)
    return table


# predefined distributions (RFC 8878 §3.1.1.3.2.2); sums checked at
# import so a transcription slip fails loud, not wrong
_LL_DEFAULTS = (
    [
        4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
        2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
        -1, -1, -1, -1,
    ],
    6,
)
_ML_DEFAULTS = (
    [
        1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
        1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
        1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
        -1, -1, -1, -1, -1,
    ],
    6,
)
_OF_DEFAULTS = (
    [
        1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
        1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
    ],
    5,
)
for _counts, _al in (_LL_DEFAULTS, _ML_DEFAULTS, _OF_DEFAULTS):
    assert sum(abs(c) for c in _counts) == (1 << _al), "predefined sum"

_LL_TABLE_DEFAULT = build_fse_table(*_LL_DEFAULTS)
_ML_TABLE_DEFAULT = build_fse_table(*_ML_DEFAULTS)
_OF_TABLE_DEFAULT = build_fse_table(*_OF_DEFAULTS)

# code -> (baseline, extra_bits)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16),
]
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]


# ---------------------------------------------------------------------------
# Huffman literals
# ---------------------------------------------------------------------------


def _build_huffman(weights: list[int]) -> tuple[list[tuple[int, int]], int]:
    """Canonical zstd Huffman from explicit weights (the LAST weight
    is implied and must already be appended by the caller). Returns
    (table of 1<<max_bits entries of (symbol, nb_bits), max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0 or total & (total - 1):
        raise ZstdError("Huffman weights do not sum to a power of two")
    max_bits = total.bit_length() - 1
    if max_bits > 11:
        raise ZstdError("Huffman max bits > 11")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    posn = 0
    # fill by ascending weight (longest codes first), symbol order
    # within a weight class
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = max_bits + 1 - w
            span = 1 << (max_bits - nb)
            for i in range(span):
                table[posn + i] = (sym, nb)
            posn += span
    if posn != 1 << max_bits:
        raise ZstdError("Huffman table underfilled")
    return table, max_bits


def _read_huffman_desc(data: bytes, pos: int) -> tuple[list[tuple[int, int]], int, int]:
    """Huffman tree description: header < 128 -> FSE-compressed
    weights (two interleaved states); >= 128 -> direct 4-bit weights
    for (header-127) symbols. Returns (table, max_bits, new_pos)."""
    if pos >= len(data):
        raise ZstdTruncated("truncated Huffman description")
    header = data[pos]
    pos += 1
    weights: list[int] = []
    if header >= 128:
        n = header - 127
        nbytes = (n + 1) // 2
        if pos + nbytes > len(data):
            raise ZstdTruncated("truncated direct Huffman weights")
        for i in range(n):
            b = data[pos + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += nbytes
    else:
        comp = data[pos : pos + header]
        if len(comp) != header:
            raise ZstdTruncated("truncated FSE Huffman weights")
        counts, al, hpos = read_ncount(comp, 0, 255)
        if al > 6:
            raise ZstdError("Huffman weight accuracy log > 6")
        fse = build_fse_table(counts, al)
        bits = _BackBits(comp[hpos:])
        s1 = bits.read(al)
        s2 = bits.read(al)
        # two interleaved states decode weights until the stream is
        # exhausted; on underflow the trailing state(s) still flush
        while True:
            sym, nb, base = fse[s1]
            weights.append(sym)
            if bits.bitpos < nb:
                sym2, _, _ = fse[s2]
                weights.append(sym2)
                break
            s1 = base + bits.read(nb)
            sym, nb, base = fse[s2]
            weights.append(sym)
            if bits.bitpos < nb:
                sym1, _, _ = fse[s1]
                weights.append(sym1)
                break
            s2 = base + bits.read(nb)
            if len(weights) > 255:
                raise ZstdError("Huffman weight overflow")
        pos += header
    # implied last weight: complete the sum to the next power of two
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("empty Huffman weights")
    nxt = 1 << total.bit_length()
    left = nxt - total
    if left & (left - 1):
        raise ZstdError("invalid implied Huffman weight")
    weights.append(left.bit_length())
    table, max_bits = _build_huffman(weights)
    return table, max_bits, pos


def _huf_decode_stream(
    comp: bytes, table: list[tuple[int, int]], max_bits: int, out_len: int
) -> bytes:
    bits = _BackBits(comp)
    out = bytearray()
    mask = (1 << max_bits) - 1
    data = bits.data
    bitpos = bits.bitpos
    while len(out) < out_len:
        # inline peek(max_bits) with zero-fill below the start
        pos = bitpos - max_bits
        if pos >= 0:
            fb = pos // 8
            lb = (bitpos + 7) // 8
            window = int.from_bytes(data[fb:lb], "little")
            state = (window >> (pos - fb * 8)) & mask
        else:
            window = int.from_bytes(data[: (bitpos + 7) // 8], "little")
            window &= (1 << bitpos) - 1 if bitpos > 0 else 0
            state = (window << (-pos)) & mask
        sym, nb = table[state]
        if nb == 0:
            raise ZstdError("corrupt Huffman stream")
        out.append(sym)
        bitpos -= nb
        if bitpos < -max_bits:
            raise ZstdError("Huffman stream overrun")
    return bytes(out)


def _decode_literals(
    data: bytes, pos: int, prev_huf: tuple | None
) -> tuple[bytes, int, tuple | None]:
    """Literals section -> (literals, new_pos, huffman_state)."""
    if pos >= len(data):
        raise ZstdTruncated("truncated literals section")
    b0 = data[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif sf == 1:
            if pos + 2 > len(data):
                raise ZstdTruncated("truncated literals header")
            regen = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(data):
                raise ZstdTruncated("truncated literals header")
            regen = (b0 >> 4) | (data[pos + 1] << 4) | (data[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            if pos + regen > len(data):
                raise ZstdTruncated("truncated raw literals")
            return data[pos : pos + regen], pos + regen, prev_huf
        if pos >= len(data):
            raise ZstdTruncated("truncated RLE literal")
        return bytes([data[pos]]) * regen, pos + 1, prev_huf
    # compressed (2) / treeless (3)
    if sf == 0:
        streams = 1
        if pos + 3 > len(data):
            raise ZstdTruncated("truncated literals header")
        regen = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        comp = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        pos += 3
    elif sf == 1:
        streams = 4
        if pos + 3 > len(data):
            raise ZstdTruncated("truncated literals header")
        regen = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        comp = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        pos += 3
    elif sf == 2:
        streams = 4
        if pos + 4 > len(data):
            raise ZstdTruncated("truncated literals header")
        regen = (b0 >> 4) | (data[pos + 1] << 4) | ((data[pos + 2] & 3) << 12)
        comp = (data[pos + 2] >> 2) | (data[pos + 3] << 6)
        pos += 4
    else:
        streams = 4
        if pos + 5 > len(data):
            raise ZstdTruncated("truncated literals header")
        regen = (b0 >> 4) | (data[pos + 1] << 4) | ((data[pos + 2] & 0x3F) << 12)
        comp = (data[pos + 2] >> 6) | (data[pos + 3] << 2) | (data[pos + 4] << 10)
        pos += 5
    end = pos + comp
    if end > len(data):
        raise ZstdTruncated("truncated compressed literals")
    if ltype == 2:
        table, max_bits, pos = _read_huffman_desc(data, pos)
        huf = (table, max_bits)
    else:
        if prev_huf is None:
            raise ZstdError("treeless literals without a previous tree")
        table, max_bits = prev_huf
        huf = prev_huf
    if streams == 1:
        return _huf_decode_stream(data[pos:end], table, max_bits, regen), end, huf
    if pos + 6 > end:
        raise ZstdTruncated("truncated stream jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", data, pos)
    pos += 6
    sizes = [s1, s2, s3, end - pos - s1 - s2 - s3]
    if sizes[3] < 0:
        raise ZstdError("bad stream jump table")
    part = (regen + 3) // 4
    lens = [part, part, part, regen - 3 * part]
    if lens[3] < 0:
        raise ZstdError("bad 4-stream regenerated size")
    out = bytearray()
    for sz, ln in zip(sizes, lens):
        out += _huf_decode_stream(data[pos : pos + sz], table, max_bits, ln)
        pos += sz
    return bytes(out), end, huf


# ---------------------------------------------------------------------------
# sequences
# ---------------------------------------------------------------------------


def _seq_table(
    data: bytes,
    pos: int,
    mode: int,
    default: list[tuple[int, int, int]],
    default_al: int,
    max_symbol: int,
    prev: tuple | None,
    name: str,
) -> tuple[list[tuple[int, int, int]], int, int, tuple | None]:
    """One symbol-mode table -> (table, accuracy_log, new_pos, state).
    Modes: 0 predefined, 1 RLE (one byte), 2 FSE-compressed,
    3 repeat."""
    if mode == 0:
        return default, default_al, pos, (default, default_al)
    if mode == 1:
        if pos >= len(data):
            raise ZstdTruncated(f"truncated {name} RLE byte")
        sym = data[pos]
        if sym > max_symbol:
            raise ZstdError(f"{name} RLE symbol {sym} out of range")
        table = [(sym, 0, 0)]
        return table, 0, pos + 1, (table, 0)
    if mode == 2:
        counts, al, pos = read_ncount(data, pos, max_symbol)
        if name == "offset" and al > 8:
            raise ZstdError("offset accuracy log > 8")
        table = build_fse_table(counts, al)
        return table, al, pos, (table, al)
    if prev is None:
        raise ZstdError(f"{name} repeat mode without a previous table")
    table, al = prev
    return table, al, pos, prev


def _decode_sequences(
    data: bytes,
    pos: int,
    end: int,
    literals: bytes,
    out: bytearray,
    window: int,
    rep: list[int],
    prev_tables: dict,
    ext: bytes = b"",
) -> None:
    """Sequences section (RFC 8878 §3.1.1.3.2): appends to `out`.
    `ext` is the attached dictionary's content — the virtual window
    prefix matches may reach into (§5)."""
    if pos >= end:
        raise ZstdError("missing sequences header")
    b0 = data[pos]
    if b0 == 0:
        if pos + 1 != end:
            # spec: a 0 sequence count ends the section; trailing
            # bytes are a corruption
            raise ZstdError("trailing bytes after empty sequences")
        out += literals
        return
    if b0 < 128:
        nseq = b0
        pos += 1
    elif b0 < 255:
        if pos + 2 > end:
            raise ZstdTruncated("truncated sequence count")
        nseq = ((b0 - 128) << 8) + data[pos + 1]
        pos += 2
    else:
        if pos + 3 > end:
            raise ZstdTruncated("truncated sequence count")
        nseq = struct.unpack_from("<H", data, pos + 1)[0] + 0x7F00
        pos += 3
    if pos >= end:
        raise ZstdTruncated("truncated sequence modes")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_tab, ll_al, pos, prev_tables["ll"] = _seq_table(
        data, pos, ll_mode, _LL_TABLE_DEFAULT, 6, 35,
        prev_tables.get("ll"), "literal-length",
    )
    of_tab, of_al, pos, prev_tables["of"] = _seq_table(
        data, pos, of_mode, _OF_TABLE_DEFAULT, 5, 31,
        prev_tables.get("of"), "offset",
    )
    ml_tab, ml_al, pos, prev_tables["ml"] = _seq_table(
        data, pos, ml_mode, _ML_TABLE_DEFAULT, 6, 52,
        prev_tables.get("ml"), "match-length",
    )
    bits = _BackBits(data[pos:end])
    ll_state = bits.read(ll_al)
    of_state = bits.read(of_al)
    ml_state = bits.read(ml_al)
    lit_pos = 0
    for i in range(nseq):
        of_code = of_tab[of_state][0]
        if of_code > 31:
            raise ZstdError("offset code out of range")
        of_value = (1 << of_code) + bits.read(of_code) if of_code else 1
        ml_code = ml_tab[ml_state][0]
        ml_base, ml_bits = _ML_CODE[ml_code]
        ml = ml_base + (bits.read(ml_bits) if ml_bits else 0)
        ll_code = ll_tab[ll_state][0]
        ll_base, ll_bits = _LL_CODE[ll_code]
        ll = ll_base + (bits.read(ll_bits) if ll_bits else 0)
        # repeat-offset resolution (§3.1.1.5): values 1-3 index the
        # ring, shifted by one when literals_length == 0 (where value
        # 3 means rep[0] - 1)
        if of_value > 3:
            offset = of_value - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[:] = [offset, rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                rep[:] = [offset, rep[0], rep[1]]
            else:
                offset = rep[0] - 1
                if offset <= 0:
                    raise ZstdError("zero repeat offset")
                rep[:] = [offset, rep[0], rep[1]]
        if lit_pos + ll > len(literals):
            raise ZstdError("literal run past literals buffer")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out) + len(ext):
            raise ZstdError(
                "offset past window start (external dictionary?)"
            )
        need = ml
        if offset > len(out):
            # the match begins inside the dictionary content: copy
            # its part, then fall through to the in-output copy
            k = offset - len(out)
            take = min(need, k)
            out += ext[len(ext) - k : len(ext) - k + take]
            need -= take
        if need:
            if offset >= need:
                start = len(out) - offset
                out += out[start : start + need]
            else:
                for _ in range(need):
                    out.append(out[-offset])
        if i + 1 < nseq:
            ll_state = ll_tab[ll_state][2] + bits.read(ll_tab[ll_state][1])
            ml_state = ml_tab[ml_state][2] + bits.read(ml_tab[ml_state][1])
            of_state = of_tab[of_state][2] + bits.read(of_tab[of_state][1])
    if bits.bitpos != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += literals[lit_pos:]


# ---------------------------------------------------------------------------
# dictionaries (RFC 8878 §5)
# ---------------------------------------------------------------------------

DICT_MAGIC = b"\x37\xa4\x30\xec"  # 0xEC30A437 little-endian


class ZstdDict:
    """Parsed dictionary: entropy defaults (Huffman literals table,
    FSE tables in OF/ML/LL order), starting repeat offsets, and the
    content prefix that extends the match window backwards."""

    __slots__ = ("did", "huf", "tables", "rep", "content", "raw", "native_ddict")

    def __init__(self, did, huf, tables, rep, content, raw=b""):
        self.did = did
        self.huf = huf
        self.tables = tables
        self.rep = rep
        self.content = content
        self.raw = raw  # original dictionary bytes (the native path
        # feeds these to ZSTD_createDDict; pure python re-parses)
        self.native_ddict = None


def parse_dictionary(data: bytes) -> ZstdDict:
    """§5 dictionary format; bytes without the magic are a raw
    content-only dictionary (no entropy defaults, DID 0)."""
    if data[:4] != DICT_MAGIC:
        return ZstdDict(0, None, {}, [1, 4, 8], data, raw=data)
    if len(data) < 8:
        raise ZstdTruncated("truncated dictionary header")
    did = int.from_bytes(data[4:8], "little")
    table, max_bits, pos = _read_huffman_desc(data, 8)
    tables = {}
    for name, maxsym, maxlog in (("of", 31, 8), ("ml", 52, 9), ("ll", 35, 9)):
        counts, al, pos = read_ncount(data, pos, maxsym)
        if al > maxlog:
            raise ZstdError(f"dictionary {name} accuracy log too large")
        tables[name] = (build_fse_table(counts, al), al)
    if pos + 12 > len(data):
        raise ZstdTruncated("truncated dictionary repeat offsets")
    rep = list(struct.unpack_from("<III", data, pos))
    if min(rep) == 0:
        raise ZstdError("zero dictionary repeat offset")
    return ZstdDict(did, (table, max_bits), tables, rep, data[pos + 12 :], raw=data)


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def decode_frame(
    data: bytes, pos: int = 0, dicts: dict[int, "ZstdDict"] | None = None
) -> tuple[bytes, int]:
    """One zstd frame at `pos` -> (decompressed, end_pos) — the
    dispatching entry: skippable frames parse here (8-byte header,
    python is already optimal), content frames go to the system
    libzstd when loadable (sources/native.py; env
    CORRIE_NATIVE_CODECS=off forces the from-spec reader). Both paths
    share the exception contract: ZstdTruncated = more bytes would
    complete the frame (the range scanner grows its buffer),
    ZstdError = corrupt (resync)."""
    if pos + 4 > len(data):
        raise ZstdTruncated("truncated magic")
    magic = struct.unpack_from("<I", data, pos)[0]
    if SKIPPABLE_LO <= magic <= SKIPPABLE_LO + 0xF:
        if pos + 8 > len(data):
            raise ZstdTruncated("truncated skippable frame")
        size = struct.unpack_from("<I", data, pos + 4)[0]
        end = pos + 8 + size
        if end > len(data):
            raise ZstdTruncated("truncated skippable frame body")
        return b"", end
    from corrie_spark.sources import native

    if native.zstd_enabled():
        return native.zstd_decode_frame(data, pos, dicts)
    return decode_frame_py(data, pos, dicts)


def decode_frame_py(
    data: bytes, pos: int = 0, dicts: dict[int, "ZstdDict"] | None = None
) -> tuple[bytes, int]:
    """One zstd frame at `pos` -> (decompressed, end_pos). Skippable
    frames return (b'', end). `dicts` maps dictionary IDs to parsed
    dictionaries (ZstdDict); a frame naming an ID not in the map
    raises — the out-of-band seam stays observable. Raises ZstdError
    on corruption or window/byte-budget violations."""
    if pos + 4 > len(data):
        raise ZstdTruncated("truncated magic")
    magic = struct.unpack_from("<I", data, pos)[0]
    if SKIPPABLE_LO <= magic <= SKIPPABLE_LO + 0xF:
        if pos + 8 > len(data):
            raise ZstdTruncated("truncated skippable frame")
        size = struct.unpack_from("<I", data, pos + 4)[0]
        end = pos + 8 + size
        if end > len(data):
            raise ZstdTruncated("truncated skippable frame body")
        return b"", end
    if data[pos : pos + 4] != ZSTD_MAGIC:
        raise ZstdError("bad magic")
    pos += 4
    if pos >= len(data):
        raise ZstdTruncated("truncated frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ZstdError("reserved frame header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_flag = fhd >> 6
    window = None
    if not single:
        if pos >= len(data):
            raise ZstdTruncated("truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base // 8) * (wd & 7)
        if window > 1 << 30:
            raise ZstdError("window size too large")
    zd: ZstdDict | None = None
    if did_size:
        if pos + did_size > len(data):
            raise ZstdTruncated("truncated dictionary id")
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            zd = (dicts or {}).get(did)
            if zd is None:
                raise ZstdError(f"external dictionary {did} required")
    fcs = None
    fcs_bytes = (1 if single else 0, 2, 4, 8)[fcs_flag]
    if fcs_bytes:
        if pos + fcs_bytes > len(data):
            raise ZstdTruncated("truncated frame content size")
        fcs = int.from_bytes(data[pos : pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            fcs += 256
        pos += fcs_bytes
    if single:
        window = fcs if fcs is not None else 0
    out = bytearray()
    if zd is not None:
        prev_huf = zd.huf
        rep = list(zd.rep)
        prev_tables = dict(zd.tables)
        ext = zd.content
    else:
        prev_huf = None
        rep = [1, 4, 8]
        prev_tables = {}
        ext = b""
    block_max = min(window or (1 << 17), 1 << 17)
    while True:
        if pos + 3 > len(data):
            raise ZstdTruncated("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ZstdTruncated("truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ZstdTruncated("truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if bsize > block_max:
                raise ZstdError("compressed block exceeds maximum")
            end = pos + bsize
            if end > len(data):
                raise ZstdTruncated("truncated compressed block")
            literals, lpos, prev_huf = _decode_literals(data, pos, prev_huf)
            _decode_sequences(
                data, lpos, end, literals, out,
                window if window is not None else 1 << 30,
                rep, prev_tables, ext,
            )
            pos = end
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ZstdError(
            f"content size mismatch: {len(out)} != declared {fcs}"
        )
    if checksum:
        if pos + 4 > len(data):
            raise ZstdTruncated("truncated content checksum")
        want = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ZstdError("content checksum mismatch")
    return bytes(out), pos


def decompress(
    data: bytes, dicts: dict[int, "ZstdDict"] | None = None
) -> bytes:
    """All concatenated frames (the .zst file convention)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        part, pos = decode_frame(data, pos, dicts)
        out += part
    return bytes(out)


def frames_at(data: bytes) -> list[tuple[int, int]]:
    """(start, end) offsets of each frame — the .warc.zst member map
    (one record per frame, the warcio convention)."""
    spans = []
    pos = 0
    while pos < len(data):
        start = pos
        _, pos = decode_frame(data, pos)
        spans.append((start, pos))
    return spans


# ---------------------------------------------------------------------------
# writer twin (fixtures)
# ---------------------------------------------------------------------------


def _lit_header_raw(ltype: int, regen: int) -> bytes:
    if regen < 32:
        return bytes([ltype | (regen << 3)])
    if regen < 4096:
        return bytes([ltype | 4 | ((regen & 0xF) << 4), regen >> 4])
    return bytes(
        [ltype | 12 | ((regen & 0xF) << 4), (regen >> 4) & 0xFF, regen >> 12]
    )


class _FwdBits:
    """LSB-first bit writer whose payload decodes with _BackBits:
    append bits in DECODE order reversed (callers push in reverse)."""

    def __init__(self):
        self.acc = 0
        self.n = 0

    def push(self, value: int, bits: int) -> None:
        self.acc |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits

    def bytes_backward(self) -> bytes:
        self.push(1, 1)  # sentinel
        nbytes = (self.n + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


def _encode_huffman_literals(lits: bytes) -> bytes | None:
    """Direct-weight Huffman single-stream literals section, or None
    when the shape doesn't fit (fixture-grade: uniform code lengths
    over a power-of-two alphabet padded with phantom symbols — every
    real symbol codes in ceil(log2(k)) bits, always a valid canonical
    code)."""
    syms = sorted(set(lits))
    k = len(syms)
    if not 1 < k <= 16 or len(lits) < 32:
        return None
    width = max((k - 1).bit_length(), 1)
    n = 1 << width  # leaves needed for an all-weight-1 code
    # phantom symbols (never emitted) pad the leaf count; keep them
    # just above the top real symbol so the weight list stays short
    phantoms = list(range(syms[-1] + 1, syms[-1] + 1 + (n - k)))
    wlist = [0] * (max(syms + phantoms) + 1)
    for s in syms + phantoms:
        wlist[s] = 1
    last = len(wlist) - 1
    explicit = wlist[:last]  # the final weight is implied
    if len(explicit) > 128:
        return None
    packed = bytearray([127 + len(explicit)])
    for i in range(0, len(explicit), 2):
        hi = explicit[i] << 4
        lo = explicit[i + 1] if i + 1 < len(explicit) else 0
        packed.append(hi | lo)
    table, max_bits = _build_huffman(explicit + [wlist[last]])
    # encode: codes derive from the table fill order — recover each
    # symbol's (first_state, nb) pair
    codes: dict[int, tuple[int, int]] = {}
    state = 0
    while state < len(table):
        sym, nb = table[state]
        codes[sym] = (state >> (max_bits - nb), nb)
        state += 1 << (max_bits - nb)
    w = _FwdBits()
    for b in reversed(lits):
        code, nb = codes[b]
        w.push(code, nb)
    stream = w.bytes_backward()
    body = bytes(packed) + stream
    regen = len(lits)
    comp = len(body)
    if comp >= regen:
        return None
    # compressed literals, size_format 0 (single stream, 10+10 bits)
    if regen >= 1024 or comp >= 1024:
        return None
    b0 = 2 | ((regen & 0xF) << 4)
    b1 = ((regen >> 4) & 0x3F) | ((comp & 3) << 6)
    b2 = comp >> 2
    return bytes([b0, b1, b2]) + body


def build_dictionary(content: bytes, did: int) -> bytes:
    """Writer twin of parse_dictionary: a §5 dictionary whose entropy
    sections are minimal-but-valid (2-symbol Huffman, single-symbol
    FSE tables — only consulted by treeless/repeat-mode frames, which
    the frame twin never emits) and whose `content` extends the match
    window. Round-trips through parse_dictionary and the reference
    implementation."""
    if did == 0:
        raise ZstdError("dictionary id 0 is reserved")
    # direct-weight Huffman over symbols 0 and 1, weight 1 each
    huf = bytes([127 + 1, 0x11])
    # single-symbol FSE (symbol 0, count 32 = full table at AL 5):
    # AL nibble 0, then the 6-bit raw value 63 (33 after the
    # large-value fold; count = value - 1 = 32), LSB-first
    ncount1 = bytes([0xF0, 0x03])
    return (
        DICT_MAGIC
        + did.to_bytes(4, "little")
        + huf
        + ncount1 * 3  # OF, ML, LL
        + struct.pack("<III", 1, 4, 8)
        + content
    )


def encode_frame(
    data: bytes,
    sequences: list[tuple[int, int, int]] | None = None,
    literals: bytes | None = None,
    checksum: bool = True,
    huffman: bool = False,
    rle_block: bool = False,
    dict_id: int | None = None,
    ext: bytes = b"",
) -> bytes:
    """Writer twin. Default: one raw (or RLE when uniform) block per
    128 KiB. With `sequences`, emits ONE compressed block whose
    regenerated output is `literals` interleaved with back-references:
    each (ll, ml, offset) consumes ll literals then copies ml bytes
    from `offset` back — the caller-provided `data` must equal that
    expansion (checked). Sequence codes use RLE mode per category
    when all codes agree, else raises (fixture scope). `huffman`
    Huffman-compresses the literals when profitable."""
    header = bytearray(ZSTD_MAGIC)
    fhd = 0x20  # single segment
    if checksum:
        fhd |= 0x04
    if dict_id is not None:
        fhd |= 3  # 4-byte dictionary id field
    n = len(data)
    if n < 256:
        fcs_bytes, fcs_flag = 1, 0
    elif n < 65536 + 256:
        fcs_bytes, fcs_flag = 2, 1
    else:
        fcs_bytes, fcs_flag = 4, 2
    fhd |= fcs_flag << 6
    header.append(fhd)
    if dict_id is not None:
        header += dict_id.to_bytes(4, "little")
    v = n - 256 if fcs_bytes == 2 else n
    header += v.to_bytes(fcs_bytes, "little")
    body = bytearray()
    if sequences is not None:
        if literals is None:
            raise ZstdError("sequences need literals")
        # verify the expansion (offsets may reach into `ext`, the
        # attached dictionary's content, mirroring the decoder)
        if sum(ll for ll, _, _ in sequences) > len(literals):
            raise ZstdError("literal runs exceed the literals buffer")
        out = bytearray()
        lp = 0
        for ll, ml, off in sequences:
            out += literals[lp : lp + ll]
            lp += ll
            if off > len(out) + len(ext):
                raise ZstdError("fixture offset past start")
            need = ml
            if off > len(out):
                k = off - len(out)
                take = min(need, k)
                out += ext[len(ext) - k : len(ext) - k + take]
                need -= take
            for _ in range(need):
                out.append(out[-off])
        out += literals[lp:]
        if bytes(out) != data:
            raise ZstdError("sequence expansion != data")
        blk = bytearray()
        lit_sec = None
        if huffman:
            lit_sec = _encode_huffman_literals(literals)
        if lit_sec is None:
            lit_sec = _lit_header_raw(0, len(literals)) + literals
        blk += lit_sec
        nseq = len(sequences)
        if nseq < 128:
            blk.append(nseq)
        elif nseq < 0x7F00:
            blk += bytes([128 + (nseq >> 8), nseq & 0xFF])
        else:
            blk += b"\xff" + struct.pack("<H", nseq - 0x7F00)
        # derive one RLE code per category
        def _code_of(table: list[tuple[int, int]], v: int, name: str) -> int:
            for code in range(len(table) - 1, -1, -1):
                base, bits = table[code]
                if base <= v < base + (1 << bits if bits else 1):
                    return code
            raise ZstdError(f"no {name} code for {v}")

        ll_codes = {_code_of(_LL_CODE, ll, "ll") for ll, _, _ in sequences}
        ml_codes = {_code_of(_ML_CODE, ml, "ml") for _, ml, _ in sequences}
        of_codes = {(o + 3).bit_length() - 1 for _, _, o in sequences}
        if len(ll_codes) > 1 or len(ml_codes) > 1 or len(of_codes) > 1:
            raise ZstdError("fixture sequences must share one code per category")
        llc, mlc, ofc = ll_codes.pop(), ml_codes.pop(), of_codes.pop()
        blk.append((1 << 6) | (1 << 4) | (1 << 2))  # all RLE mode
        blk += bytes([llc, ofc, mlc])
        w = _FwdBits()
        # decode order: [init states: none at AL=0] then per seq
        # (of bits, ml bits, ll bits), state updates 0-bit. Writer
        # pushes in REVERSE decode order.
        for ll, ml, off in reversed(sequences):
            ll_base, ll_bits = _LL_CODE[llc]
            ml_base, ml_bits = _ML_CODE[mlc]
            ofv = off + 3
            of_extra = ofv - (1 << ofc)
            if ll_bits:
                w.push(ll - ll_base, ll_bits)
            if ml_bits:
                w.push(ml - ml_base, ml_bits)
            if ofc:
                w.push(of_extra, ofc)
        blk += w.bytes_backward()
        body += (len(blk) << 3 | (2 << 1) | 1).to_bytes(3, "little")
        body += blk
    else:
        chunks = [data[i : i + (1 << 17)] for i in range(0, n, 1 << 17)] or [b""]
        for i, c in enumerate(chunks):
            last = 1 if i == len(chunks) - 1 else 0
            if rle_block and c and len(set(c)) == 1:
                body += (len(c) << 3 | (1 << 1) | last).to_bytes(3, "little")
                body += c[:1]
            else:
                body += (len(c) << 3 | (0 << 1) | last).to_bytes(3, "little")
                body += c
    out = bytes(header) + bytes(body)
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return out
