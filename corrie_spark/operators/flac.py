"""FLAC (Free Lossless Audio Codec), from the public format spec
(RFC 9639 / the xiph.org format document) — the compressed-audio
format a crawl's podcast/music corpus actually ships in alongside
MP3. No FLAC library exists in this environment; the byte/bit layer
is implemented here from spec, both directions:

  - decoder: STREAMINFO + metadata walk, frame-header parse (block
    size / sample-rate / sample-size codes, UTF-8-coded frame number,
    CRC-8 verified), subframe types CONSTANT / VERBATIM / FIXED
    (orders 0-4) / LPC (quantized coefficients, any order), wasted
    bits, Rice/Rice2 residual partitions (incl. the escape-to-raw
    code), stereo decorrelation (left/side, right/side, mid/side,
    side channel at bps+1), frame CRC-16 verified;
  - encoder (fixture/sink side): block-split frames, per-subframe
    type choice (constant when flat, else fixed order 0-2 by residual
    cost), Rice parameter fit, all three stereo decorrelations, and
    deliberate wasted-bits emission — enough surface that the decoder
    paths above are all exercised by round-trip.

LOSSLESSNESS IS THE GATE: decode(encode(samples)) must equal the
input bit-exactly, which is what the oracle-checked query pins with
id-keyed closed-form sample sequences (q_multimodal_flac). The
encode/decode bit conventions (unary polarity, Rice zigzag, CRC
polynomials) are additionally pinned by a HAND-WRITTEN bit-level
fixture in tests/test_flac.py — a restatement of the spec text
independent of this module's bit writer, so a shared-convention
off-by-one (the LZW lesson) cannot hide behind round-trip symmetry.
"""

from __future__ import annotations


class FlacError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, as the FLAC bitstream is defined)
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        """q zero bits terminated by a one bit (RFC 9639 §9.4.1)."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._out)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.byte >= len(self.data):
                raise FlacError("bitstream truncated")
            avail = 8 - self.bit
            take = min(avail, nbits)
            cur = self.data[self.byte]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            nbits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise FlacError("unary runaway")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly x^8+x^2+x+1 = 0x07; frame CRC-16
# poly x^16+x^15+x^2+1 = 0x8005; both init 0 — RFC 9639 §9.1.1/§9.8)
# ---------------------------------------------------------------------------


def _mk_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8_TABLE = _mk_crc_table(0x07, 8)
_CRC16_TABLE = _mk_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16_TABLE[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# UTF-8-style coded number (frame/sample number, RFC 9639 §9.1.5)
# ---------------------------------------------------------------------------


def _utf8_encode_num(n: int) -> bytes:
    """UTF-8-like prefix code, extended to 7 bytes (36-bit numbers):
    `cont` continuation bytes carry 6 bits each, the lead byte opens
    with cont+1 ones + a zero and carries 6-cont payload bits."""
    if n < 0x80:
        return bytes([n])
    for cont in range(1, 7):
        lead_bits = 6 - cont
        if n < 1 << (6 * cont + lead_bits):
            marker = ((1 << (cont + 1)) - 1) << (7 - cont)
            out = [marker | (n >> (6 * cont))]
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise FlacError("number too large")


def _utf8_decode_num(br: BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    cont = 0
    probe = b0
    while probe & 0x80:
        cont += 1
        probe = (probe << 1) & 0xFF
    cont -= 1  # leading ones = cont+1
    if cont < 1 or cont > 6:
        raise FlacError("bad coded number lead byte")
    n = b0 & ((1 << (6 - cont)) - 1)
    for _ in range(cont):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("bad coded number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# fixed predictors (RFC 9639 §9.5.2): residual/reconstruction pairs
# ---------------------------------------------------------------------------


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    s = samples
    if order == 0:
        return list(s)
    if order == 1:
        return [s[i] - s[i - 1] for i in range(1, len(s))]
    if order == 2:
        return [s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, len(s))]
    if order == 3:
        return [s[i] - 3 * s[i - 1] + 3 * s[i - 2] - s[i - 3] for i in range(3, len(s))]
    if order == 4:
        return [
            s[i] - 4 * s[i - 1] + 6 * s[i - 2] - 4 * s[i - 3] + s[i - 4]
            for i in range(4, len(s))
        ]
    raise FlacError("bad fixed order")


def _fixed_reconstruct(warm: list[int], resid: list[int], order: int) -> list[int]:
    s = list(warm)
    for r in resid:
        if order == 0:
            s.append(r)
        elif order == 1:
            s.append(r + s[-1])
        elif order == 2:
            s.append(r + 2 * s[-1] - s[-2])
        elif order == 3:
            s.append(r + 3 * s[-1] - 3 * s[-2] + s[-3])
        else:
            s.append(r + 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4])
    return s


# ---------------------------------------------------------------------------
# Rice residual coding (RFC 9639 §9.4): zigzag fold + k-bit remainder
# ---------------------------------------------------------------------------


def _rice_fold(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _rice_unfold(u: int) -> int:
    return (u >> 1) if u % 2 == 0 else -((u + 1) >> 1)


def _write_rice(bw: BitWriter, values: list[int], k: int) -> None:
    for v in values:
        u = _rice_fold(v)
        bw.write_unary(u >> k)
        bw.write(u & ((1 << k) - 1), k)


def _read_rice(br: BitReader, n: int, k: int) -> list[int]:
    out = []
    for _ in range(n):
        q = br.read_unary()
        u = (q << k) | br.read(k)
        out.append(_rice_unfold(u))
    return out


def _best_rice_k(values: list[int]) -> int:
    if not values:
        return 0
    mean = sum(_rice_fold(v) for v in values) / len(values)
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: BitWriter, resid: list[int], order: int, block: int) -> None:
    """Partition order 0, method 0 (4-bit Rice params); escape when a
    residual magnitude exceeds what 30 unary-quotient bits buy."""
    k = _best_rice_k(resid)
    maxu = max((_rice_fold(v) for v in resid), default=0)
    if maxu >> k > 1 << 10:  # pathological spread -> raw escape
        bits = max(maxu.bit_length() + 1, 2)
        bw.write(0, 2)  # method 0
        bw.write(0, 4)  # partition order 0
        bw.write(0xF, 4)  # escape
        bw.write(bits, 5)
        for v in resid:
            bw.write_signed(v, bits)
        return
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(k, 4)
    _write_rice(bw, resid, k)


def _read_residual(br: BitReader, block: int, order: int) -> list[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise FlacError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise FlacError("block not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        n = block >> porder
        if p == 0:
            n -= order
        if n < 0:
            raise FlacError("bad partition sizing")
        k = br.read(pbits)
        if k == escape:
            bits = br.read(5)
            out.extend(br.read_signed(bits) if bits else 0 for _ in range(n))
        else:
            out.extend(_read_rice(br, n, k))
    return out


# ---------------------------------------------------------------------------
# subframes
# ---------------------------------------------------------------------------


def _write_subframe(bw: BitWriter, samples: list[int], bps: int) -> None:
    """Type choice: wasted-bits are emitted when every sample shares a
    power-of-two factor (decoder-path coverage); constant when flat;
    else the cheapest of fixed orders 0-2."""
    wasted = 0
    s = samples
    if any(s):
        while all(v % 2 == 0 for v in s) and wasted < 4:
            wasted += 1
            s = [v >> 1 for v in s]
    eff = bps - wasted
    bw.write(0, 1)  # reserved
    if all(v == s[0] for v in s):
        bw.write(0b000000, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(s[0], eff)
        return
    best_order, best_cost = 0, None
    for order in range(3):
        resid = _fixed_residual(s, order)
        cost = sum(abs(v) for v in resid)
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    bw.write(0b001000 | order, 6)  # FIXED
    _write_wasted(bw, wasted)
    for w in s[:order]:
        bw.write_signed(w, eff)
    _write_residual(bw, _fixed_residual(s, order), order, len(s))


def _write_wasted(bw: BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def _read_subframe(br: BitReader, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe reserved bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")
    if t == 0b000000:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * n
    elif t == 0b000001:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(n)]
    elif 0b001000 <= t <= 0b001100:  # FIXED order 0-4
        order = t & 0x7
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, n, order)
        out = _fixed_reconstruct(warm, resid, order)
    elif t & 0b100000:  # LPC, order = (t & 0x1F) + 1
        order = (t & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise FlacError("invalid lpc precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, n, order)
        out = list(warm)
        for r in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise FlacError(f"reserved subframe type {t:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048,
    0b1100: 4096, 0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_RATE_CODES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SIZE_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _encode_frame(
    frame_no: int, chans: list[list[int]], sr: int, bps: int, assignment: int
) -> bytes:
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking -> frame number
    bw.write(0b0111, 4)  # block size: 16-bit at end
    rate_code = next((c for c, r in _RATE_CODES.items() if r == sr), 0b0000)
    bw.write(rate_code, 4)
    bw.write(assignment, 4)
    size_code = next(c for c, b in _SIZE_CODES.items() if b == bps)
    bw.write(size_code, 3)
    bw.write(0, 1)  # reserved
    header = bw
    for b in _utf8_encode_num(frame_no):
        header.write(b, 8)
    n = len(chans[0])
    header.write(n - 1, 16)
    head_bytes = bytearray(header._out)  # aligned by construction
    assert header._nbits == 0
    head_bytes.append(crc8(bytes(head_bytes)))
    body = BitWriter()
    for idx, ch in enumerate(chans):
        eff_bps = bps
        if (assignment == 8 and idx == 1) or (assignment == 9 and idx == 0) or (
            assignment == 10 and idx == 1
        ):
            eff_bps += 1  # the side channel carries one extra bit
        _write_subframe(body, ch, eff_bps)
    body.align()
    frame = bytes(head_bytes) + body.getvalue()
    return frame + crc16(frame).to_bytes(2, "big")


def _decode_frame(
    data: bytes, pos: int, info: dict
) -> tuple[list[list[int]], int]:
    start = pos
    br = BitReader(data, pos)
    if br.read(14) != 0b11111111111110:
        raise FlacError("bad frame sync")
    if br.read(1):
        raise FlacError("frame reserved bit")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    assignment = br.read(4)
    sz_code = br.read(3)
    if br.read(1):
        raise FlacError("frame reserved bit 2")
    _utf8_decode_num(br)
    if bs_code == 0b0110:
        n = br.read(8) + 1
    elif bs_code == 0b0111:
        n = br.read(16) + 1
    elif bs_code in _BLOCKSIZE_CODES:
        n = _BLOCKSIZE_CODES[bs_code]
    else:
        raise FlacError("reserved block size code")
    if sr_code == 0b0000:
        sr = info["sample_rate"]
    elif sr_code in _RATE_CODES:
        sr = _RATE_CODES[sr_code]
    elif sr_code == 0b1100:
        sr = br.read(8) * 1000
    elif sr_code == 0b1101:
        sr = br.read(16)
    elif sr_code == 0b1110:
        sr = br.read(16) * 10
    else:
        raise FlacError("invalid sample rate code")
    if sr != info["sample_rate"]:
        raise FlacError("frame sample rate disagrees with STREAMINFO")
    bps = info["bits"] if sz_code == 0 else _SIZE_CODES.get(sz_code)
    if bps is None:
        raise FlacError("reserved sample size code")
    assert br.bit == 0
    if crc8(data[start : br.byte]) != data[br.byte]:
        raise FlacError("frame header CRC-8 mismatch")
    br.byte += 1
    if assignment <= 7:
        nch = assignment + 1
        chans = [_read_subframe(br, n, bps) for _ in range(nch)]
    elif assignment in (8, 9, 10):
        nch = 2
        b0 = bps + (1 if assignment == 9 else 0)
        b1 = bps + (1 if assignment in (8, 10) else 0)
        c0 = _read_subframe(br, n, b0)
        c1 = _read_subframe(br, n, b1)
        if assignment == 8:  # left/side: right = left - side
            chans = [c0, [left - s for left, s in zip(c0, c1)]]
        elif assignment == 9:  # right/side: left = right + side
            chans = [[r + s for s, r in zip(c0, c1)], c1]
        else:  # mid/side (RFC 9639 §9.3)
            left, right = [], []
            for m, s in zip(c0, c1):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            chans = [left, right]
    else:
        raise FlacError("reserved channel assignment")
    if nch != info["channels"]:
        raise FlacError("frame channel count disagrees with STREAMINFO")
    br.align()
    fcrc = int.from_bytes(data[br.byte : br.byte + 2], "big")
    if crc16(data[start : br.byte]) != fcrc:
        raise FlacError("frame CRC-16 mismatch")
    return chans, br.byte + 2


# ---------------------------------------------------------------------------
# stream layer
# ---------------------------------------------------------------------------


def encode_flac(
    channels: list[list[int]],
    sample_rate: int,
    bps: int = 16,
    block_size: int = 256,
    stereo_mode: str = "independent",
) -> bytes:
    """channels = 1 or 2 equal-length sample lists. stereo_mode in
    independent | left_side | right_side | mid_side."""
    import hashlib

    nch = len(channels)
    total = len(channels[0])
    bw = BitWriter()
    bw.write(1, 1)  # last metadata block
    bw.write(0, 7)  # STREAMINFO
    bw.write(34, 24)
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    # MD5 of the interleaved little-endian PCM (decoders may verify)
    raw = bytearray()
    nbytes = (bps + 7) // 8
    for i in range(total):
        for ch in channels:
            raw += (ch[i] & ((1 << (8 * nbytes)) - 1)).to_bytes(nbytes, "little")
    md5 = hashlib.md5(bytes(raw)).digest()
    for b in md5:
        bw.write(b, 8)
    out = bytearray(b"fLaC") + bw.getvalue()
    for fno, i in enumerate(range(0, total, block_size)):
        block = [ch[i : i + block_size] for ch in channels]
        if nch == 2 and stereo_mode != "independent":
            left, right = block
            if stereo_mode == "left_side":
                chans = [left, [a - b for a, b in zip(left, right)]]
                assignment = 8
            elif stereo_mode == "right_side":
                chans = [[a - b for a, b in zip(left, right)], right]
                assignment = 9
            else:  # mid_side
                chans = [
                    [(a + b) >> 1 for a, b in zip(left, right)],
                    [a - b for a, b in zip(left, right)],
                ]
                assignment = 10
        else:
            chans = block
            assignment = nch - 1
        out += _encode_frame(fno, chans, sample_rate, bps, assignment)
    return bytes(out)


def decode_flac(data: bytes) -> dict:
    """Full decode: {'sample_rate', 'channels', 'bits', 'total',
    'pcm': [per-channel sample lists]} — bit-exact or FlacError."""
    if data[:4] != b"fLaC":
        raise FlacError("missing fLaC magic")
    br = BitReader(data, 4)
    info: dict = {}
    while True:
        last = br.read(1)
        btype = br.read(7)
        length = br.read(24)
        if btype == 0:
            if length != 34:
                raise FlacError("bad STREAMINFO length")
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            info["sample_rate"] = br.read(20)
            info["channels"] = br.read(3) + 1
            info["bits"] = br.read(5) + 1
            info["total"] = br.read(36)
            for _ in range(16):
                br.read(8)
        else:
            for _ in range(length):
                br.read(8)
        if last:
            break
    if "sample_rate" not in info:
        raise FlacError("no STREAMINFO")
    pos = br.byte
    pcm: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data):
        chans, pos = _decode_frame(data, pos, info)
        for c, ch in zip(pcm, chans):
            c.extend(ch)
    if info["total"] and len(pcm[0]) != info["total"]:
        raise FlacError("sample count disagrees with STREAMINFO")
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits": info["bits"],
        "total": len(pcm[0]),
        "pcm": pcm,
    }
