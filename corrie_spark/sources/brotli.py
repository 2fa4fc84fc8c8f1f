"""Brotli (RFC 7932) decoder — pure python, from the public spec.

Full stream support: uncompressed and compressed meta-blocks, simple
and complex prefix codes (with the code-length code, repeat symbols
16/17 and HSKIP), block switching for all three categories, context
modeling for literals (all four modes via the §7.1 lookup table) and
distances, the distance ring buffer with NPOSTFIX/NDIRECT
parameterization, and static-dictionary references with the full
Appendix B transform set. The fixed data tables (Appendix A
dictionary, Appendix B transforms, §7.1 context LUT) are PUBLIC SPEC
DATA carried in brotli_data.py (see tools/extract_brotli_tables.py
for provenance + SHA-256 pins).

Validated differentially against the reference libbrotlidec/enc via
ctypes when present (tests/test_brotli.py): streams from the real
encoder at qualities 0..11 across diverse corpora must decode
byte-exactly — quality >= 5 exercises context modeling and the
static dictionary heavily.

Closes the `Content-Encoding: br` seam in crawl ingestion
(sources/warc.py): ~40% of real web responses arrive br-coded.
Reference behavior: kak-tus/corrie has no compression surface (its
transport delegates to vendored drivers); this is a beyond-parity
ingestion component, same stance as the RFC 1952/8878 readers.
"""

from __future__ import annotations

__all__ = ["BrotliError", "decompress", "decompress_py", "encode_uncompressed"]


class BrotliError(ValueError):
    pass


# --- fixed code tables (RFC 7932) ------------------------------------------

# §3.5: the code-length alphabet's own fixed prefix code, as a
# 16-entry peek table over 4 bits (LSB-first)
_CL_PREFIX_LENGTH = [2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4]
_CL_PREFIX_VALUE = [0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5]
# §3.5: order in which code-length-code lengths are transmitted
_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# §6: block-count code (26 symbols): (offset, extra_bits)
_BLOCK_LEN_CODE = [
    (1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3), (41, 3),
    (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5), (177, 5),
    (209, 5), (241, 6), (305, 6), (369, 7), (497, 8), (753, 9), (1265, 10),
    (2289, 11), (4337, 12), (8433, 13), (16625, 24),
]

# §5: insert-length and copy-length codes: (offset, extra_bits)
_INSERT_CODE = [
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (8, 1),
    (10, 2), (14, 2), (18, 3), (26, 3), (34, 4), (50, 4), (66, 5),
    (98, 5), (130, 6), (194, 7), (322, 8), (578, 9), (1090, 10),
    (2114, 12), (6210, 14), (22594, 24),
]
_COPY_CODE = [
    (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0),
    (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4),
    (54, 4), (70, 5), (102, 5), (134, 6), (198, 7), (326, 8), (582, 9),
    (1094, 10), (2118, 24),
]

# §5: the 704-symbol insert-and-copy code's range mapping
_INSERT_RANGE_LUT = [0, 0, 8, 8, 0, 16, 8, 16, 16]
_COPY_RANGE_LUT = [0, 8, 0, 8, 16, 0, 16, 8, 16]


class _Bits:
    """LSB-first forward bit reader (§2)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        first = pos >> 3
        last = (end + 7) >> 3
        if last > len(self.data):
            raise BrotliError("truncated stream")
        window = int.from_bytes(self.data[first:last], "little")
        self.pos = end
        return (window >> (pos & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        pos, v = self.pos, self.read_safe(n)
        self.pos = pos
        return v

    def read_safe(self, n: int) -> int:
        """read() but zero-fills past the end (final-byte peeks)."""
        pos = self.pos
        first = pos >> 3
        last = min((pos + n + 7) >> 3, len(self.data))
        window = int.from_bytes(self.data[first:last], "little")
        self.pos = pos + n
        return (window >> (pos & 7)) & ((1 << n) - 1)

    def align(self) -> None:
        if self.pos & 7:
            pad = self.read(8 - (self.pos & 7))
            if pad:
                raise BrotliError("nonzero padding bits")


# --- prefix codes -----------------------------------------------------------


class _Prefix:
    """Table-driven prefix decoder: peek `max_len` bits (LSB-first;
    the FIRST bit read is the root branch), look up (symbol, length).
    RFC prefix codes are at most 15 bits."""

    __slots__ = ("table", "max_len")

    def __init__(self, lengths: list[int]):
        max_len = max(lengths)
        if max_len == 0:
            raise BrotliError("empty prefix code")
        # canonical assignment (§3.2): codes in symbol order within
        # ascending length; bits are sent starting at the ROOT, i.e.
        # the code's MSB arrives first but lands in the LOW bit of
        # the peeked window — build the table on bit-reversed codes
        count = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                count[ln] += 1
        total = 0
        for ln in range(1, max_len + 1):
            total += count[ln] << (max_len - ln)
        if total != (1 << max_len):
            raise BrotliError("invalid prefix code (not full)")
        next_code = [0] * (max_len + 2)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + count[ln - 1]) << 1
            next_code[ln] = code
        table: list[tuple[int, int]] = [(0, 0)] * (1 << max_len)
        for sym, ln in enumerate(lengths):
            if not ln:
                continue
            code = next_code[ln]
            next_code[ln] += 1
            # bit-reverse the ln-bit code
            rev = 0
            c = code
            for _ in range(ln):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            step = 1 << ln
            for k in range(rev, 1 << max_len, step):
                table[k] = (sym, ln)
        self.table = table
        self.max_len = max_len

    @classmethod
    def single(cls, sym: int) -> "_Prefix":
        p = cls.__new__(cls)
        p.table = None
        p.max_len = sym  # stores the symbol
        return p

    def decode(self, bits: _Bits) -> int:
        if self.table is None:
            return self.max_len
        v = bits.read_safe(self.max_len)
        sym, ln = self.table[v]
        if ln == 0:
            raise BrotliError("bad prefix bits")
        bits.pos -= self.max_len - ln
        if bits.pos > len(bits.data) * 8:
            raise BrotliError("truncated stream")
        return sym


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    """§3.4/§3.5: simple (2-bit NSYM) or complex prefix code."""
    nbits = max((alphabet_size - 1).bit_length(), 1)
    hskip = bits.read(2)
    if hskip == 1:  # simple
        nsym = bits.read(2) + 1
        syms = []
        for _ in range(nsym):
            s = bits.read(nbits)
            if s >= alphabet_size:
                raise BrotliError("simple code symbol out of range")
            syms.append(s)
        if len(set(syms)) != nsym:
            raise BrotliError("duplicate simple code symbol")
        if nsym == 1:
            return _Prefix.single(syms[0])
        lengths = [0] * alphabet_size
        if nsym == 2:
            syms.sort()
            lengths[syms[0]] = lengths[syms[1]] = 1
        elif nsym == 3:
            syms[1:] = sorted(syms[1:])
            lengths[syms[0]] = 1
            lengths[syms[1]] = lengths[syms[2]] = 2
        else:
            tree_select = bits.read(1)
            if tree_select:
                # only the two 3-bit symbols sort; [0] and [1] keep
                # their listed positions (§3.4)
                if syms[3] < syms[2]:
                    syms[2], syms[3] = syms[3], syms[2]
                lengths[syms[0]] = 1
                lengths[syms[1]] = 2
                lengths[syms[2]] = lengths[syms[3]] = 3
            else:
                syms.sort()
                for s in syms:
                    lengths[s] = 2
        return _Prefix(lengths)
    # complex: read the code-length code's lengths (skipping hskip)
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        idx = bits.peek(4) & 15
        ln = _CL_PREFIX_LENGTH[idx]
        bits.pos += ln
        v = _CL_PREFIX_VALUE[idx]
        cl_lengths[_CL_ORDER[i]] = v
        if v:
            space -= 32 >> v
            num_codes += 1
            if space <= 0:
                break
    if num_codes != 1 and space != 0:
        raise BrotliError("corrupt code-length code")
    if num_codes == 1:
        only = next(i for i, v in enumerate(cl_lengths) if v)
        cl_code = _Prefix.single(only)
    else:
        cl_code = _Prefix(cl_lengths)
    # read symbol lengths with repeat codes 16/17 (§3.5)
    lengths = [0] * alphabet_size
    sym = 0
    space = 1 << 15
    prev_nonzero = 8
    repeat = 0
    repeat_len = 0
    while sym < alphabet_size and space > 0:
        c = cl_code.decode(bits)
        if c < 16:
            repeat = 0
            lengths[sym] = c
            sym += 1
            if c:
                prev_nonzero = c
                space -= 32768 >> c
        else:
            extra = 2 if c == 16 else 3
            new_len = prev_nonzero if c == 16 else 0
            if repeat and repeat_len == new_len:
                old = repeat
                repeat = ((repeat - 2) << extra) + 3 + bits.read(extra)
                add = repeat - old
            else:
                repeat = 3 + bits.read(extra)
                add = repeat
            repeat_len = new_len
            if sym + add > alphabet_size:
                raise BrotliError("repeat past alphabet")
            for _ in range(add):
                lengths[sym] = new_len
                sym += 1
            if new_len:
                space -= add * (32768 >> new_len)
    if space != 0:
        raise BrotliError("prefix code over/under-subscribed")
    return _Prefix(lengths)


# --- context map (§7.3) -----------------------------------------------------


def _read_context_map(bits: _Bits, n_trees: int, size: int) -> list[int]:
    if n_trees == 1:
        return [0] * size
    rle_max = 0
    if bits.read(1):
        rle_max = bits.read(4) + 1
    code = _read_prefix_code(bits, rle_max + n_trees)
    cmap: list[int] = []
    while len(cmap) < size:
        s = code.decode(bits)
        if s == 0:
            cmap.append(0)
        elif s <= rle_max:
            run = (1 << s) + bits.read(s)
            if len(cmap) + run > size:
                raise BrotliError("context-map run overflow")
            cmap.extend([0] * run)
        else:
            cmap.append(s - rle_max)
    if bits.read(1):  # inverse MTF
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            if v:
                del mtf[v]
                mtf.insert(0, val)
            cmap[i] = val
    return cmap


# --- block category state (§6) ---------------------------------------------


class _BlockState:
    __slots__ = ("n_types", "type", "prev_type", "length", "type_code", "len_code")

    def __init__(self, bits: _Bits):
        self.n_types = _read_var_nbltypes(bits)
        self.type = 0
        self.prev_type = 1
        self.type_code = None
        self.len_code = None
        if self.n_types >= 2:
            self.type_code = _read_prefix_code(bits, self.n_types + 2)
            self.len_code = _read_prefix_code(bits, 26)
            self.length = _read_block_len(self.len_code, bits)
        else:
            self.length = 1 << 28  # effectively unbounded

    def tick(self, bits: _Bits) -> None:
        if self.length == 0:
            self._switch(bits)
        self.length -= 1

    def _switch(self, bits: _Bits) -> None:
        s = self.type_code.decode(bits)
        if s == 0:
            ntype = self.prev_type
        elif s == 1:
            ntype = (self.type + 1) % self.n_types
        else:
            ntype = s - 2
        self.prev_type = self.type
        self.type = ntype
        self.length = _read_block_len(self.len_code, bits)


def _read_var_nbltypes(bits: _Bits) -> int:
    """§6: 1; or 1 bit + variable: values 1..256."""
    if not bits.read(1):
        return 1
    n = bits.read(3)
    if n == 0:
        return 2
    return (1 << n) + bits.read(n) + 1


def _read_block_len(code: _Prefix, bits: _Bits) -> int:
    s = code.decode(bits)
    off, extra = _BLOCK_LEN_CODE[s]
    return off + bits.read(extra)


# --- dictionary transforms (Appendix B) ------------------------------------


def _ferment(word: bytearray, pos: int) -> int:
    """Uppercase one 'character' at pos (§8 transform rules)."""
    c = word[pos]
    if c < 192:
        if 97 <= c <= 122:
            word[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(word):
            word[pos + 1] ^= 32
        return 2
    if pos + 2 < len(word):
        word[pos + 2] ^= 5
    return 3


def _transform_word(word: bytes, transform_id: int) -> bytes:
    from corrie_spark.sources.brotli_data import TRANSFORMS

    prefix, kind, suffix = TRANSFORMS[transform_id]
    w = bytearray(word)
    if 1 <= kind <= 9:  # OmitLast1..9
        w = w[: max(len(w) - kind, 0)]
    elif 12 <= kind <= 20:  # OmitFirst1..9
        w = w[kind - 11 :]
    elif kind == 10:  # UppercaseFirst
        if w:
            _ferment(w, 0)
    elif kind == 11:  # UppercaseAll
        i = 0
        while i < len(w):
            i += _ferment(w, i)
    return bytes(prefix) + bytes(w) + bytes(suffix)


def _dictionary_word(copy_len: int, word_id: int) -> bytes:
    from corrie_spark.sources import brotli_data as D

    if not 4 <= copy_len <= 24:
        raise BrotliError(f"dictionary length {copy_len} out of range")
    nwords_bits = D.SIZE_BITS_BY_LENGTH[copy_len]
    if nwords_bits == 0:
        raise BrotliError(f"no dictionary words of length {copy_len}")
    index = word_id & ((1 << nwords_bits) - 1)
    transform_id = word_id >> nwords_bits
    if transform_id > 120:
        raise BrotliError("transform id out of range")
    base = D.OFFSETS_BY_LENGTH[copy_len] + index * copy_len
    word = _DICT_DATA[base : base + copy_len]
    return _transform_word(word, transform_id)


_DICT_DATA: bytes = b""


def _ensure_dict() -> None:
    global _DICT_DATA
    if not _DICT_DATA:
        from corrie_spark.sources.brotli_data import dictionary

        _DICT_DATA = dictionary()


# --- main decode loop (§9) --------------------------------------------------


def decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Dispatching entry: the system libbrotlidec when loadable
    (sources/native.py; env CORRIE_NATIVE_CODECS=off forces the
    from-spec reader below). Same contract either way: one RFC 7932
    stream, trailing bytes ignored, BrotliError on truncation or
    corruption, `max_output` bounds the decoded size."""
    from corrie_spark.sources import native

    if native.brotli_enabled():
        return native.brotli_decompress(data, max_output)
    return decompress_py(data, max_output)


def decompress_py(data: bytes, max_output: int | None = None) -> bytes:
    bits = _Bits(data)
    # stream header: WBITS (§9.1)
    if bits.read(1) == 0:
        wbits = 16
    else:
        n = bits.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            m = bits.read(3)
            if m == 0:
                wbits = 17
            elif m == 1:
                raise BrotliError("invalid WBITS")
            else:
                wbits = 8 + m
    window = (1 << wbits) - 16
    out = bytearray()
    # §4: initialized to 16, 15, 11, 4 — oldest first; ring[0] is the
    # LAST distance, so the starting order is [4, 11, 15, 16]
    dist_ring = [4, 11, 15, 16]
    islast = False
    while not islast:
        islast = bool(bits.read(1))
        if islast and bits.read(1):  # ISLASTEMPTY
            break
        mnibbles = bits.read(2) + 4
        if mnibbles == 7:  # MNIBBLES == 0: metadata block
            if bits.read(1):
                raise BrotliError("reserved metadata bit set")
            mskip_bytes = bits.read(2)
            mskip = 0
            for i in range(mskip_bytes):
                b = bits.read(8)
                if i + 1 == mskip_bytes and mskip_bytes > 1 and b == 0:
                    raise BrotliError("nonzero-padded metadata length")
                mskip |= b << (8 * i)
            if mskip_bytes:
                mskip += 1
            bits.align()
            if bits.pos + 8 * mskip > len(data) * 8:
                raise BrotliError("truncated metadata block")
            bits.pos += 8 * mskip
            continue
        mlen = 0
        for i in range(mnibbles):
            nib = bits.read(4)
            if i + 1 == mnibbles and mnibbles > 4 and nib == 0:
                raise BrotliError("nonzero-padded MLEN")
            mlen |= nib << (4 * i)
        mlen += 1
        if max_output is not None and len(out) + mlen > max_output:
            raise BrotliError("output budget exceeded")
        if not islast and bits.read(1):  # ISUNCOMPRESSED
            bits.align()
            start = bits.pos >> 3
            if start + mlen > len(data):
                raise BrotliError("truncated uncompressed block")
            out += data[start : start + mlen]
            bits.pos += 8 * mlen
            continue
        _decode_metablock(bits, mlen, out, window, dist_ring)
    bits.align()
    if bits.pos < len(data) * 8:
        raise BrotliError("trailing bytes after stream end")
    return bytes(out)


def _decode_metablock(
    bits: _Bits, mlen: int, out: bytearray, window: int, dist_ring: list[int]
) -> None:
    lut = _CONTEXT_LUT_CACHE or _load_lut()
    blocks = [_BlockState(bits) for _ in range(3)]  # L, I, D
    npostfix = bits.read(2)
    ndirect = bits.read(4) << npostfix
    postfix_mask = (1 << npostfix) - 1
    # context modes, one 2-bit value per literal block type
    cmodes = [bits.read(2) for _ in range(blocks[0].n_types)]
    ntrees_l = _read_var_nbltypes(bits)
    cmap_l = _read_context_map(bits, ntrees_l, 64 * blocks[0].n_types)
    ntrees_d = _read_var_nbltypes(bits)
    cmap_d = _read_context_map(bits, ntrees_d, 4 * blocks[2].n_types)
    lit_codes = [_read_prefix_code(bits, 256) for _ in range(ntrees_l)]
    cmd_codes = [_read_prefix_code(bits, 704) for _ in range(blocks[1].n_types)]
    dist_alpha = 16 + ndirect + (48 << npostfix)
    dist_codes = [_read_prefix_code(bits, dist_alpha) for _ in range(ntrees_d)]

    produced = 0
    p1 = out[-1] if out else 0
    p2 = out[-2] if len(out) >= 2 else 0
    while produced < mlen:
        blocks[1].tick(bits)
        cmd = cmd_codes[blocks[1].type].decode(bits)
        if cmd < 128:
            range_idx = cmd >> 6  # 0..1, implicit ring distance
            implicit = True
        else:
            range_idx = (cmd >> 6) - 2
            implicit = False
        ins_code = _INSERT_RANGE_LUT[range_idx] + ((cmd >> 3) & 7)
        cp_code = _COPY_RANGE_LUT[range_idx] + (cmd & 7)
        ins_off, ins_extra = _INSERT_CODE[ins_code]
        insert_len = ins_off + bits.read(ins_extra)
        cp_off, cp_extra = _COPY_CODE[cp_code]
        copy_len = cp_off + bits.read(cp_extra)
        # literals
        for _ in range(insert_len):
            blocks[0].tick(bits)
            btype = blocks[0].type
            mode = cmodes[btype]
            ctx = lut[(mode << 9) + p1] | lut[(mode << 9) + 256 + p2]
            tree = cmap_l[(btype << 6) + ctx]
            lit = lit_codes[tree].decode(bits)
            out.append(lit)
            p2 = p1
            p1 = lit
            produced += 1
        if produced > mlen:
            raise BrotliError("insert length past meta-block")
        if produced == mlen:
            # the copy part of the final command is ignored when the
            # inserts alone complete the meta-block (§9.3)
            break
        # distance
        if implicit:
            distance = dist_ring[0]
            dist_code = 0
        else:
            blocks[2].tick(bits)
            dctx = 3 if copy_len > 4 else copy_len - 2
            tree = cmap_d[(blocks[2].type << 2) + dctx]
            dist_code = dist_codes[tree].decode(bits)
            if dist_code < 16:
                idx, delta = _DIST_SHORT[dist_code]
                distance = dist_ring[idx] + delta
                if distance <= 0:
                    raise BrotliError("non-positive ring distance")
            elif dist_code < 16 + ndirect:
                distance = dist_code - 16 + 1
            else:
                c = dist_code - ndirect - 16
                ndistbits = 1 + (c >> (npostfix + 1))
                hcode = c >> npostfix
                lcode = c & postfix_mask
                offset = ((2 + (hcode & 1)) << ndistbits) - 4
                distance = (
                    ((offset + bits.read(ndistbits)) << npostfix)
                    + lcode + ndirect + 1
                )
        max_dist = min(len(out), window)
        if distance <= max_dist:
            # backward reference
            start = len(out) - distance
            if copy_len < 2:
                raise BrotliError("copy length < 2")
            if distance >= copy_len:
                out += out[start : start + copy_len]
            else:
                for _ in range(copy_len):
                    out.append(out[-distance])
            produced += copy_len
            if produced > mlen:
                raise BrotliError("copy past meta-block")
            if dist_code != 0:
                dist_ring[:] = [distance] + dist_ring[:3]
            p1 = out[-1]
            p2 = out[-2] if len(out) >= 2 else 0
        else:
            # static dictionary reference (§8)
            _ensure_dict()
            word_id = distance - max_dist - 1
            word = _dictionary_word(copy_len, word_id)
            out += word
            produced += len(word)
            if produced > mlen:
                raise BrotliError("dictionary word past meta-block")
            p1 = out[-1]
            p2 = out[-2] if len(out) >= 2 else 0
    # trailing: nothing to do; caller continues with next meta-block


# distance codes 0..15: (ring index, delta)
_DIST_SHORT = [
    (0, 0), (1, 0), (2, 0), (3, 0),
    (0, -1), (0, 1), (0, -2), (0, 2), (0, -3), (0, 3),
    (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3),
]

def encode_uncompressed(data: bytes) -> bytes:
    """Writer twin (fixtures): a valid RFC 7932 stream of
    ISUNCOMPRESSED meta-blocks + the final empty block. Any
    conformant decoder accepts it; the heavy decode paths are
    exercised by the differential tests against the reference
    encoder, this exists so `Content-Encoding: br` fixtures build in
    environments without that library."""
    out = bytearray()
    acc = 0
    nbits = 0

    def push(v: int, n: int) -> None:
        nonlocal acc, nbits
        acc |= (v & ((1 << n) - 1)) << nbits
        nbits += n
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def align() -> None:
        nonlocal acc, nbits
        if nbits:
            out.append(acc & 0xFF)
            acc = 0
            nbits = 0

    push(0, 1)  # WBITS = 16
    pos = 0
    chunk = 1 << 16  # fits MNIBBLES=4
    while pos < len(data):
        piece = data[pos : pos + chunk]
        pos += len(piece)
        push(0, 1)  # ISLAST = 0
        push(0, 2)  # MNIBBLES code 0 -> 4 nibbles
        m = len(piece) - 1
        for i in range(4):
            push((m >> (4 * i)) & 0xF, 4)
        push(1, 1)  # ISUNCOMPRESSED
        align()
        out += piece
    push(1, 1)  # ISLAST
    push(1, 1)  # ISLASTEMPTY
    align()
    return bytes(out)


_CONTEXT_LUT_CACHE: bytes = b""


def _load_lut() -> bytes:
    global _CONTEXT_LUT_CACHE
    from corrie_spark.sources.brotli_data import context_lut

    _CONTEXT_LUT_CACHE = context_lut()
    return _CONTEXT_LUT_CACHE
