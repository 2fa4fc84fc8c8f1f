"""Legacy binary .doc text extraction (MS-CFB + MS-DOC, from spec).

Pre-2007 Word documents are still a steady slice of crawl-borne
office files; they are OLE2 COMPOUND FILES (MS-CFB: FAT-chained
sectors, a directory of named streams, a mini-FAT for small streams)
carrying a `WordDocument` stream whose text lives at PIECE-TABLE
offsets described by the Clx structure in the `0Table`/`1Table`
stream (MS-DOC §2.8/2.9). Both specs are public Microsoft Open
Specifications.

Subset and its seams:
  - CFB: version 3 (512-byte sectors), header DIFAT (109 FAT sector
    slots — 6.8 GB of FAT reach, far beyond any .doc), mini-FAT for
    streams under the 4096-byte cutoff. Version-4 files (4096-byte
    sectors) and DIFAT chains degrade to the DLQ row.
  - DOC: the piece table (fcClx -> Pcdt -> PlcPcd) with BOTH fc
    encodings — fCompressed cp1252 at fc/2 and UTF-16LE at fc; ccpText
    main-document characters only (headers/footnotes have their own
    cp ranges, out of scope). Encrypted (fEncrypted) documents raise.
  - a missing/empty Clx falls back to the FIB's fcMin..fcMac window
    (the pre-Word-8 single-run layout).

Routed through sources/ooxml.office_records (sniffed by the CFB
magic), so the office ingest front door covers .doc unchanged.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

MINI_CUTOFF = 4096
SECT = 512
MINI_SECT = 64


class DocError(ValueError):
    """Malformed compound file / Word stream (caught at the row
    boundary)."""


# ---------------------------------------------------------------------------
# MS-CFB reader
# ---------------------------------------------------------------------------


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out = []
    s = start
    while s != _ENDCHAIN and s != _FREE:
        if s >= len(fat) or len(out) > limit:
            raise DocError("broken sector chain")
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """Compound file -> {stream name: bytes} for every stream entry.
    FAT-chained reads for streams >= 4096 bytes, mini-FAT reads (over
    the root entry's mini stream) below the cutoff."""
    if data[:8] != CFB_MAGIC:
        raise DocError("not a compound file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    if sector_shift != 9:
        raise DocError(f"unsupported sector size 2^{sector_shift}")
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (dir_start,) = struct.unpack_from("<I", data, 48)
    (minifat_start,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (difat_start,) = struct.unpack_from("<I", data, 68)
    if difat_start not in (_ENDCHAIN, _FREE):
        raise DocError("DIFAT chains beyond the header are unsupported")

    def sector(i: int) -> bytes:
        off = 512 + i * SECT
        if off + SECT > len(data):
            raise DocError(f"sector {i} out of range")
        return data[off : off + SECT]

    fat_sectors = [
        s
        for s in struct.unpack_from("<109I", data, 76)[:n_fat]
        if s != _FREE
    ]
    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack(f"<{SECT // 4}I", sector(s)))

    max_sectors = (len(data) - 512) // SECT + 1

    def read_chain(start: int) -> bytes:
        return b"".join(sector(s) for s in _chain(fat, start, max_sectors))

    directory = read_chain(dir_start)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        etype = directory[off + 66]
        if etype == 0 or name_len < 2:
            continue
        name = directory[off : off + name_len - 2].decode(
            "utf-16-le", "replace"
        )
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<Q", directory, off + 120)[0]
        entries.append((name, etype, start, size))
    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = b""
    minifat: list[int] = []
    if root is not None and root[2] not in (_ENDCHAIN, _FREE):
        mini_stream = read_chain(root[2])[: root[3]]
    if n_minifat and minifat_start not in (_ENDCHAIN, _FREE):
        mf = read_chain(minifat_start)
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # streams only
            continue
        if size >= MINI_CUTOFF:
            out[name] = read_chain(start)[:size]
        else:
            if size == 0:
                out[name] = b""
                continue
            parts = [
                mini_stream[s * MINI_SECT : (s + 1) * MINI_SECT]
                for s in _chain(minifat, start, len(minifat) + 1)
            ]
            out[name] = b"".join(parts)[:size]
    return out


# ---------------------------------------------------------------------------
# MS-DOC text extraction
# ---------------------------------------------------------------------------

_FC_COMPRESSED = 0x40000000


def doc_text(data: bytes) -> str:
    """.doc bytes -> main-document text: FIB -> table stream -> Clx ->
    piece table -> per-piece cp1252/UTF-16LE reads from WordDocument;
    paragraph marks (\\r) become newlines, field/cell markers drop."""
    streams = cfb_streams(data)
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < 0x200:
        raise DocError("no WordDocument stream")
    (w_ident,) = struct.unpack_from("<H", wd, 0)
    if w_ident != 0xA5EC:
        raise DocError(f"bad FIB wIdent {w_ident:#x}")
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    if flags & 0x0100:  # fEncrypted
        raise DocError("encrypted document")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name, b"")
    (ccp_text,) = struct.unpack_from("<i", wd, 0x4C)
    (fc_clx,) = struct.unpack_from("<I", wd, 0x1A2)
    (lcb_clx,) = struct.unpack_from("<I", wd, 0x1A6)

    pieces: list[tuple[int, int, int, bool]] = []  # cp0, cp1, fc, comp
    if lcb_clx and fc_clx + lcb_clx <= len(table):
        clx = table[fc_clx : fc_clx + lcb_clx]
        pos = 0
        while pos < len(clx):
            t = clx[pos]
            if t == 1:  # Prc: grpprl to skip
                (cb,) = struct.unpack_from("<h", clx, pos + 1)
                pos += 3 + cb
            elif t == 2:  # Pcdt
                (lcb,) = struct.unpack_from("<I", clx, pos + 1)
                plc = clx[pos + 5 : pos + 5 + lcb]
                n = (lcb - 4) // 12
                cps = struct.unpack_from(f"<{n + 1}i", plc, 0)
                for i in range(n):
                    fc_raw = struct.unpack_from(
                        "<I", plc, (n + 1) * 4 + i * 8 + 2
                    )[0]
                    comp = bool(fc_raw & _FC_COMPRESSED)
                    fc = (fc_raw & 0x3FFFFFFF) >> (1 if comp else 0)
                    pieces.append((cps[i], cps[i + 1], fc, comp))
                break
            else:
                raise DocError(f"bad Clx type {t}")
    if not pieces:
        # pre-piece-table fallback: fcMin..fcMac window, encoding from
        # fExtChar (flag 0x1000 at 0x0A means 16-bit chars)
        (fc_min,) = struct.unpack_from("<I", wd, 0x18)
        (fc_mac,) = struct.unpack_from("<I", wd, 0x1C)
        wide = bool(flags & 0x1000)
        raw = wd[fc_min:fc_mac]
        text = raw.decode("utf-16-le" if wide else "cp1252", "replace")
        pieces = []
    else:
        parts = []
        remaining = ccp_text
        for cp0, cp1, fc, comp in pieces:
            count = min(cp1 - cp0, remaining)
            if count <= 0:
                break
            if comp:
                raw = wd[fc : fc + count]
                parts.append(raw.decode("cp1252", "replace"))
            else:
                raw = wd[fc : fc + 2 * count]
                parts.append(raw.decode("utf-16-le", "replace"))
            remaining -= count
        text = "".join(parts)
    # Word control characters -> corpus text: paragraph/cell marks,
    # field chars (0x13/0x14/0x15), hard line breaks (0x0B)
    text = (
        text.replace("\r\n", "\n")
        .replace("\r", "\n")
        .replace("\x0b", "\n")
        .replace("\x07", "\t")
    )
    for ch in ("\x13", "\x14", "\x15", "\x00"):
        text = text.replace(ch, "")
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ---------------------------------------------------------------------------
# deterministic fixture writer (CFB + minimal FIB/piece table)
# ---------------------------------------------------------------------------


def cfb_build(streams: dict[str, bytes]) -> bytes:
    """Minimal-but-valid version-3 compound file: streams under the
    4096 cutoff go through a real mini stream + mini FAT, larger ones
    FAT-chain directly (so the READER's both paths stay live)."""
    big = {n: b for n, b in streams.items() if len(b) >= MINI_CUTOFF}
    small = {n: b for n, b in streams.items() if len(b) < MINI_CUTOFF}

    # mini stream: concatenation of small streams in 64-byte sectors
    mini = bytearray()
    mini_starts: dict[str, int] = {}
    for n, b in small.items():
        mini_starts[n] = len(mini) // MINI_SECT
        mini.extend(b)
        pad = (-len(b)) % MINI_SECT
        mini.extend(b"\x00" * pad)
    n_mini_sect = len(mini) // MINI_SECT
    minifat = [_FREE] * n_mini_sect
    for n, b in small.items():
        s0 = mini_starts[n]
        cnt = max(1, (len(b) + MINI_SECT - 1) // MINI_SECT) if b else 0
        for k in range(cnt):
            minifat[s0 + k] = s0 + k + 1 if k < cnt - 1 else _ENDCHAIN

    # sector plan: [dir sectors][minifat sectors][mini stream sectors]
    # [big stream sectors][FAT sectors last]
    sectors: list[bytes] = []

    def add(data: bytes) -> tuple[int, int]:
        start = len(sectors)
        for off in range(0, max(len(data), 1), SECT):
            chunk = data[off : off + SECT]
            sectors.append(chunk + b"\x00" * (SECT - len(chunk)))
        return start, len(sectors) - start

    # directory: root + entries (alphabetic red-black tree is not
    # validated by readers that walk all entries; chain siblings via
    # a simple left/right-free flat list)
    entries = [("Root Entry", 5)] + [(n, 2) for n in streams]
    dirblob = bytearray()
    starts: dict[str, int] = {}
    sizes = {n: len(b) for n, b in streams.items()}

    # placeholders; patched after sector layout
    for name, etype in entries:
        e = bytearray(128)
        nm = name.encode("utf-16-le")
        e[0 : len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<i", e, 68, -1)  # left
        struct.pack_into("<i", e, 72, -1)  # right
        # child: root points at the first stream entry
        struct.pack_into(
            "<i", e, 76, 1 if etype == 5 and len(entries) > 1 else -1
        )
        dirblob.extend(e)
    # chain stream entries as a right-leaning list so tree walkers
    # that follow siblings still find everything
    for i in range(1, len(entries) - 1):
        struct.pack_into("<i", dirblob, i * 128 + 72, i + 1)

    dir_start, _ = add(bytes(dirblob))
    mf_blob = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start, n_minifat_sect = (
        add(mf_blob) if minifat else (_ENDCHAIN, 0)
    )
    mini_start, _ = add(bytes(mini)) if mini else (_ENDCHAIN, 0)
    for n, b in big.items():
        starts[n], _ = add(b)

    # FAT: chains for every sector region + the FAT sectors themselves
    n_data = len(sectors)
    n_fat_sect = 1
    while (n_data + n_fat_sect) * 4 > n_fat_sect * SECT:
        n_fat_sect += 1
    total = n_data + n_fat_sect
    fat = [_FREE] * total

    def chain_region(start: int, count: int) -> None:
        for k in range(count):
            fat[start + k] = start + k + 1 if k < count - 1 else _ENDCHAIN

    def region_len(blob_len: int) -> int:
        return max(1, (blob_len + SECT - 1) // SECT)

    chain_region(dir_start, region_len(len(dirblob)))
    if minifat:
        chain_region(minifat_start, region_len(len(mf_blob)))
    if mini:
        chain_region(mini_start, region_len(len(mini)))
    for n, b in big.items():
        chain_region(starts[n], region_len(len(b)))
    for k in range(n_fat_sect):
        fat[n_data + k] = _FATSECT

    fat_blob = b"".join(struct.pack("<I", v) for v in fat)
    fat_blob += b"\xff" * ((-len(fat_blob)) % SECT)
    fat_sector_ids = list(range(n_data, n_data + n_fat_sect))

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat_sect)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat_sect)
    struct.pack_into("<I", header, 68, _ENDCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            fat_sector_ids[i] if i < len(fat_sector_ids) else _FREE,
        )
    # patch directory entry starts/sizes now that layout is fixed
    dirblob = bytearray(sectors[dir_start])
    for i, (name, etype) in enumerate(entries):
        off = i * 128
        if etype == 5:
            struct.pack_into(
                "<I", dirblob, off + 116,
                mini_start if mini else _ENDCHAIN,
            )
            struct.pack_into("<Q", dirblob, off + 120, len(mini))
        else:
            if name in big:
                struct.pack_into("<I", dirblob, off + 116, starts[name])
            else:
                struct.pack_into(
                    "<I", dirblob, off + 116, mini_starts[name]
                )
            struct.pack_into("<Q", dirblob, off + 120, sizes[name])
    sectors[dir_start] = bytes(dirblob[:SECT]) + b"\x00" * (
        SECT - min(len(dirblob), SECT)
    )

    out = bytes(header) + b"".join(sectors) + fat_blob
    return out


def build_doc(doc_id: int, text: str) -> bytes:
    """Deterministic .doc: fixture lines joined by Word paragraph
    marks (\\r), split into TWO pieces — the first stored compressed
    (cp1252, fc/2 encoding), the second UTF-16LE — so both piece
    encodings and the cp arithmetic are live under one closed-form
    oracle (lines joined by newlines, the docx/rtf family rule)."""
    from corrie_spark.sources.pdf import fixture_lines

    body = "\r".join(fixture_lines(text))
    cut = len(body) // 2
    p1, p2 = body[:cut], body[cut:]
    p1_b = p1.encode("cp1252", "replace")
    p2_b = p2.encode("utf-16-le")

    wd = bytearray(0x600)  # FIB region
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", wd, 0x0A, 0x0200)  # fWhichTblStm -> 1Table
    fc1 = len(wd)
    wd.extend(p1_b)
    fc2 = len(wd)
    wd.extend(p2_b)
    struct.pack_into("<i", wd, 0x4C, len(body))  # ccpText

    n = 2 if p2 else 1
    cps = [0, len(p1)] + ([len(body)] if p2 else [])
    plc = b"".join(struct.pack("<i", c) for c in cps)
    pcds = [struct.pack("<HIH", 0, (fc1 * 2) | _FC_COMPRESSED, 0)]
    if p2:
        pcds.append(struct.pack("<HIH", 0, fc2, 0))
    plc += b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray(b"\x00" * 16)  # fcClx > 0 keeps offsets honest
    fc_clx = len(table)
    table.extend(clx)
    struct.pack_into("<I", wd, 0x1A2, fc_clx)
    struct.pack_into("<I", wd, 0x1A6, len(clx))

    return cfb_build(
        {
            "WordDocument": bytes(wd),
            "1Table": bytes(table),
            "\x05SummaryInformation": b"\x00" * 32,
        }
    )
