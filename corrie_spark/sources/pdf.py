"""PDF text extraction (ISO 32000-1 / PDF 1.7 subset, from spec).

Crawls carry PDFs second only to HTML among text-bearing formats; the
reference engine has no document-format readers at all (this module
is beyond-parity LLM-pipeline surface, like sources/warc.py). Built
from public formats only: the PDF 1.7 object grammar (ISO 32000-1
§7.3), classic cross-reference tables (§7.5.4), FlateDecode (stdlib
zlib, §7.4.4), and the text-showing/positioning operators (§9.4).

Subset and its seams:
  - object parser: full §7.3 grammar (dicts, arrays, names with #xx
    escapes, literal/hex strings, numbers, booleans, null, indirect
    references, streams with direct-or-indirect /Length).
  - document assembly SCANS for `N G obj` headers instead of trusting
    the xref table (incremental updates append redefinitions, so
    last-definition-wins reproduces xref precedence; a broken or
    truncated xref cannot take the text down with it), then expands
    COMPRESSED OBJECT STREAMS (/Type/ObjStm, §7.5.7 — where modern
    writers put most non-stream objects): each ObjStm's
    `num offset` header pairs are parsed and the contained objects
    fill in around the top-level scan (top-level definitions win,
    matching xref precedence where an update appends uncompressed
    redefinitions). Cross-reference STREAMS themselves are never
    needed: the scan finds ObjStms by type, and a catalog found by
    /Type/Catalog replaces a missing classic trailer.
  - filters: FlateDecode, ASCIIHexDecode, ASCII85Decode; other
    filters degrade the page to a decode-error row, never an
    exception.
  - text extraction walks BT..ET blocks: Tj / TJ / ' / " show text;
    Td, TD, T*, Tm, ', " start a new output line (the deterministic
    layout rule: one extracted line per text-positioning operation —
    reproducible everywhere, no font metrics involved); TJ kerning
    offsets below -250 (thousandths of an em) become one space, the
    public-domain heuristic for inter-word gaps encoded as kerning.
  - string bytes decode as UTF-16BE behind a BOM, else PDFDocEncoding
    approximated by latin-1 (the spec's 8-bit range agrees with
    latin-1 for every printable character).

Scale shape mirrors sources/warc.py: binary files -> mapInPandas
(Arrow) extraction, bytes never shuffle, every malformed input
degrades to an `_error` marker row (poison-row safety stance), and
`pdf_to_documents` feeds the same documents schema the whole corpus
pipeline runs on.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from corrie_spark.errors import classify_error

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    """Malformed PDF construct (caught at the row boundary)."""


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self) -> str:  # debug aid only
        return f"Ref({self.num})"


class Stream:
    # `crypt` is (handler, obj_num) on streams of an encrypted
    # document — decode_stream decrypts lazily, after the /Length
    # extent is resolved (None = plaintext document)
    __slots__ = ("d", "raw", "crypt")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw
        self.crypt = None


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c == b"%":  # comment to end of line
            eol = data.find(b"\n", pos)
            pos = len(data) if eol < 0 else eol + 1
        elif c in _WS:
            pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int) -> tuple[str, int]:
    # pos at '/'
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c in _WS or c in _DELIM:
            break
        if c == b"#" and pos + 2 < n:
            out += bytes.fromhex(data[pos + 1 : pos + 3].decode("ascii"))
            pos += 3
        else:
            out += c
            pos += 1
    return out.decode("latin-1"), pos


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c == b"\\":
            nxt = data[pos + 1 : pos + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                pos += 2
            elif nxt.isdigit():  # \ddd octal, 1-3 digits
                j = pos + 1
                while j < min(pos + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[pos + 1 : j], 8) & 0xFF)
                pos = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                pos += 2
                if nxt == b"\r" and data[pos : pos + 1] == b"\n":
                    pos += 1
            else:
                pos += 1  # lone backslash: drop
        elif c == b"(":
            depth += 1
            out += c
            pos += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out += c
            pos += 1
        else:
            out += c
            pos += 1
    raise PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # pos at '<' (single)
    end = data.find(b">", pos)
    if end < 0:
        raise PdfError("unterminated hex string")
    hx = bytes(ch for ch in data[pos + 1 : end] if bytes((ch,)) not in _WS)
    if len(hx) % 2:
        hx += b"0"  # §7.3.4.3: odd count behaves as if 0 appended
    return bytes.fromhex(hx.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


def parse_object(data: bytes, pos: int):
    """Parse one PDF object at `pos`; returns (object, next_pos).
    Indirect references `N G R` come back as Ref(N)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("eof")
    c = data[pos : pos + 1]
    if c == b"/":
        return _parse_name(data, pos)
    if c == b"(":
        return _parse_literal_string(data, pos)
    if data.startswith(b"<<", pos):
        pos += 2
        d: dict = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            if data[pos : pos + 1] != b"/":
                raise PdfError("dict key is not a name")
            key, pos = _parse_name(data, pos)
            val, pos = parse_object(data, pos)
            d[key] = val
    if c == b"<":
        return _parse_hex_string(data, pos)
    if c == b"[":
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 1] == b"]":
                return arr, pos + 1
            v, pos = parse_object(data, pos)
            arr.append(v)
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group(0)
        end = m.end()
        # reference lookahead: <int> <int> R
        if b"." not in tok:
            look = _skip_ws(data, end)
            m2 = _NUM_RE.match(data, look)
            if m2 and b"." not in m2.group(0):
                look2 = _skip_ws(data, m2.end())
                if data.startswith(b"R", look2) and not data[
                    look2 + 1 : look2 + 2
                ].isalnum():
                    return Ref(int(tok)), look2 + 1
            return int(tok), end
        return float(tok), end
    raise PdfError(f"unparseable object at {pos}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def parse_document(data: bytes) -> tuple[dict[int, object], dict]:
    """Scan all `N G obj` definitions (last wins = xref/incremental-
    update precedence) and the trailer dict. Returns (objects, trailer).
    Streams capture raw bytes; /Length may be an indirect reference
    (resolved by the caller via the objects map) — the `endstream`
    keyword is the authoritative backstop either way (§7.3.8 allows a
    reader to recover the extent from it)."""
    objects: dict[int, object] = {}
    cursor = 0  # end of the last parsed object: a `N G obj` byte
    # pattern INSIDE a stream's compressed bytes must not be taken for
    # a definition (the reason real readers trust xref; scanning past
    # consumed extents recovers the same property without needing an
    # intact xref)
    for m in _OBJ_RE.finditer(data):
        if m.start() < cursor:
            continue
        num = int(m.group(1))
        try:
            obj, pos = parse_object(data, m.end())
        except PdfError:
            continue  # one bad object must not kill the document
        pos2 = _skip_ws(data, pos)
        if isinstance(obj, dict) and data.startswith(b"stream", pos2):
            s = pos2 + len(b"stream")
            if data.startswith(b"\r\n", s):
                s += 2
            elif data.startswith(b"\n", s):
                s += 1
            end = data.find(b"endstream", s)
            if end < 0:
                continue
            # keep bytes verbatim up to `endstream`: compressed data
            # legitimately ends in 0x0A/0x0D, so stripping here would
            # truncate it — /Length (decode_stream) is the extent
            raw = data[s:end]
            obj = Stream(obj, raw)
            pos = end + len(b"endstream")
        objects[num] = obj
        cursor = pos
    _expand_objstms(objects)
    trailer: dict = {}
    t = data.rfind(b"trailer")
    if t >= 0:
        try:
            trailer, _ = parse_object(data, t + len(b"trailer"))
        except PdfError:
            trailer = {}
    if not trailer or "Root" not in trailer:
        # no classic trailer (xref-stream file): find a catalog by type
        for num, obj in objects.items():
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                trailer = {"Root": Ref(num)}
                break
    return objects, trailer


def _expand_objstms(objects: dict[int, object]) -> None:
    # expand compressed object streams (§7.5.7): N pairs of
    # `objnum offset` in the first /First bytes, then the objects
    # back-to-back. Top-level scan definitions WIN over ObjStm
    # contents (an incremental update appends uncompressed
    # redefinitions — same precedence xref gives them); a malformed
    # ObjStm contributes nothing instead of failing the document.
    # Called again after decryption: an encrypted ObjStm is opaque on
    # the first pass and expandable once its bytes are decrypted.
    for s in [o for o in objects.values() if isinstance(o, Stream)]:
        if s.d.get("Type") != "ObjStm":
            continue
        try:
            body = decode_stream(objects, s)
            n = _resolve(objects, s.d.get("N"))
            first = _resolve(objects, s.d.get("First"))
            if not (isinstance(n, int) and isinstance(first, int)):
                continue
            pos = 0
            header: list[tuple[int, int]] = []
            for _ in range(n):
                pos = _skip_ws(body, pos)
                m1 = _NUM_RE.match(body, pos)
                if not m1:
                    break
                pos = _skip_ws(body, m1.end())
                m2 = _NUM_RE.match(body, pos)
                if not m2:
                    break
                pos = m2.end()
                header.append((int(m1.group(0)), int(m2.group(0))))
            for num, off in header:
                if num in objects:
                    continue  # top-level definition wins
                try:
                    obj, _ = parse_object(body, first + off)
                    objects[num] = obj
                except PdfError:
                    continue
        except (PdfError, zlib.error, ValueError):
            continue


def _resolve(objects: dict[int, object], v):
    seen = 0
    while isinstance(v, Ref):
        v = objects.get(v.num)
        seen += 1
        if seen > 64:
            raise PdfError("reference cycle")
    return v


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (§7.4.4.2): MSB-first variable-width codes 9..12,
    Clear=256, EOD=257, EarlyChange width bump (default 1 — the
    encoder widens one code EARLY, so the decoder must mirror it).
    The GIF twin in operators/multimodal.py is LSB-first without
    early change — the two bit orders are why this is its own
    function, not a parameter."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfError(f"lzw: first code {code} not literal")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise PdfError(f"lzw: code {code} ahead of table")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # standard convention (pdfminer/xpdf/libtiff; ISO
                # 32000-1 "length increases when entry 511 is added"
                # at EarlyChange=1): the decoder widens when its next
                # free slot reaches (1<<width) - early — 511/1023/2047
                # at early=1 — because its table lags the encoder's by
                # one entry at read time
                if next_code == (1 << width) - early and width < 12:
                    width += 1
            out += entry
            prev = entry
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    """Undo /DecodeParms /Predictor (§7.4.4.4): 1 = none, 2 = TIFF
    horizontal differencing, >= 10 = PNG row filters (each row carries
    its own filter-type byte, per the PNG spec). Flate/LZW streams in
    the wild — xref streams especially — ship Predictor 12 constantly;
    skipping this yields bytes that inflate fine but read as garbage."""
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if not all(isinstance(v, int) and v > 0 for v in (colors, bpc, columns)):
        raise PdfError("bad predictor parms")
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    if pred == 2:
        if bpc != 8:
            raise PdfError("TIFF predictor: only 8-bit components supported")
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        raise PdfError(f"unsupported predictor {pred}")
    # PNG predictors: rows of (1 filter byte + rowlen data bytes)
    out = bytearray()
    prior = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        if len(row) < rowlen:
            if not row:
                break
            raise PdfError("predictor: truncated row")
        pos += 1 + rowlen
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise PdfError(f"predictor: bad PNG filter type {ft}")
        out += row
        prior = row
    return bytes(out)


def decode_stream(objects: dict[int, object], s: Stream) -> bytes:
    raw = s.raw
    length = _resolve(objects, s.d.get("Length"))
    if isinstance(length, int) and 0 <= length <= len(raw):
        raw = raw[:length]
    else:
        # no usable /Length: the spec requires one EOL before
        # `endstream` — strip exactly that, never content bytes
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    # standard-security decryption happens AFTER the /Length
    # truncation (an AES body is only block-aligned within its
    # declared extent) and BEFORE the filter chain (§7.6.2: crypt
    # is conceptually the first filter)
    crypt = getattr(s, "crypt", None)
    if crypt is not None:
        handler, num = crypt
        try:
            raw = handler.decrypt(num, 0, raw)
        except ValueError as e:
            raise PdfError(f"stream decrypt failed: {e}") from None
    filters = _resolve(objects, s.d.get("Filter"))
    if filters is None:
        chain = []
    elif isinstance(filters, list):
        chain = [_resolve(objects, f) for f in filters]
    else:
        chain = [filters]
    # /DecodeParms may be one dict, or an array parallel to a /Filter
    # array (null entries = defaults for that position) — §7.3.8.2
    parms_raw = _resolve(
        objects, s.d.get("DecodeParms", s.d.get("DP"))
    )
    if isinstance(parms_raw, list):
        parms_chain = [
            p if isinstance(p, dict) else {}
            for p in (_resolve(objects, x) for x in parms_raw)
        ]
    elif isinstance(parms_raw, dict):
        parms_chain = [parms_raw]
    else:
        parms_chain = []
    parms_chain += [{}] * (len(chain) - len(parms_chain))
    for f, parms in zip(chain, parms_chain):
        parms = {k: _resolve(objects, v) for k, v in parms.items()}
        if f == "FlateDecode":
            raw = _apply_predictor(zlib.decompress(raw), parms)
        elif f == "ASCIIHexDecode":
            hx = raw.split(b">")[0]
            hx = bytes(ch for ch in hx if bytes((ch,)) not in _WS)
            if len(hx) % 2:
                hx += b"0"
            raw = bytes.fromhex(hx.decode("ascii"))
        elif f == "ASCII85Decode":
            import base64

            body = raw.split(b"~>")[0]
            body = bytes(ch for ch in body if bytes((ch,)) not in _WS)
            try:
                raw = base64.a85decode(body, adobe=False)
            except ValueError as e:
                raise PdfError(f"bad ASCII85 stream: {e}") from None
        elif f == "LZWDecode":
            ec = parms.get("EarlyChange")
            early = ec if isinstance(ec, int) else 1
            raw = _apply_predictor(_lzw_decode(raw, early), parms)
        else:
            raise PdfError(f"unsupported filter {f}")
    return raw


def _walk_pages(
    objects: dict[int, object], node, depth: int = 0, res=None
) -> Iterator[tuple[dict, object]]:
    """Yield (page dict, effective /Resources) in page-tree order.
    Resources are INHERITABLE from ancestor Pages nodes (§7.7.3.4) —
    the nearest definition wins."""
    if depth > 64:
        raise PdfError("page tree too deep")
    node = _resolve(objects, node)
    if not isinstance(node, dict):
        return
    own = _resolve(objects, node.get("Resources"))
    if isinstance(own, dict):
        res = own
    t = node.get("Type")
    if t == "Page":
        yield node, res
    elif t == "Pages" or "Kids" in node:
        for kid in _resolve(objects, node.get("Kids")) or []:
            yield from _walk_pages(objects, kid, depth + 1, res)


def _page_content(objects: dict[int, object], page: dict) -> bytes:
    contents = _resolve(objects, page.get("Contents"))
    parts: list[bytes] = []
    if isinstance(contents, Stream):
        parts = [decode_stream(objects, contents)]
    elif isinstance(contents, list):
        parts = [
            decode_stream(objects, c)
            for c in (_resolve(objects, x) for x in contents)
            if isinstance(c, Stream)
        ]
    return b"\n".join(parts)


def _decrypt_obj(handler, num: int, obj):
    """Decrypt strings eagerly, tag streams for lazy decryption in
    decode_stream (the /Length extent must be resolved first)."""
    if isinstance(obj, Stream):
        s = Stream(
            {k: _decrypt_obj(handler, num, v) for k, v in obj.d.items()},
            obj.raw,
        )
        s.crypt = (handler, num)
        return s
    if isinstance(obj, bytes):  # PDF strings parse to bytes
        try:
            return handler.decrypt(num, 0, obj)
        except ValueError:
            return obj  # keep undecryptable strings verbatim (poison)
    if isinstance(obj, list):
        return [_decrypt_obj(handler, num, x) for x in obj]
    if isinstance(obj, dict):
        return {k: _decrypt_obj(handler, num, v) for k, v in obj.items()}
    return obj


def _decrypt_document(objects: dict[int, object], trailer: dict) -> None:
    """§7.6.3 standard security handler, empty-user-password case
    (owner-password-only documents — they open in any viewer, so they
    must extract here too). Generation numbers: the scan layer keys
    objects by number with last-wins precedence, so per-object keys
    use gen 0 — the overwhelmingly dominant case in real files; a
    nonzero-gen encrypted object decrypts wrong and degrades at the
    stream/page level, never as a task death. Unsupported schemes
    (non-Standard filters) and wrong-password documents raise the
    distinct encrypted-document PdfError -> DLQ row. Covers RC4-40/
    128, AES-128 (R2-R4) and AES-256 (R5/R6, ISO 32000-2)."""
    from corrie_spark.sources.pdf_crypt import PdfCryptError, StdSecurityHandler

    enc_ref = trailer.get("Encrypt")
    enc = _resolve(objects, enc_ref)
    if not isinstance(enc, dict):
        raise PdfError("encrypted document (bad /Encrypt)")
    enc = {k: _resolve(objects, v) for k, v in enc.items()}
    ids = trailer.get("ID")
    id0 = (
        ids[0]
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes)
        else b""
    )
    try:
        handler = StdSecurityHandler(enc, id0)
    except PdfCryptError as e:
        raise PdfError(f"encrypted document ({e})") from None
    if not handler.authenticate():
        raise PdfError("encrypted document (password required)")
    skip = {enc_ref.num} if isinstance(enc_ref, Ref) else set()
    for num, obj in list(objects.items()):
        if num in skip:
            continue
        objects[num] = _decrypt_obj(handler, num, obj)
    # encrypted ObjStms were opaque on the parse-time pass; their
    # members become reachable once the container bytes decrypt
    _expand_objstms(objects)


def _document_root(data: bytes) -> tuple[dict[int, object], dict]:
    objects, trailer = parse_document(data)
    if "Encrypt" in trailer:
        _decrypt_document(objects, trailer)
    root = _resolve(objects, trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfError("no document catalog")
    return objects, root


def document_pages(data: bytes) -> list[bytes]:
    """bytes -> decoded content stream per page, in page-tree order."""
    objects, root = _document_root(data)
    return [
        _page_content(objects, page)
        for page, _ in _walk_pages(objects, root.get("Pages"))
    ]


# ---------------------------------------------------------------------------
# font decoding: /Encoding base tables + /Differences (§9.6.6) and
# /ToUnicode CMaps (§9.10.3) — without these, any PDF whose text layer
# rides a subset-embedded font or a remapped simple font extracts
# mojibake SILENTLY, the most common failure mode of naive extractors
# on crawl data.
# ---------------------------------------------------------------------------

# Adobe Glyph List subset: every name the four standard encodings use,
# plus the typographic names crawl-era writers emit. uniXXXX / uXXXXXX
# forms are handled by pattern in _glyph_to_char.
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "onesuperior": "¹",
    "ordmasculine": "º", "guillemotright": "»",
    "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "multiply": "×", "divide": "÷",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ",
    "germandbls": "ß", "agrave": "à", "aacute": "á",
    "acircumflex": "â", "atilde": "ã", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê",
    "edieresis": "ë", "igrave": "ì", "iacute": "í",
    "icircumflex": "î", "idieresis": "ï", "eth": "ð",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "fraction": "⁄",
    "florin": "ƒ", "circumflex": "ˆ", "tilde": "˜",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "OE": "Œ", "oe": "œ",
    "Ydieresis": "Ÿ", "trademark": "™", "Euro": "€",
    "minus": "−", "fi": "ﬁ", "fl": "ﬂ",
    "dotlessi": "ı", "Lslash": "Ł", "lslash": "ł",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "hungarumlaut": "˝", "caron": "ˇ",
}
for _c in range(10):
    _AGL[
        ("zero", "one", "two", "three", "four",
         "five", "six", "seven", "eight", "nine")[_c]
    ] = str(_c)
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _AGL[_c] = _c
    _AGL[_c.lower()] = _c.lower()
del _c

_UNI_NAME_RE = re.compile(r"uni((?:[0-9A-Fa-f]{4})+)")
_U_NAME_RE = re.compile(r"u([0-9A-Fa-f]{4,6})")


def _glyph_to_char(name: str) -> str | None:
    c = _AGL.get(name)
    if c is not None:
        return c
    m = _UNI_NAME_RE.fullmatch(name)
    if m:
        try:
            return bytes.fromhex(m.group(1)).decode("utf-16-be")
        except UnicodeDecodeError:
            return None
    m = _U_NAME_RE.fullmatch(name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
            return chr(cp)
    return None


# StandardEncoding's non-ASCII region (§D.2, octal positions) plus its
# two in-ASCII remaps (39 -> quoteright, 96 -> quoteleft)
_STD_UPPER = {
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling",
    0o244: "fraction", 0o245: "yen", 0o246: "florin", 0o247: "section",
    0o250: "currency", 0o251: "quotesingle", 0o252: "quotedblleft",
    0o253: "guillemotleft", 0o254: "guilsinglleft",
    0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase",
    0o272: "quotedblright", 0o273: "guillemotright", 0o274: "ellipsis",
    0o275: "perthousand", 0o277: "questiondown", 0o301: "grave",
    0o302: "acute", 0o303: "circumflex", 0o304: "tilde",
    0o305: "macron", 0o306: "breve", 0o307: "dotaccent",
    0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron",
    0o320: "emdash", 0o341: "AE", 0o343: "ordfeminine",
    0o350: "Lslash", 0o351: "Oslash", 0o352: "OE",
    0o353: "ordmasculine", 0o361: "ae", 0o365: "dotlessi",
    0o370: "lslash", 0o371: "oslash", 0o372: "oe",
    0o373: "germandbls",
}


def _codec_table(codec: str) -> tuple:
    out = []
    for b in range(256):
        try:
            out.append(bytes((b,)).decode(codec))
        except UnicodeDecodeError:
            out.append(None)
    return tuple(out)


_BASE_TABLES: dict[str, tuple] = {}


def _base_table(name: str | None) -> tuple | None:
    """code -> char table for a named base encoding; None entries mean
    'undefined at this code'. WinAnsi == cp1252 and MacRoman ==
    mac-roman for every defined position (both public tables)."""
    if name is None:
        return None
    t = _BASE_TABLES.get(name)
    if t is not None:
        return t
    if name == "WinAnsiEncoding":
        t = _codec_table("cp1252")
    elif name == "MacRomanEncoding":
        t = _codec_table("mac-roman")
    elif name in ("StandardEncoding", "PDFDocEncoding"):
        std = [None] * 256
        for b in range(32, 127):
            std[b] = chr(b)
        std[0o47] = "’"  # quoteright
        std[0o140] = "‘"  # quoteleft
        for code, glyph in _STD_UPPER.items():
            std[code] = _AGL[glyph]
        if name == "PDFDocEncoding":  # latin-1-agreeing upper half
            for b in range(0xA1, 256):
                std[b] = chr(b)
            std[0o47] = "'"
            std[0o140] = "`"
        t = tuple(std)
    else:
        return None
    _BASE_TABLES[name] = t
    return t


_HEXWS_RE = re.compile(rb"\s+")


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap -> ({code: unicode string}, code byte width).
    Handles begincodespacerange (width), beginbfchar (pairs) and
    beginbfrange (both the <lo> <hi> <dst> incrementing form and the
    <lo> <hi> [<d1> <d2> ...] array form). Destination hex strings are
    UTF-16BE per §9.10.3."""

    def objs(body: bytes) -> list:
        out = []
        pos = 0
        while True:
            try:
                o, pos = parse_object(body, pos)
            except PdfError:
                break
            out.append(o)
        return out

    def utf16(b: bytes) -> str:
        return b.decode("utf-16-be", "replace")

    cmap: dict[int, str] = {}
    width = 0
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    ):
        for o in objs(m.group(1)):
            if isinstance(o, bytes) and o:
                width = max(width, len(o))
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = objs(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            if isinstance(src, bytes) and isinstance(dst, bytes):
                cmap[int.from_bytes(src, "big")] = utf16(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        toks = objs(m.group(1))
        for lo, hi, dst in zip(toks[0::3], toks[1::3], toks[2::3]):
            if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                continue
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if hi_i < lo_i or hi_i - lo_i > 0xFFFF:
                continue  # malformed range must not OOM the page
            if isinstance(dst, list):
                for i, d in enumerate(dst[: hi_i - lo_i + 1]):
                    if isinstance(d, bytes):
                        cmap[lo_i + i] = utf16(d)
            elif isinstance(dst, bytes) and dst:
                base = int.from_bytes(dst, "big")
                for i in range(hi_i - lo_i + 1):
                    cmap[lo_i + i] = utf16(
                        (base + i).to_bytes(len(dst), "big")
                    )
    return cmap, width


class _Font:
    """Per-font string decoder. Priority per the spec's reader advice:
    /ToUnicode CMap wins; else the /Encoding table (base + Differences);
    else the module's BOM-or-latin-1 default. Unresolvable codes become
    U+FFFD — detectable downstream, never silent mojibake."""

    __slots__ = ("code_bytes", "cmap", "table")

    def __init__(
        self,
        code_bytes: int = 1,
        cmap: dict[int, str] | None = None,
        table: tuple | None = None,
    ):
        self.code_bytes = code_bytes
        self.cmap = cmap
        self.table = table

    def decode(self, b: bytes) -> str:
        if self.code_bytes == 2:
            cm = self.cmap or {}
            out = []
            for i in range(0, len(b) - 1, 2):
                code = (b[i] << 8) | b[i + 1]
                out.append(cm.get(code, "�"))
            if len(b) % 2:  # stray trailing byte: try 1-byte lookup
                out.append(cm.get(b[-1], "�"))
            return "".join(out)
        if self.cmap is None and self.table is None:
            return _decode_pdf_string(b)
        out = []
        for byte in b:
            s = self.cmap.get(byte) if self.cmap is not None else None
            if s is None and self.table is not None:
                s = self.table[byte]
            if s is None:
                s = chr(byte)  # latin-1 passthrough, the old default
            out.append(s)
        return "".join(out)


def _build_font(objects: dict[int, object], fd) -> _Font:
    fd = _resolve(objects, fd)
    if not isinstance(fd, dict):
        return _Font()
    code_bytes = 2 if fd.get("Subtype") == "Type0" else 1
    cmap = None
    tun = _resolve(objects, fd.get("ToUnicode"))
    if isinstance(tun, Stream):
        try:
            cmap, width = _parse_tounicode(decode_stream(objects, tun))
            if width in (1, 2):
                code_bytes = width
        except (PdfError, zlib.error, ValueError):
            cmap = None
    table = None
    enc = _resolve(objects, fd.get("Encoding"))
    if isinstance(enc, str):
        table = _base_table(enc)
    elif isinstance(enc, dict):
        base = _resolve(objects, enc.get("BaseEncoding"))
        # spec default base is the font's built-in encoding; Standard
        # is the public stand-in (pdfminer's choice too)
        tbl = list(
            _base_table(base if isinstance(base, str) else None)
            or _base_table("StandardEncoding")
        )
        diffs = _resolve(objects, enc.get("Differences"))
        if isinstance(diffs, list):
            code = 0
            for item in diffs:
                item = _resolve(objects, item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, str):
                    if 0 <= code <= 255:
                        tbl[code] = _glyph_to_char(item) or "�"
                    code += 1
        table = tuple(tbl)
    return _Font(code_bytes, cmap, table)


def page_fonts(
    objects: dict[int, object],
    resources,
    cache: dict[int, _Font] | None = None,
) -> dict[str, _Font]:
    """Resolve a page's /Resources /Font dict into name -> _Font.
    `cache` (keyed by indirect object number) shares decoders across
    the pages of one document — fonts are document-global in practice."""
    res = _resolve(objects, resources)
    if not isinstance(res, dict):
        return {}
    fdict = _resolve(objects, res.get("Font"))
    if not isinstance(fdict, dict):
        return {}
    out: dict[str, _Font] = {}
    for name, fref in fdict.items():
        if cache is not None and isinstance(fref, Ref):
            f = cache.get(fref.num)
            if f is None:
                f = _build_font(objects, fref)
                cache[fref.num] = f
        else:
            f = _build_font(objects, fref)
        out[name] = f
    return out


# ---------------------------------------------------------------------------
# text extraction from content streams (§9.4 text operators)
# ---------------------------------------------------------------------------

_TJ_SPACE = -250  # thousandths of an em: gaps wider than this are words


def _decode_pdf_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", "replace")
    return b.decode("latin-1")


_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")
_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def extract_text(
    content: bytes,
    fonts: dict[str, _Font] | None = None,
    xobjects: dict[str, object] | None = None,
) -> str:
    """Deterministic layout rule: inside BT..ET, every text-positioning
    operation (Td TD T* Tm ' \") starts a new output line; Tj/TJ/'/\"
    append their strings; TJ kerning below -250 becomes one space.
    Lines join with \\n; an ET flushes the line. No font metrics, no
    coordinate sort — the SAME bytes always extract the SAME text, on
    any engine, which is what a dedup/corpus pipeline needs from a
    layout rule.

    `fonts` (from page_fonts) maps resource names to decoders; Tf
    selects the current one and q/Q save/restore it with the graphics
    state (§8.4.2 lists text font in the gs). Without fonts — or for
    strings shown before any Tf — the BOM-or-latin-1 default applies.

    `xobjects` maps resource names to zero-arg callables returning the
    extracted text of a Form XObject (§8.10); a `Do` flushes the
    current line and splices the form's lines in at the invocation
    point — headers, stamps and OCR text layers live in forms, and an
    extractor that skips Do silently loses them."""
    lines: list[str] = []
    cur: list[str] = []
    pos = 0
    n = len(content)
    in_text = False
    font: _Font | None = None
    gs_stack: list[_Font | None] = []

    def dec(b: bytes) -> str:
        return font.decode(b) if font is not None else _decode_pdf_string(b)

    def flush() -> None:
        if cur:
            line = "".join(cur)
            if line:
                lines.append(line)
            cur.clear()

    operands: list = []
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos : pos + 1]
        try:
            if c == b"(":
                s, pos = _parse_literal_string(content, pos)
                operands.append(s)
                continue
            if content.startswith(b"<<", pos):
                d, pos = parse_object(content, pos)
                operands.append(d)
                continue
            if c == b"<":
                s, pos = _parse_hex_string(content, pos)
                operands.append(s)
                continue
            if c == b"[":
                arr, pos = parse_object(content, pos)
                operands.append(arr)
                continue
            if c == b"/":
                name, pos = _parse_name(content, pos)
                operands.append(name)
                continue
            m = _NUM_RE.match(content, pos)
            if m:
                operands.append(float(m.group(0)))
                pos = m.end()
                continue
        except PdfError:
            pos += 1
            operands.clear()
            continue
        m = _OP_RE.match(content, pos)
        if not m:
            pos += 1
            operands.clear()
            continue
        op = m.group(0)
        pos = m.end()
        if op == b"BI":
            # inline image (§8.9.7): binary sample data follows up to a
            # whitespace-delimited EI — it can contain byte sequences
            # that LOOK like text operators (even 'BT'), so it must be
            # skipped as a block, never scanned
            m_ei = _EI_RE.search(content, pos)  # no remaining-buffer copy
            pos = n if m_ei is None else m_ei.end()
        elif op == b"BT":
            in_text = True
        elif op == b"ET":
            flush()
            in_text = False
        elif op == b"Tf":
            if (
                fonts
                and len(operands) >= 2
                and isinstance(operands[-2], str)
            ):
                font = fonts.get(operands[-2], font)
        elif op == b"q":
            gs_stack.append(font)
        elif op == b"Q":
            if gs_stack:
                font = gs_stack.pop()
        elif op == b"Do":
            if (
                xobjects
                and operands
                and isinstance(operands[-1], str)
                and operands[-1] in xobjects
            ):
                flush()
                t = xobjects[operands[-1]]()
                if t:
                    lines.extend(t.split("\n"))
        elif in_text:
            if op == b"Tj" and operands and isinstance(operands[-1], bytes):
                cur.append(dec(operands[-1]))
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        cur.append(dec(el))
                    elif isinstance(el, (int, float)) and el < _TJ_SPACE:
                        cur.append(" ")
            elif op in (b"'", b'"'):
                flush()
                if operands and isinstance(operands[-1], bytes):
                    cur.append(dec(operands[-1]))
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                flush()
        operands.clear()
    flush()
    return "\n".join(lines)


def page_xobjects(
    objects: dict[int, object],
    resources,
    font_cache: dict[int, _Font],
    depth: int = 0,
):
    """Resolve a /Resources /XObject dict into name -> lazy extractor
    for Form XObjects (§8.10.1). Lazy + depth-bounded: a form's text
    is extracted only when a Do actually invokes it, a form's own
    Resources fall back to the invoker's (the spec's inheritance
    advice), and a malformed or cyclic form degrades to '' — never an
    exception out of the page."""
    res = _resolve(objects, resources)
    if not isinstance(res, dict) or depth > 8:
        return {}
    xdict = _resolve(objects, res.get("XObject"))
    if not isinstance(xdict, dict):
        return {}
    out = {}
    for name, xref in xdict.items():

        def run(xref=xref):
            x = _resolve(objects, xref)
            if not isinstance(x, Stream) or x.d.get("Subtype") != "Form":
                return ""
            try:
                content = decode_stream(objects, x)
                own = _resolve(objects, x.d.get("Resources"))
                eff = own if isinstance(own, dict) else res
                return extract_text(
                    content,
                    page_fonts(objects, eff, font_cache),
                    page_xobjects(objects, eff, font_cache, depth + 1),
                )
            except (PdfError, zlib.error, ValueError, RecursionError):
                return ""

        out[name] = run
    return out


def pdf_links(data: bytes) -> list[list[str]]:
    """Whole document -> per page, the URI targets of /Link
    annotations (§12.5.6.5 + §12.6.4.7 URI actions) — URL discovery
    for the crawl frontier: PDFs carry outlinks exactly like HTML
    pages, and a frontier that skips them under-crawls every document-
    heavy site."""
    objects, root = _document_root(data)
    out: list[list[str]] = []
    for page, _res in _walk_pages(objects, root.get("Pages")):
        uris: list[str] = []
        annots = _resolve(objects, page.get("Annots"))
        for aref in annots if isinstance(annots, list) else []:
            a = _resolve(objects, aref)
            if not (isinstance(a, dict) and a.get("Subtype") == "Link"):
                continue
            act = _resolve(objects, a.get("A"))
            if isinstance(act, dict) and act.get("S") == "URI":
                uri = _resolve(objects, act.get("URI"))
                if isinstance(uri, bytes):
                    uris.append(_decode_pdf_string(uri))
        out.append(uris)
    return out


def pdf_text(data: bytes) -> list[str]:
    """Whole document -> extracted text per page, strings decoded
    through each page's font resources (ToUnicode / Encoding), Form
    XObjects spliced in at their Do invocation points."""
    objects, root = _document_root(data)
    cache: dict[int, _Font] = {}
    out = []
    for page, res in _walk_pages(objects, root.get("Pages")):
        content = _page_content(objects, page)
        out.append(
            extract_text(
                content,
                page_fonts(objects, res, cache),
                page_xobjects(objects, res, cache),
            )
        )
    return out


# ---------------------------------------------------------------------------
# Spark operators (the warc_records shape: poison-safe Arrow stage)
# ---------------------------------------------------------------------------

PDF_SCHEMA_DDL = (
    "pdf_file string, page bigint, n_pages bigint, text string, "
    "n_chars bigint, error string, error_kind string"
)

PDF_COLUMNS = [
    "pdf_file", "page", "n_pages", "text", "n_chars", "error", "error_kind",
]


def pdf_records(
    bin_df: DataFrame, file_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(file, pdf-bytes) -> one row per page with extracted text.
    Poison safety stance of warc_records: a truncated or malformed PDF
    yields ONE error row (error column set, text null) — never an
    exception out of the stage. mapInPandas: bytes stay executor-
    local, only text leaves."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf[file_col], pdf[content_col]):
                try:
                    pages = pdf_text(bytes(blob))
                    if not pages:
                        raise PdfError("no pages")
                    for i, text in enumerate(pages):
                        out.append(
                            {
                                "pdf_file": path,
                                "page": i,
                                "n_pages": len(pages),
                                "text": text,
                                "n_chars": len(text),
                                "error": None,
                                "error_kind": None,
                            }
                        )
                except Exception as e:  # noqa: BLE001 — poison row, not task death
                    reason = f"{type(e).__name__}: {e}"[:200]
                    out.append(
                        {
                            "pdf_file": path,
                            "page": -1,
                            "n_pages": 0,
                            "text": None,
                            "n_chars": 0,
                            "error": reason,
                            "error_kind": classify_error(reason),
                        }
                    )
            yield pd.DataFrame(out, columns=PDF_COLUMNS)

    return bin_df.mapInPandas(run, PDF_SCHEMA_DDL)


PDF_LINKS_DDL = "pdf_file string, page bigint, pos bigint, uri string, error string"


def pdf_link_records(
    bin_df: DataFrame, file_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(file, pdf-bytes) -> one row per /Link URI annotation (the
    frontier-expansion stage for document corpora). Poison safety as
    pdf_records: a malformed file yields one error row."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf[file_col], pdf[content_col]):
                try:
                    for pg, uris in enumerate(pdf_links(bytes(blob))):
                        for i, u in enumerate(uris):
                            out.append(
                                {
                                    "pdf_file": path,
                                    "page": pg,
                                    "pos": i,
                                    "uri": u,
                                    "error": None,
                                }
                            )
                except Exception as e:  # noqa: BLE001 — poison row
                    out.append(
                        {
                            "pdf_file": path,
                            "page": -1,
                            "pos": -1,
                            "uri": None,
                            "error": f"{type(e).__name__}: {e}"[:200],
                        }
                    )
            yield pd.DataFrame(
                out, columns=["pdf_file", "page", "pos", "uri", "error"]
            )

    return bin_df.mapInPandas(run, PDF_LINKS_DDL)


def read_pdf(spark: SparkSession, path: str) -> DataFrame:
    """Batch reader: binaryFile scan -> per-page extraction."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return pdf_records(files)


def read_pdf_stream(spark: SparkSession, path: str) -> DataFrame:
    """Continuous PDF ingestion — the read_warc_stream twin: the file
    source watches the directory, each new .pdf lands as one row of
    one micro-batch and runs through the same extraction stage as
    batch (one code path). File-granular exactly-once from the file
    source's checkpointed log; extraction is deterministic, so
    replays re-emit identical rows."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    return pdf_records(files.select("path", "content"))


def pdf_to_documents(records: DataFrame) -> DataFrame:
    """Page rows -> documents schema: doc_id = 60-bit hash of
    (file, page), all pages of a file concatenated per page row
    upstream consumers can regroup; error rows are excluded (they
    stay available as the DLQ frame via records.where(error ...))."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.dedup import hash60

    return records.where(F.col("error").isNull()).select(
        hash60(
            F.concat_ws(":", F.col("pdf_file"), F.col("page")), "pdf-doc"
        ).alias("doc_id"),
        F.col("pdf_file").alias("url"),
        F.col("text"),
    )


# ---------------------------------------------------------------------------
# deterministic fixture builder (python + closed-form oracle twins)
# ---------------------------------------------------------------------------

WORDS_PER_LINE = 8
LINES_PER_PAGE = 3


def fixture_lines(text: str) -> list[str]:
    """The wrapping rule both engines state: split on single spaces,
    WORDS_PER_LINE words per extracted line (the oracle rebuilds this
    with list_slice over the token array). Empty text -> no lines."""
    toks = [t for t in text.split(" ") if t]
    return [
        " ".join(toks[i : i + WORDS_PER_LINE])
        for i in range(0, len(toks), WORDS_PER_LINE)
    ]


def fixture_pages(text: str) -> list[list[str]]:
    lines = fixture_lines(text)
    if not lines:
        return [[]]
    return [
        lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(lines), LINES_PER_PAGE)
    ]


def _esc_literal(s: str) -> bytes:
    b = s.encode("latin-1", "replace")
    return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def _content_stream(lines: list[str], doc_id: int) -> bytes:
    """One BT..ET block per line; line encoding alternates literal /
    hex / TJ-array by (doc_id + line index) so every string-shaped
    code path is live in the gated fixture, while the EXTRACTED text
    is identical by construction."""
    parts = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        mode = (doc_id + i) % 3
        if i > 0:
            parts.append(b"0 -14 Td")
        if mode == 0:
            parts.append(b"(" + _esc_literal(line) + b") Tj")
        elif mode == 1:
            parts.append(b"<" + line.encode("latin-1", "replace").hex().encode() + b"> Tj")
        else:
            # TJ with an inter-word kerning gap: first word, -300 gap,
            # rest — extracts to the same line text
            words = line.split(" ", 1)
            if len(words) == 2:
                parts.append(
                    b"[(" + _esc_literal(words[0]) + b") -300 ("
                    + _esc_literal(words[1]) + b")] TJ"
                )
            else:
                parts.append(b"(" + _esc_literal(line) + b") Tj")
    parts.append(b"ET")
    return b"\n".join(parts)


def _serialize_encrypt_dict(enc: dict) -> bytes:
    """Resolved /Encrypt dict (pdf_crypt.build_standard_encrypt) ->
    PDF object body. O/U as hex strings; V4/V5 add the /StdCF
    filter, V5 additionally /OE //UE //Perms (48/32/16 bytes)."""
    body = (
        b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O <%s> /U <%s>"
        % (
            enc["V"],
            enc["R"],
            enc["Length"],
            enc["P"],
            enc["O"].hex().encode(),
            enc["U"].hex().encode(),
        )
    )
    if enc["V"] == 5:
        body += b" /OE <%s> /UE <%s> /Perms <%s>" % (
            enc["OE"].hex().encode(),
            enc["UE"].hex().encode(),
            enc["Perms"].hex().encode(),
        )
    if enc["V"] in (4, 5):
        cfm = enc["CF"]["StdCF"]["CFM"]
        body += (
            b" /CF << /StdCF << /CFM /%s /AuthEvent /DocOpen >> >>"
            b" /StmF /StdCF /StrF /StdCF" % cfm.encode()
        )
    return body + b" >>"


def build_pdf(doc_id: int, text: str, encrypt: str | None = None) -> bytes:
    """Deterministic single-doc PDF: catalog -> pages -> LINES_PER_PAGE
    lines per page, FlateDecode content streams, classic xref with
    byte-exact offsets, /Length as an INDIRECT reference on page 0
    (the resolver path) and direct elsewhere. `encrypt` in {'rc4-40',
    'rc4-128', 'aes-128'} wraps every content stream in §7.6.3
    standard security with an EMPTY user password (the
    owner-password-only shape): extracted text must equal the
    unencrypted twin's byte-for-byte."""
    handler = None
    extra_objs: list[tuple[int, bytes]] = []
    trailer_extra = b""
    pages = fixture_pages(text)
    n_pages = len(pages)
    objs: list[tuple[int, bytes]] = []
    page_ids = [4 + 2 * i for i in range(n_pages)]
    next_id = 4 + 2 * n_pages
    if encrypt is not None:
        from corrie_spark.sources.pdf_crypt import build_standard_encrypt

        id0 = hashlib.md5(f"pdf-id:{doc_id}".encode()).digest()
        if encrypt == "locked":  # a real (non-empty) user password:
            # must DLQ as 'encrypted', never extract
            enc_dict, handler = build_standard_encrypt(
                "rc4-128", id0, user_pw=b"secret"
            )
        else:
            enc_dict, handler = build_standard_encrypt(encrypt, id0)
        enc_id = next_id + (1 if n_pages else 0)
        extra_objs.append((enc_id, _serialize_encrypt_dict(enc_dict)))
        id_hex = id0.hex().encode()
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            enc_id,
            id_hex,
            id_hex,
        )
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append(
        (2, b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages)
    )
    objs.append((3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    first_len = None
    for i, (pid, lines) in enumerate(zip(page_ids, pages)):
        content = zlib.compress(_content_stream(lines, doc_id))
        if handler is not None:
            content = handler.encrypt(pid + 1, 0, content)
        if i == 0:
            len_ref = b"%d 0 R" % next_id
            first_len = len(content)
        else:
            len_ref = b"%d" % len(content)
        objs.append(
            (
                pid,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % (pid + 1),
            )
        )
        objs.append(
            (
                pid + 1,
                b"<< /Length " + len_ref + b" /Filter /FlateDecode >>\nstream\n"
                + content
                + b"\nendstream",
            )
        )
    if n_pages:
        objs.append((next_id, b"%d" % first_len))
    objs.extend(extra_objs)
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    max_id = max(offsets) + 1
    out += b"xref\n0 %d\n" % max_id
    out += b"0000000000 65535 f \n"
    for num in range(1, max_id):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_id, trailer_extra, xref_at)
    )
    return bytes(out)


def build_pdf_objstm(doc_id: int, text: str) -> bytes:
    """Modern-writer fixture: every non-stream object (catalog, page
    tree, pages, font) lives in ONE compressed object stream; content
    streams stay top-level (streams cannot nest in an ObjStm, §7.5.7);
    NO classic trailer — the reader must expand the ObjStm and find
    the catalog by /Type (the xref-stream file shape). Extracted text
    is byte-identical to build_pdf's by construction."""
    pages = fixture_pages(text)
    n_pages = len(pages)
    page_ids = [10 + 2 * i for i in range(n_pages)]
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in page_ids) + b"]"
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    for pid in page_ids:
        packed.append(
            (
                pid,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % (pid + 1),
            )
        )
    header = bytearray()
    body = bytearray()
    for num, obj in packed:
        header += b"%d %d " % (num, len(body))
        body += obj + b" "
    first = len(header)
    objstm_payload = zlib.compress(bytes(header) + bytes(body))
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    out += (
        b"9 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n" % (len(packed), first, len(objstm_payload))
        + objstm_payload
        + b"\nendstream\nendobj\n"
    )
    for pid, lines in zip(page_ids, pages):
        content = zlib.compress(_content_stream(lines, doc_id))
        out += (
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % (pid + 1, len(content))
            + content
            + b"\nendstream\nendobj\n"
        )
    out += b"%%EOF\n"
    return bytes(out)


_LOWER = "abcdefghijklmnopqrstuvwxyz"


def build_pdf_fonts(doc_id: int, text: str) -> bytes:
    """Font-machinery fixture: the FIRST fixture line shown three ways
    on one page —
      1. /FT: Type0 + Identity-H, per-doc CID assignment, /ToUnicode
         bfchar CMap (the subset-embedded-font shape) -> extracts the
         line verbatim;
      2. /FD: simple font, /BaseEncoding /WinAnsiEncoding +
         /Differences remapping a-z codes to A-Z glyph NAMES; content
         bytes are the lowercase line -> extracts the UPPERCASED line
         (if Differences were ignored, extraction would yield the raw
         bytes and the oracle md5 would catch it);
      3. /FW: WinAnsiEncoding, 0x93/0x94 curly-quote bytes around the
         first token -> extracts with real Unicode quotes — and this
         line lives inside a FORM XOBJECT invoked by Do (its own
         /Resources carry /FW), so XObject traversal is gated by the
         same closed-form oracle.
    Empty documents produce a page with no text operators."""
    lines = fixture_lines(text)
    line1 = lines[0] if lines else ""
    w1 = line1.split(" ", 1)[0] if line1 else ""
    chars = sorted(set(line1))
    cid = {c: i + 1 for i, c in enumerate(chars)}
    tun = bytearray(
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
    )
    for i in range(0, len(chars), 100):  # <=100 entries per block (spec)
        chunk = chars[i : i + 100]
        tun += b"%d beginbfchar\n" % len(chunk)
        for c in chunk:
            tun += b"<%04X> <%s>\n" % (
                cid[c],
                c.encode("utf-16-be").hex().encode(),
            )
        tun += b"endbfchar\n"
    tun += b"end\n"
    if line1:
        hex1 = "".join("%04x" % cid[c] for c in line1).encode()
        content = (
            b"BT /FT 12 Tf 72 720 Td <" + hex1 + b"> Tj\n"
            b"0 -14 Td /FD 12 Tf (" + _esc_literal(line1) + b") Tj ET\n"
            b"/X1 Do"
        )
        form = (
            b"BT /FW 12 Tf 72 680 Td (\x93" + _esc_literal(w1) + b"\x94) Tj ET"
        )
    else:
        content = b"BT ET"
        form = b""
    comp = zlib.compress(content)
    diffs = b" ".join(b"/%c" % c for c in _LOWER.upper().encode())
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (
            4,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /FT 7 0 R /FD 8 0 R >> "
            b"/XObject << /X1 10 0 R >> >> "
            b"/Annots [11 0 R 12 0 R] "
            b"/Contents 5 0 R >>",
        ),
        (
            11,
            b"<< /Type /Annot /Subtype /Link /Rect [0 0 100 20] "
            b"/A << /S /URI /URI (https://example.org/doc/%d/next) >> >>"
            % doc_id,
        ),
        (
            12,
            b"<< /Type /Annot /Subtype /Link /Rect [0 30 100 50] "
            b"/A << /S /URI /URI (https://ref.example.net/cite/%d) >> >>"
            % (doc_id % 13),
        ),
        (
            7,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+Fix-%d "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>" % (doc_id % 97),
        ),
        (
            8,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Fix "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding /Differences "
            b"[97 " + diffs + b"] >> >>",
        ),
        (
            9,
            b"<< /Type /Font /Subtype /TrueType /BaseFont /Fix "
            b"/Encoding /WinAnsiEncoding >>",
        ),
    ]
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    for num, body in objs:
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    out += (
        b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream\nendobj\n"
    )
    out += (
        b"6 0 obj\n<< /Length %d >>\nstream\n" % len(tun)
        + bytes(tun)
        + b"\nendstream\nendobj\n"
    )
    out += (
        b"10 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        b"/Resources << /Font << /FW 9 0 R >> >> /Length %d >>\nstream\n"
        % len(form)
        + form
        + b"\nendstream\nendobj\n"
    )
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


# doc_id % 10 routes even docs through §7.6.3 standard security with
# an empty user password (the owner-password-only crawl shape) — the
# extracted text is identical by construction, so the same closed-form
# oracle gates the decryption paths for free.
PDF_ENCRYPT_ROUTE = {2: "rc4-40", 4: "rc4-128", 6: "aes-128", 8: "aes-256"}

# doc_id % 31 routes a slice of the corpus through DETERMINISTIC
# corruption, one rule per DLQ error_kind, so the corpus accounting
# oracle replays the taxonomy column closed-form:
#   7  -> locked encryption (real user password)    -> 'encrypted'
#   14 -> first content stream's tail bytes removed -> 'truncated'
#   21 -> /FlateDecode renamed to an unknown filter -> 'unsupported-codec'
#   28 -> every byte XOR 0x5A (no object survives)  -> 'bad-container'
PDF_CORRUPT_MOD = 31
PDF_CORRUPT_KINDS = {
    7: "encrypted",
    14: "truncated",
    21: "unsupported-codec",
    28: "bad-container",
}


def corrupt_pdf(blob: bytes, kind: str) -> bytes:
    """Apply one deterministic corruption rule to a built fixture PDF
    (classic layout). Each rule is chosen so the scanning parser —
    which is deliberately tolerant — still surfaces exactly the
    intended error kind."""
    if kind == "truncated":
        # keep the stream's head, drop its tail: zlib reports an
        # incomplete/truncated stream (cutting the MIDDLE would read
        # as invalid data, a different kind)
        s = blob.find(b"stream\n") + len(b"stream\n")
        e = blob.find(b"\nendstream", s)
        return blob[: s + (e - s) // 2] + blob[e:]
    if kind == "unsupported-codec":
        return blob.replace(b"FlateDecode", b"JPXDecodeXX")
    if kind == "bad-container":
        return bytes(b ^ 0x5A for b in blob)
    raise ValueError(kind)


def _build_fixture_pdf(doc_id: int, text: str) -> bytes:
    kind = PDF_CORRUPT_KINDS.get(doc_id % PDF_CORRUPT_MOD)
    if kind == "encrypted":
        return build_pdf(doc_id, text, encrypt="locked")
    if kind is not None:
        # corruption rules assume the classic layout's byte shape
        return corrupt_pdf(build_pdf(doc_id, text), kind)
    if doc_id % 2:
        return build_pdf_objstm(doc_id, text)
    return build_pdf(doc_id, text, encrypt=PDF_ENCRYPT_ROUTE.get(doc_id % 10))


def pdf_fixture_files(docs_df: DataFrame) -> DataFrame:
    """Distributed fixture build: one PDF per document row (path,
    content) — the binaryFile shape, so the extraction path under test
    is the real one end-to-end. Writers alternate by doc_id: odd docs
    get the modern ObjStm layout (build_pdf_objstm), even docs the
    classic-xref layout, with doc_id % 10 in {2, 4, 6} additionally
    encrypted (RC4-40 / RC4-128 / AES-128, empty user password) —
    extraction is byte-identical by construction, so ONE closed-form
    oracle gates every assembly and decryption path."""
    import pandas as pd

    def build(batches):
        for pdf in batches:
            out = [
                {
                    "path": f"doc-{int(i):08d}.pdf",
                    "content": _build_fixture_pdf(int(i), str(t)),
                }
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(out, columns=["path", "content"])

    return docs_df.select("doc_id", "text").mapInPandas(
        build, "path string, content binary"
    )
