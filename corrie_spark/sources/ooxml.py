"""Office / EPUB container ingestion (ZIP + OOXML, from spec).

Crawls carry .docx/.pptx/.epub as the third text-bearing family after
HTML and PDF; the reference engine has no document readers (this is
beyond-parity LLM-pipeline surface, like sources/pdf.py). Built from
public formats only: the PKZIP APPNOTE container layout (local file
headers, central directory, end-of-central-directory), DEFLATE via
stdlib zlib (RFC 1951), ECMA-376 WordprocessingML / PresentationML
(w:p paragraphs, w:t/w:tab/w:br runs; a:p/a:t for slides), and the
EPUB OCF layout (OEBPS XHTML chapters — the HTML strip itself rides
operators/web.py's oracle-mirrored chain, one code path with the
crawl HTML pipeline).

Subset and its seams:
  - ZIP64 (APPNOTE 4.5) is handled: EOCD64 locator + record when the
    EOCD fields are maxed, per-entry 0x0001 extras in the central
    directory; corrupt ZIP64 structures degrade to the DLQ row. The
    fixture writer can FORCE the layout at small sizes so the path
    stays oracle-gated.
  - encrypted members (flag bit 0) and methods other than stored /
    deflate raise OoxmlError (degrades to the DLQ row).
  - XML is parsed with stdlib ElementTree, namespace-agnostic on
    local names (OOXML writers vary prefixes, never local names).

Scale shape mirrors sources/warc.py: binary files -> mapInPandas
(Arrow) extraction, bytes never shuffle, every malformed input
degrades to an error row (poison-row safety stance).
"""

from __future__ import annotations

import re
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

from corrie_spark.errors import classify_error


class OoxmlError(ValueError):
    """Malformed container/part (caught at the row boundary)."""


# ---------------------------------------------------------------------------
# ZIP container (PKZIP APPNOTE 4.3.x structures)
# ---------------------------------------------------------------------------

_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_MAX16, _MAX32 = 0xFFFF, 0xFFFFFFFF


def _zip64_extra(extra: bytes, usize: int, csize: int, lho: int) -> tuple[int, int, int]:
    """APPNOTE 4.5.3: the 0x0001 extra field carries 64-bit values
    for exactly the central-directory fields that are maxed, in
    uncompressed-size, compressed-size, offset order."""
    ep = 0
    while ep + 4 <= len(extra):
        hid, hsz = struct.unpack_from("<HH", extra, ep)
        if hid != 0x0001:
            ep += 4 + hsz
            continue
        vals = extra[ep + 4 : ep + 4 + hsz]
        vp = 0
        try:
            if usize == _MAX32:
                (usize,) = struct.unpack_from("<Q", vals, vp)
                vp += 8
            if csize == _MAX32:
                (csize,) = struct.unpack_from("<Q", vals, vp)
                vp += 8
            if lho == _MAX32:
                (lho,) = struct.unpack_from("<Q", vals, vp)
                vp += 8
        except struct.error:
            raise OoxmlError("bad zip64 extra field") from None
        return usize, csize, lho
    raise OoxmlError("zip64 extra field missing")


def zip_entries(data: bytes) -> dict[str, bytes]:
    """Parse a ZIP archive into {name: decompressed bytes}. Reads the
    end-of-central-directory (scanned from the tail — the comment may
    follow it), following the ZIP64 EOCD locator + record (APPNOTE
    4.5) when any EOCD field is maxed, then walks the central
    directory for the authoritative entry list (per-entry 0x0001
    ZIP64 extras honored), then each local header for the data start
    (local name/extra lengths may legally differ from central). CRC32
    and size are validated per entry — a corrupt member is an error
    for the WHOLE container (unlike WARC members, ZIP entries share
    one directory; a lying directory poisons everything after it)."""
    eocd = data.rfind(_EOCD_SIG)
    if eocd < 0 or eocd + 22 > len(data):
        raise OoxmlError("no end-of-central-directory")
    n_entries, cd_size, cd_off = struct.unpack_from("<HII", data, eocd + 10)
    n_entries64: int = n_entries
    if n_entries == _MAX16 or cd_size == _MAX32 or cd_off == _MAX32:
        loc = data.rfind(_EOCD64_LOC_SIG, 0, eocd)
        if loc < 0 or loc + 20 > len(data):
            raise OoxmlError("zip64 locator missing")
        (e64,) = struct.unpack_from("<Q", data, loc + 8)
        if e64 + 56 > len(data) or data[e64 : e64 + 4] != _EOCD64_SIG:
            raise OoxmlError("bad zip64 end-of-central-directory")
        n_entries64, cd_size, cd_off = struct.unpack_from("<QQQ", data, e64 + 32)
    if cd_off + cd_size > len(data):
        raise OoxmlError("central directory out of range")
    out: dict[str, bytes] = {}
    pos = cd_off
    for _ in range(n_entries64):
        if data[pos : pos + 4] != _CEN_SIG:
            raise OoxmlError("bad central-directory header")
        flags, method = struct.unpack_from("<HH", data, pos + 8)
        crc, csize, usize = struct.unpack_from("<III", data, pos + 16)
        nlen, elen, clen = struct.unpack_from("<HHH", data, pos + 28)
        (lho,) = struct.unpack_from("<I", data, pos + 42)
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        if _MAX32 in (csize, usize, lho):
            extra = data[pos + 46 + nlen : pos + 46 + nlen + elen]
            usize, csize, lho = _zip64_extra(extra, usize, csize, lho)
        pos += 46 + nlen + elen + clen
        if flags & 0x1:
            raise OoxmlError(f"encrypted entry {name}")
        if data[lho : lho + 4] != _LOC_SIG:
            raise OoxmlError(f"bad local header for {name}")
        lnlen, lelen = struct.unpack_from("<HH", data, lho + 26)
        start = lho + 30 + lnlen + lelen
        blob = data[start : start + csize]
        if len(blob) != csize:
            raise OoxmlError(f"truncated entry {name}")
        if method == 0:
            raw = blob
        elif method == 8:
            try:
                raw = zlib.decompress(blob, -15)
            except zlib.error as e:
                raise OoxmlError(f"bad deflate in {name}: {e}") from None
        else:
            raise OoxmlError(f"unsupported method {method} in {name}")
        if len(raw) != usize:
            raise OoxmlError(f"size mismatch in {name}")
        if (zlib.crc32(raw) & 0xFFFFFFFF) != crc:
            raise OoxmlError(f"crc mismatch in {name}")
        out[name] = raw
    return out


def zip_build(
    entries: list[tuple[str, bytes, bool]], force_zip64: bool = False
) -> bytes:
    """Deterministic ZIP writer (fixture twin of zip_entries): one
    local header + data per entry, central directory, EOCD. Timestamps
    are zero — the same inputs always produce the same bytes.
    `force_zip64` writes the APPNOTE 4.5 layout (maxed EOCD + EOCD64
    record/locator, per-entry 0x0001 extras) even at small sizes, so
    the ZIP64 read path is oracle-gated without a 4 GiB fixture."""
    out = bytearray()
    central = bytearray()
    for name, raw, deflate in entries:
        nm = name.encode("utf-8")
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        if deflate:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = c.compress(raw) + c.flush()
            method = 8
        else:
            blob = raw
            method = 0
        off = len(out)
        out += struct.pack(
            "<4sHHHHHIIIHH",
            _LOC_SIG, 20, 0, method, 0, 0x21, crc, len(blob), len(raw),
            len(nm), 0,
        )
        out += nm + blob
        if force_zip64:
            # maxed central fields + the 0x0001 extra carrying the
            # real 64-bit values (the modern-writer shape a >4 GiB
            # docx would have, forced at small size so the structures
            # are exercised under the same oracle)
            extra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(raw), len(blob), off
            )
            central += struct.pack(
                "<4sHHHHHHIIIHHHHHII",
                _CEN_SIG, 45, 45, 0, method, 0, 0x21, crc,
                _MAX32, _MAX32, len(nm), len(extra), 0, 0, 0, 0, _MAX32,
            )
            central += nm + extra
        else:
            central += struct.pack(
                "<4sHHHHHHIIIHHHHHII",
                _CEN_SIG, 20, 20, 0, method, 0, 0x21, crc, len(blob),
                len(raw), len(nm), 0, 0, 0, 0, 0, off,
            )
            central += nm
    cd_off = len(out)
    out += central
    if force_zip64:
        e64_off = len(out)
        out += struct.pack(
            "<4sQHHIIQQQQ",
            _EOCD64_SIG, 44, 45, 45, 0, 0,
            len(entries), len(entries), len(central), cd_off,
        )
        out += struct.pack("<4sIQI", _EOCD64_LOC_SIG, 0, e64_off, 1)
        out += struct.pack(
            "<4sHHHHIIH",
            _EOCD_SIG, 0, 0, _MAX16, _MAX16, _MAX32, _MAX32, 0,
        )
    else:
        out += struct.pack(
            "<4sHHHHIIH",
            _EOCD_SIG, 0, 0, len(entries), len(entries), len(central),
            cd_off, 0,
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# OOXML part extraction (ECMA-376)
# ---------------------------------------------------------------------------


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _paragraph_lines(root, text_tag: str = "t") -> list[str]:
    """Collect one output line per paragraph element (local name 'p' —
    w:p in WordprocessingML, a:p in DrawingML): text runs concatenate,
    tabs become \\t, explicit breaks become in-line newlines. Empty
    paragraphs are dropped (corpus-text stance)."""
    lines: list[str] = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        buf: list[str] = []
        for el in p.iter():
            ln = _local(el.tag)
            if ln == text_tag and el.text:
                buf.append(el.text)
            elif ln == "tab":
                buf.append("\t")
            elif ln in ("br", "cr"):
                buf.append("\n")
        t = "".join(buf)
        if t:
            lines.append(t)
    return lines


def _parse_xml(raw: bytes):
    import xml.etree.ElementTree as ET

    try:
        return ET.fromstring(raw)
    except ET.ParseError as e:
        raise OoxmlError(f"bad xml: {e}") from None


def docx_text(data: bytes) -> str:
    """.docx bytes -> text: word/document.xml paragraphs, one line per
    w:p (tables contribute their cell paragraphs in document order —
    they nest w:p like everything else in WordprocessingML)."""
    parts = zip_entries(data)
    xml = parts.get("word/document.xml")
    if xml is None:
        raise OoxmlError("no word/document.xml")
    return "\n".join(_paragraph_lines(_parse_xml(xml)))


_SLIDE_RE = re.compile(r"ppt/slides/slide([0-9]+)\.xml")


def pptx_slides(data: bytes) -> list[str]:
    """.pptx bytes -> text per slide (numeric slide order): a:p
    paragraphs of every shape's text body."""
    parts = zip_entries(data)
    slides = sorted(
        (int(m.group(1)), name)
        for name, m in ((n, _SLIDE_RE.fullmatch(n)) for n in parts)
        if m
    )
    if not slides:
        raise OoxmlError("no ppt/slides/slideN.xml parts")
    return [
        "\n".join(_paragraph_lines(_parse_xml(parts[name])))
        for _, name in slides
    ]


_SHEET_RE = re.compile(r"xl/worksheets/sheet([0-9]+)\.xml")


def xlsx_sheets(data: bytes) -> list[str]:
    """.xlsx bytes -> text per sheet (numeric sheet order): one line
    per row, cells joined by \\t. SpreadsheetML stores string cells as
    INDICES into xl/sharedStrings.xml (t="s"); inline strings
    (t="inlineStr") and raw values (<v>) are read directly. Cells of
    other types contribute their <v> text — a corpus pipeline wants
    the characters, not the number format."""
    parts = zip_entries(data)
    shared: list[str] = []
    ss = parts.get("xl/sharedStrings.xml")
    if ss is not None:
        root = _parse_xml(ss)
        for si in root:
            if _local(si.tag) != "si":
                continue
            shared.append(
                "".join(
                    el.text
                    for el in si.iter()
                    if _local(el.tag) == "t" and el.text
                )
            )
    sheets = sorted(
        (int(m.group(1)), name)
        for name, m in ((n, _SHEET_RE.fullmatch(n)) for n in parts)
        if m
    )
    if not sheets:
        raise OoxmlError("no xl/worksheets/sheetN.xml parts")
    out = []
    for _, name in sheets:
        root = _parse_xml(parts[name])
        lines = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                t = c.get("t", "")
                v = next(
                    (el for el in c.iter() if _local(el.tag) == "v"), None
                )
                if t == "s" and v is not None and v.text:
                    idx = int(v.text)
                    cells.append(
                        shared[idx] if 0 <= idx < len(shared) else ""
                    )
                elif t == "inlineStr":
                    cells.append(
                        "".join(
                            el.text
                            for el in c.iter()
                            if _local(el.tag) == "t" and el.text
                        )
                    )
                elif v is not None and v.text:
                    cells.append(v.text)
            line = "\t".join(cells)
            if line:
                lines.append(line)
        out.append("\n".join(lines))
    return out


_CHAPTER_RE = re.compile(r".*\.(?:xhtml|html)")


def epub_chapters(data: bytes) -> list[tuple[str, str]]:
    """.epub bytes -> (part name, RAW xhtml) per chapter, in OPF SPINE
    order when a .opf package document is present (the EPUB reading
    order: <spine> idrefs resolved through the <manifest> id->href
    map, hrefs relative to the opf's directory), falling back to name
    order. Deliberately does NOT strip the HTML here: the strip is
    operators/web.py html_to_text, a JVM Column chain applied
    DOWNSTREAM — one oracle-mirrored code path shared with the crawl
    HTML pipeline, and the part bytes leave the Arrow stage only once
    either way."""
    parts = zip_entries(data)
    chapters = {
        name: raw.decode("utf-8", "replace")
        for name, raw in parts.items()
        if _CHAPTER_RE.fullmatch(name)
    }
    opf_name = next(
        (n for n in sorted(parts) if n.endswith(".opf")), None
    )
    ordered: list[str] = []
    if opf_name is not None:
        try:
            root = _parse_xml(parts[opf_name])
            hrefs: dict[str, str] = {}
            for el in root.iter():
                if _local(el.tag) == "item":
                    iid, href = el.get("id"), el.get("href")
                    if iid and href:
                        hrefs[iid] = href
            base = (
                opf_name.rsplit("/", 1)[0] + "/" if "/" in opf_name else ""
            )
            for el in root.iter():
                if _local(el.tag) == "itemref":
                    href = hrefs.get(el.get("idref") or "")
                    if href and base + href in chapters:
                        ordered.append(base + href)
        except OoxmlError:
            ordered = []
    for name in sorted(chapters):
        if name not in ordered:
            ordered.append(name)
    return [(n, chapters[n]) for n in ordered]


# ---------------------------------------------------------------------------
# Spark operators (the warc_records shape: poison-safe Arrow stage)
# ---------------------------------------------------------------------------

OFFICE_SCHEMA_DDL = (
    "office_file string, kind string, part bigint, n_parts bigint, "
    "text string, n_chars bigint, error string, error_kind string"
)

OFFICE_COLUMNS = [
    "office_file", "kind", "part", "n_parts", "text", "n_chars", "error",
    "error_kind",
]


def office_records(
    bin_df: DataFrame, file_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(file, container bytes) -> text rows: docx = one row, pptx =
    one row per slide, epub = one row of RAW xhtml per chapter (kind
    'epub-xhtml'; apply operators.web.html_to_text downstream). The
    container kind is sniffed from the entry names, not the file
    extension (crawl filenames lie). Poison safety stance of
    warc_records: malformed containers yield ONE error row each."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf[file_col], pdf[content_col]):
                try:
                    blob_b = bytes(blob)
                    if blob_b[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
                        from corrie_spark.sources.doc import doc_text

                        texts = [("doc", doc_text(blob_b))]
                    elif blob_b[:5] == b"{\\rtf":
                        from corrie_spark.sources.rtf import rtf_text

                        texts = [("rtf", rtf_text(blob_b))]
                    else:
                        parts = zip_entries(blob_b)
                        if "word/document.xml" in parts:
                            texts = [("docx", docx_text(blob_b))]
                        elif any(_SLIDE_RE.fullmatch(n) for n in parts):
                            texts = [
                                ("pptx", t) for t in pptx_slides(blob_b)
                            ]
                        elif any(_SHEET_RE.fullmatch(n) for n in parts):
                            texts = [
                                ("xlsx", t) for t in xlsx_sheets(blob_b)
                            ]
                        elif any(_CHAPTER_RE.fullmatch(n) for n in parts):
                            texts = [
                                ("epub-xhtml", x)
                                for _, x in epub_chapters(blob_b)
                            ]
                        else:
                            raise OoxmlError(
                                "unrecognized container layout"
                            )
                    for i, (kind, t) in enumerate(texts):
                        out.append(
                            {
                                "office_file": path,
                                "kind": kind,
                                "part": i,
                                "n_parts": len(texts),
                                "text": t,
                                "n_chars": len(t),
                                "error": None,
                                "error_kind": None,
                            }
                        )
                except Exception as e:  # noqa: BLE001 — poison row
                    reason = f"{type(e).__name__}: {e}"[:200]
                    out.append(
                        {
                            "office_file": path,
                            "kind": None,
                            "part": -1,
                            "n_parts": 0,
                            "text": None,
                            "n_chars": 0,
                            "error": reason,
                            "error_kind": classify_error(reason),
                        }
                    )
            yield pd.DataFrame(out, columns=OFFICE_COLUMNS)

    return bin_df.mapInPandas(run, OFFICE_SCHEMA_DDL)


def read_office(spark: SparkSession, path: str) -> DataFrame:
    """Batch reader: binaryFile scan -> per-part extraction."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return office_records(files)


OFFICE_STREAM_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_office_stream(spark: SparkSession, path: str) -> DataFrame:
    """Continuous office-document ingestion — the read_pdf_stream /
    read_warc_stream twin: the file source watches the directory, each
    new container lands as one micro-batch row through the SAME
    extraction stage as batch. File-granular exactly-once from the
    file source's checkpointed log; extraction is deterministic, so
    replays re-emit identical rows."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(OFFICE_STREAM_SCHEMA)
        .load(path)
    )
    return office_records(files.select("path", "content"))


def office_to_documents(records: DataFrame) -> DataFrame:
    """Part rows -> documents schema (the pdf_to_documents twin);
    epub rows must be html-stripped by the caller first."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.dedup import hash60

    return records.where(F.col("error").isNull()).select(
        hash60(
            F.concat_ws(":", F.col("office_file"), F.col("part")), "office-doc"
        ).alias("doc_id"),
        F.col("office_file").alias("url"),
        F.col("text"),
    )


# ---------------------------------------------------------------------------
# deterministic fixture builders (python + closed-form oracle twins)
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_CT_XML = (
    b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    b'package/2006/content-types"/>'
)


def build_docx(doc_id: int, text: str) -> bytes:
    """One w:p per fixture line (sources/pdf.py fixture_lines — the
    shared 8-words-per-line rule, so ONE closed-form CTE gates pdf,
    docx and pptx). Entry compression alternates stored/deflate by
    doc_id so both ZIP methods stay live in the gated fixture, and
    doc_id % 5 == 3 writes the forced-ZIP64 container layout —
    extraction is identical by construction, so the same oracle gates
    the EOCD64/extra read path."""
    from corrie_spark.sources.pdf import fixture_lines

    body = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(ln)}</w:t>'
        "</w:r></w:p>"
        for ln in fixture_lines(text)
    )
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W_NS}">'
        f"<w:body>{body}</w:body></w:document>"
    ).encode("utf-8")
    defl = doc_id % 2 == 0
    return zip_build(
        [
            ("[Content_Types].xml", _CT_XML, not defl),
            ("word/document.xml", doc, defl),
        ],
        force_zip64=doc_id % 5 == 3,
    )


def build_pptx(doc_id: int, text: str) -> bytes:
    """One slide per fixture page (3 lines, sources/pdf.py
    fixture_pages), one a:p per line."""
    from corrie_spark.sources.pdf import fixture_pages

    entries: list[tuple[str, bytes, bool]] = [
        ("[Content_Types].xml", _CT_XML, True)
    ]
    for i, lines in enumerate(fixture_pages(text), start=1):
        paras = "".join(
            f"<a:p><a:r><a:t>{_xml_escape(ln)}</a:t></a:r></a:p>"
            for ln in lines
        )
        sld = (
            f'<?xml version="1.0"?><p:sld xmlns:p="x" xmlns:a="{_A_NS}">'
            f"<p:cSld><p:spTree><p:sp><p:txBody>{paras}</p:txBody>"
            "</p:sp></p:spTree></p:cSld></p:sld>"
        ).encode("utf-8")
        entries.append(
            (f"ppt/slides/slide{i}.xml", sld, (doc_id + i) % 2 == 0)
        )
    return zip_build(entries)


def build_xlsx(doc_id: int, text: str) -> bytes:
    """One sheet; one row per fixture line; one CELL per word, every
    cell a sharedStrings INDEX (repeated words share one si entry, so
    the index indirection is genuinely exercised). Extracted text is
    the line with spaces as tabs."""
    from corrie_spark.sources.pdf import fixture_lines

    lines = [ln.split(" ") for ln in fixture_lines(text)]
    vocab: dict[str, int] = {}
    for ws in lines:
        for w in ws:
            vocab.setdefault(w, len(vocab))
    sst = (
        '<?xml version="1.0"?><sst xmlns="x">'
        + "".join(
            f'<si><t xml:space="preserve">{_xml_escape(w)}</t></si>'
            for w in vocab
        )
        + "</sst>"
    ).encode("utf-8")
    rows = "".join(
        "<row r=\"%d\">%s</row>"
        % (
            r + 1,
            "".join(
                f'<c r="x" t="s"><v>{vocab[w]}</v></c>' for w in ws
            ),
        )
        for r, ws in enumerate(lines)
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="x">'
        f"<sheetData>{rows}</sheetData></worksheet>"
    ).encode("utf-8")
    defl = doc_id % 2 == 1
    return zip_build(
        [
            ("[Content_Types].xml", _CT_XML, True),
            ("xl/sharedStrings.xml", sst, defl),
            ("xl/worksheets/sheet1.xml", sheet, not defl),
        ]
    )


def build_epub(doc_id: int, text: str) -> bytes:
    """One OEBPS chapter carrying the SAME fixture HTML page the crawl
    pipeline uses (operators/web.py fixture_page), so the downstream
    strip is gated by the existing html_to_text oracle twin."""
    from corrie_spark.operators.web import fixture_page

    page = fixture_page(doc_id, text).encode("utf-8")
    return zip_build(
        [
            ("mimetype", b"application/epub+zip", False),  # OCF: stored
            ("OEBPS/chapter1.xhtml", page, True),
        ]
    )
