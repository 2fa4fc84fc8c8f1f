"""PDF reader units (object grammar, streams, text operators) and the
Spark extraction path (poison safety, documents composition)."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from corrie_spark.sources import pdf as P


# --- object grammar ---------------------------------------------------------


def test_parse_scalars_and_containers():
    obj, _ = P.parse_object(b" << /A 1 /B [2 3.5 (x) /N#41me true null] >>", 0)
    assert obj["A"] == 1
    assert obj["B"][:2] == [2, 3.5]
    assert obj["B"][2] == b"x"
    assert obj["B"][3] == "NAme"  # #41 = 'A'
    assert obj["B"][4] is True and obj["B"][5] is None


def test_parse_reference_lookahead():
    obj, _ = P.parse_object(b"<< /P 12 0 R /N 7 >>", 0)
    assert isinstance(obj["P"], P.Ref) and obj["P"].num == 12
    assert obj["N"] == 7


def test_literal_string_escapes_and_nesting():
    s, _ = P.parse_object(rb"(a\(b\)c (nested) \\ \101 \n)", 0)
    assert s == b"a(b)c (nested) \\ A \n"


def test_hex_string_odd_digit_pads_zero():
    s, _ = P.parse_object(b"<48 6\n5 6C6C6F2>", 0)
    assert s == b"Hello " or s == b"Hello\x20"  # trailing '2' -> 0x20


def test_stream_bytes_kept_verbatim():
    """Compressed data ending in EOL bytes must survive: /Length is
    the extent, not whitespace stripping (the Error -5 regression)."""
    payload = bytes(range(250, 256)) + b"\n\r\n"  # ends in EOLs
    comp = zlib.compress(payload)
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == payload


def test_incremental_update_last_definition_wins():
    v1 = b"1 0 obj\n(old)\nendobj\n"
    v2 = b"1 0 obj\n(new)\nendobj\n"
    objects, _ = P.parse_document(v1 + v2)
    assert objects[1] == b"new"


def test_obj_pattern_inside_stream_ignored():
    inner = b"garbage 2 0 obj << /X 1 >> endobj garbage"
    doc = (
        b"1 0 obj\n<< /Length %d >>\nstream\n" % len(inner)
        + inner
        + b"\nendstream\nendobj\n3 0 obj\n42\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert 2 not in objects and objects[3] == 42


# --- text operators -----------------------------------------------------------


def test_extract_text_layout_rule():
    content = (
        b"BT /F1 12 Tf 72 720 Td (first line) Tj "
        b"0 -14 Td (second) Tj ( line) Tj "
        b"T* (third) Tj ET "
        b"BT 1 0 0 1 72 500 Tm [(kern) -300 (gap) -10 (x)] TJ ET"
    )
    assert P.extract_text(content) == "first line\nsecond line\nthird\nkern gapx"


def test_extract_text_quote_operators():
    content = b"BT (a) Tj (b) ' 2 3 (c) \" ET"
    assert P.extract_text(content) == "a\nb\nc"


def test_extract_utf16_bom_string():
    s = "café".encode("utf-16-be")
    content = b"BT (" + b"\xfe\xff" + s + b") Tj ET"
    assert P.extract_text(content) == "café"


# --- whole documents ----------------------------------------------------------


def test_build_extract_roundtrip_all_encodings():
    text = "alpha beta gamma delta epsilon zeta eta theta " * 6
    for did in range(3):  # rotates literal/hex/TJ line encodings
        pages = P.pdf_text(P.build_pdf(did, text))
        assert pages == ["\n".join(pl) for pl in P.fixture_pages(text)]


def test_indirect_length_resolved():
    blob = P.build_pdf(0, "one two three four five six seven eight nine")
    # page 0's /Length is an indirect reference by fixture construction
    objects, trailer = P.parse_document(blob)
    stream_objs = [o for o in objects.values() if isinstance(o, P.Stream)]
    assert any(isinstance(s.d.get("Length"), P.Ref) for s in stream_objs)
    assert P.pdf_text(blob)  # and it still decodes


def test_poison_pdfs_degrade_to_error_rows(spark):
    good = P.build_pdf(1, "hello world this is a fine document")
    rows = [
        ("good.pdf", good),
        ("truncated.pdf", good[: len(good) // 3]),
        ("garbage.pdf", b"this is not a pdf"),
        ("empty.pdf", b""),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    recs = P.pdf_records(df).collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r.pdf_file, []).append(r)
    assert all(r.error is None for r in by_file["good.pdf"])
    for poison in ("garbage.pdf", "empty.pdf"):
        (row,) = by_file[poison]
        assert row.error is not None and row.text is None
    # truncated: either parses a prefix or degrades — never missing
    assert "truncated.pdf" in by_file


def test_pdf_to_documents_schema(spark):
    df = spark.createDataFrame(
        [
            ("a.pdf", P.build_pdf(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9")),
            ("bad.pdf", b"nope"),
        ],
        "path string, content binary",
    )
    docs = P.pdf_to_documents(P.pdf_records(df))
    assert docs.columns == ["doc_id", "url", "text"]
    got = docs.collect()
    # 9 words -> two 8/1-word lines -> one page -> one doc row; the
    # poison file contributes only a DLQ row, never a document
    assert len(got) == 1
    assert got[0].url == "a.pdf"
    assert got[0].text == "w1 w2 w3 w4 w5 w6 w7 w8\nw9"


def test_read_pdf_from_files(spark, tmp_path):
    import os

    for i in range(4):
        with open(os.path.join(str(tmp_path), f"doc-{i}.pdf"), "wb") as f:
            f.write(P.build_pdf(i, f"document {i} " + "word " * 20))
    recs = P.read_pdf(spark, os.path.join(str(tmp_path), "*.pdf"))
    ok = recs.where(F.col("error").isNull())
    assert ok.count() >= 4
    assert ok.select("pdf_file").distinct().count() == 4


def test_objstm_document_extracts_identically():
    """Modern-writer shape: all non-stream objects in one compressed
    ObjStm, no classic trailer — expansion + catalog-by-type must
    reproduce the classic file's extraction byte-for-byte."""
    text = "omega psi chi phi upsilon tau sigma rho " * 5
    for did in range(3):
        classic = P.pdf_text(P.build_pdf(did, text))
        modern = P.pdf_text(P.build_pdf_objstm(did, text))
        assert modern == classic and modern


def test_objstm_top_level_definition_wins():
    """xref precedence twin: an uncompressed redefinition appended by
    an incremental update overrides the ObjStm's copy."""
    blob = P.build_pdf_objstm(0, "one two three four five six seven eight")
    # append a top-level redefinition of the catalog pointing nowhere
    update = b"1 0 obj\n<< /Type /Catalog /Pages 99 0 R >>\nendobj\n"
    objects, trailer = P.parse_document(blob + update)
    root = objects[trailer["Root"].num]
    assert root["Pages"].num == 99


def test_malformed_objstm_contributes_nothing():
    blob = P.build_pdf_objstm(0, "a b c d e f g h i")
    # corrupt the ObjStm payload; top-level content streams survive,
    # but the page tree is gone -> pdf_text degrades to PdfError (the
    # row boundary catches it), never an unhandled exception type
    bad = blob.replace(b"/Type /ObjStm", b"/Type /ObjStZ", 1)
    import pytest

    with pytest.raises(P.PdfError):
        P.pdf_text(bad)


def test_ascii85_filter():
    import base64

    payload = b"Hello ASCII85 world, with binary \x00\xff bytes"
    enc = base64.a85encode(payload) + b"~>"
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /ASCII85Decode >>\nstream\n" % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == payload


def _lzw_encode_msb(data: bytes, early: int = 1) -> bytes:
    """Reference MSB-first LZW encoder (test-local): Clear, codes,
    EOD, with the EarlyChange width bump mirrored from the decoder."""
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((256, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # encoder widens one entry LATER than the decoder: when the
        # entry just added has index (1<<width) - early (511 at 9 bits,
        # early=1), the decoder — whose table lags by one — has just
        # reached its own 511 threshold, so the next code is read wide
        if next_code == (1 << width) - early + 1 and width < 12:
            width += 1
        elif width == 12 and next_code == (1 << 12) - early:
            # table full at 12 bits: reinitialize with a Clear, as any
            # real encoder must (codes >= 4096 are unrepresentable)
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))
    buf = 0
    nbits = 0
    enc = bytearray()
    for code, cw in out_bits:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            enc.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        enc.append((buf << (8 - nbits)) & 0xFF)
    return bytes(enc)


def test_lzw_filter_roundtrip():
    payload = (b"the quick brown fox " * 40) + bytes(range(256))
    enc = _lzw_encode_msb(payload)
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == payload


def _lzw_decode_tablestyle(data: bytes) -> bytes:
    """Independent convention witness, structured like pdfminer's
    LZWDecoder (append-list table, widths bumped when len(table) hits
    511/1023/2047 — the EarlyChange=1 standard). Deliberately NOT a
    mirror of the production decoder: agreement between the two pins
    the width-bump convention itself, not just encoder/decoder
    symmetry."""
    table = [bytes((c,)) for c in range(256)] + [None, None]
    prevbuf = b""
    nbits = 9
    out = bytearray()
    buf = 0
    have = 0
    for byte in data:
        buf = (buf << 8) | byte
        have += 8
        while have >= nbits:
            code = (buf >> (have - nbits)) & ((1 << nbits) - 1)
            have -= nbits
            if code == 256:
                table = [bytes((c,)) for c in range(256)] + [None, None]
                prevbuf = b""
                nbits = 9
                continue
            if code == 257:
                return bytes(out)
            if not prevbuf:
                x = prevbuf = table[code]
            else:
                if code < len(table):
                    x = table[code]
                    table.append(prevbuf + x[:1])
                else:
                    table.append(prevbuf + prevbuf[:1])
                    x = table[code]
                n = len(table)
                if n == 511:
                    nbits = 10
                elif n == 1023:
                    nbits = 11
                elif n == 2047:
                    nbits = 12
                prevbuf = x
            out += x
    return bytes(out)


def test_lzw_width_bump_convention():
    """The real-world failure mode the round-10 advice flagged: streams
    longer than ~253 codes desync if the width bump is off by one.
    Cross two bumps (9->10->11 bits) and require the production decoder
    to agree with the independently-written table-style decoder."""
    import random

    rng = random.Random(7)
    # low-entropy but non-repeating text: ~2.5k distinct phrases emitted
    # as ~4k codes, comfortably past the 511 and 1023 thresholds
    payload = b" ".join(
        b"tok%03d" % rng.randrange(600) for _ in range(4000)
    )
    enc = _lzw_encode_msb(payload)
    assert _lzw_decode_tablestyle(enc) == payload
    assert P._lzw_decode(enc) == payload


def test_lzw_early_change_zero():
    payload = b" ".join(b"w%03d" % (i % 400) for i in range(3000))
    enc = _lzw_encode_msb(payload, early=0)
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /LZWDecode "
        b"/DecodeParms << /EarlyChange 0 >> >>\nstream\n" % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == payload


def _png_filter_rows(plain: bytes, columns: int, ftype: int) -> bytes:
    """Forward-apply one PNG filter type to every row (bpp=1)."""
    out = bytearray()
    prior = bytes(columns)
    for r in range(0, len(plain), columns):
        row = plain[r : r + columns]
        out.append(ftype)
        for i, x in enumerate(row):
            a = row[i - 1] if i else 0
            b = prior[i]
            c = prior[i - 1] if i else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
        prior = row
    return bytes(out)


def test_flate_png_predictor():
    import zlib

    columns = 16
    plain = bytes((i * 7 + (i // columns) * 3) & 0xFF for i in range(columns * 12))
    for ftype in (0, 1, 2, 3, 4):
        enc = zlib.compress(_png_filter_rows(plain, columns, ftype))
        doc = (
            b"1 0 obj\n<< /Length %d /Filter /FlateDecode "
            b"/DecodeParms << /Predictor 12 /Columns 16 >> >>\nstream\n"
            % len(enc)
            + enc
            + b"\nendstream\nendobj\n"
        )
        objects, _ = P.parse_document(doc)
        assert P.decode_stream(objects, objects[1]) == plain, ftype


def test_flate_tiff_predictor():
    import zlib

    columns = 8
    plain = bytes((i * 13) & 0xFF for i in range(columns * 6))
    diff = bytearray(plain)
    for r in range(0, len(diff), columns):
        for i in range(r + columns - 1, r, -1):
            diff[i] = (diff[i] - diff[i - 1]) & 0xFF
    enc = zlib.compress(bytes(diff))
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 2 /Columns 8 >> >>\nstream\n" % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == plain


def test_decodeparms_array_shape():
    """Array-shaped /Filter with a parallel /DecodeParms array: null for
    the A85 stage, a predictor dict for the Flate stage."""
    import base64
    import zlib

    columns = 4
    plain = bytes(range(64))
    enc = base64.a85encode(
        zlib.compress(_png_filter_rows(plain, columns, 2))
    ) + b"~>"
    doc = (
        b"1 0 obj\n<< /Length %d /Filter [/ASCII85Decode /FlateDecode] "
        b"/DecodeParms [null << /Predictor 10 /Columns 4 >>] >>\nstream\n"
        % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == plain


def test_lzw_kwkwk_case():
    # 'ababab...' forces the code==next_code branch immediately
    payload = b"ababababababababab"
    enc = _lzw_encode_msb(payload)
    doc = (
        b"1 0 obj\n<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(enc)
        + enc
        + b"\nendstream\nendobj\n"
    )
    objects, _ = P.parse_document(doc)
    assert P.decode_stream(objects, objects[1]) == payload


def test_pdf_stream_ingestion(spark, tmp_path):
    """Streaming twin: new .pdf files land as micro-batch rows through
    the SAME extraction stage as batch."""
    import os

    src = tmp_path / "in"
    os.makedirs(src)
    for i in range(3):
        with open(src / f"d{i}.pdf", "wb") as f:
            f.write(P.build_pdf(i, f"streamed doc {i} " + "w " * 20))
    q = (
        P.read_pdf_stream(spark, str(src))
        .where(F.col("error").isNull())
        .writeStream.format("memory")
        .queryName("pdf_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from pdf_stream_t").collect()
    assert len({r.pdf_file for r in rows}) == 3
    assert all(r.text for r in rows)


# --- font encodings (/Encoding, /Differences, /ToUnicode) --------------------


def _font_doc(font_body: bytes, content: bytes, extra_objs: bytes = b"") -> bytes:
    """Minimal single-page doc with font /F9 and raw content."""
    return (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj\n"
        b"3 0 obj " + font_body + b" endobj\n"
        b"4 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F9 3 0 R >> >> /Contents 5 0 R >> endobj\n"
        b"5 0 obj << /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream endobj\n"
        + extra_objs
        + b"trailer << /Root 1 0 R >>\n"
    )


def test_winansi_encoding_decodes_quotes():
    # cp1252 0x93/0x94 are curly quotes; latin-1 would give C1 controls
    content = b"BT /F9 10 Tf (\x93quoted\x94 \x97 dash) Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
        b"/Encoding /WinAnsiEncoding >>",
        content,
    )
    assert P.pdf_text(doc) == ["“quoted” — dash"]


def test_differences_remap_and_uni_names():
    # remap 0x41 ('A') -> eacute, 0x42 -> uni2603 (snowman), 0x43 -> u1F600
    content = b"BT /F9 10 Tf (ABC plain) Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /eacute 66 /uni2603 67 /u1F600] >> >>",
        content,
    )
    assert P.pdf_text(doc) == ["é☃\U0001f600 plain"]


def test_differences_unknown_glyph_is_detectable():
    content = b"BT /F9 10 Tf (AB) Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
        b"/Encoding << /Differences [65 /g123] >> >>",
        content,
    )
    # unknown subset glyph -> U+FFFD (never a silently wrong base char);
    # undiffed 'B' decodes via the Standard base table
    assert P.pdf_text(doc) == ["�B"]


def test_standard_encoding_quote_remaps():
    content = b"BT /F9 10 Tf (it\x27s \x60quoted) Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
        b"/Encoding /StandardEncoding >>",
        content,
    )
    assert P.pdf_text(doc) == ["it’s ‘quoted"]


def _tounicode_stream(pairs: dict[int, str], ranges=()) -> bytes:
    bf = b"".join(
        b"<%04X> <%s>\n" % (c, s.encode("utf-16-be").hex().encode())
        for c, s in pairs.items()
    )
    rg = b"".join(
        b"<%04X> <%04X> <%s>\n"
        % (lo, hi, dst.encode("utf-16-be").hex().encode())
        for lo, hi, dst in ranges
    )
    body = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        + (b"%d beginbfchar\n" % len(pairs)) + bf + b"endbfchar\n"
        + (b"%d beginbfrange\n" % max(len(ranges), 0)) + rg + b"endbfrange\n"
        b"end\n"
    )
    return body


def test_type0_tounicode_bfchar_and_bfrange():
    # CIDs: 1 -> "H", 2 -> "i", range 0x10..0x12 -> "a","b","c"
    tun = _tounicode_stream({1: "H", 2: "i"}, ranges=[(0x10, 0x12, "a")])
    content = b"BT /F9 10 Tf <00010002> Tj 0 -14 Td <001000110012> Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+F "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        content,
        extra_objs=(
            b"6 0 obj << /Length %d >>\nstream\n" % len(tun)
            + tun
            + b"\nendstream endobj\n"
        ),
    )
    assert P.pdf_text(doc) == ["Hi\nabc"]


def test_type0_without_tounicode_flags_not_mojibake():
    content = b"BT /F9 10 Tf <00410042> Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+F "
        b"/Encoding /Identity-H >>",
        content,
    )
    # glyph ids without a ToUnicode are unknowable: detectable U+FFFD,
    # not latin-1 pair soup
    assert P.pdf_text(doc) == ["��"]


def test_tounicode_multichar_ligature_target():
    tun = _tounicode_stream({5: "ffi"})
    content = b"BT /F9 10 Tf <0005> Tj ET"
    doc = _font_doc(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+F "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        content,
        extra_objs=(
            b"6 0 obj << /Length %d >>\nstream\n" % len(tun)
            + tun
            + b"\nendstream endobj\n"
        ),
    )
    assert P.pdf_text(doc) == ["ffi"]


def test_font_state_saved_restored_by_q_Q():
    tun = _tounicode_stream({1: "X"})
    content = (
        b"BT /F9 10 Tf <0001> Tj ET "
        b"q BT /F8 10 Tf (plain) Tj ET Q "
        b"BT <0001> Tj ET"
    )
    doc = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Font /Subtype /Type0 /BaseFont /S "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n"
        b"7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
        b"4 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F9 3 0 R /F8 7 0 R >> >> /Contents 5 0 R >> endobj\n"
        b"5 0 obj << /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream endobj\n"
        b"6 0 obj << /Length %d >>\nstream\n" % len(tun)
        + tun
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n"
    )
    # after Q the Type0 font is current again (font is graphics state)
    assert P.pdf_text(doc) == ["X\nplain\nX"]


def test_resources_inherited_from_pages_node():
    content = b"BT /F9 10 Tf (\x93q\x94) Tj ET"
    doc = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 "
        b"/Resources << /Font << /F9 3 0 R >> >> >> endobj\n"
        b"3 0 obj << /Type /Font /Subtype /TrueType /BaseFont /A "
        b"/Encoding /WinAnsiEncoding >> endobj\n"
        b"4 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n"
        b"5 0 obj << /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n"
    )
    assert P.pdf_text(doc) == ["“q”"]


def test_build_pdf_fonts_roundtrip():
    text = "The quick brown Fox jumps over the lazy dog again and again"
    l1 = P.fixture_lines(text)[0]
    w1 = l1.split(" ", 1)[0]
    expect = [
        l1 + "\n"
        + l1.translate(str.maketrans(P._LOWER, P._LOWER.upper()))
        + "\n“" + w1 + "”"
    ]
    assert P.pdf_text(P.build_pdf_fonts(3, text)) == expect
    assert P.pdf_text(P.build_pdf_fonts(3, "")) == [""]


def test_nested_form_xobjects_and_cycle_guard():
    inner = b"BT (deep) Tj ET"
    outer = b"(before) Tj /X2 Do"  # Do outside BT is the common shape
    # X3 invokes itself: the depth bound must degrade it to '', not
    # recurse forever
    cyc = b"/X3 Do"
    doc = (
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj\n"
        b"4 0 obj << /Type /Page /Parent 2 0 R "
        b"/Resources << /XObject << /X1 5 0 R /X3 7 0 R >> >> "
        b"/Contents 8 0 R >> endobj\n"
        b"5 0 obj << /Type /XObject /Subtype /Form "
        b"/Resources << /XObject << /X2 6 0 R >> >> /Length %d >>\n"
        b"stream\n" % len(outer) + outer + b"\nendstream endobj\n"
        b"6 0 obj << /Type /XObject /Subtype /Form /Length %d >>\n"
        b"stream\n" % len(inner) + inner + b"\nendstream endobj\n"
        b"7 0 obj << /Type /XObject /Subtype /Form "
        b"/Resources << /XObject << /X3 7 0 R >> >> /Length %d >>\n"
        b"stream\n" % len(cyc) + cyc + b"\nendstream endobj\n"
        b"8 0 obj << /Length %d >>\nstream\n"
        % len(b"BT (page) Tj ET /X1 Do /X3 Do")
        + b"BT (page) Tj ET /X1 Do /X3 Do"
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n"
    )
    # page line, then X1's text: 'before' is outside BT (not shown),
    # X2's 'deep' IS shown; the cyclic X3 contributes nothing
    assert P.pdf_text(doc) == ["page\ndeep"]


def test_encrypted_pdf_degrades_to_error():
    import pytest

    blob = P.build_pdf(0, "secret words one two three four five six")
    bad = blob.replace(
        b"trailer\n<< /Size",
        b"9 0 obj\n<< /Filter /Standard /V 2 >>\nendobj\n"
        b"trailer\n<< /Encrypt 9 0 R /Size",
        1,
    )
    with pytest.raises(P.PdfError, match="encrypted"):
        P.pdf_text(bad)


def test_inline_image_data_is_skipped_as_a_block():
    # BI..EI sample data containing fake 'BT (evil) Tj ET' bytes must
    # not leak into extraction; real text resumes after EI
    fake = b"BT (evil) Tj ET \xff\x00"
    content = (
        b"BT (before) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /G ID " + fake + b" EI "
        b"BT (after) Tj ET"
    )
    assert P.extract_text(content) == "before\nafter"


def test_pdf_links_extraction():
    blob = P.build_pdf_fonts(9, "alpha beta gamma delta")
    (uris,) = P.pdf_links(blob)
    assert uris == [
        "https://example.org/doc/9/next",
        "https://ref.example.net/cite/9",
    ]
    # a doc with no annotations yields an empty list per page
    assert P.pdf_links(P.build_pdf(1, "w1 w2 w3")) == [[]]

# --- standard security handler (ISO 32000-1 §7.6.3) --------------------------

def test_pdf_crypt_primitives():
    from corrie_spark.sources import pdf_crypt as C

    # FIPS-197 Appendix C.1 vector
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    words, nr = C._expand_key(key)
    ct = C._cipher_block(pt, words, nr)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert C._decipher_block(ct, words, nr) == pt
    # FIPS-197 Appendix C.3 (AES-256) vector
    w256, nr256 = C._expand_key(bytes(range(32)))
    assert nr256 == 14
    ct256 = C._cipher_block(pt, w256, nr256)
    assert ct256.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert C._decipher_block(ct256, w256, nr256) == pt
    # CBC + PKCS#5 roundtrip at padding boundaries
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 7) % 256 for i in range(n))
        assert C.aes128_cbc_decrypt(key, C.aes128_cbc_encrypt(key, iv, data)) == data
    # public RC4 test vectors
    assert C.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert C.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # corrupt AES framing raises, never returns garbage
    import pytest

    with pytest.raises(C.PdfCryptError):
        C.aes128_cbc_decrypt(key, b"short")
    with pytest.raises(C.PdfCryptError):
        C.aes128_cbc_decrypt(key, bytes(48).replace(b"\x00", b"\x07"))


def test_encrypted_pdf_extracts_hash_equal():
    """Owner-password-only fixtures (empty user password) extract
    text byte-identical to their unencrypted twins — RC4-40, RC4-128
    and AES-128 crypt-filter paths."""
    text = " ".join(f"tok{i}" for i in range(150))
    plain = P.pdf_text(P.build_pdf(12, text))
    assert len(plain) > 1  # multi-page, so multiple streams decrypt
    for scheme in ("rc4-40", "rc4-128", "aes-128"):
        assert P.pdf_text(P.build_pdf(12, text, encrypt=scheme)) == plain, scheme


def test_encrypted_pdf_wrong_password_and_unsupported_dlq():
    import hashlib

    import pytest

    from corrie_spark.sources import pdf_crypt as C

    text = "alpha beta gamma delta"
    enc = P.build_pdf(5, text, encrypt="rc4-128")
    id0 = hashlib.md5(b"pdf-id:5").digest()
    u_hex = C.build_standard_encrypt("rc4-128", id0)[0]["U"].hex().encode()
    # a real (non-empty) user password presents as a /U that the
    # empty-password recompute cannot match
    bad_u = enc.replace(b"/U <" + u_hex, b"/U <" + b"00" * 32)
    with pytest.raises(P.PdfError, match="password required"):
        P.pdf_text(bad_u)
    # AES-256 (V5/R6) stays a distinct encrypted-DLQ reason
    with pytest.raises(P.PdfError, match="encrypted document"):
        P.pdf_text(enc.replace(b"/V 2 /R 3", b"/V 5 /R 6"))
    # non-Standard security filters too
    with pytest.raises(P.PdfError, match="encrypted document"):
        P.pdf_text(enc.replace(b"/Filter /Standard", b"/Filter /AcmeDRM"))


def test_aes256_crossvalidated_against_cryptography():
    """The pure-python AES core checked against an INDEPENDENT
    implementation (the `cryptography` package, when present) for
    both key sizes, CBC and ECB, across padding shapes."""
    pytest = __import__("pytest")
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
    except ImportError:
        pytest.skip("cryptography not available")
    from corrie_spark.sources import pdf_crypt as C

    iv = bytes(range(16))
    for klen in (16, 32):
        key = bytes((i * 13 + klen) % 256 for i in range(klen))
        data = bytes((i * 7) % 256 for i in range(25 * 16))
        ref = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
        expect = ref.update(data) + ref.finalize()
        # the _py_ variants are the from-spec core (the dispatchers
        # route through cryptography when present — comparing those
        # would be circular)
        assert C._py_cbc_encrypt_raw(key, iv, data) == expect, klen
        assert C._py_cbc_decrypt_raw(key, iv, expect) == data, klen
        ref = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
        expect = ref.update(data) + ref.finalize()
        assert C._py_ecb_encrypt(key, data) == expect, klen
        assert C._py_ecb_decrypt(key, expect) == data, klen


def test_pdf_aes256_v5_handler():
    """AES-256 (R5/R6): fixture round-trip equals the plain twin,
    the recovered file key matches the writer's, a real user
    password fails empty-password auth, and a tampered /Perms is a
    hard PdfCryptError (the ECB cross-check)."""
    import hashlib

    import pytest

    from corrie_spark.sources import pdf_crypt as C

    text = " ".join(f"tok{i}" for i in range(150))
    plain = P.pdf_text(P.build_pdf(12, text))
    for scheme in ("aes-256", "aes-256-r5"):
        assert P.pdf_text(P.build_pdf(12, text, encrypt=scheme)) == plain, scheme

    id0 = hashlib.md5(b"v5test").digest()
    enc, h = C.build_standard_encrypt("aes-256", id0)
    # hash_2b: R5 is one SHA-256; R6 iterates and must differ
    salt = enc["U"][32:40]
    import hashlib as H

    assert C.hash_2b(b"", salt, b"", 5) == H.sha256(salt).digest()
    assert C.hash_2b(b"", salt, b"", 6) != C.hash_2b(b"", salt, b"", 5)
    # locked: the empty password must not authenticate
    enc_l, _ = C.build_standard_encrypt("aes-256", id0, user_pw=b"secret")
    assert not C.StdSecurityHandler(enc_l, id0).authenticate()
    # owner-side derivation recovers the same file key
    ikey = C.hash_2b(b"owner-secret", enc["O"][40:48], enc["U"], 6)
    assert C._cbc_decrypt_raw(ikey, b"\x00" * 16, enc["OE"]) == h.key
    # tampered Perms -> hard error at authenticate
    bad = dict(enc)
    bad["Perms"] = bytes(16)
    with pytest.raises(C.PdfCryptError, match="Perms"):
        C.StdSecurityHandler(bad, id0).authenticate()
    # ISO 32000-2 Algorithm 13: a tampered P with an INTACT "adb"
    # marker must also fail (the decrypted Perms echoes P bytes 0-3
    # and the EncryptMetadata flag at byte 8)
    bad_p = dict(enc)
    bad_p["P"] = -44
    with pytest.raises(C.PdfCryptError, match="Perms P"):
        C.StdSecurityHandler(bad_p, id0).authenticate()
    bad_m = dict(enc)
    bad_m["EncryptMetadata"] = False
    with pytest.raises(C.PdfCryptError, match="EncryptMetadata"):
        C.StdSecurityHandler(bad_m, id0).authenticate()


def test_fixture_routing_covers_all_schemes():
    """doc_id % 10 in {2,4,6,8} builds encrypted twins whose extraction
    equals the plain build — the routing q_pdf_ingest's oracle rides."""
    for doc_id, scheme in P.PDF_ENCRYPT_ROUTE.items():
        text = f"scheme {scheme} body " * 20
        blob = P._build_fixture_pdf(doc_id, text)
        assert b"/Encrypt" in blob, scheme
        assert P.pdf_text(blob) == P.pdf_text(P.build_pdf(doc_id, text)), scheme
