"""ZIP/OOXML/EPUB container reader units and the Spark extraction
path (poison safety, documents composition)."""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import functions as F

from corrie_spark.sources import ooxml as O


# --- ZIP layer ----------------------------------------------------------------


def test_zip_roundtrip_stored_and_deflate():
    entries = [
        ("a.txt", b"stored bytes", False),
        ("dir/b.bin", bytes(range(256)) * 40, True),
        ("empty", b"", True),
    ]
    blob = O.zip_build(entries)
    got = O.zip_entries(blob)
    assert got == {n: d for n, d, _ in entries}


def test_zip_writer_reads_under_stdlib_zipfile():
    """Independent-reader witness: stdlib zipfile (not our code)
    validates the writer's structures and CRCs."""
    blob = O.zip_build([("x/y.txt", b"hello world", True)])
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert zf.read("x/y.txt") == b"hello world"


def test_zip_reader_reads_stdlib_written_archive():
    """Independent-writer witness."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", "alpha")
        z.writestr("b/c.txt", "beta")
    got = O.zip_entries(buf.getvalue())
    assert got == {"a.txt": b"alpha", "b/c.txt": b"beta"}


def test_zip_corruption_raises_ooxml_error():
    import pytest

    blob = O.zip_build([("a.txt", b"payload bytes here", True)])
    with pytest.raises(O.OoxmlError):
        O.zip_entries(b"not a zip at all")
    with pytest.raises(O.OoxmlError):
        O.zip_entries(blob[: len(blob) // 2])  # EOCD gone
    bad = bytearray(blob)
    bad[37] ^= 0xFF  # flip a compressed-data byte (after 30-byte local
    # header + 5-byte name) -> deflate error or CRC mismatch
    with pytest.raises(O.OoxmlError):
        O.zip_entries(bytes(bad))


# --- OOXML parts ----------------------------------------------------------------


def test_docx_tabs_breaks_and_tables():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://x/main"><w:body>'
        "<w:p><w:r><w:t>col1</w:t></w:r><w:r><w:tab/></w:r>"
        "<w:r><w:t>col2</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t></w:r></w:p>"
        "<w:p/>"  # empty paragraph dropped
        "</w:body></w:document>"
    ).encode()
    blob = O.zip_build([("word/document.xml", doc, True)])
    assert O.docx_text(blob) == "col1\tcol2\ncell\na\nb"


def test_pptx_slide_numeric_order():
    def slide(txt):
        return (
            '<p:sld xmlns:p="x" xmlns:a="y"><p:txBody>'
            f"<a:p><a:r><a:t>{txt}</a:t></a:r></a:p></p:txBody></p:sld>"
        ).encode()

    blob = O.zip_build(
        [
            ("ppt/slides/slide10.xml", slide("ten"), True),
            ("ppt/slides/slide2.xml", slide("two"), True),
            ("ppt/slides/slide1.xml", slide("one"), True),
        ]
    )
    assert O.pptx_slides(blob) == ["one", "two", "ten"]


def test_xml_escape_roundtrip_through_docx():
    text = "ampersand & angle <brackets> survive " + "x " * 12
    blob = O.build_docx(1, text)
    from corrie_spark.sources.pdf import fixture_lines

    assert O.docx_text(blob) == "\n".join(fixture_lines(text))


# --- Spark path ----------------------------------------------------------------


def test_office_records_kinds_and_poison(spark):
    rows = [
        ("d.docx", O.build_docx(0, "w1 w2 w3 w4 w5 w6 w7 w8 w9")),
        ("p.pptx", O.build_pptx(1, "s1 s2 s3 s4 s5 s6 s7 s8 " * 4)),
        ("e.epub", O.build_epub(2, "chapter body words")),
        ("junk.docx", b"PK\x03\x04 truncated junk"),
        ("weird.zip", O.zip_build([("readme.txt", b"no office parts", True)])),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    recs = O.office_records(df).collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r.office_file, []).append(r)
    assert by_file["d.docx"][0].kind == "docx"
    assert by_file["d.docx"][0].n_parts == 1
    # 32 tokens -> 4 lines -> 2 slides
    pptx = sorted(by_file["p.pptx"], key=lambda r: r.part)
    assert [r.kind for r in pptx] == ["pptx", "pptx"]
    assert pptx[0].n_parts == 2
    assert by_file["e.epub"][0].kind == "epub-xhtml"
    assert "<html>" in by_file["e.epub"][0].text
    for poison in ("junk.docx", "weird.zip"):
        (row,) = by_file[poison]
        assert row.error is not None and row.text is None


def test_office_to_documents(spark):
    df = spark.createDataFrame(
        [
            ("a.docx", O.build_docx(0, "w1 w2 w3 w4")),
            ("bad.docx", b"nope"),
        ],
        "path string, content binary",
    )
    docs = O.office_to_documents(O.office_records(df))
    assert docs.columns == ["doc_id", "url", "text"]
    got = docs.collect()
    assert len(got) == 1 and got[0].url == "a.docx"
    assert got[0].text == "w1 w2 w3 w4"


def test_epub_html_strip_matches_crawl_chain(spark):
    """EPUB chapters stripped by the SAME html_to_text the crawl
    pipeline uses — composition equality pinned on a real frame."""
    from corrie_spark.operators import web as Wb
    from corrie_spark.operators.web import fixture_page

    text = "epub body words " * 3
    df = spark.createDataFrame(
        [("e.epub", O.build_epub(7, text))], "path string, content binary"
    )
    recs = O.office_records(df).where(F.col("kind") == "epub-xhtml")
    got = recs.select(
        Wb.html_to_text(F.col("text")).alias("x")
    ).collect()[0].x
    ref = (
        spark.createDataFrame([(fixture_page(7, text),)], "h string")
        .select(Wb.html_to_text(F.col("h")).alias("x"))
        .collect()[0]
        .x
    )
    assert got == ref and "epub body words" in got


def test_xlsx_shared_and_inline_strings():
    sst = (
        '<sst xmlns="x"><si><t>alpha</t></si>'
        "<si><t>be</t><t>ta</t></si></sst>"  # split runs concatenate
    ).encode()
    sheet = (
        '<worksheet xmlns="x"><sheetData>'
        '<row r="1"><c t="s"><v>1</v></c><c t="s"><v>0</v></c>'
        '<c t="inlineStr"><is><t>inline</t></is></c>'
        '<c><v>42</v></c></row>'
        '<row r="2"><c t="s"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    blob = O.zip_build(
        [
            ("xl/sharedStrings.xml", sst, True),
            ("xl/worksheets/sheet1.xml", sheet, True),
        ]
    )
    assert O.xlsx_sheets(blob) == ["beta\talpha\tinline\t42\nalpha"]


def test_build_xlsx_roundtrip():
    from corrie_spark.sources.pdf import fixture_lines

    text = "one two three four five six seven eight nine ten one two"
    blob = O.build_xlsx(4, text)
    expect = "\n".join(
        ln.replace(" ", "\t") for ln in fixture_lines(text)
    )
    assert O.xlsx_sheets(blob) == [expect]
    assert O.build_xlsx(4, "") and O.xlsx_sheets(O.build_xlsx(4, "")) == [""]


def test_office_stream_ingestion(spark, tmp_path):
    import os

    src = tmp_path / "in"
    os.makedirs(src)
    for i in range(2):
        with open(src / f"d{i}.docx", "wb") as f:
            f.write(O.build_docx(i, f"streamed doc {i} " + "w " * 12))
    with open(src / "s.xlsx", "wb") as f:
        f.write(O.build_xlsx(7, "a b c d e f g h i j"))
    q = (
        O.read_office_stream(spark, str(src))
        .where(F.col("error").isNull())
        .writeStream.format("memory")
        .queryName("office_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from office_stream_t").collect()
    kinds = sorted(r.kind for r in rows)
    assert kinds == ["docx", "docx", "xlsx"]


def test_epub_spine_order_overrides_name_order():
    opf = (
        '<?xml version="1.0"?><package xmlns="x"><manifest>'
        '<item id="c1" href="zz_last_by_name.xhtml" media-type="t"/>'
        '<item id="c2" href="aa_first_by_name.xhtml" media-type="t"/>'
        "</manifest><spine>"
        '<itemref idref="c1"/><itemref idref="c2"/>'
        "</spine></package>"
    ).encode()
    blob = O.zip_build(
        [
            ("mimetype", b"application/epub+zip", False),
            ("OEBPS/content.opf", opf, True),
            ("OEBPS/aa_first_by_name.xhtml", b"<p>second</p>", True),
            ("OEBPS/zz_last_by_name.xhtml", b"<p>first</p>", True),
        ]
    )
    got = [n for n, _ in O.epub_chapters(blob)]
    assert got == [
        "OEBPS/zz_last_by_name.xhtml",
        "OEBPS/aa_first_by_name.xhtml",
    ]

# --- ZIP64 (APPNOTE 4.5) ------------------------------------------------------

def test_zip64_forced_layout_roundtrips():
    text = " ".join(f"w{i}" for i in range(80))
    plain = O.build_docx(9, text)   # 9 % 5 != 3: classic EOCD
    z64 = O.build_docx(3, text)     # 3 % 5 == 3: forced ZIP64
    assert b"PK\x06\x06" in z64 and b"PK\x06\x07" in z64
    assert b"PK\x06\x06" not in plain
    # same parts, byte-identical contents, through the real reader
    assert O.zip_entries(z64)["word/document.xml"] == O.zip_entries(
        O.build_docx(13, text)  # 13 % 5 == 3 too, deflated variant
    )["word/document.xml"] or O.docx_text(z64) == O.docx_text(plain)
    assert O.docx_text(z64) == O.docx_text(plain)


def test_zip64_corruption_degrades():
    import pytest

    text = "alpha beta gamma delta epsilon zeta eta theta"
    z = bytearray(O.build_docx(3, text))
    i = bytes(z).find(b"PK\x06\x06")
    z[i + 3] ^= 0xFF
    with pytest.raises(O.OoxmlError, match="zip64"):
        O.zip_entries(bytes(z))
    z2 = bytearray(O.build_docx(3, text))
    j = bytes(z2).find(b"PK\x06\x07")
    z2[j + 3] ^= 0xFF
    with pytest.raises(O.OoxmlError, match="zip64 locator"):
        O.zip_entries(bytes(z2))
    # bad extra field: maxed central values but the 0x0001 extra gone
    z3 = bytearray(O.build_docx(3, text))
    k = bytes(z3).find(b"\x01\x00\x18\x00")  # extra header id+size
    z3[k] = 0x7F  # unknown extra id -> required zip64 values missing
    with pytest.raises(O.OoxmlError, match="zip64 extra"):
        O.zip_entries(bytes(z3))
