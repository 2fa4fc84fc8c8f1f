"""MS-CFB compound file + MS-DOC piece-table units (sources/doc.py)."""

from __future__ import annotations

import pytest

from corrie_spark.sources import doc as D
from corrie_spark.sources.pdf import fixture_lines


def test_roundtrip_small_streams_mini_fat():
    text = "alpha beta gamma delta epsilon zeta eta theta iota " * 3
    blob = D.build_doc(5, text)
    assert D.doc_text(blob) == "\n".join(fixture_lines(text))
    # every stream under the cutoff -> the mini-FAT path is live
    sizes = {k: len(v) for k, v in D.cfb_streams(blob).items()}
    assert all(s < D.MINI_CUTOFF for s in sizes.values())


def test_roundtrip_large_worddocument_fat_path():
    text = "streaming large word document body " * 400  # > 4096 bytes
    blob = D.build_doc(2, text)
    streams = D.cfb_streams(blob)
    assert len(streams["WordDocument"]) >= D.MINI_CUTOFF
    assert D.doc_text(blob) == "\n".join(fixture_lines(text))


def test_both_piece_encodings_live():
    text = "one two three four five six seven eight nine ten"
    blob = D.build_doc(0, text)
    streams = D.cfb_streams(blob)
    wd = streams["WordDocument"]
    body = "\r".join(fixture_lines(text))
    cut = len(body) // 2
    # compressed piece: cp1252 bytes of the first half present
    assert body[:cut].encode("cp1252") in wd
    # UTF-16 piece: utf-16-le bytes of the second half present
    assert body[cut:].encode("utf-16-le") in wd


def test_unicode_content_survives_utf16_piece():
    # non-latin1 chars force replacement in the cp1252 piece but
    # survive in the UTF-16 one; keep them in the second half
    text = "plain ascii words here then café snö ☃ end"
    blob = D.build_doc(1, text)
    out = D.doc_text(blob)
    assert "☃" in out or "é" in out  # at least one piece wide


def test_poison_degrades():
    with pytest.raises(D.DocError):
        D.cfb_streams(b"not a compound file at all padding " * 20)
    blob = D.build_doc(3, "w1 w2 w3 w4")
    with pytest.raises(D.DocError):
        D.doc_text(blob[: len(blob) // 3])  # truncated sectors
    bad = bytearray(blob)
    bad[30] = 12  # version-4 sector size -> unsupported, clean error
    with pytest.raises(D.DocError):
        D.cfb_streams(bytes(bad))


def test_encrypted_doc_rejected():
    import struct

    blob = bytearray(D.build_doc(4, "secret words one two"))
    # find the FIB inside WordDocument: flip fEncrypted (0x0100)
    streams = D.cfb_streams(bytes(blob))
    wd = streams["WordDocument"]
    idx = bytes(blob).find(wd[:64])
    flags = struct.unpack_from("<H", blob, idx + 0x0A)[0]
    struct.pack_into("<H", blob, idx + 0x0A, flags | 0x0100)
    with pytest.raises(D.DocError, match="encrypted"):
        D.doc_text(bytes(blob))


def test_office_records_routes_doc(spark):
    from corrie_spark.sources import ooxml as O

    df = spark.createDataFrame(
        [("legacy.doc", D.build_doc(0, "w1 w2 w3"))],
        "path string, content binary",
    )
    (row,) = O.office_records(df).collect()
    assert row.kind == "doc" and row.text == "w1 w2 w3"
