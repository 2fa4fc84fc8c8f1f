"""DLQ error-kind taxonomy (corrie_spark/errors.py): the classifier's
mapping over every reader's real message vocabulary, and the readers'
uniform `error_kind` emission (the cross-source integration is gated
by q_error_kinds' closed-form oracle)."""

from __future__ import annotations

from corrie_spark.errors import ERROR_KINDS, classify_error


def test_classifier_over_reader_vocabulary():
    cases = {
        # pdf
        "PdfError: encrypted document (password required)": "encrypted",
        "PdfError: encrypted document (unsupported V=5 R=6)": "encrypted",
        "error: Error -5 while decompressing data: incomplete or truncated stream": "truncated",
        "PdfError: unsupported filter JPXDecodeXX": "unsupported-codec",
        "PdfError: no document catalog": "bad-container",
        # office / doc / rtf
        "OoxmlError: no end-of-central-directory": "bad-container",
        "OoxmlError: bad deflate in word/document.xml: Error -3": "bad-framing",
        "OoxmlError: truncated entry word/document.xml": "truncated",
        "OoxmlError: unsupported method 99 in a.xml": "unsupported-codec",
        "OoxmlError: crc mismatch in a.xml": "bad-framing",
        "OoxmlError: encrypted entry a.xml": "encrypted",
        "DocError: encrypted document": "encrypted",
        "DocError: not a compound file": "bad-container",
        "RtfError: not an RTF document": "bad-container",
        # tar / wds
        "TarError: truncated member body": "truncated",
        "TarError: header checksum mismatch at offset 0": "bad-framing",
        # avro
        "AvroError: not an Avro object container file": "bad-container",
        "AvroError: unsupported codec snappy": "unsupported-codec",
        "AvroError: corrupt header metadata: x": "bad-container",
        "AvroError: bad map key length": "bad-framing",
        "AvroError: truncated varint": "truncated",
        # warc splitter reasons
        "x-error/gzip": "bad-framing",
        "x-error/gzip-range": "bad-framing",
        "x-error/zstd-range": "bad-framing",
        "x-error/xz-range": "bad-framing",
        "x-error/gzip-tail": "truncated",
        "x-error/http-body:bad chunk size b'zz'": "bad-framing",
        "x-error/ValueError": "bad-container",
    }
    for reason, want in cases.items():
        got = classify_error(reason)
        assert got == want, (reason, got, want)
        assert got in ERROR_KINDS
    assert classify_error(None) is None
    assert classify_error("") is None
    # total function: junk falls to the container fallback
    assert classify_error("???") == "bad-container"


def test_pdf_corruption_rules_classify_as_routed():
    from corrie_spark.sources import pdf as P

    text = " ".join(f"w{i}" for i in range(60))
    for did, kind in P.PDF_CORRUPT_KINDS.items():
        blob = P._build_fixture_pdf(did, text)
        try:
            P.pdf_text(blob)
            raise AssertionError(f"{kind}: corruption did not surface")
        except Exception as e:  # noqa: BLE001
            assert classify_error(f"{type(e).__name__}: {e}") == kind


def test_wiki_marker_rows(spark):
    from corrie_spark.sources import wikipedia as Wk

    pages = [(j, f"Page {j}", f"body {j}") for j in range(1, 4)]
    dump, _ = Wk.build_dump(pages, pages_per_stream=1)
    starts = [off for off, _, _ in Wk.bz2_streams_at(dump)]
    mid = bytearray(dump)
    mid[starts[2] + 30] ^= 0xFF  # corrupt a middle stream
    cut = dump[: starts[-1] + 10]  # truncate the final stream
    df = spark.createDataFrame(
        [("mid.xml.bz2", bytes(mid)), ("cut.xml.bz2", cut)],
        "path string, content binary",
    )
    rows = Wk.wiki_pages(df).collect()
    marks = {(r.path, r.error_kind) for r in rows if r.error_kind is not None}
    assert marks == {("mid.xml.bz2", "bad-framing"), ("cut.xml.bz2", "truncated")}
    # good rows keep a null kind and their pages
    good = [r for r in rows if r.error_kind is None]
    assert all(r.page_id is not None for r in good)
    assert sum(1 for r in good if r.path == "mid.xml.bz2") >= 2
