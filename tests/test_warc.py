"""WARC ingestion: record layer unit tests + the file-based reader
(`read_warc` over real .warc.gz files via binaryFile) + tolerance for
the malformed records every real crawl contains."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from corrie_spark.sources import warc as W


def test_gzip_member_split_roundtrip():
    members = [b"first record bytes", b"second", b"x" * 70000]
    blob = b"".join(gzip.compress(m) for m in members)
    assert list(W.gzip_members(blob)) == members


def test_gzip_single_member_whole_file():
    whole = gzip.compress(b"abc" * 1000)
    assert list(W.gzip_members(whole)) == [b"abc" * 1000]


def test_parse_warc_record_roundtrip():
    rec = W.response_record(43, "hello world page")
    parsed = list(W.parse_warc(rec))
    assert len(parsed) == 1
    h = parsed[0]["headers"]
    assert h["warc-type"] == "response"
    assert h["warc-target-uri"] == "https://example.org/doc/43"
    status, hh, body = W.split_http_response(parsed[0]["content"])
    assert status == 200
    assert int(hh["content-length"]) == len(body)
    # doc 43 % ENC_MOD == 3 -> the fixture ships a gzip content coding
    assert hh["content-encoding"] == "gzip"
    body, applied, ok = W.decode_http_body(hh, body)
    assert body.decode("utf-8") == "hello world page"
    assert applied == ["gzip"] and ok
    # an identity doc (40 % 5 == 0) stays plain
    rec0 = W.response_record(40, "plain page")
    _, hh0, body0 = W.split_http_response(list(W.parse_warc(rec0))[0]["content"])
    assert W.decode_http_body(hh0, body0) == (b"plain page", [], True)


def test_parse_warc_multi_record_stream():
    stream = (
        W.warcinfo_record("f.warc.gz")
        + W.request_record(1)
        + W.response_record(1, "body one")
    )
    types = [r["headers"]["warc-type"] for r in W.parse_warc(stream)]
    assert types == ["warcinfo", "request", "response"]


def test_latin1_charset_roundtrip():
    # doc 7 routes to iso-8859-1 with the non-ASCII suffix
    rec = W.response_record(7, "plain ascii text")
    parsed = next(iter(W.parse_warc(rec)))
    status, hh, body = W.split_http_response(parsed["content"])
    body, applied, _ok = W.decode_http_body(hh, body)  # doc 7%5==2: chunked
    assert applied == ["chunked"]
    cs = W.sniff_charset(hh["content-type"], body)
    assert cs == "iso-8859-1"
    assert W.decode_text(body, cs) == "plain ascii text caf\xe9"
    # latin-1 body is one byte per char
    assert len(body) == len("plain ascii text caf\xe9")


def test_sniff_charset_bom_and_default():
    assert W.sniff_charset("text/html", b"\xef\xbb\xbfhi") == "utf-8-sig"
    assert W.sniff_charset("text/html", b"hi") == "utf-8"
    assert W.sniff_charset('text/html; charset="ISO-8859-1"', b"") == "iso-8859-1"


def test_decode_text_poison_falls_back():
    # invalid utf-8 must not raise (crawls are full of mislabeled pages)
    assert W.decode_text(b"\xff\xfe\xfa", "utf-8") == "\xff\xfe\xfa".encode(
        "latin-1"
    ).decode("latin-1")
    assert W.decode_text(b"abc", "no-such-charset") == "abc"


def test_parse_warc_tolerates_trailing_garbage():
    stream = W.response_record(3, "x") + b"NOT A RECORD"
    assert len(list(W.parse_warc(stream))) == 1


def test_read_warc_from_files(spark, tmp_path):
    # the real file path: write .warc.gz files, read via binaryFile
    docs = [(i, f"document body number {i}") for i in range(30)]
    for g in range(3):
        blob = W.build_warc_gz(
            f"part-{g}.warc.gz", [d for d in docs if d[0] % 3 == g]
        )
        (tmp_path / f"part-{g}.warc.gz").write_bytes(blob)
    recs = W.read_warc(spark, str(tmp_path / "*.warc.gz"))
    by_type = {
        r["warc_type"]: r["n"]
        for r in recs.groupBy("warc_type").agg(F.count("*").alias("n")).collect()
    }
    n_dups = len([d for d in docs if d[0] % W.DUP_MOD == 0])
    assert by_type == {"warcinfo": 3, "request": 30, "response": 30 + n_dups}
    # text decodes for every response; request/warcinfo rows carry none
    resp = recs.where(F.col("warc_type") == "response")
    assert resp.where(F.col("text").isNull()).count() == 0
    got = {
        r.target_uri: r.text
        for r in resp.where(~F.col("record_id").isNull()).collect()
    }
    assert got["https://example.org/doc/5"] == "document body number 5"


def test_to_documents_schema_and_dedup_food(spark, tmp_path):
    docs = [(i, f"text {i}") for i in range(12)]
    (tmp_path / "c.warc.gz").write_bytes(W.build_warc_gz("c.warc.gz", docs))
    recs = W.read_warc(spark, str(tmp_path / "c.warc.gz"))
    d = W.to_documents(recs)
    assert d.columns == ["doc_id", "url", "text"]
    rows = d.collect()
    # 12 docs + re-crawled duplicates (doc 0 and 11)
    assert len(rows) == 14
    # duplicate responses got DIFFERENT doc_ids (distinct record ids)
    assert len({r.doc_id for r in rows}) == 14
    # but identical text — exact dedup downstream collapses them
    assert len({r.text for r in rows}) == 12


def test_streaming_crawl_to_corpus_dedup(spark, tmp_path):
    """Crawl snapshots arriving as .warc.gz files, screened by the
    incremental dedup store: snapshot 1 is all fresh (plus its own
    re-fetch duplicates as dup_in_batch); snapshot 2 re-crawls half
    the pages (dup_of_corpus) and adds new ones (fresh)."""
    from corrie_spark.streaming.dedup_stream import dedup_decisions

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    work = str(tmp_path / "work")

    snap1 = [(i, f"page body number {i}") for i in range(20)]
    (crawl / "snap1.warc.gz").write_bytes(
        W.build_warc_gz("snap1.warc.gz", snap1, with_dups=False)
    )
    q = W.start_warc_dedup_stream(spark, str(crawl / "*.warc.gz"), work)
    q.awaitTermination(120)
    d1 = dedup_decisions(spark, work + "/decisions")
    assert d1.count() == 20
    assert d1.where(F.col("status") != "fresh").count() == 0

    # snapshot 2: pages 10..19 unchanged (re-crawled under the SAME
    # ids/urls, as a real crawl does — the charset routing is id-keyed,
    # so same id => byte-identical body), 20..29 new
    snap2 = [(i, f"page body number {i}") for i in range(10, 30)]
    (crawl / "snap2.warc.gz").write_bytes(
        W.build_warc_gz("snap2.warc.gz", snap2, with_dups=False)
    )
    q = W.start_warc_dedup_stream(spark, str(crawl / "*.warc.gz"), work)
    q.awaitTermination(120)
    d2 = dedup_decisions(spark, work + "/decisions")
    by_status = {r.status: r.n for r in d2.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert by_status == {"fresh": 30, "dup_of_corpus": 10}


def test_wet_conversion_records(spark, tmp_path):
    """WET layout: conversion records carry text as a bare text/plain
    content block (no HTTP framing); the reader decodes them through
    its conversion branch and wet_to_documents maps them onto the
    documents schema."""
    docs = [(i, f"extracted text {i}") for i in range(9)]
    (tmp_path / "c.warc.wet.gz").write_bytes(W.build_wet_gz("c.warc.wet.gz", docs))
    recs = W.read_warc(spark, str(tmp_path / "c.warc.wet.gz"))
    conv = recs.where(F.col("warc_type") == "conversion").collect()
    assert len(conv) == 9
    by_uri = {r.target_uri: r for r in conv}
    r5 = by_uri["https://example.org/doc/5"]
    assert r5.text == "extracted text 5" and r5.http_status == 0
    # doc 7 routes latin-1 with the suffix
    r7 = by_uri["https://example.org/doc/7"]
    assert r7.charset == "iso-8859-1" and r7.text.endswith("caf\xe9")
    d = W.wet_to_documents(recs)
    assert d.columns == ["doc_id", "url", "text"] and d.count() == 9

# --- HTTP body transfer/content decoding (RFC 9112 §7.1 / 9110 §8.4) --------

def test_dechunk_roundtrip_and_extensions():
    body = b"x" * 1300
    assert W.dechunk_http_body(W.chunk_http_body(body)) == body
    assert W.dechunk_http_body(W.chunk_http_body(b"")) == b""
    # chunk extensions after ';' are ignored; trailers after 0-chunk too
    wire = b"5;ext=1\r\nhello\r\n0\r\nTrailer: v\r\n\r\n"
    assert W.dechunk_http_body(wire) == b"hello"


def test_dechunk_poison_framing():
    import pytest

    for bad in (
        b"zz\r\nabc\r\n0\r\n\r\n",      # non-hex size
        b"10\r\nshort\r\n",             # chunk data truncated
        b"3\r\nabcXX0\r\n\r\n",         # missing terminating CRLF
        b"5\r\nhello",                  # no next size line
    ):
        with pytest.raises(W.HttpBodyError):
            W.dechunk_http_body(bad)


def test_content_coding_decode_paths():
    import gzip as G
    import zlib

    import pytest

    body = b"page body " * 100
    assert W.decode_http_body({"content-encoding": "gzip"}, G.compress(body))[0] == body
    # deflate: zlib-wrapped (spec) and raw (real servers) both decode
    assert W.decode_http_body({"content-encoding": "deflate"}, zlib.compress(body))[0] == body
    raw = zlib.compress(body)[2:-4]
    assert W.decode_http_body({"content-encoding": "deflate"}, raw)[0] == body
    # chunked + gzip composition (TE outermost on the wire)
    wire = W.chunk_http_body(G.compress(body), 333)
    out, applied, ok = W.decode_http_body(
        {"transfer-encoding": "chunked", "content-encoding": "gzip"}, wire
    )
    assert out == body and ok and applied == ["chunked", "gzip"]
    # br decodes via the from-spec RFC 7932 reader (the former seam)
    from corrie_spark.sources.brotli import encode_uncompressed

    out, applied, ok = W.decode_http_body(
        {"content-encoding": "br"}, encode_uncompressed(body)
    )
    assert out == body and ok and applied == ["br"]
    # genuinely unknown codings stay the textual-off seam
    out, applied, ok = W.decode_http_body({"content-encoding": "compress"}, b"\x1f\x9d")
    assert out == b"\x1f\x9d" and not ok
    # corrupt codings raise
    with pytest.raises(W.HttpBodyError):
        W.decode_http_body({"content-encoding": "gzip"}, b"\x1f\x8b\x08 garbage")
    with pytest.raises(W.HttpBodyError):
        W.decode_http_body({"content-encoding": "deflate"}, b"garbage")


def test_encoded_responses_through_reader(spark):
    """Fixture docs routed through chunked/gzip/deflate bodies decode
    to the same text as identity framing; corrupt chunk framing
    degrades to one _error row."""
    import gzip as G

    docs = [(i, f"body text number {i} " * 30) for i in range(10, 20)]
    blob = W.build_warc_gz("enc.warc.gz", docs, with_dups=False)
    # one extra member with corrupt chunked framing
    bad_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nzz\r\nnope"
    )
    bad_rec = W._record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{W.fixture_uuid('bad-chunk')}>"),
            ("WARC-Date", "2026-01-01T00:00:00Z"),
            ("WARC-Target-URI", "https://example.org/bad"),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        bad_http,
    )
    blob += G.compress(bad_rec, compresslevel=1)
    df = spark.createDataFrame(
        [("enc.warc.gz", bytearray(blob))], "path string, content binary"
    )
    rows = W.warc_records(df).collect()
    resp = {r.target_uri: r for r in rows if r.warc_type == "response"}
    for i, text in docs:
        got = resp[f"https://example.org/doc/{i}"]
        assert got.text == W.fixture_body(i, text)[1], i
        expect_enc = {1: "zstd", 2: "chunked", 3: "gzip", 4: "deflate"}.get(
            i % W.ENC_MOD
        )
        if i % W.BR_MOD == 5:
            expect_enc = "br"
        elif i % W.XZ_MOD == 10:
            expect_enc = "xz"
        assert got.http_encoding == expect_enc, i
    errs = [r for r in rows if r.warc_type == W.ERROR_TYPE]
    assert len(errs) == 1
    assert errs[0].http_content_type.startswith("x-error/http-body")


def test_plain_uncompressed_warc_file(spark, tmp_path):
    """Bare .warc files (no container at all) parse via the WARC/
    head fast path — one 'member' spanning the file."""
    import os

    docs = [(i, f"plain doc {i} text") for i in range(1, 7)]
    members = [W.warcinfo_record("p.warc")]
    for i, t in docs:
        members.append(W.response_record(i, t))
    p = os.path.join(str(tmp_path), "p.warc")
    with open(p, "wb") as f:
        f.write(b"".join(members))
    rows = W.read_warc(spark, p).where("warc_type = 'response'").collect()
    assert {r.target_uri for r in rows} == {
        f"https://example.org/doc/{i}" for i, _ in docs
    }


# ---------------------------------------------------------------------------
# xz/lzma codings (round 13)
# ---------------------------------------------------------------------------


def test_warc_xz_record_set_identical_to_gzip():
    """The same docs through build_warc_gz and build_warc_xz parse to
    the same record set (ids, text, encodings) — only offsets differ."""
    import lzma

    from corrie_spark.sources import warc as W

    docs = [(i, f"doc {i} body words " * 3) for i in range(25)]
    gz = W.build_warc_gz("a.warc", docs)
    xz = W.build_warc_xz("a.warc", docs)  # same name: warcinfo ids match
    assert xz[:6] == W.XZ_MAGIC

    def parse_all(blob, walker):
        out = []
        for _, _, member in walker(blob):
            for rec in W.parse_warc(member):
                h = rec["headers"]
                out.append((h.get("warc-record-id"), len(rec["content"])))
        return out

    a = parse_all(gz, W.gzip_members_at)
    b = parse_all(xz, W.xz_members_at)
    assert a == b and len(a) >= 2 * len(docs)
    # a doc_id%20==10 response body carries Content-Encoding: xz and
    # decode_http_body recovers the page
    rec10 = W.response_record(10, "xz body " * 30)
    (r,) = list(W.parse_warc(rec10))
    status, hh, body = W.split_http_response(r["content"])
    assert hh.get("content-encoding") == "xz"
    decoded, applied, ok = W.decode_http_body(hh, body)
    assert ok and applied == ["xz"]
    assert decoded.decode("utf-8") == "xz body " * 30
    # lzma (legacy alone container) coding decodes too
    legacy = lzma.compress(b"legacy body", format=lzma.FORMAT_ALONE)
    d2, a2, ok2 = W.decode_http_body(
        {"content-encoding": "lzma"}, legacy
    )
    assert ok2 and a2 == ["lzma"] and d2 == b"legacy body"
    # corrupt xz framing raises HttpBodyError (DLQ path)
    import pytest

    with pytest.raises(W.HttpBodyError):
        W.decode_http_body({"content-encoding": "xz"}, b"\xfd7zXZ\x00garbage")
