"""Offset-sharded WARC range reader + CDX index + poison safety.

The sharded reader's contract: (file, byte-range) partitions resynced
to gzip-member boundaries produce records HASH-IDENTICAL to the
binaryFile whole-file path (including warc_offset/warc_rec_length),
with more partitions than files. record_idx is excluded from identity
— it is a within-input-row ordinal by contract (per file for
binaryFile, per member for ranges), not a record identity; offsets
are the identity.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from corrie_spark.sources import warc as W

_IDENTITY_COLS = [c for c in W.WARC_COLUMNS if c != "record_idx"]


def _write_fixture(tmp_path, n_docs=40, n_files=2):
    paths = []
    for g in range(n_files):
        docs = [
            (i, f"document {i} body with several words " * 3)
            for i in range(n_docs)
            if i % n_files == g
        ]
        p = os.path.join(tmp_path, f"crawl-{g:05d}.warc.gz")
        with open(p, "wb") as f:
            f.write(W.build_warc_gz(os.path.basename(p), docs))
        paths.append(p)
    return paths


def test_sharded_reader_hash_identical_to_binaryfile(spark, tmp_path):
    _write_fixture(str(tmp_path))
    glob = os.path.join(str(tmp_path), "*.warc.gz")

    whole = W.read_warc(spark, glob).select(*_IDENTITY_COLS)
    # binaryFile paths are file:/ URIs; normalize to basenames on both
    norm = lambda df: df.withColumn(  # noqa: E731
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    W.register_warc_ranges(spark)
    sharded_rows = (
        spark.read.format("warc_ranges")
        .option("path", glob)
        .option("rangeBytes", "4096")
        .load()
    )
    # more partitions than files: the whole point of the range reader
    assert sharded_rows.rdd.getNumPartitions() > 2
    sharded = W.warc_records(sharded_rows).select(*_IDENTITY_COLS)
    a, b = norm(whole), norm(sharded)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_sharded_reader_via_helper(spark, tmp_path):
    _write_fixture(str(tmp_path), n_docs=12, n_files=1)
    glob = os.path.join(str(tmp_path), "*.warc.gz")
    recs = W.read_warc_sharded(spark, glob, range_bytes=2048)
    n_resp = recs.where(F.col("warc_type") == "response").count()
    assert n_resp == 12 + sum(1 for i in range(12) if i % W.DUP_MOD == 0)


def test_corrupt_member_emits_error_marker_not_exception(spark, tmp_path):
    docs = [(i, f"text {i} " * 5) for i in range(20)]
    blob = W.build_warc_gz("c.warc.gz", docs)
    offs = [(o, l) for o, l, _ in W.gzip_members_at(blob)]
    bad = bytearray(blob)
    o3, l3 = offs[3]
    bad[o3 + 8 : o3 + 16] = b"\x00" * 8  # corrupt the 4th member
    p = os.path.join(str(tmp_path), "c.warc.gz")
    with open(p, "wb") as f:
        f.write(bytes(bad))

    recs = W.read_warc(spark, p)
    errors = recs.where(F.col("warc_type") == W.ERROR_TYPE).collect()
    good = recs.where(F.col("warc_type") != W.ERROR_TYPE)
    # one marker row covering the skipped span; everything else parsed
    assert len(errors) == 1
    assert errors[0].http_content_type.startswith("x-error/")
    assert errors[0].warc_offset == o3
    assert good.count() >= len(offs) - 2


def test_sharded_reader_corrupt_span_emits_error_marker(spark, tmp_path):
    """DLQ parity with the binaryFile path: a corrupt member read
    through the RANGE reader surfaces as an `_error` marker row (the
    round-10 advice's observability gap), and every intact member
    still parses."""
    docs = [(i, f"sharded corrupt test {i} " * 6) for i in range(30)]
    blob = W.build_warc_gz("c.warc.gz", docs)
    offs = [(o, l) for o, l, _ in W.gzip_members_at(blob)]
    bad = bytearray(blob)
    o5, l5 = offs[5]
    bad[o5 + 8 : o5 + 16] = b"\x00" * 8  # corrupt the 6th member
    p = os.path.join(str(tmp_path), "c.warc.gz")
    with open(p, "wb") as f:
        f.write(bytes(bad))

    recs = W.read_warc_sharded(spark, p, range_bytes=2048)
    errors = recs.where(F.col("warc_type") == W.ERROR_TYPE).collect()
    good = recs.where(F.col("warc_type") != W.ERROR_TYPE)
    assert len(errors) == 1
    assert errors[0].http_content_type == "x-error/gzip-range"
    assert errors[0].warc_offset == o5
    assert errors[0].warc_rec_length >= 1
    # error span + surviving members tile the file with no silent loss
    assert good.count() == len(offs) - 1
    # clean fixture still emits ZERO error rows through the same path
    clean = os.path.join(str(tmp_path), "ok.warc.gz")
    with open(clean, "wb") as f:
        f.write(blob)
    ok = W.read_warc_sharded(spark, clean, range_bytes=2048)
    assert ok.where(F.col("warc_type") == W.ERROR_TYPE).count() == 0


def test_malformed_content_length_stops_member_only():
    rec = W._record([("WARC-Type", "response")], b"xyz")
    broken = rec.replace(b"Content-Length: 3", b"Content-Length: zz")
    assert list(W.parse_warc(broken)) == []
    # a clean record in its OWN member is unaffected (crawl layout)
    assert len(list(W.parse_warc(rec))) == 1


def test_cdx_offsets_range_request_roundtrip(spark, tmp_path):
    """The CDX contract: reading exactly [warc_offset, +warc_rec_length)
    from the file and gunzipping replays the indexed record."""
    _write_fixture(str(tmp_path), n_docs=15, n_files=1)
    glob = os.path.join(str(tmp_path), "*.warc.gz")
    recs = W.read_warc(spark, glob)
    cdx = W.cdx_index(recs).collect()
    assert cdx
    for row in cdx:
        path = row.warc_file.removeprefix("file:")
        with open(path, "rb") as f:
            f.seek(row.warc_offset)
            comp = f.read(row.warc_rec_length)
        (rec,) = list(W.parse_warc(gzip.decompress(comp)))
        rid = (
            rec["headers"]["warc-record-id"]
            .strip("<>")
            .removeprefix("urn:uuid:")
        )
        assert rid == row.record_id


def test_cdx_urlkey_surt_shape(spark):
    df = spark.createDataFrame(
        [("https://www.Site.Example.org:443/Doc/9?utm_source=x&b=2&a=1#f",)],
        "u string",
    )
    got = df.select(W.surt_urlkey(F.col("u")).alias("k")).collect()[0].k
    assert got == "org,example,site,www)/doc/9?a=1&b=2"


def test_revisit_record_parse_and_same_crawl_resolution(spark):
    """A deduplicated crawl resolves against itself: the dup re-fetch
    shipped as a revisit record gets its text from the original
    response in the SAME record frame."""
    text = "revisit fixture body with several words here"
    blob = (
        gzip.compress(W.warcinfo_record("r.warc.gz"))
        + gzip.compress(W.response_record(3, text))
        + gzip.compress(W.revisit_record(3, text))
    )
    df = spark.createDataFrame(
        [("r.warc.gz", blob)], "path string, content binary"
    )
    recs = W.warc_records(df)
    rev = recs.where(F.col("warc_type") == "revisit").collect()
    assert len(rev) == 1
    r = rev[0]
    assert r.text is None and r.payload_digest is None
    assert r.declared_digest.startswith("md5:")
    assert r.refers_to_uri == "https://example.org/doc/3"
    assert r.refers_to  # the original capture's record id
    resolved = W.resolve_revisits(recs).collect()
    assert len(resolved) == 1
    orig = recs.where(F.col("warc_type") == "response").collect()[0]
    assert resolved[0].resolved_text == orig.text
    assert resolved[0].resolved_charset == orig.charset
    assert resolved[0].resolved_from == orig.record_id


def test_unresolvable_revisit_stays_null(spark):
    """A revisit whose referenced capture is absent (or whose digest
    no longer matches) resolves to null — observable loss."""
    blob = (
        gzip.compress(W.response_record(4, "the page CHANGED since"))
        + gzip.compress(W.revisit_record(4, "original text gone"))
        + gzip.compress(W.revisit_record(7, "no capture at all"))
    )
    df = spark.createDataFrame(
        [("r.warc.gz", blob)], "path string, content binary"
    )
    out = {
        r.target_uri: r.resolved_text
        for r in W.resolve_revisits(W.warc_records(df)).collect()
    }
    assert out == {
        "https://example.org/doc/4": None,
        "https://example.org/doc/7": None,
    }


def test_sharded_zst_hash_identical_to_binaryfile(spark, tmp_path):
    """.warc.zst through the range reader: frame-boundary resync at
    range sizes small enough that most frames straddle a boundary,
    hash-identical to the whole-file path (container dispatch by
    FILE-head magic, not range head)."""
    paths = []
    for g in range(2):
        docs = [
            (i, f"zst doc {i} body words " * 4) for i in range(40) if i % 2 == g
        ]
        p = os.path.join(str(tmp_path), f"crawl-{g:05d}.warc.zst")
        with open(p, "wb") as f:
            f.write(W.build_warc_zst(os.path.basename(p), docs))
        paths.append(p)
    glob = os.path.join(str(tmp_path), "*.warc.zst")
    whole = W.read_warc(spark, glob).select(*_IDENTITY_COLS)
    norm = lambda df: df.withColumn(  # noqa: E731
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    W.register_warc_ranges(spark)
    for range_bytes in (700, 4096):
        sharded_rows = (
            spark.read.format("warc_ranges")
            .option("path", glob)
            .option("rangeBytes", str(range_bytes))
            .load()
        )
        assert sharded_rows.rdd.getNumPartitions() > 2
        sharded = W.warc_records(sharded_rows).select(*_IDENTITY_COLS)
        a, b = norm(whole), norm(sharded)
        assert a.count() == b.count() > 0, range_bytes
        assert a.exceptAll(b).count() == 0, range_bytes


def test_sharded_zst_corrupt_frame_sentinel(spark, tmp_path):
    """A corrupt frame inside a range costs its own error span and
    later frames in the same and following ranges still extract."""
    docs = [(i, f"body {i} " * 8) for i in range(1, 13)]
    blob = bytearray(W.build_warc_zst("c.warc.zst", docs))
    first = blob.find(W.ZSTD_FRAME_MAGIC)
    second = blob.find(W.ZSTD_FRAME_MAGIC, first + 4)
    blob[second + 4] |= 0x08  # reserved FHD bit
    p = os.path.join(str(tmp_path), "c.warc.zst")
    with open(p, "wb") as f:
        f.write(bytes(blob))
    W.register_warc_ranges(spark)
    rows = W.warc_records(
        spark.read.format("warc_ranges")
        .option("path", p)
        .option("rangeBytes", "600")
        .load()
    ).collect()
    errs = [r for r in rows if r.warc_type == W.ERROR_TYPE]
    resp = [r for r in rows if r.warc_type == "response"]
    assert len(resp) == 12 + sum(1 for i, _ in docs if i % W.DUP_MOD == 0)
    assert len(errs) >= 1
    assert all(r.error_kind in ("bad-framing", "bad-container") for r in errs)
    # the sentinel reason names the ACTUAL container (round-13 advice:
    # .warc.zst spans were mislabeled x-error/gzip-range)
    range_errs = [
        r for r in errs if r.http_content_type.endswith("-range")
    ]
    assert all(
        r.http_content_type == "x-error/zstd-range" for r in range_errs
    )


def test_sharded_zst_with_dictionary(spark, tmp_path):
    """Mid-file ranges of a dictionary-bearing .warc.zst must decode:
    every partition probes the leading skippable frames for the
    dictionary before walking its own range."""
    docs = [(i, f"dict doc {i} body words " * 4) for i in range(30)]
    p = os.path.join(str(tmp_path), "d.warc.zst")
    with open(p, "wb") as f:
        f.write(W.build_warc_zst("d.warc.zst", docs, with_dict=True))
    whole = W.read_warc(spark, p).select(*_IDENTITY_COLS)
    norm = lambda df: df.withColumn(  # noqa: E731
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    W.register_warc_ranges(spark)
    sharded = W.warc_records(
        spark.read.format("warc_ranges")
        .option("path", p)
        .option("rangeBytes", "900")
        .load()
    ).select(*_IDENTITY_COLS)
    a, b = norm(whole), norm(sharded)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0


def test_cdx_offsets_zst_range_request_roundtrip(spark, tmp_path):
    """The CDX contract extends to .warc.zst: [warc_offset,
    +warc_rec_length) slices one zstd frame; decoding it (with the
    file's dictionary when present) replays the indexed record."""
    from corrie_spark.sources.zstd import decode_frame

    for with_dict, fname in ((False, "p.warc.zst"), (True, "d.warc.zst")):
        docs = [(i, f"cdx doc {i} body") for i in range(10)]
        p = os.path.join(str(tmp_path), fname)
        with open(p, "wb") as f:
            f.write(W.build_warc_zst(fname, docs, with_dict=with_dict))
        head = open(p, "rb").read()
        dicts = W._collect_zst_dictionaries(head)
        recs = W.read_warc(spark, p)
        cdx = W.cdx_index(recs).collect()
        assert cdx, fname
        for row in cdx:
            path = row.warc_file.removeprefix("file:")
            with open(path, "rb") as f:
                f.seek(row.warc_offset)
                comp = f.read(row.warc_rec_length)
            blob, end = decode_frame(comp, 0, dicts)
            assert end == len(comp), fname
            (rec,) = list(W.parse_warc(blob))
            rid = (
                rec["headers"]["warc-record-id"]
                .strip("<>")
                .removeprefix("urn:uuid:")
            )
            assert rid == row.record_id, fname


# ---------------------------------------------------------------------------
# regression: frames that actually COMPRESS (decompressed > compressed,
# i.e. every real-world .warc.zst) must not emit spurious tail errors
# from the pre-decoded branch's accounting (ADVICE r12: expect was
# base + compressed span, tail was base + decompressed length).
# ---------------------------------------------------------------------------

import shutil
import struct
import subprocess

import pytest

ZSTD_CLI = shutil.which("zstd")


def test_predecoded_member_compressed_span_no_tail_error(spark):
    """Unit-shape pin (no CLI needed): a pre-decoded member row whose
    `length` (compressed frame span) is SHORTER than its decompressed
    content — the exact shape _scan_range_frames_zst yields for any
    compressing frame — produces the record and ZERO error rows, and
    warc_rec_length stays the compressed span (the CDX locator)."""
    member = W.response_record(3, "compressible body words " * 30)
    comp_len = len(member) // 3  # any value < len(member)
    rows = spark.createDataFrame(
        [("f.warc.zst", bytearray(member), 100, comp_len)],
        "path string, content binary, offset long, length long",
    )
    recs = W.warc_records(rows).collect()
    errs = [r for r in recs if r.warc_type == W.ERROR_TYPE]
    assert errs == [], [r.http_content_type for r in errs]
    assert len(recs) == 1
    assert recs[0].warc_offset == 100
    assert recs[0].warc_rec_length == comp_len


@pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI")
def test_sharded_zst_real_compression_end_to_end(spark, tmp_path):
    """End-to-end with REAL zstd-CLI-compressed frames (the raw-block
    writer-twin fixtures expand rather than compress, which is how the
    tail bug hid): zero error rows, and the sharded path is
    hash-identical to the whole-file path."""

    def cli_frame(m: bytes) -> bytes:
        return subprocess.run(
            [ZSTD_CLI, "-3", "-c"], input=m, capture_output=True, check=True
        ).stdout

    members = [W.warcinfo_record("real.warc.zst")]
    for i in range(12):
        members.append(W.request_record(i))
        members.append(W.response_record(i, f"cli-compressed body {i} " * 40))
    blob = struct.pack("<II", 0x184D2A5D, 0) + b"".join(
        cli_frame(m) for m in members
    )
    assert len(blob) < sum(len(m) for m in members)  # it really compresses
    p = os.path.join(str(tmp_path), "real.warc.zst")
    with open(p, "wb") as f:
        f.write(blob)

    norm = lambda df: df.withColumn(  # noqa: E731
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    whole = W.read_warc(spark, p).cache()
    assert whole.where(F.col("warc_type") == W.ERROR_TYPE).count() == 0
    W.register_warc_ranges(spark)
    for range_bytes in (700, 4096):
        rows = (
            spark.read.format("warc_ranges")
            .option("path", p)
            .option("rangeBytes", str(range_bytes))
            .load()
        )
        sharded = W.warc_records(rows).cache()
        errs = sharded.where(F.col("warc_type") == W.ERROR_TYPE).collect()
        assert errs == [], [r.http_content_type for r in errs]
        a = norm(whole.select(*_IDENTITY_COLS))
        b = norm(sharded.select(*_IDENTITY_COLS))
        assert a.count() == b.count() > 0, range_bytes
        assert a.exceptAll(b).count() == 0, range_bytes


# ---------------------------------------------------------------------------
# .warc.xz: one record per .xz stream, sharded == whole-file
# ---------------------------------------------------------------------------


def test_sharded_xz_hash_identical_to_binaryfile(spark, tmp_path):
    paths = []
    for g in range(2):
        docs = [
            (i, f"xz doc {i} body words " * 4) for i in range(40) if i % 2 == g
        ]
        p = os.path.join(str(tmp_path), f"crawl-{g:05d}.warc.xz")
        with open(p, "wb") as f:
            f.write(W.build_warc_xz(os.path.basename(p), docs))
        paths.append(p)
    glob = os.path.join(str(tmp_path), "*.warc.xz")
    whole = W.read_warc(spark, glob).select(*_IDENTITY_COLS)
    norm = lambda df: df.withColumn(  # noqa: E731
        "warc_file", F.element_at(F.split("warc_file", "/"), -1)
    )
    W.register_warc_ranges(spark)
    for range_bytes in (700, 4096):
        sharded_rows = (
            spark.read.format("warc_ranges")
            .option("path", glob)
            .option("rangeBytes", str(range_bytes))
            .load()
        )
        assert sharded_rows.rdd.getNumPartitions() > 2
        sharded = W.warc_records(sharded_rows).select(*_IDENTITY_COLS)
        a, b = norm(whole), norm(sharded)
        assert a.count() == b.count() > 0, range_bytes
        assert a.exceptAll(b).count() == 0, range_bytes


def test_sharded_xz_corrupt_stream_sentinel(spark, tmp_path):
    docs = [(i, f"cx doc {i} body") for i in range(12)]
    blob = bytearray(W.build_warc_xz("c.warc.xz", docs))
    members = list(W.xz_members_at(bytes(blob)))
    off, ln, _ = members[4]
    blob[off + 20] ^= 0xFF  # corrupt one stream body
    p = os.path.join(str(tmp_path), "c.warc.xz")
    with open(p, "wb") as f:
        f.write(bytes(blob))
    recs = W.read_warc(spark, p).collect()
    errs = [r for r in recs if r.warc_type == W.ERROR_TYPE]
    good = [r for r in recs if r.warc_type != W.ERROR_TYPE]
    assert len(errs) >= 1
    assert errs[0].error_kind in ("bad-framing", "truncated")
    assert len(good) >= len(members) - 2
    # the RANGE reader's sentinel reason names the xz container
    # (round-13 advice: was mislabeled x-error/gzip-range)
    W.register_warc_ranges(spark)
    rrecs = W.warc_records(
        spark.read.format("warc_ranges")
        .option("path", p)
        .option("rangeBytes", "400")
        .load()
    ).collect()
    range_errs = [
        r
        for r in rrecs
        if r.warc_type == W.ERROR_TYPE
        and r.http_content_type.endswith("-range")
    ]
    assert range_errs
    assert all(
        r.http_content_type == "x-error/xz-range" for r in range_errs
    )


def test_cdx_offsets_xz_range_request_roundtrip(spark, tmp_path):
    """The CDX contract extends to .warc.xz: [warc_offset,
    +warc_rec_length) slices one .xz stream; decompressing it replays
    the indexed record."""
    import lzma

    docs = [(i, f"cdx xz doc {i} body") for i in range(10)]
    p = os.path.join(str(tmp_path), "p.warc.xz")
    with open(p, "wb") as f:
        f.write(W.build_warc_xz("p.warc.xz", docs))
    recs = W.read_warc(spark, p)
    cdx = W.cdx_index(recs).collect()
    assert cdx
    for row in cdx:
        path = row.warc_file.removeprefix("file:")
        with open(path, "rb") as f:
            f.seek(row.warc_offset)
            comp = f.read(row.warc_rec_length)
        (rec,) = list(W.parse_warc(lzma.decompress(comp, format=lzma.FORMAT_XZ)))
        rid = (
            rec["headers"]["warc-record-id"]
            .strip("<>")
            .removeprefix("urn:uuid:")
        )
        assert rid == row.record_id


def test_first_owned_corrupt_frame_gets_sentinel_zst(tmp_path):
    """A corrupt frame that is the FIRST owned candidate of a
    mid-file range must still produce a loss sentinel (round-14 fix:
    without a validated anchor before it, the span vanished silently
    while the binaryFile path reported it)."""
    docs = [(i, f"first-cand {i} " * 4) for i in range(1, 9)]
    blob = bytearray(W.build_warc_zst("f.warc.zst", docs))
    offs = [blob.find(W.ZSTD_FRAME_MAGIC)]
    while True:
        nxt = blob.find(W.ZSTD_FRAME_MAGIC, offs[-1] + 4)
        if nxt < 0:
            break
        offs.append(nxt)
    k = len(offs) // 2
    blob[offs[k] + 9] ^= 0xFF  # corrupt frame k's body
    p = os.path.join(str(tmp_path), "f.warc.zst")
    with open(p, "wb") as f:
        f.write(bytes(blob))
    import io

    with open(p, "rb") as f:
        # range starts EXACTLY at the corrupt frame: no validated
        # member can anchor the sentinel before it
        spans = list(
            W._scan_range_frames_zst(
                f, offs[k], len(blob), len(blob),
                dicts=W._collect_zst_dictionaries(bytes(blob[:offs[1]])),
            )
        )
    sentinels = [(o, ln) for o, ln, b in spans if not b]
    members = [(o, ln) for o, ln, b in spans if b]
    assert members  # later frames in the range still extract
    assert sentinels, "corrupt first-owned frame lost silently"
    assert sentinels[0][0] == offs[k]


def test_first_owned_corrupt_stream_gets_sentinel_xz(tmp_path):
    docs = [(i, f"first-xz {i} " * 4) for i in range(1, 9)]
    blob = bytearray(W.build_warc_xz("f.warc.xz", docs))
    members = list(W.xz_members_at(bytes(blob)))
    off, ln, _ = members[len(members) // 2]
    blob[off + 20] ^= 0xFF
    p = os.path.join(str(tmp_path), "f.warc.xz")
    with open(p, "wb") as f:
        f.write(bytes(blob))
    with open(p, "rb") as f:
        spans = list(
            W._scan_range_members_xz(f, off, len(blob), len(blob))
        )
    sentinels = [(o, l) for o, l, b in spans if not b]
    assert sentinels and sentinels[0][0] == off


def test_coverage_gaps_audit(spark, tmp_path):
    """coverage_gaps: zero interior gaps on a clean crawl AND on a
    corrupt crawl whose loss is sentinel-accounted (records + error
    rows tile); a fabricated hole (delete one row) surfaces as
    exactly one gap with the right span."""
    docs = [(i, f"coverage test {i} " * 6) for i in range(24)]
    blob = W.build_warc_gz("cv.warc.gz", docs)
    bad = bytearray(blob)
    offs = [(o, l) for o, l, _ in W.gzip_members_at(blob)]
    o4, l4 = offs[4]
    bad[o4 + 8 : o4 + 14] = b"\x00" * 6
    for name, payload in (("clean.warc.gz", blob), ("bad.warc.gz", bytes(bad))):
        p = os.path.join(str(tmp_path), name)
        with open(p, "wb") as f:
            f.write(payload)
        recs = W.read_warc_sharded(spark, p, range_bytes=2048)
        assert W.coverage_gaps(recs).count() == 0, name
    # fabricate a hole: drop one mid-file record row entirely
    p = os.path.join(str(tmp_path), "clean.warc.gz")
    recs = W.read_warc_sharded(spark, p, range_bytes=2048)
    o6, l6 = offs[6]
    holed = recs.where(F.col("warc_offset") != o6)
    gaps = W.coverage_gaps(holed).collect()
    assert len(gaps) == 1
    assert gaps[0].gap_start == o6 and gaps[0].gap_len == l6
