"""ustar/WebDataset reader units and the Spark sample path."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from corrie_spark.sources import tar_wds as T


def test_tar_roundtrip_with_longname_and_dirs():
    long = "shards/" + "x" * 130 + ".txt"
    entries = [("a.txt", b"hello"), (long, b"long body"), ("b/c.bin", b"\x00\xff")]
    got = dict(T.tar_members(T.tar_build(entries)))
    assert got == dict(entries)


def test_tar_writer_reads_under_stdlib_tarfile():
    blob = T.tar_build([("k/0001.txt", b"alpha beta")])
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert tf.extractfile("k/0001.txt").read() == b"alpha beta"


def test_tar_reader_reads_stdlib_pax_archive():
    """stdlib PAX_FORMAT uses 'x' extended headers for long paths —
    the path= override must be honored."""
    buf = io.BytesIO()
    long = "deep/" + "y" * 150 + ".txt"
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as w:
        for nm, b in [("s.txt", b"short"), (long, b"deep body")]:
            ti = tarfile.TarInfo(nm)
            ti.size = len(b)
            w.addfile(ti, io.BytesIO(b))
    got = dict(T.tar_members(buf.getvalue()))
    assert got == {"s.txt": b"short", long: b"deep body"}


def test_tar_checksum_corruption_raises():
    import pytest

    blob = bytearray(T.tar_build([("a.txt", b"hello")]))
    blob[0] ^= 0xFF  # corrupt the name -> checksum mismatch
    with pytest.raises(T.TarError):
        list(T.tar_members(bytes(blob)))


def test_wds_multidot_extension_groups_by_first_dot():
    blob = T.tar_build(
        [
            ("0001.txt", b"t"),
            ("0001.seg.png", b"segbytes"),
            ("0002.txt", b"u"),
        ]
    )
    ss = T.wds_samples(blob)
    assert [s["key"] for s in ss] == ["0001", "0002"]
    assert ss[0]["exts"] == ["txt", "seg.png"]
    assert ss[0]["payload"] == b"segbytes"


def test_wds_records_and_poison(spark):
    good = T.build_wds_shard([(1, "one text"), (2, "two words")], gz=False)
    goodgz = T.build_wds_shard([(3, "three things")], gz=True)
    df = spark.createDataFrame(
        [("a.tar", good), ("b.tar.gz", goodgz), ("junk.tar", b"not a tar " * 60)],
        "path string, content binary",
    )
    rows = T.wds_records(df).collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert {r.key for r in ok} == {"00000001", "00000002", "00000003"}
    assert all(r.n_parts == 3 for r in ok)
    assert len(bad) == 1 and bad[0].shard == "junk.tar"


def test_wds_to_documents(spark):
    shard = T.build_wds_shard([(5, "five tokens of text")])
    df = spark.createDataFrame([("s.tar", shard)], "path string, content binary")
    docs = T.wds_to_documents(T.wds_records(df)).collect()
    assert len(docs) == 1
    assert docs[0].text == "five tokens of text"
    assert docs[0].url == "s.tar#00000005"


def test_write_wds_roundtrip_and_determinism(spark, tmp_path):
    """The sink half: documents -> shards -> read back hash-equal;
    re-runs produce byte-identical shards (idempotent publish)."""
    import glob
    import hashlib
    import os

    docs = spark.createDataFrame(
        [(i, f"https://x/{i}", f"text body {i} " + "w " * (i % 5)) for i in range(40)],
        "doc_id long, url string, text string",
    )
    out = os.path.join(str(tmp_path), "shards")
    man = T.documents_to_wds(docs, out, n_shards=4).collect()
    assert len(man) == 4 and sum(r.n_samples for r in man) == 40
    # read back through the source half
    back = T.read_wds(spark, os.path.join(out, "*.tar"))
    got = {
        (int(r.key), r.txt) for r in back.where(F.col("error").isNull()).collect()
    }
    assert got == {(i, f"text body {i} " + "w " * (i % 5)) for i in range(40)}
    # json sidecar is parseable and carries the url
    one = back.where(F.col("key") == "000000000007").collect()[0]
    assert '"url":"https://x/7"' in one.json.replace(" ", "")
    # deterministic re-run: byte-identical files
    before = {
        p: hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "*.tar"))
    }
    T.documents_to_wds(docs, out, n_shards=4).collect()
    after = {
        p: hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(out, "*.tar"))
    }
    assert before == after


def test_write_wds_gz_deterministic(spark, tmp_path):
    import hashlib
    import os

    docs = spark.createDataFrame(
        [(1, "u", "alpha"), (2, "v", "beta")], "doc_id long, url string, text string"
    )
    out1 = os.path.join(str(tmp_path), "a")
    out2 = os.path.join(str(tmp_path), "b")
    m1 = T.documents_to_wds(docs, out1, n_shards=1, gz=True).collect()
    T.documents_to_wds(docs, out2, n_shards=1, gz=True).collect()
    p1 = m1[0].shard
    p2 = p1.replace("/a/", "/b/")
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
    assert h(p1) == h(p2)  # mtime=0 -> identical gzip bytes
    back = T.read_wds(spark, p2)
    assert back.where(F.col("error").isNull()).count() == 2
