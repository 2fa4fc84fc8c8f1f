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
