"""Wikipedia multistream dump source (sources/wikipedia.py): stream
split + resync, page parse (entities, redirects), the companion
index's seek contract, offset-sharded == whole-file, and the
wikitext strip chain against hand cases.
"""

from __future__ import annotations

import bz2
import os

from pyspark.sql import functions as F

from corrie_spark.sources import wikipedia as W


def _pages(n: int = 30) -> list[tuple[int, str, str]]:
    out = []
    for i in range(1, n + 1):
        wt = (
            f"#REDIRECT [[Page {i + 1}]]"
            if i % 11 == 0
            else W.wiki_fixture_text(i, f"alpha beta{i} gamma delta{i % 3}")
        )
        out.append((i, f"Page {i}", wt))
    return out


def test_multistream_parse_and_redirects():
    dump, index = W.build_dump(_pages(), pages_per_stream=3)
    got = []
    for _, _, blob in W.bz2_streams_at(dump):
        got.extend(W.parse_pages(blob.decode()))
    assert len(got) == 30 and len(index) == 30
    by_id = {p["page_id"]: p for p in got}
    assert by_id[11]["is_redirect"] and by_id[11]["redirect_target"] == "Page 12"
    assert not by_id[1]["is_redirect"]
    assert "== Section 1 ==" in by_id[1]["wikitext"]
    # the XML layer unescapes exactly once: the fixture's literal
    # "&lt;"-entities survive into the wikitext (their decode belongs
    # to the STRIP chain, exercised in test_wikitext_strip_hand_cases)
    assert "x&lt;y&amp;z" in by_id[1]["wikitext"]


def test_index_offsets_seek_to_their_stream(tmp_path):
    dump, index = W.build_dump(_pages(), pages_per_stream=3)
    p = str(tmp_path / "d.xml.bz2")
    with open(p, "wb") as f:
        f.write(dump)
    for line in index[::7]:
        off, pid, _title = line.split(":", 2)
        with open(p, "rb") as f:
            f.seek(int(off))
            blob = bz2.BZ2Decompressor().decompress(f.read())
        assert any(q["page_id"] == int(pid) for q in W.parse_pages(blob.decode()))


def test_sharded_equals_whole(tmp_path):
    dump, _ = W.build_dump(_pages(), pages_per_stream=3)
    p = str(tmp_path / "d.xml.bz2")
    with open(p, "wb") as f:
        f.write(dump)
    base = sorted(
        (q["page_id"], off)
        for off, _, blob in W.bz2_streams_at(dump)
        for q in W.parse_pages(blob.decode())
    )
    for rb in (50, 137, 999, 10**9):
        acc = []
        s = 0
        while s < len(dump):
            acc.extend(
                (q["page_id"], q["stream_offset"])
                for q in W.scan_dump_range(p, s, rb)
            )
            s += rb
        assert sorted(acc) == base, rb


def test_corrupt_stream_costs_its_own_pages():
    dump, _ = W.build_dump(_pages(), pages_per_stream=3)
    starts = [off for off, _, _ in W.bz2_streams_at(dump)]
    bad = bytearray(dump)
    bad[starts[2] + 30] ^= 0xFF
    kept = []
    for _, _, blob in W.bz2_streams_at(bytes(bad)):
        kept.extend(W.parse_pages(blob.decode()))
    assert 27 <= len(kept) < 30


def test_wikitext_strip_hand_cases(spark):
    cases = [
        ("[[plain link]]", "plain link"),
        ("[[Target|label text]]", "label text"),
        ("'''bold''' and ''italic''", "bold and italic"),
        ("{{infobox|a=1|b={{nested|x}}}} kept", "kept"),
        ("before<ref name=x>cite</ref> after", "before after"),
        ("a<ref group=\"n\"/>b", "a b"),
        ("== Heading ==\nbody", "Heading body"),
        ("{|\n|cell\n|}tail", "tail"),
        ("[https://e.x/y label here] and [https://e.x/z]", "label here and"),
        ("x&lt;y&amp;z", "x<y&z"),
    ]
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(cases)], "i long, wt string")
    got = {r.i: r.t for r in df.select("i", W.wikitext_to_text("wt").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_wiki_pages_spark_stage(spark):
    dump, _ = W.build_dump(_pages(12), pages_per_stream=2)
    df = spark.createDataFrame(
        [("w.xml.bz2", bytearray(dump))], "path string, content binary"
    )
    rows = W.wiki_pages(df)
    got = rows.collect()
    assert len(got) == 12
    reds = [r for r in got if r.is_redirect]
    assert [r.page_id for r in reds] == [11]
    # stream offsets: 2 pages per stream share an offset
    offs = {}
    for r in got:
        offs.setdefault(r.stream_offset, []).append(r.page_id)
    assert all(len(v) <= 2 for v in offs.values())
    # strip chain composes in-plan
    clean = rows.where(~F.col("is_redirect")).select(
        "page_id", W.wikitext_to_text(F.col("wikitext")).alias("t")
    )
    one = {r.page_id: r.t for r in clean.collect()}
    assert one[1] == "Section 1 alpha beta1 gamma delta1 x<y&z"

def test_large_straddling_stream_chunked_growth(tmp_path):
    """A multi-MiB stream owned by a tiny range: the decompressor is
    fed fixed-size slices and the tail buffer grows only as far as
    the straddling stream needs (the whole-tail-copy path was
    O(n_streams x range_bytes) memcpy on real dumps)."""
    import hashlib

    big = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(100_000)
    )
    pages = [(1, "Big", big), (2, "After", "tail page")]
    dump, index = W.build_dump(pages, pages_per_stream=1)
    p = str(tmp_path / "big.xml.bz2")
    with open(p, "wb") as f:
        f.write(dump)
    off1 = int(index[0].split(":")[0])
    # sanity: the stream really is bigger than the 1 MiB initial tail
    off2 = int(index[1].split(":")[0])
    assert off2 - off1 > (1 << 20) + 64
    rows = W.scan_dump_range(p, off1, 64)
    assert [r["page_id"] for r in rows] == [1]
    assert rows[0]["wikitext"] == big
