"""CLI surface: parser + registry listing (no Spark needed)."""

from __future__ import annotations

import pytest


def test_list_prints_all_queries(capsys):
    from corrie_spark.__main__ import main
    from corrie_spark.queries.registry import all_queries

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(all_queries())
    assert all(line.startswith("* ") or line.startswith("  ") for line in out)


def test_unknown_query_exits_2(capsys):
    from corrie_spark.__main__ import main

    assert main(["run", "q_definitely_not_a_query"]) == 2


def test_parser_rejects_missing_command():
    from corrie_spark.__main__ import _build_parser

    with pytest.raises(SystemExit):
        _build_parser().parse_args([])


def test_parser_accepts_round5_subcommands():
    from corrie_spark.__main__ import _build_parser

    p = _build_parser()
    a = p.parse_args(["explain", "q1_pricing_summary", "--sf-dir", "/d"])
    assert (a.cmd, a.name) == ("explain", "q1_pricing_summary")
    a = p.parse_args(["index", "--out", "/o", "--ivf"])
    assert (a.cmd, a.ivf) == ("index", True)
    a = p.parse_args(["build", "--out", "/o", "--staged", "--shard-budget", "123"])
    assert (a.cmd, a.staged, a.shard_budget) == ("build", True, 123)


def test_cli_ingest_warc(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.operators.web import fixture_page
    from corrie_spark.sources import warc as W

    docs = [(i, fixture_page(i, f"cli body {i}")) for i in range(6)]
    (tmp_path / "c.warc.gz").write_bytes(
        W.build_warc_gz("c.warc.gz", docs, with_dups=False)
    )
    out = str(tmp_path / "docs")
    rc = cli_main(
        ["ingest-warc", str(tmp_path / "c.warc.gz"), "--out", out, "--html"]
    )
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 6 and info["distinct_texts"] == 6
    rows = {r.text for r in spark.read.parquet(out).collect()}
    # HTML stripped: the page chrome is gone, the body text survives
    assert any("cli body 3" in t for t in rows)
    assert not any("<html>" in t for t in rows)


def test_cli_ingest_wet(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import warc as W

    docs = [(i, f"wet text {i}") for i in range(5)]
    (tmp_path / "c.warc.wet.gz").write_bytes(W.build_wet_gz("c.warc.wet.gz", docs))
    out = str(tmp_path / "docs")
    rc = cli_main(["ingest-warc", str(tmp_path / "c.warc.wet.gz"), "--out", out, "--wet"])
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 5


def test_cli_ingest_warc_sharded_with_cdx(spark, tmp_path, capsys):
    import json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import warc as W

    docs = [(i, f"cli doc {i} words here") for i in range(10)]
    with open(tmp_path / "c.warc.gz", "wb") as f:
        f.write(W.build_warc_gz("c.warc.gz", docs))
    out = str(tmp_path / "docs")
    cdx = str(tmp_path / "cdx")
    rc = cli_main(
        [
            "ingest-warc", str(tmp_path / "c.warc.gz"),
            "--out", out, "--sharded", "--cdx", cdx,
        ]
    )
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 10 docs + doc 0's DUP_MOD re-fetch = 11 response records
    assert got["documents"] == 11
    assert got["distinct_texts"] == 10  # the re-fetch is an exact dup
    assert got["cdx_rows"] == 11  # one capture row per response


def test_cli_ingest_pdf(spark, tmp_path, capsys):
    import json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import pdf as P

    for i in range(3):
        with open(tmp_path / f"d{i}.pdf", "wb") as f:
            f.write(P.build_pdf(i, f"pdf doc {i} " + "tok " * 30))
    with open(tmp_path / "bad.pdf", "wb") as f:
        f.write(b"not a pdf")
    out = str(tmp_path / "docs")
    err = str(tmp_path / "dlq")
    rc = cli_main(
        ["ingest-pdf", str(tmp_path / "*.pdf"), "--out", out, "--errors", err]
    )
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["documents"] >= 3 and got["errors"] == 1


def test_cli_ingest_office(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import ooxml as O

    from corrie_spark.sources.doc import build_doc
    from corrie_spark.sources.rtf import build_rtf

    (tmp_path / "a.docx").write_bytes(O.build_docx(1, "w1 w2 w3 w4"))
    (tmp_path / "b.epub").write_bytes(O.build_epub(2, "epub words here"))
    (tmp_path / "c.rtf").write_bytes(build_rtf(3, "rtf body words"))
    (tmp_path / "d.doc").write_bytes(build_doc(4, "legacy body words"))
    (tmp_path / "bad.docx").write_bytes(b"junk")
    out = str(tmp_path / "docs")
    errs = str(tmp_path / "dlq")
    rc = cli_main(
        [
            "ingest-office",
            str(tmp_path / "*.docx") if False else str(tmp_path) + "/*.*",
            "--out", out, "--errors", errs,
        ]
    )
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 4 and info["errors"] == 1
    texts = {r.text for r in spark.read.parquet(out).collect()}
    assert "w1 w2 w3 w4" in texts
    assert "rtf body words" in texts and "legacy body words" in texts
    # the epub chapter went through the HTML strip (markup gone; the
    # literal '<tag>' from the entity-decode fixture is CONTENT)
    assert any(
        "epub words here" in t and "<html>" not in t and "<p>" not in t
        for t in texts
    )


def test_cli_wds_pack_and_extract(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main

    docs = spark.createDataFrame(
        [(i, f"u{i}", f"wds text {i}") for i in range(12)],
        "doc_id long, url string, text string",
    )
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)
    shards = str(tmp_path / "shards")
    rc = cli_main(["wds", src, "--out", shards, "--shards", "3"])
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["shards"] == 3 and info["samples"] == 12
    back = str(tmp_path / "docs_back")
    rc = cli_main(["wds", shards + "/*.tar", "--out", back, "--extract"])
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 12
    texts = {r.text for r in spark.read.parquet(back).collect()}
    assert texts == {f"wds text {i}" for i in range(12)}


def test_cli_ingest_avro(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import avro as A

    schema = _json.dumps(
        {
            "type": "record",
            "name": "T",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "c", "type": ["null", "string"]},
            ],
        }
    )
    recs = [
        {"k": i, "s": f"row {i}", "c": None if i % 3 == 0 else f"c{i}"}
        for i in range(30)
    ]
    for g in range(2):
        blob = A.encode_ocf(
            schema, recs[g * 15 : (g + 1) * 15],
            codec="deflate" if g else "null", name=f"f{g}", block_size=7,
        )
        (tmp_path / f"f{g}.avro").write_bytes(blob)
    # a corrupt block in a third file -> DLQ span, good rows survive
    blob = A.encode_ocf(schema, recs[:10], codec="null", name="f2", block_size=5)
    sync = blob[-16:]
    bad = bytearray(blob)
    bad[blob.find(sync, blob.find(sync) + 1) + 18] ^= 0xFF
    (tmp_path / "f2.avro").write_bytes(bytes(bad))

    out = str(tmp_path / "rows")
    errs = str(tmp_path / "dlq")
    for extra in ([], ["--sharded"]):
        rc = cli_main(
            ["ingest-avro", str(tmp_path) + "/*.avro", "--out", out,
             "--errors", errs, *extra]
        )
        assert rc == 0
        info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["rows"] == 30 + 5 and info["errors"] == 1, extra
        got = spark.read.parquet(out)
        assert got.where("c IS NULL").count() == 10 + 2
        assert {r.s for r in got.where("k = 7").collect()} == {"row 7"}


def test_cli_ingest_wiki(spark, tmp_path, capsys):
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import wikipedia as Wk

    pages = []
    for i in range(1, 13):
        wt = (
            f"#REDIRECT [[Page {i + 1}]]"
            if i % 5 == 0
            else Wk.wiki_fixture_text(i, f"tok{i} common")
        )
        pages.append((i, f"Page {i}", wt))
    dump, _ = Wk.build_dump(pages, pages_per_stream=3)
    (tmp_path / "w.xml.bz2").write_bytes(dump)

    out = str(tmp_path / "docs")
    reds = str(tmp_path / "redirects")
    rc = cli_main(
        ["ingest-wiki", str(tmp_path) + "/*.xml.bz2", "--out", out,
         "--redirects", reds]
    )
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 10 and info["redirects"] == 2
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got[1] == "Section 1 tok1 common x<y&z"
    rmap = {r.page_id: r.redirect_target
            for r in spark.read.parquet(reds).collect()}
    assert rmap == {5: "Page 6", 10: "Page 11"}


def test_cli_ingest_warc_zst(spark, tmp_path, capsys):
    """ingest-warc needs NO zst flag: the reader dispatches on the
    container magic, so .warc.zst crawls (dictionary included) flow
    through the same CLI surface."""
    import json as _json

    from corrie_spark.__main__ import main as cli_main
    from corrie_spark.sources import warc as W

    docs = [(i, f"zst cli body {i}") for i in range(1, 8)]
    (tmp_path / "c.warc.zst").write_bytes(
        W.build_warc_zst("c.warc.zst", docs, with_dict=True)
    )
    out = str(tmp_path / "docs")
    rc = cli_main(["ingest-warc", str(tmp_path / "c.warc.zst"), "--out", out])
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["documents"] == 7 + sum(
        1 for i, _ in docs if i % W.DUP_MOD == 0
    )
    rows = {r.text for r in spark.read.parquet(out).collect()}
    assert "zst cli body 3" in rows
