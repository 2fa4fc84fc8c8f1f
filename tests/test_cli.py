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
