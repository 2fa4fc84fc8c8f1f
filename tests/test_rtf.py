"""RTF control-word state machine units (sources/rtf.py)."""

from __future__ import annotations

import pytest

from corrie_spark.sources import rtf as R


def test_basic_paragraphs_and_tabs():
    doc = b"{\\rtf1\\ansi first line\\par second\\tab col\\par}"
    assert R.rtf_text(doc) == "first line\nsecond\tcol"


def test_destinations_and_starred_groups_skipped():
    doc = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        b"{\\colortbl;\\red1\\green2\\blue3;}"
        b"{\\*\\generator Fancy Writer 9000;}"
        b"{\\info{\\title secret}}"
        b"visible\\par}"
    )
    assert R.rtf_text(doc) == "visible"


def test_hex_and_unicode_escapes():
    doc = b"{\\rtf1\\ansi caf\\'e9 \\u9731?snow \\u-3?neg\\par}"
    out = R.rtf_text(doc)
    assert out.startswith("café ☃snow ")
    # \u-3: negative params wrap mod 65536 per spec
    assert chr((-3) % 65536) in out


def test_uc_fallback_skipping():
    # \uc2 -> two fallback bytes after each \uN must be swallowed
    doc = b"{\\rtf1\\ansi\\uc2 \\u9731??after\\par}"
    assert R.rtf_text(doc) == "☃after"


def test_escaped_braces_and_backslash():
    doc = b"{\\rtf1\\ansi a\\{b\\}c\\\\d\\par}"
    assert R.rtf_text(doc) == "a{b}c\\d"


def test_ansicpg_codec_switch():
    # cp1251 (cyrillic): 0xE0 is U+0430
    doc = b"{\\rtf1\\ansi\\ansicpg1251 \\'e0\\par}"
    assert R.rtf_text(doc) == "а"


def test_not_rtf_raises():
    with pytest.raises(R.RtfError):
        R.rtf_text(b"plain text")


def test_office_records_routes_rtf(spark):
    from pyspark.sql import functions as F

    from corrie_spark.sources import ooxml as O

    df = spark.createDataFrame(
        [
            ("a.rtf", R.build_rtf(0, "w1 w2 w3 w4")),
            ("broken.rtf", b"{\\rtf1 truncated"),  # no closing: still parses
        ],
        "path string, content binary",
    )
    rows = {r.office_file: r for r in O.office_records(df).collect()}
    assert rows["a.rtf"].kind == "rtf"
    assert rows["a.rtf"].text == "w1 w2 w3 w4"
    # tolerant reader: an unterminated group degrades to best-effort
    # text, not an error (RTF has no framing to validate against)
    assert rows["broken.rtf"].error is None
    assert "truncated" in rows["broken.rtf"].text
