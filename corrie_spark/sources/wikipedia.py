"""MediaWiki XML dump ingestion (the `pages-articles-multistream
.xml.bz2` layout Wikipedia publishes) — the single most-used public
corpus in LLM training mixes, and a textbook offset-shardable
container: the dump is a CONCATENATION of bz2 streams (stream 0 =
the <mediawiki> header + <siteinfo>, then ~100 whole <page> elements
per stream), with a companion index of `offset:page_id:title` lines
so a reader can seek straight to a stream.

Implemented here from the public layouts (stdlib bz2; no mwxml/
mwparserfromhell in this environment):
  - `bz2_streams_at`: split concatenated bz2 streams with byte
    offsets, resyncing past corrupt streams on the BZh magic — the
    bzip2 twin of warc.gzip_members_at, same total-function stance;
  - `parse_pages`: <page> scan (title / ns / id / revision
    timestamp / text, XML entities unescaped), #REDIRECT detection
    with target extraction;
  - `wikitext_to_text`: a pure-JVM regex strip chain (refs,
    templates innermost-first, tables, piped/plain wikilinks,
    external links, bold/italic quotes, headings kept as text,
    entity decode, whitespace collapse) in the Java/RE2 common
    subset — the crawl-chain idiom of operators/web.html_to_text;
  - `build_dump` / `wiki_fixture_text`: oracle-twin fixture builders
    (multistream layout + the index lines, invertible decorations);
  - `wiki_pages` (binaryFile frame -> typed page rows) and
    `scan_dump_range` (offset-sharded range reader: stream ownership
    by start offset, magic resync, straddling stream finished by
    tail reads).
"""

from __future__ import annotations

import bz2
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BZ2_MAGIC = b"BZh"
# full stream magic: BZh + level digit '1'-'9' + pi (block magic)
_PI = b"\x31\x41\x59\x26\x53\x59"


class WikiError(ValueError):
    pass


# ---------------------------------------------------------------------------
# multistream bz2 layer
# ---------------------------------------------------------------------------


def _is_stream_start(data: bytes, pos: int) -> bool:
    return (
        data[pos : pos + 3] == BZ2_MAGIC
        and pos + 4 <= len(data)
        and 0x31 <= data[pos + 3] <= 0x39
        and data[pos + 4 : pos + 10] == _PI
    )


def bz2_streams_at(data: bytes, base: int = 0) -> Iterator[tuple[int, int, bytes]]:
    """Split concatenated bz2 streams, yielding (absolute_offset,
    compressed_length, decompressed_bytes). Corrupt/truncated streams
    cannot raise out of the generator: on error the scan resyncs to
    the next full stream magic — one bad stream costs its own bytes
    (callers see the gap through consecutive offsets)."""
    pos = 0
    n = len(data)
    mv = memoryview(data)
    while pos < n:
        d = bz2.BZ2Decompressor()
        try:
            out = d.decompress(mv[pos:])
            if not d.eof:
                raise OSError("truncated bz2 stream")
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                return
        except OSError:
            nxt = data.find(BZ2_MAGIC, pos + 1)
            while nxt >= 0 and not _is_stream_start(data, nxt):
                nxt = data.find(BZ2_MAGIC, nxt + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield base + pos, consumed, out
        pos += consumed


# ---------------------------------------------------------------------------
# page XML layer
# ---------------------------------------------------------------------------

_XML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST, so &amp;lt; -> &lt; stays literal
]


def xml_escape(s: str) -> str:
    s = s.replace("&", "&amp;")
    for ent, raw in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
        s = s.replace(raw, ent)
    return s


def _xml_unescape(s: str) -> str:
    for ent, raw in _XML_ENTITIES:
        s = s.replace(ent, raw)
    return s


def _tag_body(xml: str, tag: str, start: int, end: int) -> str | None:
    """First <tag ...>body</tag> inside xml[start:end]; None if absent.
    Handles attribute-carrying open tags (<text bytes="..." xml:space=...>)."""
    open_plain = xml.find(f"<{tag}>", start, end)
    open_attr = xml.find(f"<{tag} ", start, end)
    if open_plain < 0 and open_attr < 0:
        return None
    i = open_plain if (open_attr < 0 or (0 <= open_plain < open_attr)) else open_attr
    gt = xml.find(">", i, end)
    if gt < 0:
        return None
    if xml[gt - 1] == "/":  # self-closing (<text ... />): empty body
        return ""
    close = xml.find(f"</{tag}>", gt + 1, end)
    if close < 0:
        return None
    return xml[gt + 1 : close]


def parse_pages(xml: str) -> list[dict]:
    """Scan every <page> element: title, ns, page id, latest revision
    timestamp and wikitext (entities unescaped), redirect flag +
    target. Malformed pages are skipped (total function) — the dump
    convention is one <page> per line group, already well-formed."""
    out = []
    pos = 0
    while True:
        s = xml.find("<page>", pos)
        if s < 0:
            return out
        e = xml.find("</page>", s)
        if e < 0:
            return out
        pos = e + 7
        title = _tag_body(xml, "title", s, e)
        pid = _tag_body(xml, "id", s, e)  # first <id> in page scope
        ns = _tag_body(xml, "ns", s, e)
        ts = _tag_body(xml, "timestamp", s, e)
        text = _tag_body(xml, "text", s, e)
        if title is None or pid is None:
            continue
        wikitext = _xml_unescape(text or "")
        redirect = wikitext.lstrip()[:9].upper().startswith("#REDIRECT")
        target = None
        if redirect:
            i = wikitext.find("[[")
            j = wikitext.find("]]", i + 2)
            if i >= 0 and j > i:
                target = wikitext[i + 2 : j].split("|")[0]
        out.append(
            {
                "page_id": int(pid),
                "title": _xml_unescape(title),
                "ns": int(ns) if ns is not None else 0,
                "timestamp": ts,
                "wikitext": wikitext,
                "is_redirect": redirect,
                "redirect_target": target,
            }
        )


# ---------------------------------------------------------------------------
# wikitext -> text (pure-JVM regex chain, html_to_text idiom)
# ---------------------------------------------------------------------------

# order matters; every pattern stays in the Java/RE2 common subset
WIKITEXT_STEPS: list[tuple[str, str]] = [
    (r"(?is)<ref[^>/]*>.*?</ref>", " "),  # reference bodies
    (r"(?i)<ref[^>]*/>", " "),  # self-closing refs
    (r"(?s)\{\|.*?\|\}", " "),  # tables
    # templates, innermost-first: three passes cover nesting depth 3
    (r"(?s)\{\{[^{}]*\}\}", " "),
    (r"(?s)\{\{[^{}]*\}\}", " "),
    (r"(?s)\{\{[^{}]*\}\}", " "),
    (r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]", "$1"),  # piped wikilink -> label
    (r"\[\[([^\[\]]*)\]\]", "$1"),  # plain wikilink -> target
    (r"\[https?://[^ \]]+ ([^\]]*)\]", "$1"),  # ext link w/ label
    (r"\[https?://[^ \]]+\]", " "),  # bare ext link
    (r"'''''|'''|''", ""),  # bold/italic quotes
    (r"(?m)^=+ *([^=\n]*?) *=+ *$", "$1"),  # headings keep their text
]


def wikitext_to_text(c: Column | str) -> Column:
    """Strip wikitext markup, decode the common XML entities, collapse
    whitespace — deterministic, total (markup soup degrades to extra
    whitespace, never an exception). Row-local projection: free rider
    on the ingest scan at any scale."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, rep in WIKITEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, rep in _XML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# ---------------------------------------------------------------------------
# fixture builders (oracle twins)
# ---------------------------------------------------------------------------


def wiki_fixture_text(doc_id: int, text: str) -> str:
    """Wikitext whose strip is closed-form: heading + every token
    under a rotating decoration whose strip is EXACTLY the token,
    plus removable noise (template, ref, table, bare ext link) and a
    trailing entity-escaped token so the unescape path is live.
    Clean form (the oracle's statement):
        'Section {id} ' + tokens joined by ' ' + ' x<y&z'."""
    toks = [t for t in text.split(" ") if t]
    deco = []
    for j, t in enumerate(toks):
        m = (doc_id + j) % 5
        if m == 0:
            deco.append(f"[[{t}]]")
        elif m == 1:
            deco.append(f"[[Target page|{t}]]")
        elif m == 2:
            deco.append(f"'''{t}'''")
        elif m == 3:
            deco.append(f"[https://ex.org/{doc_id}/{j} {t}]")
        else:
            deco.append(f"''{t}''")
    noise_tpl = (
        f"{{{{outer|{{{{inner {doc_id}}}}}}}}}" if doc_id % 9 == 0
        else f"{{{{cite web|id={doc_id}}}}}"
    )
    body = (
        f"== Section {doc_id} ==\n"
        + noise_tpl
        + "<ref name=\"a\">cited stuff</ref>\n"
        + " ".join(deco)
        + "\n{|\n| table junk\n|}\n"
        + f"[https://ex.org/bare/{doc_id}]\n"
        + "x&lt;y&amp;z"
    )
    return body


def page_xml(page_id: int, title: str, wikitext: str, ns: int = 0) -> str:
    ts = f"2026-01-{(page_id % 28) + 1:02d}T00:00:00Z"
    return (
        "  <page>\n"
        f"    <title>{xml_escape(title)}</title>\n"
        f"    <ns>{ns}</ns>\n"
        f"    <id>{page_id}</id>\n"
        "    <revision>\n"
        f"      <id>{page_id * 10 + 1}</id>\n"
        f"      <timestamp>{ts}</timestamp>\n"
        f"      <text bytes=\"{len(wikitext)}\" xml:space=\"preserve\">"
        f"{xml_escape(wikitext)}</text>\n"
        "    </revision>\n"
        "  </page>\n"
    )


def build_dump(
    pages: list[tuple[int, str, str]], pages_per_stream: int = 2
) -> tuple[bytes, list[str]]:
    """Multistream dump bytes + the companion index lines
    (`offset:page_id:title`, the real dumps' format). pages =
    [(page_id, title, wikitext)]. Stream 0 carries the header +
    siteinfo; page streams follow; a final stream closes the root."""
    header = (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" '
        'version="0.11" xml:lang="en">\n'
        "  <siteinfo>\n    <sitename>Fixturepedia</sitename>\n"
        "    <dbname>fixwiki</dbname>\n  </siteinfo>\n"
    )
    chunks = [bz2.compress(header.encode(), 1)]
    index: list[str] = []
    offset = len(chunks[0])
    for i in range(0, len(pages), pages_per_stream):
        group = pages[i : i + pages_per_stream]
        blob = bz2.compress(
            "".join(page_xml(pid, t, wt) for pid, t, wt in group).encode(), 1
        )
        for pid, t, _ in group:
            index.append(f"{offset}:{pid}:{t}")
        chunks.append(blob)
        offset += len(blob)
    chunks.append(bz2.compress(b"</mediawiki>\n", 1))
    return b"".join(chunks), index


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------

WIKI_PAGE_DDL = (
    "path string, stream_offset long, page_id long, title string, "
    "ns long, timestamp string, wikitext string, is_redirect boolean, "
    "redirect_target string, error_kind string"
)


def wiki_pages(
    files_df: DataFrame, file_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(path, multistream-bz2 bytes) -> one row per <page>, carrying
    the owning stream's byte offset (the index locator — a range
    request of that stream replays the page). One Arrow stage; dump
    bytes never shuffle.

    DLQ parity with warc_records: byte spans the stream walk skipped
    (corrupt bz2 streams, a tail that never completed) emit one
    marker row each — null page_id, `error_kind` set ('bad-framing'
    for a mid-file resync, 'truncated' for the tail) — so data loss
    is observable downstream, never silent."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf[file_col], pdf[content_col]):
                data = bytes(content)
                expect = 0
                for off, clen, blob in bz2_streams_at(data):
                    if off > expect:
                        out.append(
                            {
                                "path": path,
                                "stream_offset": expect,
                                "error_kind": "bad-framing",
                            }
                        )
                    expect = off + clen
                    for p in parse_pages(blob.decode("utf-8", errors="replace")):
                        p["path"] = path
                        p["stream_offset"] = off
                        p["error_kind"] = None
                        out.append(p)
                if expect < len(data) and data[expect:].strip(b"\x00"):
                    out.append(
                        {
                            "path": path,
                            "stream_offset": expect,
                            "error_kind": "truncated",
                        }
                    )
            yield pd.DataFrame(
                {
                    "path": [r["path"] for r in out],
                    "stream_offset": pd.array(
                        [r["stream_offset"] for r in out], dtype="Int64"
                    ),
                    "page_id": pd.array(
                        [r.get("page_id") for r in out], dtype="Int64"
                    ),
                    "title": [r.get("title") for r in out],
                    "ns": pd.array([r.get("ns") for r in out], dtype="Int64"),
                    "timestamp": [r.get("timestamp") for r in out],
                    "wikitext": [r.get("wikitext") for r in out],
                    "is_redirect": [r.get("is_redirect") for r in out],
                    "redirect_target": [r.get("redirect_target") for r in out],
                    "error_kind": [r["error_kind"] for r in out],
                }
            )

    return files_df.select(file_col, content_col).mapInPandas(run, WIKI_PAGE_DDL)


def scan_dump_range(path: str, start: int, length: int) -> list[dict]:
    """Offset-sharded dump read: streams whose START offset lies in
    [start, start+length), resynced to the first stream magic at or
    after `start`, the straddling final stream finished by tail
    reads. Mirrors avro.scan_avro_range (ownership by start offset,
    so consecutive ranges partition the file exactly)."""
    import os

    file_end = os.path.getsize(path)
    hi = min(start + length, file_end)
    if start >= hi:
        return []
    CHUNK = 1 << 20
    with open(path, "rb") as f:
        f.seek(start)
        buf = bytearray(f.read(min(file_end, hi + CHUNK) - start))

        # resync to the first stream starting in-range
        pos = 0
        data = bytes(buf)
        if start > 0 and not _is_stream_start(data, 0):
            nxt = data.find(BZ2_MAGIC)
            while nxt >= 0 and not _is_stream_start(data, nxt):
                nxt = data.find(BZ2_MAGIC, nxt + 1)
            if nxt < 0 or start + nxt >= hi:
                return []
            pos = nxt
        out = []
        while start + pos < hi:
            # feed the decompressor fixed-size slices instead of one
            # whole-tail copy: the naive `decompress(buf[pos:])` is
            # O(n_streams × range_bytes) memcpy (~16 GB of copying for
            # a 128 MiB range of ~1 MiB streams); chunk feeding is
            # O(range_bytes) total, and a straddling final stream
            # grows the buffer one chunk at a time — only as far as
            # that stream actually needs, never to end-of-file.
            d = bz2.BZ2Decompressor()
            parts = []
            fed = pos
            try:
                while not d.eof:
                    if fed >= len(buf):
                        if start + len(buf) >= file_end:
                            break  # truncated file
                        f.seek(start + len(buf))
                        chunk = f.read(CHUNK)
                        if not chunk:
                            break
                        buf.extend(chunk)
                    feed_end = min(fed + CHUNK, len(buf))
                    parts.append(d.decompress(bytes(buf[fed:feed_end])))
                    fed = feed_end
                if not d.eof:
                    break  # truncated file
                consumed = (fed - pos) - len(d.unused_data)
                if consumed <= 0:
                    break
                blob = b"".join(parts)
            except OSError:
                data = bytes(buf)
                nxt = data.find(BZ2_MAGIC, pos + 1)
                while nxt >= 0 and not _is_stream_start(data, nxt):
                    nxt = data.find(BZ2_MAGIC, nxt + 1)
                if nxt < 0 or start + nxt >= hi:
                    break
                pos = nxt
                continue
            for p in parse_pages(blob.decode("utf-8", errors="replace")):
                p["path"] = path
                p["stream_offset"] = start + pos
                out.append(p)
            pos += consumed
        return out
