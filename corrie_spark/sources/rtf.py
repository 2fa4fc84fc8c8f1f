"""RTF text extraction (the RTF 1.9 control-word grammar, from spec).

Legacy .rtf documents are still a steady fraction of crawl-borne
office files. The format is a plain-text stream of groups `{...}` and
control words `\\word[param]`; extraction is a small state machine —
no container layer. Routed through sources/ooxml.office_records (an
RTF payload is sniffed by its `{\\rtf` magic), so the office ingest
front door covers it with the same DLQ stance.

Subset and its seams:
  - destinations that never carry body text are skipped by group
    (fonttbl/colortbl/stylesheet/info/pict/field instructions), as is
    every `{\\*` starred destination — the spec's own rule for
    readers that don't understand an extension.
  - `\\'hh` hex escapes decode as cp1252 (the \\ansi default);
    per-document codepages (\\ansicpgN) map onto the matching python
    codec when available.
  - `\\uN` unicode escapes emit chr(N mod 65536) and skip the current
    \\uc fallback-byte count, tracked per group per spec.
"""

from __future__ import annotations

import re

# control words whose GROUP is a non-text destination
_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "annotation", "fldinst",
    "themedata", "colorschememapping", "datastore", "generator",
    "xmlnstbl", "listtable", "listoverridetable", "revtbl",
}

_CW_RE = re.compile(rb"\\([a-zA-Z]+)(-?[0-9]+)? ?|\\([^a-zA-Z])")


class RtfError(ValueError):
    """Malformed RTF (caught at the row boundary)."""


def rtf_text(data: bytes) -> str:
    """RTF bytes -> text: paragraphs/rows to \\n, cells/tabs to \\t,
    skip-destinations dropped, \\'hh + \\uN escapes decoded."""
    if not data.startswith(b"{\\rtf"):
        raise RtfError("not an RTF document")
    out: list[str] = []
    # group state: (skipping, uc_count); values inherit on push
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    codec = "cp1252"
    pending_skip = 0  # \uN fallback bytes still to swallow
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        if pending_skip and c not in (0x7B, 0x7D, 0x5C):  # { } backslash
            pending_skip -= 1
            pos += 1
            continue
        if c == 0x7B:  # {
            stack.append((skipping, uc))
            pos += 1
            # starred destination: the whole group is skippable unless
            # it's one a reader understands (we understand none of the
            # starred ones that carry text)
            if data[pos : pos + 2] == b"\\*":
                skipping = True
            continue
        if c == 0x7D:  # }
            if stack:
                skipping, uc = stack.pop()
            pos += 1
            continue
        if c == 0x5C:  # backslash
            m = _CW_RE.match(data, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3)
                if not skipping:
                    if sym in (b"\\", b"{", b"}"):
                        out.append(sym.decode("ascii"))
                    elif sym == b"'":
                        hx = data[pos : pos + 2]
                        pos += 2
                        if pending_skip:
                            pending_skip -= 1
                        elif not skipping:
                            try:
                                out.append(
                                    bytes.fromhex(hx.decode("ascii")).decode(
                                        codec, "replace"
                                    )
                                )
                            except ValueError:
                                pass
                    elif sym == b"~":
                        out.append("\u00a0")
                    elif sym == b"-":
                        pass  # optional hyphen: no text
                    elif sym == b"_":
                        out.append("\u2011")
                elif sym == b"'":
                    pos += 2  # consume the hex digits even when skipping
                continue
            word = m.group(1).decode("ascii")
            param = m.group(2)
            if word in _SKIP_DESTINATIONS:
                skipping = True
            elif word == "uc":
                uc = int(param or b"1")
            elif word == "u":
                cp = int(param or b"0") % 65536
                if not skipping:
                    out.append(chr(cp))
                pending_skip = uc
            elif word == "ansicpg":
                try:
                    cp = int(param or b"1252")
                    "".encode(f"cp{cp}")  # probe codec availability
                    codec = f"cp{cp}"
                except (LookupError, ValueError):
                    pass
            elif not skipping:
                if word in ("par", "row", "line", "sect", "page"):
                    out.append("\n")
                elif word in ("tab", "cell"):
                    out.append("\t")
                elif word == "emdash":
                    out.append("—")
                elif word == "endash":
                    out.append("–")
                elif word in ("lquote", "rquote"):
                    out.append("‘" if word == "lquote" else "’")
                elif word in ("ldblquote", "rdblquote"):
                    out.append("“" if word == "ldblquote" else "”")
            continue
        if c in (0x0D, 0x0A):  # raw CR/LF are NOT text in RTF
            pos += 1
            continue
        start = pos
        while pos < n and data[pos] not in (0x7B, 0x7D, 0x5C, 0x0D, 0x0A):
            pos += 1
        if not skipping:
            span = data[start:pos]
            if pending_skip:
                drop = min(pending_skip, len(span))
                span = span[drop:]
                pending_skip -= drop
            if span:
                out.append(span.decode(codec, "replace"))
    text = "".join(out)
    # normalize: strip blank lines introduced by structural \par runs
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def build_rtf(doc_id: int, text: str) -> bytes:
    """Deterministic fixture: one paragraph per fixture line (the
    shared 8-word rule), wrapped in a real header (font/color tables
    and a starred generator group — all skip-destinations). Escape
    coverage that PRESERVES the extracted text: the first character of
    every third line rides a \\uN escape with a '?' fallback byte, so
    unicode decode + \\uc fallback skipping are live while one
    closed-form CTE still gates the whole family (lines joined by
    newlines, same as docx)."""
    from corrie_spark.sources.pdf import fixture_lines

    body = []
    for i, ln in enumerate(fixture_lines(text)):
        esc = ln.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}")
        if (doc_id + i) % 3 == 0 and esc and ord(esc[0]) < 128:
            esc = f"\\u{ord(esc[0])}?" + esc[1:]
        body.append(esc + "\\par\n")
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\*\\generator corrie-spark-fixture;}"
        "\\f0\\fs20 " + "".join(body) + "}"
    )
    return doc.encode("cp1252", "replace")
