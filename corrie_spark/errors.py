"""DLQ/poison error-kind taxonomy — one enum, emitted uniformly by
every ingestion reader (pdf/office/wds/avro/warc/wiki) next to its
free-text error reason.

Why an enum: at crawl scale the DLQ stream is the operational
dashboard — "how many documents failed, and WHY" has to be a groupBy
on a closed vocabulary, not a regex over ten readers' message styles.
The classifier is deterministic substring rules over THIS repo's own
error messages (each reader's messages are part of its tested
contract), so the mapping is stable and the DuckDB oracles can state
expected kinds closed-form per fixture corruption rule.

Kinds:
  encrypted         password-protected / undecryptable-by-design
  truncated         container or stream ends mid-structure (EOF class)
  unsupported-codec known-but-undecodable coding (br, snappy,
                    JPXDecode, zip method N, AES-256, fourcc)
  bad-framing       record/member/block-level corruption inside a
                    structurally-located container (CRC/size/sync
                    mismatches, chunked-framing garbage, bad deflate)
  bad-container     container-level structure invalid (bad magic, no
                    catalog, unparseable metadata) — the fallback
"""

from __future__ import annotations

ERROR_KINDS = (
    "encrypted",
    "truncated",
    "bad-container",
    "unsupported-codec",
    "bad-framing",
)

_CODEC_HINTS = ("method", "codec", "filter", "cfm", "coding", "compression", "fourcc")
_FRAMING_HINTS = (
    "framing",
    "chunk",
    "sync mismatch",
    "bad block",
    "varint",
    "crc mismatch",
    "checksum mismatch",
    "size mismatch",
    "bad deflate",
    "http-body",
    "trailing bytes",
    "bad map",
)


def classify_error(reason: str | None) -> str | None:
    """Free-text reader error reason -> ERROR_KINDS member (None in ->
    None out, so good rows carry a null kind). Total function: any
    unrecognized reason is 'bad-container', never an exception."""
    if not reason:
        return None
    r = reason.lower()
    if "encrypted" in r or "password" in r:
        return "encrypted"
    if "unsupported" in r and any(h in r for h in _CODEC_HINTS):
        return "unsupported-codec"
    # WARC splitter reasons (gzip / zstd / plain containers): a tail
    # that never became a member is a truncation; a resynced mid-file
    # span is member-level framing
    if "gzip-tail" in r or "zstd-tail" in r or "xz-tail" in r or "warc-tail" in r:
        return "truncated"
    if "x-error/gzip" in r or "x-error/zstd" in r or "x-error/xz" in r:
        return "bad-framing"
    if "truncat" in r or "incomplete" in r:
        return "truncated"
    if any(h in r for h in _FRAMING_HINTS):
        return "bad-framing"
    return "bad-container"
