"""Extract the RFC 7932 fixed data tables from the system's reference
brotli library (when present) into `corrie_spark/sources/brotli_data.py`.

The three tables are PUBLIC SPEC DATA — RFC 7932 Appendix A ("Static
Dictionary Data", 122,784 bytes), Appendix B ("List of Word
Transformations", 121 transforms) and §7.1 (the 2048-byte context
lookup table). The RFC publishes them in full; re-typing 125 KiB of
hex from the RFC text is error-prone, so this script reads the same
bytes out of the installed open-source reference implementation
(libbrotlicommon/libbrotlidec) and pins them with SHA-256 so the
repo's copy is verifiable against any other copy of the spec data.

    python tools/extract_brotli_tables.py   # writes brotli_data.py
"""

from __future__ import annotations

import base64
import ctypes
import ctypes.util
import hashlib
import os
import sys
import zlib

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "corrie_spark", "sources", "brotli_data.py",
)


def _load(name: str) -> ctypes.CDLL:
    for cand in (
        f"lib{name}.so",
        f"/root/miniconda/lib/lib{name}.so",
        ctypes.util.find_library(name) or "",
    ):
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    raise SystemExit(f"lib{name} not found — extraction needs the reference library")


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


def extract_dictionary(common: ctypes.CDLL) -> tuple[list[int], list[int], bytes]:
    common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = common.BrotliGetDictionary().contents
    data = bytes(
        ctypes.cast(
            d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)
        ).contents
    )
    return list(d.size_bits_by_length), list(d.offsets_by_length), data


class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ("prefix_suffix_size", ctypes.c_uint16),
        ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
        ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
        ("num_transforms", ctypes.c_uint32),
        ("transforms", ctypes.POINTER(ctypes.c_uint8)),
        ("params", ctypes.POINTER(ctypes.c_uint8)),
        ("cutOffTransforms", ctypes.c_int16 * 10),
    ]


def extract_transforms(common: ctypes.CDLL) -> list[tuple[bytes, int, bytes]]:
    """(prefix, elementary_transform_id, suffix) for each of the 121
    RFC transforms, in transform-id order."""
    common.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
    t = common.BrotliGetTransforms().contents
    ps = bytes(
        ctypes.cast(
            t.prefix_suffix, ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)
        ).contents
    )

    def chunk(idx: int) -> bytes:
        # prefix_suffix entries are LENGTH-PREFIXED: map[idx] points
        # at the length byte
        off = t.prefix_suffix_map[idx]
        return ps[off + 1 : off + 1 + ps[off]]

    out = []
    raw = ctypes.cast(
        t.transforms, ctypes.POINTER(ctypes.c_uint8 * (t.num_transforms * 3))
    ).contents
    for i in range(t.num_transforms):
        p_idx, kind, s_idx = raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]
        out.append((chunk(p_idx), kind, chunk(s_idx)))
    return out


def extract_context_lut(dec: ctypes.CDLL) -> bytes:
    return bytes(
        (ctypes.c_uint8 * 2048).in_dll(dec, "_kBrotliContextLookupTable")
    )


def main() -> int:
    common = _load("brotlicommon")
    dec = _load("brotlidec")
    size_bits, offsets, data = extract_dictionary(common)
    transforms = extract_transforms(common)
    lut = extract_context_lut(dec)

    assert len(data) == 122784, len(data)  # RFC 7932 Appendix A size
    assert len(transforms) == 121, len(transforms)  # Appendix B count
    assert len(lut) == 2048

    dict_b = base64.b85encode(zlib.compress(data, 9)).decode()
    lut_b = base64.b85encode(lut).decode()
    tr_repr = repr([(p, k, s) for p, k, s in transforms])

    def wrap(s: str, width: int = 76) -> str:
        return "\n".join(
            f'    "{s[i : i + width]}"' for i in range(0, len(s), width)
        )

    body = f'''"""RFC 7932 fixed data tables (PUBLIC SPEC DATA).

Contents: Appendix A static dictionary (122,784 bytes, zlib+base85),
Appendix B word transformations (121 entries), and the section 7.1
context lookup table (2,048 bytes). Extracted from the open-source
reference implementation by tools/extract_brotli_tables.py and pinned
by SHA-256 — the same bytes appear verbatim in the RFC text.

DICT_SHA256 = {hashlib.sha256(data).hexdigest()!r}
LUT_SHA256 = {hashlib.sha256(lut).hexdigest()!r}
"""

import base64
import zlib

SIZE_BITS_BY_LENGTH = {size_bits!r}

OFFSETS_BY_LENGTH = {offsets!r}

DICT_SHA256 = {hashlib.sha256(data).hexdigest()!r}

_DICT_B85 = (
{wrap(dict_b)}
)

TRANSFORMS = {tr_repr}

_LUT_B85 = (
{wrap(lut_b)}
)


def dictionary() -> bytes:
    data = zlib.decompress(base64.b85decode(_DICT_B85))
    import hashlib

    assert hashlib.sha256(data).hexdigest() == DICT_SHA256
    return data


def context_lut() -> bytes:
    return base64.b85decode(_LUT_B85)
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: dict {len(data)} B (sha256 {hashlib.sha256(data).hexdigest()[:16]}…), "
          f"{len(transforms)} transforms, LUT {len(lut)} B")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
