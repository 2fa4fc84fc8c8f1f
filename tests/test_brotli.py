"""Brotli decoder (sources/brotli.py, RFC 7932): twin round trips,
fixed-table integrity, poison safety, and — when the reference
libbrotli is present — differential validation against the real
encoder across qualities 0..11, window sizes, and diverse corpora
(quality >= 5 exercises context modeling, the static dictionary and
the Appendix B transforms heavily).
"""

from __future__ import annotations

import ctypes
import hashlib
import json
import random

import pytest

from corrie_spark.sources.brotli import (
    BrotliError,
    decompress,
    encode_uncompressed,
)


def _load_ref():
    # libbrotlienc/dec need libbrotlicommon's symbols resolved first
    for base in ("", "/root/miniconda/lib/"):
        try:
            ctypes.CDLL(f"{base}libbrotlicommon.so", mode=ctypes.RTLD_GLOBAL)
            return ctypes.CDLL(f"{base}libbrotlienc.so")
        except OSError:
            continue
    return None


_ENC = _load_ref()
needs_ref = pytest.mark.skipif(_ENC is None, reason="no reference libbrotlienc")


def ref_compress(data: bytes, quality: int = 11, lgwin: int = 22) -> bytes:
    n = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    buf = ctypes.create_string_buffer(n.value)
    ok = _ENC.BrotliEncoderCompress(
        ctypes.c_int(quality), ctypes.c_int(lgwin), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data, ctypes.byref(n), buf,
    )
    assert ok
    return buf.raw[: n.value]


def _u(s: str, i: int) -> int:
    return int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# fixed spec data
# ---------------------------------------------------------------------------


def test_spec_data_integrity():
    """The Appendix A dictionary is SHA-256-pinned and has the known
    layout (words of length 4..24, 'time'/'down'/... at the head of
    the length-4 section); Appendix B is exactly 121 transforms with
    the documented identity head."""
    from corrie_spark.sources import brotli_data as D

    data = D.dictionary()
    assert len(data) == 122784
    off4 = D.OFFSETS_BY_LENGTH[4]
    assert data[off4 : off4 + 12] == b"timedownlife"
    assert len(D.TRANSFORMS) == 121
    assert D.TRANSFORMS[0] == (b"", 0, b"")  # Identity
    assert D.TRANSFORMS[1] == (b"", 0, b" ")  # Identity + space
    assert len(D.context_lut()) == 2048
    # LSB6 mode's lut0 is the identity & 0x3f
    assert list(D.context_lut()[:64]) == list(range(64))


def test_transforms():
    from corrie_spark.sources.brotli import _transform_word

    assert _transform_word(b"hello", 0) == b"hello"
    assert _transform_word(b"hello", 1) == b"hello "
    # kind 10 = UppercaseFirst, kind 11 = UppercaseAll (via ids 9/44
    # per the extracted Appendix B table)
    from corrie_spark.sources.brotli_data import TRANSFORMS

    up_first = next(i for i, t in enumerate(TRANSFORMS) if t == (b"", 10, b""))
    up_all = next(i for i, t in enumerate(TRANSFORMS) if t == (b"", 11, b""))
    assert _transform_word(b"hello", up_first) == b"Hello"
    assert _transform_word(b"hello", up_all) == b"HELLO"


# ---------------------------------------------------------------------------
# writer twin
# ---------------------------------------------------------------------------


def test_twin_roundtrip():
    for data in (b"", b"x", b"hello " * 100, bytes(range(256)) * 400):
        assert decompress(encode_uncompressed(data)) == data


def test_poison_streams_raise():
    good = encode_uncompressed(b"hello brotli world")
    with pytest.raises(BrotliError):
        decompress(good[:3])
    with pytest.raises(BrotliError):
        decompress(b"")
    # nonzero padding in the final byte is a framing error when it
    # lands in the post-stream padding check
    rng = random.Random(5)
    for _ in range(200):  # mutation fuzz must never hang or crash
        bad = bytearray(good)
        for _ in range(rng.randrange(1, 4)):
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            decompress(bytes(bad), max_output=1 << 20)
        except BrotliError:
            pass


@needs_ref
def test_twin_decodes_with_reference():
    ctypes.CDLL(
        "/root/miniconda/lib/libbrotlicommon.so", mode=ctypes.RTLD_GLOBAL
    )
    dec = ctypes.CDLL("/root/miniconda/lib/libbrotlidec.so")
    for data in (b"", b"payload " * 5000, bytes(range(256)) * 300):
        f = encode_uncompressed(data)
        n = ctypes.c_size_t(len(data) + 64)
        buf = ctypes.create_string_buffer(n.value)
        r = dec.BrotliDecoderDecompress(
            ctypes.c_size_t(len(f)), f, ctypes.byref(n), buf
        )
        assert r == 1 and buf.raw[: n.value] == data


# ---------------------------------------------------------------------------
# differential validation vs the reference encoder
# ---------------------------------------------------------------------------


def _corpora() -> dict[str, bytes]:
    return {
        "text": (" ".join(f"w{_u('v', i) % 5000}" for i in range(20000))).encode(),
        "html": (
            b"<html><head><title>Test</title></head><body>"
            b"<p>The quick brown fox jumps over the lazy dog.</p></body></html>"
        ) * 400,
        "json": json.dumps(
            [{"id": i, "name": f"item-{i % 97}"} for i in range(4000)]
        ).encode(),
        "binary": bytes(_u("b", i // 16) >> (i % 16) & 0xFF for i in range(80000)),
        "random": hashlib.md5(b"r").digest() * 4000,
        "utf8": ("héllo wörld 中文测试 русский текст " * 2500).encode(),
    }


@needs_ref
@pytest.mark.parametrize("quality", [0, 1, 2, 5, 9, 10, 11])
def test_decode_real_brotli_streams(quality):
    for name, data in _corpora().items():
        c = ref_compress(data, quality)
        assert decompress(c) == data, (name, quality)


@needs_ref
def test_decode_window_sizes():
    data = (b"the quick brown fox jumps over " * 20000)
    for lgwin in (10, 16, 22, 24):
        assert decompress(ref_compress(data, 9, lgwin)) == data, lgwin


@needs_ref
def test_decode_fuzz_vs_reference():
    rng = random.Random(99)
    alphabets = [b"ab", b'abc012{}":, ', bytes(range(256)), b"the quick fox "]
    for _ in range(400):
        n = rng.randrange(0, 400)
        data = bytes(rng.choice(rng.choice(alphabets)) for _ in range(n))
        q = rng.randrange(12)
        assert decompress(ref_compress(data, q)) == data


# ---------------------------------------------------------------------------
# WARC integration
# ---------------------------------------------------------------------------


def test_content_encoding_br_body():
    from corrie_spark.sources import warc as W

    body = "página br ñ 中文 " * 50
    wire = encode_uncompressed(body.encode("utf-8"))
    out, applied, ok = W.decode_http_body({"content-encoding": "br"}, wire)
    assert ok and applied == ["br"] and out.decode("utf-8") == body
    with pytest.raises(W.HttpBodyError, match="br"):
        W.decode_http_body({"content-encoding": "br"}, wire[:4])


@needs_ref
def test_content_encoding_br_real_encoder_body():
    from corrie_spark.sources import warc as W

    body = ("<html><body>" + "real brotli page content. " * 200 + "</body></html>").encode()
    wire = ref_compress(body, 11)
    out, applied, ok = W.decode_http_body({"content-encoding": "br"}, wire)
    assert ok and out == body
