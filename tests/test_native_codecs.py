"""Native-codec dispatch (sources/native.py): the system libzstd /
libbrotlidec fast path must agree byte-exactly with the from-spec
pure-Python readers on EVERY fixture class — levels, dictionaries,
skippables, poison — including the exception-TYPE contract
(ZstdTruncated = grow, ZstdError = resync) the sharded range scanner
depends on. The pure readers are the continuously-running
differential twin; this file is where the twin runs.
"""

from __future__ import annotations

import ctypes
import hashlib
import shutil
import struct
import subprocess

import pytest

from corrie_spark.sources import native as N
from corrie_spark.sources import zstd as Z
from corrie_spark.sources.brotli import (
    BrotliError,
    decompress as brotli_decompress,
    decompress_py as brotli_decompress_py,
    encode_uncompressed,
)

ZSTD_CLI = shutil.which("zstd")
needs_zstd_native = pytest.mark.skipif(
    not N.zstd_enabled(), reason="libzstd not loadable"
)
needs_brotli_native = pytest.mark.skipif(
    not N.brotli_enabled(), reason="libbrotlidec not loadable"
)
needs_cli = pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI")


def _u(s: str, i: int) -> int:
    return int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16)


def _corpus(salt: str, n: int) -> bytes:
    # repetitive-but-not-uniform: exercises matches, literals, RLE
    words = [b"alpha", b"beta", b"gamma", b"delta", b"%d" % _u(salt, 7)]
    return b" ".join(words[_u(salt, i) % len(words)] for i in range(n))


def _both_zstd(blob: bytes, pos: int = 0, dicts=None):
    """(native result-or-exception, pure result-or-exception)."""
    out = []
    for fn in (N.zstd_decode_frame, Z.decode_frame_py):
        try:
            out.append(("ok", fn(blob, pos, dicts)))
        except Z.ZstdTruncated as e:
            out.append(("truncated", type(e).__name__, None))
        except Z.ZstdError as e:
            out.append(("error", type(e).__name__, None))
    return out


# ---------------------------------------------------------------------------
# zstd: value parity per fixture class
# ---------------------------------------------------------------------------


@needs_zstd_native
def test_zstd_parity_writer_twin_frames():
    for i, data in enumerate(
        [
            b"",
            b"\x00" * 5000,  # RLE block
            _corpus("wt", 400),
            _corpus("wt2", 40000),  # multiple 128 KiB raw blocks? large
        ]
    ):
        for checksum in (True, False):
            f = Z.encode_frame(data, checksum=checksum)
            a = N.zstd_decode_frame(f, 0, None)
            b = Z.decode_frame_py(f, 0, None)
            assert a == b == (data, len(f)), (i, checksum)


@needs_zstd_native
@needs_cli
@pytest.mark.parametrize("level", [1, 3, 19])
def test_zstd_parity_cli_levels(level):
    data = _corpus(f"lvl{level}", 30000)
    comp = subprocess.run(
        [ZSTD_CLI, f"-{level}", "-c"], input=data, capture_output=True, check=True
    ).stdout
    assert N.zstd_decode_frame(comp, 0, None) == Z.decode_frame_py(comp, 0, None)
    assert N.zstd_decode_frame(comp, 0, None)[0] == data


@needs_zstd_native
def test_zstd_parity_dictionary_frames():
    did = 9301
    dic = Z.build_dictionary(b"WARC/1.0\r\nWARC-Type: response\r\n", did)
    dicts = {did: Z.parse_dictionary(dic)}
    data = b"WARC/1.0\r\nWARC-Type: response\r\n" + _corpus("dict", 800)
    f = Z.encode_frame(data, dict_id=did)
    a = N.zstd_decode_frame(f, 0, dicts)
    b = Z.decode_frame_py(f, 0, dicts)
    assert a == b == (data, len(f))
    # unknown dictionary: same error either way
    for fn in (N.zstd_decode_frame, Z.decode_frame_py):
        with pytest.raises(Z.ZstdError, match="external dictionary"):
            fn(f, 0, None)


@needs_zstd_native
def test_zstd_parity_skippable_and_offsets():
    skip = struct.pack("<II", 0x184D2A5D, 6) + b"abcdef"
    f = Z.encode_frame(_corpus("off", 300))
    blob = skip + f
    # dispatching decode_frame handles the skippable identically
    assert Z.decode_frame(blob, 0) == (b"", len(skip))
    a = N.zstd_decode_frame(blob, len(skip), None)
    b = Z.decode_frame_py(blob, len(skip), None)
    assert a == b
    assert a[1] == len(blob)


@needs_zstd_native
def test_zstd_exception_type_parity_truncation_and_poison():
    """The range scanner's grow-vs-resync branch keys on the TYPE:
    every truncation cut must raise ZstdTruncated on BOTH paths, and
    corrupt-but-complete bytes must raise plain ZstdError on both."""
    data = _corpus("trunc", 2000)
    f = Z.encode_frame(data)
    cuts = [2, 5, 7, len(f) // 2, len(f) - 1]
    for cut in cuts:
        res = _both_zstd(f[:cut])
        kinds = [r[0] for r in res]
        assert kinds == ["truncated", "truncated"], (cut, res)
    # flip a byte inside the (checksummed) frame body: complete input,
    # corrupt content -> plain ZstdError both ways
    bad = bytearray(f)
    bad[len(f) // 2] ^= 0xFF
    res = _both_zstd(bytes(bad))
    kinds = [r[0] for r in res]
    assert "truncated" not in kinds and "ok" not in kinds, res
    # bad magic rejects identically via the dispatching entry
    with pytest.raises(Z.ZstdError):
        Z.decode_frame(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


@needs_zstd_native
@needs_cli
def test_zstd_parity_multiframe_decompress():
    datas = [_corpus(f"mf{i}", 3000) for i in range(4)]
    blob = b"".join(
        subprocess.run(
            [ZSTD_CLI, "-5", "-c"], input=d, capture_output=True, check=True
        ).stdout
        for d in datas
    )
    want = b"".join(datas)
    assert Z.decompress(blob) == want
    # forced-off pure path agrees
    import os

    os.environ["CORRIE_NATIVE_CODECS"] = "off"
    try:
        assert Z.decompress(blob) == want
    finally:
        del os.environ["CORRIE_NATIVE_CODECS"]


@needs_zstd_native
def test_zstd_mode_toggle(monkeypatch):
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "off")
    assert not N.zstd_enabled() and not N.brotli_enabled()
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "require")
    assert N.zstd_enabled()  # must not raise when the lib is present
    monkeypatch.setenv("CORRIE_NATIVE_CODECS", "auto")
    assert N.zstd_enabled()


# ---------------------------------------------------------------------------
# brotli parity
# ---------------------------------------------------------------------------


def _ref_brotli_enc():
    for base in ("", "/root/miniconda/lib/"):
        try:
            ctypes.CDLL(f"{base}libbrotlicommon.so", mode=ctypes.RTLD_GLOBAL)
            return ctypes.CDLL(f"{base}libbrotlienc.so")
        except OSError:
            continue
    return None


_ENC = _ref_brotli_enc()


def _ref_compress(data: bytes, quality: int) -> bytes:
    n = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    buf = ctypes.create_string_buffer(n.value)
    ok = _ENC.BrotliEncoderCompress(
        ctypes.c_int(quality), ctypes.c_int(22), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data, ctypes.byref(n), buf,
    )
    assert ok
    return buf.raw[: n.value]


@needs_brotli_native
def test_brotli_parity_uncompressed_twin():
    for n in (0, 1, 100, 70000):
        data = _corpus("bu", n // 5) if n else b""
        s = encode_uncompressed(data)
        assert N.brotli_decompress(s) == brotli_decompress_py(s) == data


@needs_brotli_native
@pytest.mark.skipif(_ENC is None, reason="no reference libbrotlienc")
@pytest.mark.parametrize("quality", [1, 5, 11])
def test_brotli_parity_real_streams(quality):
    data = _corpus(f"bq{quality}", 20000)
    s = _ref_compress(data, quality)
    assert N.brotli_decompress(s) == brotli_decompress_py(s) == data


@needs_brotli_native
def test_brotli_parity_poison_and_budget():
    data = _corpus("bp", 4000)
    s = encode_uncompressed(data)
    # truncated: BrotliError both ways
    for fn in (N.brotli_decompress, brotli_decompress_py):
        with pytest.raises(BrotliError):
            fn(s[: len(s) // 2])
        with pytest.raises(BrotliError, match="output budget"):
            fn(s, max_output=10)
    # empty input
    for fn in (N.brotli_decompress, brotli_decompress_py):
        with pytest.raises(BrotliError):
            fn(b"")


def test_native_versions_shape():
    v = N.native_versions()
    assert set(v) == {"zstd", "brotli"}


def test_brotli_compress_fixture_arm_parity():
    """The libbrotlienc fixture arm's streams decode identically on
    both decode paths (and actually compress)."""
    data = _corpus("bc", 8000)
    c = N.brotli_compress(data, quality=5)
    if c is None:
        pytest.skip("no libbrotlienc")
    assert len(c) < len(data)
    assert brotli_decompress_py(c) == data
    if N.brotli_enabled():
        assert N.brotli_decompress(c) == data


def test_zstd_compress_fixture_arm_parity():
    """The libzstd fixture arm's frames decode identically on both
    decode paths (and actually compress)."""
    data = _corpus("zc", 8000)
    c = N.zstd_compress(data, level=3)
    if c is None:
        pytest.skip("no libzstd")
    assert len(c) < len(data)
    assert Z.decode_frame_py(c, 0, None) == (data, len(c))
    if N.zstd_enabled():
        assert N.zstd_decode_frame(c, 0, None) == (data, len(c))
