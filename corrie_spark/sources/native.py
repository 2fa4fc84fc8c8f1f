"""ctypes fast path to the system libzstd / libbrotlidec for the hot
decode loops (``.warc.zst`` members, ``Content-Encoding: zstd/br``
bodies).

The from-spec pure-Python readers (sources/zstd.py RFC 8878,
sources/brotli.py RFC 7932) remain the always-available fallback AND
the continuously-running differential twin: tests pin native ==
pure-python on every fixture class (levels, dictionaries, skippables,
poison), so a convention bug in either implementation surfaces as a
disagreement instead of silently shipping. Nothing here changes plan
shape — decode stays strictly per-record work inside the existing
Arrow stages; only the per-byte constant factor moves (pure python:
~2.3 MB/s/core zstd / ~1.4 MB/s/core brotli; libzstd: ~1 GB/s).

Dispatch policy, env ``CORRIE_NATIVE_CODECS``:

- ``auto`` (default) — use the native library when loadable, fall
  back to pure python otherwise (workers on images without the shared
  library keep working, just slower).
- ``off``  — pure python always (differential baseline / debugging).
- ``require`` — raise if the library is not loadable (test-only, to
  prove the native path actually ran).

Error-type parity is part of the contract: the sharded range scanner
distinguishes "frame straddles the range tail, grow the buffer"
(ZstdTruncated) from "corrupt frame, resync" (ZstdError) by exception
TYPE, so the native wrapper maps libzstd's input-exhausted-mid-frame
condition (``ZSTD_decompressStream`` returning a nonzero hint with the
input drained) to ZstdTruncated and every ``ZSTD_isError`` code to
ZstdError.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct
import threading

__all__ = [
    "zstd_enabled",
    "brotli_enabled",
    "zstd_decode_frame",
    "brotli_decompress",
    "native_versions",
]

_MODE_ENV = "CORRIE_NATIVE_CODECS"

# ---------------------------------------------------------------------------
# libzstd
# ---------------------------------------------------------------------------


class _ZIn(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


class _ZOut(ctypes.Structure):
    _fields_ = [
        ("dst", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_ZSTD_d_windowLogMax = 100  # ZSTD_dParameter enum
_ZSTD_reset_session_only = 1
_CONTENTSIZE_UNKNOWN = (1 << 64) - 1
_CONTENTSIZE_ERROR = (1 << 64) - 2

_zstd_lib = None
_zstd_tried = False
_zstd_local = threading.local()


def _load_zstd():
    global _zstd_lib, _zstd_tried
    if _zstd_tried:
        return _zstd_lib
    _zstd_tried = True
    name = ctypes.util.find_library("zstd")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
        lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_freeDCtx.restype = ctypes.c_size_t
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_ZOut),
            ctypes.POINTER(_ZIn),
        ]
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_DCtx_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ZSTD_DCtx_reset.restype = ctypes.c_size_t
        lib.ZSTD_DCtx_setParameter.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ZSTD_DCtx_setParameter.restype = ctypes.c_size_t
        lib.ZSTD_DCtx_refDDict.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ZSTD_DCtx_refDDict.restype = ctypes.c_size_t
        lib.ZSTD_createDDict.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.ZSTD_createDDict.restype = ctypes.c_void_p
        lib.ZSTD_getDictID_fromFrame.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ZSTD_getDictID_fromFrame.restype = ctypes.c_uint
        lib.ZSTD_getFrameContentSize.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        lib.ZSTD_versionString.restype = ctypes.c_char_p
        _zstd_lib = lib
    except OSError:
        _zstd_lib = None
    return _zstd_lib


def _mode() -> str:
    return os.environ.get(_MODE_ENV, "auto")


def zstd_enabled() -> bool:
    mode = _mode()
    if mode == "off":
        return False
    ok = _load_zstd() is not None
    if not ok and mode == "require":
        raise RuntimeError("CORRIE_NATIVE_CODECS=require but libzstd not loadable")
    return ok


def _dctx():
    """One reusable decompression context per (process, thread) —
    frames in a .warc.zst are record-sized, so per-frame allocation
    would dominate; reset(session_only) between frames is cheap and
    leaves parameters (windowLogMax) in place."""
    ctx = getattr(_zstd_local, "dctx", None)
    if ctx is None:
        ctx = _zstd_lib.ZSTD_createDCtx()
        if not ctx:
            raise MemoryError("ZSTD_createDCtx failed")
        # match the pure decoder's 1<<30 window ceiling, once —
        # session-only resets keep parameters
        _zstd_lib.ZSTD_DCtx_setParameter(ctx, _ZSTD_d_windowLogMax, 30)
        _zstd_local.dctx = ctx
    return ctx


def _out_buf(need: int):
    """Reusable per-thread output buffer: ctypes.create_string_buffer
    creates a fresh array TYPE per call (~hundreds of µs), which would
    dominate record-sized frames — grow geometrically instead."""
    buf = getattr(_zstd_local, "buf", None)
    if buf is None or len(buf) < need:
        size = 1 << 20
        while size < need:
            size <<= 1
        buf = ctypes.create_string_buffer(size)
        _zstd_local.buf = buf
    return buf


def _addr(data: bytes) -> int:
    # c_char_p points at the bytes object's internal buffer (no copy);
    # the caller keeps `data` referenced across the native call
    return ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p).value


def _ddict_for(zd) -> int:
    """Memoized ZSTD_DDict per parsed dictionary (digested once per
    process instead of per frame). ZSTD_createDDict auto-detects the
    magic vs raw-content layouts, matching parse_dictionary."""
    handle = getattr(zd, "native_ddict", None)
    if handle:
        return handle
    raw = zd.raw
    dd = _zstd_lib.ZSTD_createDDict(_addr(raw), len(raw))
    if not dd:
        from corrie_spark.sources.zstd import ZstdError

        raise ZstdError("native: ZSTD_createDDict failed")
    zd.native_ddict = dd  # freed with the process (few dicts, tiny)
    return dd


def zstd_decode_frame(
    data: bytes, pos: int, dicts: dict | None
) -> tuple[bytes, int]:
    """Native twin of zstd.decode_frame for CONTENT frames (the
    dispatching wrapper handles skippable frames in python). Returns
    (decompressed, end_pos); checksum and declared-content-size are
    validated by libzstd itself."""
    from corrie_spark.sources.zstd import ZstdError, ZstdTruncated

    lib = _load_zstd()
    if lib is None:
        raise RuntimeError("libzstd not loadable")
    if not isinstance(data, bytes):
        data = bytes(data)
    n = len(data) - pos
    base_addr = _addr(data) + pos

    # frame-header DID parse in python (an extra FFI round trip per
    # record-sized frame is measurable); truncation raises the
    # growable type. Magic checks FIRST, mirroring decode_frame_py's
    # order — garbage near a range tail must raise ZstdError (resync),
    # not ZstdTruncated (grow), or the sharded scanner re-reads the
    # tail before resyncing.
    if n < 4:
        raise ZstdTruncated("truncated magic")
    from corrie_spark.sources.zstd import ZSTD_MAGIC

    if data[pos : pos + 4] != ZSTD_MAGIC:
        raise ZstdError("bad magic")
    if n < 5:
        raise ZstdTruncated("truncated frame header")
    fhd = data[pos + 4]
    hp = pos + 5
    if not fhd & 0x20:  # window descriptor present
        hp += 1
    did_size = (0, 1, 2, 4)[fhd & 3]
    if hp + did_size > len(data):
        raise ZstdTruncated("truncated dictionary id")
    did = int.from_bytes(data[hp : hp + did_size], "little") if did_size else 0
    zd = None
    if did:
        zd = (dicts or {}).get(did)
        if zd is None:
            raise ZstdError(f"external dictionary {did} required")

    ctx = _dctx()
    lib.ZSTD_DCtx_reset(ctx, _ZSTD_reset_session_only)
    if zd is not None:
        rc = lib.ZSTD_DCtx_refDDict(ctx, _ddict_for(zd))
        if lib.ZSTD_isError(rc):
            raise ZstdError("native: refDDict failed")

    buf = _out_buf(1)
    inb = _ZIn(base_addr, n, 0)
    outb = _ZOut(ctypes.addressof(buf), len(buf), 0)
    parts: list[bytes] = []
    while True:
        outb.pos = 0
        ret = lib.ZSTD_decompressStream(
            ctx, ctypes.byref(outb), ctypes.byref(inb)
        )
        if lib.ZSTD_isError(ret):
            msg = lib.ZSTD_getErrorName(ret).decode()
            raise ZstdError(f"native: {msg}")
        if outb.pos:
            # slice the array directly — buf.raw would copy the WHOLE
            # reusable buffer before slicing
            parts.append(buf[: outb.pos])
        if ret == 0:  # frame fully decoded + flushed (incl. checksum)
            return parts[0] if len(parts) == 1 else b"".join(parts), pos + inb.pos
        if inb.pos == inb.size and outb.pos < outb.size:
            # input drained mid-frame with room to flush: the frame
            # straddles the buffered tail -> grow, don't resync
            raise ZstdTruncated("truncated frame (native)")
        # output chunk filled: grow the reusable buffer so multi-MiB
        # frames converge in O(log) passes
        buf = _out_buf(len(buf) * 2)
        outb.dst = ctypes.addressof(buf)
        outb.size = len(buf)


# ---------------------------------------------------------------------------
# libbrotlidec
# ---------------------------------------------------------------------------

_brotli_lib = None
_brotli_tried = False

_BROTLI_RESULT_ERROR = 0
_BROTLI_RESULT_SUCCESS = 1
_BROTLI_RESULT_NEEDS_MORE_INPUT = 2
_BROTLI_RESULT_NEEDS_MORE_OUTPUT = 3


def _load_brotli():
    global _brotli_lib, _brotli_tried
    if _brotli_tried:
        return _brotli_lib
    _brotli_tried = True
    common = ctypes.util.find_library("brotlicommon")
    dec = ctypes.util.find_library("brotlidec")
    if not dec:
        return None
    try:
        if common:
            # libbrotlidec resolves symbols from libbrotlicommon;
            # RTLD_GLOBAL makes them visible (the extract-tool lesson)
            ctypes.CDLL(common, mode=ctypes.RTLD_GLOBAL)
        lib = ctypes.CDLL(dec)
        lib.BrotliDecoderCreateInstance.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
        lib.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
        lib.BrotliDecoderVersion.restype = ctypes.c_uint32
        _brotli_lib = lib
    except OSError:
        _brotli_lib = None
    return _brotli_lib


def brotli_enabled() -> bool:
    mode = _mode()
    if mode == "off":
        return False
    ok = _load_brotli() is not None
    if not ok and mode == "require":
        raise RuntimeError(
            "CORRIE_NATIVE_CODECS=require but libbrotlidec not loadable"
        )
    return ok


def brotli_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Native twin of brotli.decompress: one RFC 7932 stream, trailing
    bytes after the final metablock ignored (the pure reader's
    stance); truncated or corrupt input raises BrotliError."""
    from corrie_spark.sources.brotli import BrotliError

    lib = _load_brotli()
    if lib is None:
        raise RuntimeError("libbrotlidec not loadable")
    if not isinstance(data, bytes):
        data = bytes(data)
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise MemoryError("BrotliDecoderCreateInstance failed")
    try:
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.c_void_p(_addr(data))
        chunk = max(len(data) * 4, 1 << 16)
        buf = ctypes.create_string_buffer(chunk)
        total = ctypes.c_size_t(0)
        parts: list[bytes] = []
        produced = 0
        while True:
            avail_out = ctypes.c_size_t(chunk)
            next_out = ctypes.c_void_p(ctypes.addressof(buf))
            res = lib.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in),
                ctypes.byref(next_in),
                ctypes.byref(avail_out),
                ctypes.byref(next_out),
                ctypes.byref(total),
            )
            written = chunk - avail_out.value
            if written:
                parts.append(buf[:written])
                produced += written
                if max_output is not None and produced > max_output:
                    raise BrotliError("output budget exceeded")
            if res == _BROTLI_RESULT_SUCCESS:
                return b"".join(parts)
            if res == _BROTLI_RESULT_NEEDS_MORE_INPUT:
                raise BrotliError("truncated brotli stream (native)")
            if res == _BROTLI_RESULT_ERROR:
                raise BrotliError("corrupt brotli stream (native)")
            # NEEDS_MORE_OUTPUT: loop with a fresh chunk
    finally:
        lib.BrotliDecoderDestroyInstance(state)


def native_versions() -> dict[str, str | None]:
    """Loaded library versions (SCALE.md provenance)."""
    out: dict[str, str | None] = {"zstd": None, "brotli": None}
    if _load_zstd() is not None:
        out["zstd"] = _zstd_lib.ZSTD_versionString().decode()
    if _load_brotli() is not None:
        v = _brotli_lib.BrotliDecoderVersion()
        out["brotli"] = f"{v >> 24}.{(v >> 12) & 0xFFF}.{v & 0xFFF}"
    return out


def zstd_compress(data: bytes, level: int = 3) -> bytes | None:
    """Real-encoder fixture arm: libzstd's ZSTD_compress when
    loadable (None otherwise — callers fall back to the raw-block
    writer twin). Raw-block twin frames EXPAND rather than compress,
    which is exactly how the round-12 pre-decoded-tail bug hid from
    the fixtures: routing half the fixture frames through real
    compression keeps compressed-shorter-than-content members under
    the closed-form oracles continuously."""
    lib = _load_zstd()
    if lib is None or _mode() == "off":
        return None
    if not hasattr(lib, "_compress_bound_ready"):
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
        ]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib._compress_bound_ready = True
    if not isinstance(data, bytes):
        data = bytes(data)
    bound = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(
        ctypes.addressof(buf), bound, _addr(data), len(data), level
    )
    if lib.ZSTD_isError(n):
        return None
    return buf[:n]


# ---------------------------------------------------------------------------
# libwebp (decode only — operators/webp.py dispatches VP8L payloads)
# ---------------------------------------------------------------------------

_webp_lib = None
_webp_tried = False


def _load_webp():
    global _webp_lib, _webp_tried
    if _webp_tried:
        return _webp_lib
    _webp_tried = True
    name = ctypes.util.find_library("webp")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _webp_lib = lib
    except OSError:
        _webp_lib = None
    return _webp_lib


def webp_enabled() -> bool:
    mode = _mode()
    if mode == "off":
        return False
    ok = _load_webp() is not None
    if not ok and mode == "require":
        raise RuntimeError("CORRIE_NATIVE_CODECS=require but libwebp not loadable")
    return ok


def webp_decode_rgba(payload: bytes) -> tuple[int, int, bytes] | None:
    """One WebP payload -> (width, height, RGBA bytes), or None when
    libwebp rejects it (the caller raises its own typed error). The
    caller guarantees the payload is VP8L — lossy VP8 stays the
    documented cross-environment seam even though libwebp could
    decode it, so query results never depend on which image the
    cluster happens to have installed."""
    lib = _load_webp()
    if lib is None:
        raise RuntimeError("libwebp not loadable")
    if not isinstance(payload, bytes):
        payload = bytes(payload)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    try:
        return w.value, h.value, ctypes.string_at(p, w.value * h.value * 4)
    finally:
        lib.WebPFree(p)


_brotli_enc_lib = None
_brotli_enc_tried = False


def brotli_compress(data: bytes, quality: int = 5) -> bytes | None:
    """Real-encoder fixture arm: libbrotlienc when loadable (None
    otherwise — callers fall back to the uncompressed-metablock
    writer twin). Real streams carry compressed metablocks, context
    modeling and dictionary references, so routing half the br-coded
    fixture bodies through this arm keeps the heavy decode paths
    under the closed-form oracles, mirroring the zstd/webp arms."""
    global _brotli_enc_lib, _brotli_enc_tried
    if _mode() == "off":
        return None
    if not _brotli_enc_tried:
        _brotli_enc_tried = True
        common = ctypes.util.find_library("brotlicommon")
        enc = ctypes.util.find_library("brotlienc")
        if enc:
            try:
                if common:
                    ctypes.CDLL(common, mode=ctypes.RTLD_GLOBAL)
                lib = ctypes.CDLL(enc)
                lib.BrotliEncoderCompress.argtypes = [
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_size_t,
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_size_t),
                    ctypes.c_char_p,
                ]
                lib.BrotliEncoderCompress.restype = ctypes.c_int
                _brotli_enc_lib = lib
            except OSError:
                _brotli_enc_lib = None
    lib = _brotli_enc_lib
    if lib is None:
        return None
    if not isinstance(data, bytes):
        data = bytes(data)
    n = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    buf = ctypes.create_string_buffer(n.value)
    ok = lib.BrotliEncoderCompress(
        quality, 22, 0, len(data), data, ctypes.byref(n), buf
    )
    if not ok:
        return None
    return buf[: n.value]
