"""Native fast path for the image-codec hot loop: libjpeg / libpng
via a tiny compiled shim (`_native_image.c`), the round-13 headline
ask one layer up from sources/native.py's zstd/brotli dispatch.

Why compiled instead of pure ctypes: libjpeg's fatal-error contract
is an ``error_exit`` callback that must not return (the default one
calls ``exit()``); only a C frame can own the setjmp/longjmp pair
that turns those into return codes, and a poison JPEG must land in
the DLQ, not kill the Python worker. The shim is ~300 lines of
error-capture plumbing; all pixel policy (color conversion, chroma
upsampling, rounding) stays on the Python side so the from-spec
decoders remain the semantics reference.

Build-and-cache: the shim compiles ON FIRST USE with the system gcc
into a per-user cache directory, keyed by the SHA-256 of the C
source (so editing the shim invalidates cleanly) — write-to-temp +
atomic rename makes concurrent first-calls from 32 local executor
threads / many worker processes safe. No compiler, no headers, or a
failed compile simply disables the fast path: ``auto`` mode falls
back to the pure decoders, exactly like a cluster image without the
shared libraries.

Dispatch policy: the same ``CORRIE_NATIVE_CODECS`` env as
sources/native.py (auto | off | require).

Determinism stance (the round-13 verdict's caveat, measured and
pinned by tests/test_native_image.py):

- PNG is lossless — native == pure BIT-EXACT on the whole supported
  envelope (gray / RGB / palette / alpha-strip / Adam7), all parity
  tests exact.
- JPEG has no bit-exact cross-decoder ground truth: ITU-T T.81
  conformance is tolerance-based and libjpeg's scaled-integer IDCT
  differs from the from-spec float IDCT by at most 1 LSB on
  AC-bearing blocks. The shim removes the OTHER two divergence
  sources (color conversion and chroma upsampling run on the Python
  side with the codec's exact double arithmetic), so: on the DC-only
  fixture class every oracle gate uses, native == pure bit-exact
  (pinned per quality / subsampling); on AC-bearing images parity is
  pinned to max |diff| <= 1 LSB. A fleet shares one worker image in
  practice, so within a cluster results are deterministic either way.
- Error parity by construction: ANY native failure falls back to the
  pure decoder, which raises the house-typed error — DLQ reasons are
  always the pure decoder's strings, and the shim's
  warnings-are-errors rule makes libjpeg reject the corrupt-entropy
  class the pure decoder rejects.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

__all__ = [
    "image_shim_enabled",
    "jpeg_decode_native",
    "png_decode_native",
    "shim_path",
    "NativeImageUnsupported",
]

_MODE_ENV = "CORRIE_NATIVE_CODECS"

_C_SRC = os.path.join(os.path.dirname(__file__), "_native_image.c")
_LINK_LIBS = ["-ljpeg", "-lpng16"]


class NativeImageError(ValueError):
    """Native decode failed (caller falls back to the pure decoder)."""


class NativeImageUnsupported(NativeImageError):
    """Input is outside the pure decoders' envelope — fall back
    silently so native-on/off environments agree on what decodes."""


def _mode() -> str:
    return os.environ.get(_MODE_ENV, "auto")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "corrie_spark")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def _compile_shim() -> str | None:
    """Compile (or reuse) the cached shim .so; None when the
    environment can't build it. Concurrency-safe: compile to a
    unique temp name, atomic-rename into place."""
    try:
        with open(_C_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    key = hashlib.sha256(src).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"corrie_native_image-{key}.so")
    if os.path.exists(out):
        return out
    tmp = f"{out}.tmp-{os.getpid()}-{threading.get_ident()}"
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", "-o", tmp, _C_SRC,
    ] + _LINK_LIBS
    try:
        r = subprocess.run(
            cmd, capture_output=True, timeout=120, check=False
        )
        if r.returncode != 0:
            return None
        os.rename(tmp, out)  # atomic; loser of a race just overwrites
        return out
    except Exception:
        return None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


_lib = None
_lib_tried = False
_lib_lock = threading.Lock()


def shim_path() -> str | None:
    """Cached shim location (compiling it if needed) — diagnostics."""
    return getattr(_load(), "_corrie_path", None)


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    with _lib_lock:
        if _lib_tried:
            return _lib
        path = _compile_shim()
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
                lib.corrie_gif_lzw.argtypes = [
                    ctypes.c_void_p,                    # data
                    ctypes.c_size_t,                    # len
                    ctypes.c_int32,                     # mcs
                    ctypes.POINTER(ctypes.c_void_p),    # out
                    ctypes.POINTER(ctypes.c_size_t),    # outlen
                    ctypes.c_char_p,                    # err
                    ctypes.c_int32,                     # errcap
                ]
                lib.corrie_gif_lzw.restype = ctypes.c_int
                lib.corrie_buf_free.argtypes = [ctypes.c_void_p]
                lib.corrie_buf_free.restype = None
                for fn in ("corrie_jpeg_decode", "corrie_png_decode"):
                    f = getattr(lib, fn)
                    f.argtypes = [
                        ctypes.c_void_p,                  # buf
                        ctypes.c_size_t,                  # len
                        ctypes.c_void_p,                  # out
                        ctypes.c_size_t,                  # cap
                        ctypes.POINTER(ctypes.c_size_t),  # need
                        ctypes.POINTER(ctypes.c_int32),   # w
                        ctypes.POINTER(ctypes.c_int32),   # h
                        ctypes.POINTER(ctypes.c_int32),   # ch
                        ctypes.c_char_p,                  # err
                        ctypes.c_int32,                   # errcap
                    ]
                    f.restype = ctypes.c_int
                lib.corrie_image_shim_version.restype = ctypes.c_char_p
                lib._corrie_path = path
            except OSError:
                lib = None
        _lib = lib
        _lib_tried = True
    return _lib


def image_shim_enabled() -> bool:
    mode = _mode()
    if mode == "off":
        return False
    ok = _load() is not None
    if not ok and mode == "require":
        raise RuntimeError(
            "CORRIE_NATIVE_CODECS=require but the image shim is not "
            "buildable (gcc / jpeglib.h / png.h missing?)"
        )
    return ok


# reusable per-thread output buffer, geometric growth — the
# create_string_buffer-per-call trap costs ~10x on record-sized
# payloads (sources/native.py round-13 lesson)
_tls = threading.local()


def _out_buf(need: int):
    buf = getattr(_tls, "img_buf", None)
    if buf is None or len(buf) < need:
        size = 1 << max(16, (need - 1).bit_length())
        buf = ctypes.create_string_buffer(size)
        _tls.img_buf = buf
    return buf


def _addr(data: bytes) -> int:
    return ctypes.cast(
        ctypes.c_char_p(data), ctypes.c_void_p
    ).value or 0


def _call(fn_name: str, payload: bytes) -> tuple[int, int, int, bytes]:
    """Run one shim decoder -> (w, h, channels, pixel bytes). Raises
    NativeImageUnsupported (silent-fallback class) or NativeImageError
    (decode error — caller re-runs pure for the typed message)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image shim not loaded")
    if not isinstance(payload, bytes):
        payload = bytes(payload)
    fn = getattr(lib, fn_name)
    need = ctypes.c_size_t(0)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    err = ctypes.create_string_buffer(256)
    buf = _out_buf(1 << 16)
    rc = fn(
        _addr(payload), len(payload),
        ctypes.addressof(buf), len(buf),
        ctypes.byref(need), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(ch), err, len(err),
    )
    if rc == 3:  # grow once to the exact need and retry
        buf = _out_buf(need.value)
        rc = fn(
            _addr(payload), len(payload),
            ctypes.addressof(buf), len(buf),
            ctypes.byref(need), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(ch), err, len(err),
        )
    if rc == 1:
        raise NativeImageUnsupported(fn_name)
    if rc != 0:
        raise NativeImageError(
            err.value.decode("utf-8", "replace") or f"{fn_name} rc={rc}"
        )
    # slice the array directly — buf.raw would copy the whole
    # reusable buffer before slicing
    return w.value, h.value, ch.value, buf[: need.value]


def jpeg_decode_native(payload: bytes) -> tuple[int, int, int, bytes]:
    """(w, h, channels, samples): gray bytes for 1-channel frames,
    replicated-upsampled interleaved YCbCr triples for color — the
    caller applies the codec's exact double YCbCr->RGB."""
    return _call("corrie_jpeg_decode", payload)


def png_decode_native(payload: bytes) -> tuple[int, int, int, bytes]:
    """(w, h, channels, pixels): gray bytes or RGB triples, palette
    expanded and alpha stripped — bit-exact vs the pure decoder."""
    return _call("corrie_png_decode", payload)


def gif_lzw_native(data: bytes, mcs: int) -> bytes:
    """From-spec C twin of the GIF variable-width LZW decoder (no
    giflib — only the per-pixel hot loop moves to C, so there is no
    foreign-ABI risk in an environment shipping libgif.so without
    headers). Bit-exact vs multimodal._gif_lzw_decode_py."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image shim not loaded")
    if not isinstance(data, bytes):
        data = bytes(data)
    outp = ctypes.c_void_p(None)
    outlen = ctypes.c_size_t(0)
    err = ctypes.create_string_buffer(128)
    rc = lib.corrie_gif_lzw(
        _addr(data), len(data), mcs,
        ctypes.byref(outp), ctypes.byref(outlen), err, len(err),
    )
    if rc == 1:
        raise NativeImageUnsupported("corrie_gif_lzw")
    if rc != 0:
        raise NativeImageError(
            err.value.decode("utf-8", "replace") or f"gif_lzw rc={rc}"
        )
    try:
        return ctypes.string_at(outp, outlen.value)
    finally:
        lib.corrie_buf_free(outp)
