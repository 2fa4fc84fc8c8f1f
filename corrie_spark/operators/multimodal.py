"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched pandas stages over mapInPandas.

Design for 100 TB:
  - media bytes live in a BinaryType column next to typed metadata
    (media_type, width/height/sample_rate/...), so relational
    filters/joins prune and push down WITHOUT touching bytes — a
    metadata-only query never deserializes a single payload;
  - all byte-touching stages are mapInPandas (Arrow batch transfer,
    one python process per task, zero shuffle): throughput scales
    with executors and `spark.sql.execution.arrow.maxRecordsPerBatch`
    bounds batch memory;
  - decode is pluggable: the real codecs (PIL/libav/...) are not in
    this environment, so `decode_payload` dispatches to a
    deterministic FAKE codec for the `fake/*` media types and raises
    NotImplementedError for real ones — the Spark-side contract
    (schemas, batching, partitioning) is identical either way.

Fake wire format (deterministic, self-describing):
  images: b"FAKEIMG" + width:int32le + height:int32le + pixels (w*h bytes)
  audio:  b"FAKEAUD" + sample_rate:int32le + n_samples:int32le + samples
  video:  b"FAKEVID" + n_frames:int32le + frame_size:int32le + frames
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from corrie_spark.functions import bind


def _byte_mean(data: bytes) -> float:
    """Exact mean of raw bytes via numpy: int64-accumulated sum (no
    float rounding, no per-byte python loop), one float division —
    bit-identical to sum(data)/len(data) and ~50x faster."""
    if not data:
        return 0.0
    arr = np.frombuffer(data, dtype=np.uint8)
    return float(arr.sum(dtype=np.int64) / arr.size)

MEDIA_SCHEMA_DDL = "media_id bigint, media_type string, payload binary"

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FAKEIMG", b"FAKEAUD", b"FAKEVID"

IMAGE_FEATURES_DDL = (
    "media_id bigint, media_type string, width int, height int, "
    "n_bytes int, mean_pixel double, ok boolean"
)
AUDIO_FEATURES_DDL = (
    "media_id bigint, media_type string, sample_rate int, n_samples int, "
    "duration_s double, mean_amp double, ok boolean"
)
FRAME_SAMPLE_DDL = "media_id bigint, frame_idx int, frame binary"
RESIZE_DDL = "media_id bigint, media_type string, payload binary, width int, height int"


# ---------------------------------------------------------------------------
# fake codec (the pluggable seam; real codecs replace these functions)
# ---------------------------------------------------------------------------

def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    px = bytes(((seed + i) * 31 + 7) % 256 for i in range(width * height))
    return IMG_MAGIC + struct.pack("<ii", width, height) + px


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    samples = bytes(((seed + i) * 17 + 3) % 256 for i in range(n_samples))
    return AUD_MAGIC + struct.pack("<ii", sample_rate, n_samples) + samples


def encode_fake_video(n_frames: int, frame_size: int, seed: int) -> bytes:
    frames = bytes(((seed + i) * 13 + 11) % 256 for i in range(n_frames * frame_size))
    return VID_MAGIC + struct.pack("<ii", n_frames, frame_size) + frames


def encode_bmp(width: int, height: int, rows: list[bytes], bottom_up: bool = True) -> bytes:
    """REAL encoder: 8-bpp uncompressed BMP (BITMAPINFOHEADER) with
    the spec's 4-byte row padding; `rows` are top-down visual rows."""
    row_raw = width
    stride = (row_raw + 3) & ~3
    stored = list(reversed(rows)) if bottom_up else rows
    px = b"".join(bytes(r) + b"\x00" * (stride - row_raw) for r in stored)
    data_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(px), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height if bottom_up else -height, 1, 8, 0, len(px), 0, 0, 0, 0,
    )
    return hdr + info + px


def encode_wav_pcm(sample_rate: int, samples, bits: int = 16, nch: int = 1) -> bytes:
    """REAL encoder: RIFF/WAVE PCM container (fmt + data chunks,
    even-length chunk padding)."""
    data = (
        np.asarray(samples, dtype="<i2").tobytes()
        if bits == 16
        else bytes(samples)
    )
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * nch * bits // 8,
        nch * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _decode_bmp(payload: bytes) -> dict:
    """REAL codec: uncompressed BMP (BITMAPINFOHEADER, 8/24 bpp) from
    the public file-format layout — 'BM', pixel-array offset at byte
    10, width/height int32 at 18/22, bpp uint16 at 28, compression
    uint32 at 30 (must be BI_RGB=0). Rows are 4-byte aligned and
    stored bottom-up when height > 0; the returned `data` is the
    unpadded pixel bytes in TOP-DOWN row order (for 24 bpp: BGR byte
    triples, so mean_pixel is the mean over all channel bytes).
    Implemented with struct + one numpy gather — no external libs."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (8, 24) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    height, bottom_up = abs(h), h > 0
    bytes_per_px = bpp // 8
    row_raw = w * bytes_per_px
    row_stride = (row_raw + 3) & ~3  # 4-byte row padding
    need = data_off + row_stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    arr = np.frombuffer(payload, dtype=np.uint8)
    rows = [
        arr[data_off + r * row_stride : data_off + r * row_stride + row_raw]
        for r in range(height)
    ]
    if bottom_up:
        rows.reverse()
    return {
        "kind": "image",
        "width": w,
        "height": height,
        "data": np.concatenate(rows).tobytes() if rows else b"",
    }


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """REAL encoder: binary P6 PPM (netpbm) — 'P6\n<w> <h>\n255\n'
    followed by width*height RGB byte triples."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def _decode_ppm(payload: bytes) -> dict:
    """REAL codec: netpbm P6 (binary PPM) from the public spec —
    'P6', whitespace/comment-separated width, height, maxval (<=255
    supported), ONE whitespace byte, then width*height RGB triples.
    Comments ('#' to end of line) are legal anywhere in the header."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM file")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment: skip to newline
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            raise ValueError("bad PPM header byte")
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval})")
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    data = payload[pos : pos + need]
    if len(data) < need:
        raise ValueError("truncated PPM pixel array")
    return {"kind": "image", "width": w, "height": h, "data": data}


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The Paeth predictor from the PNG spec (RFC 2083 §6.6): pick
    whichever of left/up/upper-left is closest to left+up-upperleft,
    ties resolved left, up, upper-left in that order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# Adam7 pass grid (ISO 15948 §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(px: "np.ndarray", ch: int, filters: list[int]) -> bytes:
    """Filter a (rows, stride) int64 pixel block into PNG scanlines
    (one filter-type byte + filtered row each)."""
    prev = np.zeros(px.shape[1], dtype=np.int64)
    out = []
    for r in range(px.shape[0]):
        raw = px[r]
        ft = filters[r]
        if ft == 0:
            filt = raw
        elif ft == 1:  # Sub: subtract the pixel bpp bytes to the left
            left = np.concatenate([np.zeros(ch, dtype=np.int64), raw[:-ch]])
            filt = raw - left
        elif ft == 2:  # Up
            filt = raw - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int64), raw[:-ch]])
            filt = raw - (left + prev) // 2
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int64), raw[:-ch]])
            upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
            filt = raw - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
        prev = raw
    return b"".join(out)


def _png_unfilter_rows(scan: "np.ndarray", w: int, ch: int) -> "np.ndarray":
    """Invert _png_filter_rows: (rows, stride+1) int64 scanlines ->
    flat uint8 pixels. Exact by construction (mod-256 arithmetic)."""
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int64)
    rows = []
    for r in range(scan.shape[0]):
        ft, frow = int(scan[r, 0]), scan[r, 1:]
        if ft == 0:
            rec = frow % 256
        elif ft == 1:  # Sub: per-channel cumsum undoes the left-delta
            rec = np.cumsum(frow.reshape(w, ch), axis=0).ravel() % 256
        elif ft == 2:  # Up
            rec = (frow + prev) % 256
        elif ft == 3:  # Average (left is a row recurrence)
            f2, p2 = frow.reshape(w, ch), prev.reshape(w, ch)
            rec2 = np.empty((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for i in range(w):
                left = (f2[i] + (left + p2[i]) // 2) % 256
                rec2[i] = left
            rec = rec2.ravel()
        elif ft == 4:  # Paeth (left/upper-left row recurrence)
            f2, p2 = frow.reshape(w, ch), prev.reshape(w, ch)
            rec2 = np.empty((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for i in range(w):
                left = (f2[i] + _paeth(left, p2[i], upleft)) % 256
                rec2[i] = left
                upleft = p2[i]
            rec = rec2.ravel()
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        rows.append(rec.astype(np.uint8))
        prev = rec
    return (
        np.concatenate(rows) if rows else np.zeros(0, dtype=np.uint8)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filters: list[int] | None = None,
    palette: bytes | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """REAL encoder: PNG (RFC 2083 / ISO 15948) with 8-bit greyscale
    (color_type 0), RGB (2), palette-indexed (3, `pixels` are indices
    and `palette` is the PLTE body — RGB triples), grey+alpha (4) or
    RGBA (6) — stdlib zlib deflate over per-row filtered scanlines.
    `filters` picks the filter type (0=None 1=Sub 2=Up 3=Average
    4=Paeth) per row so fixtures can exercise every unfilter branch
    of the decoder; default all-None. `interlace=True` emits the
    Adam7 layout: seven sub-images in pass order, each independently
    filtered (filter rotating by pass+row so every branch stays
    live), pixels scattered on the §8.2 grid."""
    import zlib

    if color_type == 3:
        if palette is None or len(palette) % 3 or not 3 <= len(palette) <= 768:
            raise ValueError("palette PNG needs a PLTE body of RGB triples")
    if (
        depth not in (1, 2, 4, 8, 16)
        or (depth == 16 and color_type == 3)
        or (depth < 8 and color_type not in (0, 3))
    ):
        raise ValueError(
            "depth must be 8; 16 for non-palette; 1/2/4 for grey/palette"
        )
    # 16-bit: `pixels` carries 2 bytes per sample, big-endian.
    # Sub-8-bit: `pixels` carries ONE byte per sample (< 2^depth);
    # rows pack MSB-first with byte padding here. The filters operate
    # on bytes in every case (PNG section 9.2).
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type] * max(1, depth // 8)
    stride = width * ch
    if depth < 8:
        if len(pixels) != width * height:
            raise ValueError("pixel buffer does not match dims")
        if pixels and max(pixels) >= (1 << depth):
            raise ValueError("sample out of range for depth")

        def _pack(sub: "np.ndarray") -> "np.ndarray":
            ph, pw = sub.shape
            bits = (
                (sub[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).reshape(ph, pw * depth).astype(np.uint8)
            return np.packbits(bits, axis=1).astype(np.int64)

    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
    if interlace:
        px3 = px.reshape(height, width, 1 if depth < 8 else ch)
        parts = []
        for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
            sub = px3[y0::dy, x0::dx]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            if depth < 8:
                flat = _pack(sub[:, :, 0])
                parts.append(
                    _png_filter_rows(
                        flat, 1, [(p + r) % 5 for r in range(ph)]
                    )
                )
            else:
                flat = sub.reshape(ph, pw * ch)
                parts.append(
                    _png_filter_rows(flat, ch, [(p + r) % 5 for r in range(ph)])
                )
        body = b"".join(parts)
    else:
        if filters is None:
            filters = [0] * height
        if depth < 8:
            body = _png_filter_rows(
                _pack(px.reshape(height, width)), 1, filters
            )
        else:
            body = _png_filter_rows(px.reshape(height, stride), ch, filters)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    idat = zlib.compress(body)
    plte = _png_chunk(b"PLTE", palette) if color_type == 3 else b""
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + plte
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> dict:
    """Dispatching entry: PNG pixel decode goes to the system libpng
    through the compiled error-capturing shim (sources/
    native_image.py, policy env CORRIE_NATIVE_CODECS) when buildable.
    PNG is lossless, so native == pure BIT-EXACT across the whole
    supported envelope (1/2/4/8/16-bit gray, 8/16-bit RGB/alpha,
    1/2/4/8-bit palette, alpha-strip, Adam7 — pinned by
    tests/test_native_image.py); the shim mirrors the pure decoder's
    strictness (every chunk CRC fatal) and sample conventions
    (strip_16 MSB-keep, expand_gray replication scaling). Any native
    failure falls back to _decode_png_py for the house-typed error."""
    from corrie_spark.sources import native_image as NI

    if NI.image_shim_enabled():
        try:
            w, h, ch, raw = NI.png_decode_native(payload)
        except NI.NativeImageError:
            return _decode_png_py(payload)
        return {"kind": "image", "width": w, "height": h, "data": raw}
    return _decode_png_py(payload)


def _decode_png_py(payload: bytes) -> dict:
    """REAL codec: PNG (RFC 2083 / ISO 15948) — implemented from the
    public spec with stdlib zlib + numpy only, closing half the
    compressed-media seam natively (round-7 verdict #1). Supported:
    8- and 16-bit depth (16-bit samples keep the MSB after
    unfiltering, the libpng strip_16 convention, so downstream stays
    on the 8-bit contract), greyscale (color type 0), truecolor RGB
    (2), palette-indexed (3, 1/2/4/8-bit indices, PLTE lookup to RGB
    triples), grey+alpha (4) and RGBA (6) with alpha stripped,
    sub-8-bit greyscale (1/2/4-bit, scaled to 8-bit by the standard
    255/(2^d-1) replication — the libpng expand_gray convention),
    non-interlaced or Adam7. Chunk CRCs are verified. The per-row unfilter
    (None/Sub/Up/Average/Paeth) is numpy per scanline: Sub is a
    per-channel cumulative sum, Up is one vector add, Average/Paeth
    walk pixels left-to-right with channel-vectorized arithmetic
    (sequential along the row by data dependency — the spec's
    recurrence — but each step is one small numpy op). Returns the
    recovered raw pixel stream in top-down row order (RGB triples for
    color type 2, like the PPM decoder), exact by construction:
    filtering is invertible integer arithmetic mod 256."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos = len(PNG_SIG)
    ihdr = None
    plte = None
    idat = []
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt_m, interlace = struct.unpack(">IIBBBBB", ihdr)
    ok_depth = (
        depth == 8
        or (depth == 16 and color in (0, 2, 4, 6))
        or (depth in (1, 2, 4) and color in (0, 3))
    )
    if not ok_depth or color not in (0, 2, 3, 4, 6) or comp != 0 or filt_m != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace}); "
            "only 8/16-bit grey/RGB/alpha + 8-bit palette "
            "(non-interlaced or Adam7) decoded natively"
        )
    if color == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing/malformed PLTE chunk")
    if w < 1 or h < 1:
        raise ValueError("bad PNG dimensions")
    # bytes per pixel in the filtered stream (alpha kept for
    # filtering, stripped from the output so downstream stays
    # gray/RGB-invariant; 16-bit samples are 2 bytes each and the
    # filter bpp covers them; sub-8-bit rows pack MSB-first with the
    # filter bpp clamped to ONE byte — PNG §9.2 filters operate on
    # BYTES in every case)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    sub_byte = depth < 8
    sw = 1 if sub_byte else ch * (depth // 8)  # filter bpp in bytes

    def _row_bytes(width: int) -> int:
        return (width * depth + 7) // 8 if sub_byte else width * sw

    def _unpack_rows(rec: "np.ndarray", rows: int, width: int) -> "np.ndarray":
        """(rows * rowbytes,) packed bytes -> (rows, width) samples,
        MSB-first within each byte, row padding dropped (§7.2)."""
        rb = _row_bytes(width)
        bits = np.unpackbits(rec.reshape(rows, rb), axis=1)
        bits = bits[:, : width * depth].reshape(rows, width, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (bits * weights).sum(axis=2).astype(np.uint8)

    stride = _row_bytes(w)
    raw = zlib.decompress(b"".join(idat))
    if interlace == 1:
        # Adam7 (§8.2): seven independently-filtered sub-images in
        # pass order, scattered back onto the (x0 + j*dx, y0 + i*dy)
        # grid — each pass unfilters with ITS OWN row recurrence
        img = np.zeros((h, w, 1 if sub_byte else sw), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prb = _row_bytes(pw)
            need = (prb + 1) * ph
            if pos + need > len(raw):
                raise ValueError("PNG Adam7 pass data truncated")
            scan = (
                np.frombuffer(raw[pos : pos + need], dtype=np.uint8)
                .reshape(ph, prb + 1)
                .astype(np.int64)
            )
            pos += need
            rec = _png_unfilter_rows(scan, prb, 1) if sub_byte else (
                _png_unfilter_rows(scan, pw, sw)
            )
            if sub_byte:
                img[y0::dy, x0::dx, 0] = _unpack_rows(rec, ph, pw)
            else:
                img[y0::dy, x0::dx] = rec.reshape(ph, pw, sw)
        if pos != len(raw):
            raise ValueError("PNG Adam7 data does not match dims")
        out = img.ravel()
    else:
        if len(raw) != (stride + 1) * h:
            raise ValueError("PNG scanline data does not match dims")
        scan = (
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(h, stride + 1)
            .astype(np.int64)
        )
        if sub_byte:
            out = _unpack_rows(
                _png_unfilter_rows(scan, stride, 1), h, w
            ).ravel()
        else:
            out = _png_unfilter_rows(scan, w, sw)
    if depth == 16:
        # big-endian samples: keep the MSB (libpng png_set_strip_16
        # convention — the native twin), so 16-bit crawl images flow
        # through the same 8-bit downstream contract
        out = out.reshape(-1, 2)[:, 0].copy()
    elif sub_byte and color == 0:
        # scale low-bit grey to 8-bit by the standard replication
        # (255/(2^d-1) — the libpng expand_gray convention); palette
        # indices pass through unscaled for the PLTE lookup below
        out = (out.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if color == 3:
        # palette lookup: indices -> RGB triples (one numpy gather)
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(out.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        out = pal[out].ravel()
    elif color in (4, 6):
        # strip the alpha channel after unfiltering (the filter bpp
        # includes it; the pipeline's image contract is gray/RGB)
        out = out.reshape(-1, ch)[:, : ch - 1].ravel()
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "data": out.tobytes(),
    }


# --- IMA ADPCM (compressed audio) ------------------------------------------

# public IMA ADPCM tables (IMA Digital Audio Focus/Compatibility
# committees' reference algorithm, also in the MS WAVE format docs)
ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
ADPCM_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (pred, index) x nibble -> new state.
    Pure-integer; the oracle SQL replays it as a recursive CTE."""
    step = ADPCM_STEPS[idx]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + ADPCM_INDEX_ADJ[nibble & 7]))
    return pred, idx


def adpcm_decode(pred0: int, idx0: int, nibbles: bytes | list[int]) -> list[int]:
    """Decode a mono IMA ADPCM block body: the header predictor is
    emitted as sample 0 (the standard block convention), then one
    sample per 4-bit code."""
    out = [pred0]
    pred, idx = pred0, idx0
    for n in nibbles:
        pred, idx = _adpcm_step(pred, idx, n & 0xF)
        out.append(pred)
    return out


def adpcm_encode(samples: list[int], pred0: int | None = None, idx0: int = 0) -> tuple[int, int, bytes]:
    """Greedy reference IMA encoder: per sample pick the nibble whose
    decoded prediction lands closest (the sign+magnitude search of
    the reference algorithm). Returns (pred0, idx0, nibble bytes)."""
    if pred0 is None:
        pred0 = int(samples[0]) if samples else 0
    pred, idx = pred0, idx0
    nibbles = []
    for s in samples:
        step = ADPCM_STEPS[idx]
        delta = int(s) - pred
        n = 8 if delta < 0 else 0
        if delta < 0:
            delta = -delta
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        pred, idx = _adpcm_step(pred, idx, n)
        nibbles.append(n)
    return pred0, idx0, bytes(nibbles)


def encode_wav_adpcm(
    sample_rate: int, pred0: int, idx0: int, nibbles: bytes
) -> bytes:
    """REAL encoder: RIFF/WAVE with format tag 0x0011 (IMA ADPCM),
    mono, one block — 4-byte block header (pred:int16, index:uint8,
    reserved) then the 4-bit codes packed low-nibble-first. `fact`
    chunk carries the decoded sample count as the spec requires for
    compressed formats."""
    n_samples = 1 + len(nibbles)
    packed = bytearray()
    for i in range(0, len(nibbles) - 1, 2):
        packed.append((nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4))
    if len(nibbles) % 2:
        packed.append(nibbles[-1] & 0xF)
    body = struct.pack("<hBB", pred0, idx0, 0) + bytes(packed)
    block_align = len(body)
    samples_per_block = n_samples
    fmt = struct.pack(
        "<HHIIHH", 0x11, 1, sample_rate, sample_rate * block_align // max(samples_per_block, 1),
        block_align, 4,
    ) + struct.pack("<HH", 2, samples_per_block)  # cbSize=2, wSamplesPerBlock
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<I", 4) + struct.pack("<I", n_samples)
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _decode_wav_adpcm(sr: int, block_align: int, samples_per_block: int, data: bytes) -> dict:
    """Decode the data chunk of a mono IMA ADPCM WAV: per block, a
    4-byte state header then packed nibbles (low first)."""
    out: list[int] = []
    pos = 0
    while pos + 4 <= len(data):
        block = data[pos : pos + block_align] if block_align else data[pos:]
        pos += len(block) if block_align == 0 else block_align
        pred0, idx0, _ = struct.unpack_from("<hBB", block, 0)
        nibbles = []
        for b in block[4:]:
            nibbles.append(b & 0xF)
            nibbles.append(b >> 4)
        want = samples_per_block - 1 if samples_per_block else len(nibbles)
        out.extend(adpcm_decode(pred0, idx0, nibbles[:want]))
        if not block_align:
            break
    samples = np.asarray(out, dtype=np.int64)
    return {
        "kind": "audio",
        "sample_rate": sr,
        "n_samples": len(out),
        "data": samples.astype("<i2").tobytes(),
        "samples": samples,
    }


# --- G.711 mu-law / A-law --------------------------------------------------

_G711_BIAS, _G711_CLIP = 0x84, 32635


def _ulaw_decode_table() -> np.ndarray:
    """ITU-T G.711 mu-law expansion, all 256 codes at once: complement
    the code, then magnitude = ((mant<<3)+BIAS) << exp minus BIAS,
    negated when the (complemented) sign bit is set. Closed form — the
    oracle replays the identical arithmetic in SQL."""
    u = 255 - np.arange(256, dtype=np.int32)  # ~code & 0xFF
    t = (((u & 0x0F) << 3) + _G711_BIAS) << ((u >> 4) & 7)
    return np.where(u & 0x80, _G711_BIAS - t, t - _G711_BIAS).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """ITU-T G.711 A-law expansion: XOR 0x55, then segment 0 adds the
    half-step 8, segment 1 adds 0x108, higher segments shift; the
    0x80 bit is the POSITIVE sign (opposite of mu-law)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a >> 4) & 7
    t = (a & 0x0F) << 4
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_encode(samples) -> bytes:
    """G.711 mu-law compression of 16-bit linear samples, vectorized:
    bias the clipped magnitude, exponent = bit_length - 8 (exact via
    frexp on float64 — integers < 2^53 are exact), 4-bit mantissa,
    complement. encode(decode(code)) == code for every code except
    0x7F (mu-law's redundant negative zero collapses to 0xFF)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _G711_CLIP) + _G711_BIAS
    exp = np.frexp(mag.astype(np.float64))[1] - 8
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def alaw_encode(samples) -> bytes:
    """G.711 A-law compression: 13-bit domain (>>3), negative values
    fold as -x-1, segment by magnitude boundary table, XOR masking
    (0xD5 positive / 0x55 negative). encode(decode(code)) == code for
    all 256 codes (A-law has no redundant zero)."""
    x = np.asarray(samples, dtype=np.int32) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    v = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, v, side="left")
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((v >> shift) & 0x0F)
    return ((aval ^ mask) & 0xFF).astype(np.uint8).tobytes()


def encode_wav_g711(sample_rate: int, samples, law: str = "mu", nch: int = 1) -> bytes:
    """REAL encoder: RIFF/WAVE with format tag 7 (mu-law) or 6
    (A-law) — G.711 telephony audio, 8 bits per sample. `samples` are
    16-bit linear (interleaved if nch > 1); pass raw code bytes via
    `raw=`-free path by pre-encoding with ulaw_encode/alaw_encode and
    encode_wav_g711_raw."""
    codes = ulaw_encode(samples) if law == "mu" else alaw_encode(samples)
    return encode_wav_g711_raw(sample_rate, codes, law=law, nch=nch)


def encode_wav_g711_raw(sample_rate: int, codes: bytes, law: str = "mu", nch: int = 1) -> bytes:
    """RIFF assembly for already-compressed G.711 code bytes (the
    oracle queries generate code streams directly in closed form)."""
    fmt_tag = 7 if law == "mu" else 6
    fmt = struct.pack("<HHIIHH", fmt_tag, nch, sample_rate, sample_rate * nch, nch, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<I", 4) + struct.pack("<I", len(codes) // nch)
    chunks += b"data" + struct.pack("<I", len(codes)) + codes
    if len(codes) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _decode_wav_g711(sr: int, fmt_tag: int, nch: int, data: bytes) -> dict:
    """Expand a G.711 data chunk through the 256-entry table — one
    numpy gather, no per-byte python."""
    table = _ULAW_TABLE if fmt_tag == 7 else _ALAW_TABLE
    samples = table[np.frombuffer(data, dtype=np.uint8)]
    n_samples = len(data) // max(nch, 1)
    return {
        "kind": "audio",
        "sample_rate": sr,
        "n_samples": n_samples,
        "data": samples.astype("<i2").tobytes(),
        "samples": samples,
    }


# --- GIF (LZW) -------------------------------------------------------------

def encode_gif(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """REAL encoder: GIF89a with a global color table and one image
    block, real variable-width LZW (dict growth, width bumps at
    2^n boundaries, table reset at 4096) — from the public GIF89a
    specification. `indices` are palette indices (one byte per
    pixel), `palette` is RGB triples padded up to a power-of-two
    entry count."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dims")
    n_colors = len(palette) // 3
    if len(palette) % 3 or not 2 <= n_colors <= 256:
        raise ValueError("palette must be 2..256 RGB triples")
    size_bits = max(2, (n_colors - 1).bit_length())
    pal = palette + b"\x00" * (3 * ((1 << size_bits) - n_colors))
    mcs = size_bits  # LZW minimum code size
    blocks = _gif_lzw_encode(indices, mcs)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | ((size_bits - 1) << 4) | (size_bits - 1), 0, 0)
    imgdesc = b"," + struct.pack("<HHHHB", 0, 0, width, height, 0)
    return b"GIF89a" + lsd + pal + imgdesc + bytes([mcs]) + blocks + b";"


def _gif_lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Variable-width LZW compress + LSB bit-pack + 255-byte
    sub-blocking (incl. terminator) — shared by the still and
    animation encoders."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width_now = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    out_bits.append((clear, width_now))
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width_now))
        table[cand] = next_code
        next_code += 1
        # canonical width bump: when the NEXT code to assign (which the
        # decoder may reference immediately, K-K-K) reaches 2^width
        if next_code == (1 << width_now) and width_now < 12:
            width_now += 1
        if next_code > 4095:
            out_bits.append((clear, width_now))
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = end + 1
            width_now = mcs + 1
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width_now))
    out_bits.append((end, width_now))

    # LSB-first bit packing (GIF's bit order), then 255-byte sub-blocks
    acc, nacc, data = 0, 0, bytearray()
    for code, wd in out_bits:
        acc |= code << nacc
        nacc += wd
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return b"".join(
        bytes([min(255, len(data) - i)]) + bytes(data[i : i + 255])
        for i in range(0, len(data), 255)
    ) + b"\x00"


def _gif_lzw_decode(data: bytes, mcs: int) -> bytearray:
    """Dispatching entry for the GIF LZW hot loop: the compiled
    shim's from-spec C twin when buildable (sources/native_image.py
    policy env; bit-exact by construction — same algorithm, pinned by
    tests), the pure decoder below otherwise. Any native failure
    falls back to pure for the house-typed error."""
    from corrie_spark.sources import native_image as NI

    if NI.image_shim_enabled():
        try:
            return bytearray(NI.gif_lzw_native(bytes(data), mcs))
        except NI.NativeImageError:
            pass
    return _gif_lzw_decode_py(data, mcs)


def _gif_lzw_decode_py(data: bytes, mcs: int) -> bytearray:
    """Variable-width LZW decompress (clear/end codes, dict growth
    with width bumps, the K=K-K special case, 4096-entry reset) —
    shared by the still decoder and the animation compositor."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    width_now = mcs + 1
    acc = nacc = di = 0
    prev: bytes | None = None
    out = bytearray()

    def next_code():
        nonlocal acc, nacc, di
        while nacc < width_now:
            if di >= len(data):
                return None
            acc |= data[di] << nacc
            di += 1
            nacc += 8
        c = acc & ((1 << width_now) - 1)
        acc >>= width_now
        nacc -= width_now
        return c

    while True:
        c = next_code()
        if c is None or c == end:
            break
        if c == clear:
            table = table[: (1 << mcs) + 2]
            width_now = mcs + 1
            prev = None
            continue
        if prev is None:
            if c >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[c]
        elif c < len(table):
            entry = table[c]
            table.append(prev + entry[:1])
        elif c == len(table):  # the K-K-K case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        # width bump one entry EARLY: the encoder adds its entry
        # before this decoder does (it is always one code ahead),
        # so when the local table reaches 2^w - 1 the encoder's
        # next emission is already w+1 bits wide
        if len(table) == (1 << width_now) - 1 and width_now < 12:
            width_now += 1
        prev = entry
    return out


def _decode_gif(payload: bytes) -> dict:
    """REAL codec: GIF87a/89a from the public spec — logical screen
    descriptor, global/local color tables, extension-block skip, and
    the variable-width LZW decompressor (clear/end codes, dict
    growth with width bumps, the K=K-K special case, 4096-entry
    reset). Decodes the FIRST image block (still images and frame 1
    of animations); interlaced row order is de-interlaced. Output is
    RGB triples via the palette, top-down — same shape as the other
    color decoders."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        interlaced = bool(ipacked & 0x40)
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        out = _gif_lzw_decode(bytes(data), mcs)
        if len(out) < w * h:
            raise ValueError("truncated GIF pixel data")
        idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
        if interlaced:
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            rows = np.empty((h, w), dtype=np.uint8)
            rows[order] = idx.reshape(h, w)
            idx = rows.ravel()
        npal = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= npal.shape[0]:
            raise ValueError("GIF palette index out of range")
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "data": npal[idx].ravel().tobytes(),
        }
    raise ValueError("GIF has no image block")


def encode_gif_animation(
    width: int,
    height: int,
    frames: list[tuple],
    palette: bytes,
    bg_index: int = 0,
    delay_cs: int = 10,
) -> bytes:
    """REAL encoder: multi-frame GIF89a animation. Each frame is
    (left, top, w, h, indices, disposal, transparent_idx_or_None); a
    Graphic Control Extension precedes every image block carrying the
    disposal method (1 keep, 2 restore-background, 3 restore-previous),
    the frame delay and the transparency index — the full inter-frame
    state machine of the public spec."""
    n_colors = len(palette) // 3
    if len(palette) % 3 or not 2 <= n_colors <= 256:
        raise ValueError("palette must be 2..256 RGB triples")
    size_bits = max(2, (n_colors - 1).bit_length())
    pal = palette + b"\x00" * (3 * ((1 << size_bits) - n_colors))
    mcs = size_bits
    lsd = struct.pack(
        "<HHBBB", width, height,
        0x80 | ((size_bits - 1) << 4) | (size_bits - 1), bg_index, 0,
    )
    body = bytearray()
    for left, top, w, h, indices, disposal, tidx in frames:
        if len(indices) != w * h:
            raise ValueError("frame index buffer does not match dims")
        packed = (disposal & 7) << 2 | (1 if tidx is not None else 0)
        body += b"\x21\xf9\x04" + bytes([packed]) + struct.pack(
            "<H", delay_cs
        ) + bytes([tidx or 0, 0])
        body += b"," + struct.pack("<HHHHB", left, top, w, h, 0)
        body += bytes([mcs]) + _gif_lzw_encode(indices, mcs)
    return b"GIF89a" + lsd + pal + bytes(body) + b";"


def _gif_image_count(payload: bytes) -> int:
    """Count image blocks by walking the block structure (sub-block
    lengths let the LZW data be skipped without decoding) — routes
    image/gif payloads between the still decoder and the animation
    compositor."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    packed = payload[10]
    pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    n = 0
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:  # extension
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image: descriptor + local palette + lzw
            n += 1
            ipacked = payload[pos + 9]
            pos += 10 + (3 * (2 << (ipacked & 7)) if ipacked & 0x80 else 0)
            pos += 1  # min code size
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    return n


def _decode_gif_animation(payload: bytes) -> dict:
    """REAL codec: animated GIF89a — a true INTER-FRAME video decode
    with stdlib only: every frame is a rect DELTA composited onto the
    logical-screen canvas under the GCE state machine (transparency
    holes keep the underlying canvas; disposal 1 keeps the composite,
    2 restores the frame rect to the background color, 3 restores the
    pre-frame canvas). Emits FULL canvas snapshots (RGB, top-down) in
    the fake/AVI/MP4 video shape so frame_stats / video_fingerprint /
    the dedup screens consume animations unchanged. fps recovers from
    the GCE delay (centiseconds)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    bg_rgb = (
        np.frombuffer(gct[3 * bg : 3 * bg + 3], dtype=np.uint8)
        if gct is not None and 3 * bg + 3 <= len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    disposal, tidx, delay = 0, None, None
    frames: list[bytes] = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # GCE
                gpacked = payload[pos + 1]
                disposal = (gpacked >> 2) & 7
                (d,) = struct.unpack_from("<H", payload, pos + 2)
                delay = d if delay is None else delay
                tidx = payload[pos + 4] if gpacked & 1 else None
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        out = _gif_lzw_decode(bytes(data), mcs)
        if len(out) < w * h:
            raise ValueError("truncated GIF pixel data")
        idx = np.frombuffer(bytes(out[: w * h]), dtype=np.uint8)
        if ipacked & 0x40:  # interlace de-pass
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            rows = np.empty((h, w), dtype=np.uint8)
            rows[order] = idx.reshape(h, w)
            idx = rows.ravel()
        npal = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= npal.shape[0]:
            raise ValueError("GIF palette index out of range")
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame rect exceeds logical screen")
        before = canvas.copy() if disposal == 3 else None
        rect = npal[idx].reshape(h, w, 3)
        target = canvas[top : top + h, left : left + w]
        if tidx is not None:
            mask = (idx.reshape(h, w) != tidx)[:, :, None]
            target[...] = np.where(mask, rect, target)
        else:
            target[...] = rect
        frames.append(canvas.tobytes())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal, tidx = 0, None
    if not frames:
        raise ValueError("GIF has no image block")
    return {
        "kind": "video",
        "n_frames": len(frames),
        "frame_size": sw * sh * 3,
        "width": sw,
        "height": sh,
        "channels": 3,
        "fps": (100 // delay) if delay else None,
        "data": b"".join(frames),
    }


def _packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (the Apple RLE scheme TIFF §9 adopts): runs of
    >=2 equal bytes become (257-n, byte); literals become (n-1,
    bytes). Deterministic greedy runs."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run up to the next 2-byte repeat
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:  # literal c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += bytes((data[i],)) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    if len(out) < expect:
        raise ValueError("short PackBits strip")
    return bytes(out[:expect])


def _lzw_encode_msb(data: bytes) -> bytes:
    """TIFF-convention LZW encoder (§7.4.4 twin of the PDF decoder:
    MSB-first variable 9..12-bit codes, Clear=256/EOD=257, EarlyChange
    width bump when the entry just added has index (1<<width)-1, Clear
    emitted when the 12-bit table fills). Used by the TIFF fixture
    builder; decode goes through sources.pdf._lzw_decode — the SAME
    public convention, so the gated fixture cross-checks both."""
    out_bits: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((256, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        elif width == 12 and next_code == (1 << 12) - 1:
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))
    buf = 0
    nbits = 0
    enc = bytearray()
    for code, cw in out_bits:
        buf = (buf << cw) | code
        nbits += cw
        while nbits >= 8:
            enc.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        enc.append((buf << (8 - nbits)) & 0xFF)
    return bytes(enc)


_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(
    width: int,
    height: int,
    data: bytes,
    compression: int = 1,
    predictor: int = 1,
    samples: int = 1,
    rows_per_strip: int = 2,
    big_endian: bool = False,
) -> bytes:
    """REAL encoder: baseline TIFF 6.0, 8-bit gray (samples=1) or RGB
    (samples=3), MULTIPLE strips (rows_per_strip), compression 1=none
    / 5=LZW / 32773=PackBits, optional horizontal-differencing
    predictor (2) on compressed strips, either byte order."""
    if len(data) != width * height * samples:
        raise ValueError("pixel buffer does not match dims")
    e = ">" if big_endian else "<"
    strips: list[bytes] = []
    for r0 in range(0, height, rows_per_strip):
        rows = min(rows_per_strip, height - r0)
        raw = data[
            r0 * width * samples : (r0 + rows) * width * samples
        ]
        if predictor == 2:
            a = np.frombuffer(raw, dtype=np.uint8).reshape(
                rows, width, samples
            ).astype(np.int16)
            d = a.copy()
            d[:, 1:, :] = a[:, 1:, :] - a[:, :-1, :]
            raw = (d.astype(np.uint8)).tobytes()
        if compression == 5:
            strips.append(_lzw_encode_msb(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)
    phot = 1 if samples == 1 else 2

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    def _short_or_long(v: int) -> tuple[int, int]:
        return (3, v) if v < 0x10000 else (4, v)

    # layout: header(8) + IFD + arrays + strip data
    n_entries = 10 + (1 if predictor == 2 else 0)
    ifd_at = 8
    ifd_size = 2 + 12 * n_entries + 4
    arrays_at = ifd_at + ifd_size
    arrays = bytearray()

    def arr_long(values: list[int]) -> int:
        off = arrays_at + len(arrays)
        for v in values:
            arrays.extend(struct.pack(e + "I", v))
        return off

    def arr_short(values: list[int]) -> int:
        off = arrays_at + len(arrays)
        for v in values:
            arrays.extend(struct.pack(e + "H", v))
        return off

    # strip offsets need the data start; compute after arrays we know:
    # reserve the two n_strips-long arrays up front when n_strips > 2
    counts = [len(s) for s in strips]
    # BitsPerSample (per sample)
    bps_val = 8
    if samples == 3:
        bps_off = arr_short([8, 8, 8])
    data_at_holder: list[int] = []

    def build_entries(strip_offsets: list[int]) -> bytes:
        ent = bytearray()
        wt, wv = _short_or_long(width)
        ht, hv = _short_or_long(height)
        items: list[tuple[int, int, int, int]] = [
            (256, wt, 1, wv),
            (257, ht, 1, hv),
        ]
        if samples == 3:
            items.append((258, 3, 3, bps_off))
        else:
            items.append((258, 3, 1, bps_val))
        items.append((259, 3, 1, compression))
        items.append((262, 3, 1, phot))
        if n_strips == 1:
            items.append((273, 4, 1, strip_offsets[0]))
        else:
            items.append((273, 4, n_strips, so_off))
        items.append((277, 3, 1, samples))
        items.append((278, 3, 1, rows_per_strip))
        if n_strips == 1:
            items.append((279, 4, 1, counts[0]))
        else:
            items.append((279, 4, n_strips, sc_off))
        items.append((282, 3, 1, 72))  # XResolution as SHORT (lenient)
        if predictor == 2:
            items.append((317, 3, 1, 2))
        items.sort()
        for tag, typ, cnt, val in items:
            ent += struct.pack(e + "HHI", tag, typ, cnt)
            if typ == 3 and cnt == 1:
                ent += struct.pack(e + "HH", val, 0)
            else:
                ent += struct.pack(e + "I", val)
        return bytes(ent)

    if n_strips > 1:
        so_off = arr_long([0] * n_strips)  # patched below
        sc_off = arr_long(counts)
    data_at = arrays_at + len(arrays)
    offs = []
    pos = data_at
    for c in counts:
        offs.append(pos)
        pos += c
    if n_strips > 1:
        # patch the reserved strip-offset array
        rel = so_off - arrays_at
        for i, o in enumerate(offs):
            arrays[rel + 4 * i : rel + 4 * i + 4] = struct.pack(e + "I", o)
    out = bytearray()
    out += (b"MM" if big_endian else b"II")
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_at)
    ent = build_entries(offs)
    out += struct.pack(e + "H", n_entries)
    out += ent
    out += struct.pack(e + "I", 0)  # no next IFD
    assert len(out) == arrays_at, (len(out), arrays_at)
    out += arrays
    for s in strips:
        out += s
    return bytes(out)


def _tiff_ifd_tags(payload: bytes) -> tuple[str, dict[int, list[int]]]:
    """Shared TIFF 6.0 IFD walk -> (struct endianness, {tag: values})
    — the decoder and the header-only metadata scan both ride it.
    RATIONAL values keep (numerator, denominator) interleaved."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF file")
    (ifd_at,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_at + 2 > len(payload):
        raise ValueError("truncated IFD offset")
    (n_ent,) = struct.unpack_from(e + "H", payload, ifd_at)
    if ifd_at + 2 + 12 * n_ent + 4 > len(payload):
        raise ValueError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_ent):
        at = ifd_at + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, at)
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        vat = at + 8 if total <= 4 else struct.unpack_from(e + "I", payload, at + 8)[0]
        if vat + total > len(payload):
            raise ValueError(f"tag {tag} value out of range")
        vals: list[int] = []
        for k in range(cnt):
            if typ == 3:
                vals.append(struct.unpack_from(e + "H", payload, vat + 2 * k)[0])
            elif typ == 4:
                vals.append(struct.unpack_from(e + "I", payload, vat + 4 * k)[0])
            elif typ in (1, 2):
                vals.append(payload[vat + k])
            else:  # RATIONAL: keep numerator (resolutions, unused)
                vals.append(struct.unpack_from(e + "I", payload, vat + 8 * k)[0])
        tags[tag] = vals
    return e, tags


def tiff_metadata(payload: bytes) -> dict:
    """Header-only TIFF scan (the parse_jpeg_metadata twin): dims,
    compression name, photometric, bits per sample, strip count, and
    DPI from XResolution/YResolution numerators when ResolutionUnit
    is inches — no strip is ever decompressed."""
    _, tags = _tiff_ifd_tags(payload)
    comp_names = {1: "none", 5: "lzw", 32773: "packbits"}
    out: dict = {
        "width": tags.get(256, [None])[0],
        "height": tags.get(257, [None])[0],
        "compression": comp_names.get(
            tags.get(259, [1])[0], str(tags.get(259, [1])[0])
        ),
        "photometric": tags.get(262, [None])[0],
        "bits_per_sample": tags.get(258, [8])[0],
        "n_strips": len(tags.get(273, [])),
    }
    if tags.get(296, [2])[0] == 2:  # inches
        if 282 in tags:
            out["dpi_x"] = tags[282][0]
        if 283 in tags:
            out["dpi_y"] = tags[283][0]
    if out["width"] is None or out["height"] is None:
        raise ValueError("missing required TIFF dimension tags")
    return out


def _decode_tiff(payload: bytes) -> dict:
    """REAL codec: baseline TIFF 6.0 from the public spec — II/MM
    byte order, IFD walk, strip assembly (RowsPerStrip), compression
    1 (none), 5 (LZW — the SAME MSB-first EarlyChange convention the
    PDF filter implements; reused from sources/pdf.py) and 32773
    (PackBits), horizontal-differencing predictor (317=2), 8-bit
    grayscale (photometric 0/1) and RGB (photometric 2). Returns the
    top-down pixel bytes like the other image codecs."""
    e, tags = _tiff_ifd_tags(payload)
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as k:
        raise ValueError(f"missing required TIFF tag {k}") from None
    comp = tags.get(259, [1])[0]
    phot = tags.get(262, [1])[0]
    samples = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    rows_per_strip = tags.get(278, [height])[0] or height
    if any(b != 8 for b in bps) or samples not in (1, 3) or phot not in (0, 1, 2):
        raise ValueError(
            f"unsupported TIFF shape (bps={bps}, spp={samples}, phot={phot})"
        )
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count length mismatch")
    out = bytearray()
    row_bytes = width * samples
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, height - si * rows_per_strip)
        if rows <= 0:
            break
        expect = rows * row_bytes
        blob = payload[off : off + cnt]
        if len(blob) < cnt:
            raise ValueError("truncated strip")
        if comp == 1:
            raw = blob[:expect]
            if len(raw) < expect:
                raise ValueError("short uncompressed strip")
        elif comp == 5:
            from corrie_spark.sources.pdf import _lzw_decode

            raw = _lzw_decode(blob)[:expect]
            if len(raw) < expect:
                raise ValueError("short LZW strip")
        elif comp == 32773:
            raw = _packbits_decode(blob, expect)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        if tags.get(317, [1])[0] == 2:
            a = np.frombuffer(raw, dtype=np.uint8).reshape(
                rows, width, samples
            )
            raw = np.cumsum(a, axis=1, dtype=np.uint32).astype(
                np.uint8
            ).tobytes()
        out += raw
    if len(out) != height * row_bytes:
        raise ValueError("assembled pixel size mismatch")
    data = bytes(out)
    if phot == 0:  # WhiteIsZero: invert to the BlackIsZero convention
        data = bytes(255 - b for b in data)
    return {"kind": "image", "width": width, "height": height, "data": data}


def _decode_wav(payload: bytes) -> dict:
    """REAL codec: RIFF/WAVE PCM (8- or 16-bit, any channel count)
    from the public container layout — 'RIFF' <size> 'WAVE', then
    chunks ('fmt ' carries format tag/channels/sample-rate/bits,
    'data' carries the frames; chunk sizes pad to even). Returns
    int-valued samples (numpy) so amplitude stats are exact; format
    tags 1 (PCM), 0x11 (IMA ADPCM), 6/7 (G.711 A-law/mu-law) are
    decoded natively — other compressed WAVs raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, bits, nch, data = 12, None, None, None, None
    fmt_tag = None
    block_align = 0
    samples_per_block = 0
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, nch, sr = struct.unpack_from("<HHI", body, 0)
            block_align = struct.unpack_from("<H", body, 12)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag == 0x11:  # IMA ADPCM: mono, 4-bit codes
                if nch != 1 or bits != 4:
                    raise ValueError(f"unsupported ADPCM WAV (nch={nch}, bits={bits})")
                if len(body) >= 20:
                    samples_per_block = struct.unpack_from("<H", body, 18)[0]
            elif fmt_tag in (6, 7):  # G.711 A-law / mu-law: 8-bit codes
                if bits != 8 or nch < 1:
                    raise ValueError(f"unsupported G.711 WAV (nch={nch}, bits={bits})")
            elif fmt_tag != 1 or bits not in (8, 16) or nch < 1:
                raise ValueError(f"unsupported WAV (fmt={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks pad to even length
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag == 0x11:
        return _decode_wav_adpcm(sr, block_align, samples_per_block, data)
    if fmt_tag in (6, 7):
        return _decode_wav_g711(sr, fmt_tag, nch, data)
    frame_bytes = nch * bits // 8
    n_samples = len(data) // frame_bytes
    usable = data[: n_samples * frame_bytes]
    samples = np.frombuffer(usable, dtype=np.uint8 if bits == 8 else np.dtype("<i2"))
    return {
        "kind": "audio",
        "sample_rate": sr,
        "n_samples": n_samples,
        "data": usable,
        "samples": samples,
    }


def _riff_chunks(data: bytes, pos: int, end: int):
    """Walk RIFF sub-chunks in data[pos:end]: yields (fourcc, body,
    body_start). LIST chunks yield as ('LIST:<type>', inner, ...)."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"LIST" and len(body) >= 4:
            yield (b"LIST:" + body[:4], body[4:], pos + 12)
        else:
            yield (cid, body, pos + 8)
        pos += 8 + sz + (sz & 1)  # chunks pad to even length


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """REAL encoder: minimal MJPEG AVI (RIFF 'AVI ' with an hdrl list
    — avih + one 'vids'/'MJPG' stream — and a movi list of '00dc'
    chunks, one JPEG per frame; public AVI RIFF layout + OpenDML
    conventions). Exists for fixtures and sink symmetry; decode is
    the production direction."""
    n = len(frames)
    frame_us = 1_000_000 // max(fps, 1)
    maxbytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        frame_us, maxbytes * fps, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0
    )
    strf = strf[:16] + b"MJPG" + strf[20:]  # biCompression fourcc

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode_avi_mjpeg(payload: bytes) -> dict:
    """REAL codec: MJPEG AVI — RIFF container walk (hdrl for the
    declared dims/rate, movi for the '00dc'/'00db' frame chunks), each
    frame decoded by the repo's own baseline-JPEG decoder
    (operators/jpeg.py). Closes the compressed-VIDEO half of the
    media seam: MJPEG is the canonical intra-only format (every frame
    standalone), so the container walk + still-image codec IS the
    full decode — no inter-frame state. Returns the same shape the
    fake video codec produces ({n_frames, frame_size, data} with
    frames concatenated) so frame_stats/sample_frames run unchanged.
    Frames must agree on decoded dimensions; inter-frame formats
    (MPEG/H.26x in AVI, MP4 containers) still raise to the external-
    decoder seam."""
    from corrie_spark.operators.jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps = None
    compression = None
    frames: list[bytes] = []
    for cid, body, _ in _riff_chunks(payload, 12, len(payload)):
        if cid == b"LIST:hdrl":
            for hid, hbody, _ in _riff_chunks(body, 0, len(body)):
                if hid == b"avih" and len(hbody) >= 4:
                    (frame_us,) = struct.unpack_from("<I", hbody, 0)
                    fps = 1_000_000 // frame_us if frame_us else None
                elif hid == b"LIST:strl":
                    for sid, sbody, _ in _riff_chunks(hbody, 0, len(hbody)):
                        if sid == b"strh" and sbody[:4] == b"vids":
                            compression = sbody[4:8]
        elif cid == b"LIST:movi":
            for mid_, mbody, _ in _riff_chunks(body, 0, len(body)):
                if mid_[2:4] in (b"dc", b"db"):
                    frames.append(mbody)
    if compression not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"AVI stream codec {compression!r} not decoded natively "
            "(only MJPG; inter-frame codecs fall to the external seam)"
        )
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    decoded = [decode_jpeg(f) for f in frames]
    w, h, ch = decoded[0]["width"], decoded[0]["height"], decoded[0]["channels"]
    if any(d["width"] != w or d["height"] != h or d["channels"] != ch for d in decoded):
        raise ValueError("MJPEG frames disagree on dimensions")
    return {
        "kind": "video",
        "n_frames": len(decoded),
        "frame_size": w * h * ch,
        "width": w,
        "height": h,
        "channels": ch,
        "fps": fps,
        "data": b"".join(d["data"] for d in decoded),
    }


# --- MP4 / ISO base media file format (ISO/IEC 14496-12) --------------------

def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _mp4_box(btype, struct.pack(">I", (version << 24) | flags) + body)


def _mp4_boxes(data: bytes, pos: int, end: int):
    """Walk ISO-BMFF boxes in data[pos:end]: yields (fourcc, body,
    body_start). Handles the spec's 64-bit largesize (size==1) and
    to-end (size==0) encodings."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body_start = pos + 16
        elif size == 0:
            size = end - pos
            body_start = pos + 8
        else:
            body_start = pos + 8
        if size < body_start - pos or pos + size > end:
            raise ValueError(f"bad MP4 box size at {pos}")
        yield btype, data[body_start : pos + size], body_start
        pos += size


_MP4_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    frames: list[bytes], width: int, height: int,
    fps: int = 10, samples_per_chunk: int = 2,
) -> bytes:
    """REAL encoder: minimal ISO-BMFF MP4 (ftyp + mdat + moov) with a
    single 'vide' track whose sample entry is the QuickTime/ISO 'jpeg'
    VisualSampleEntry — MJPEG-in-MP4, one JPEG per sample. Samples are
    grouped `samples_per_chunk` per chunk so the stsc/stco/stsz sample
    tables are exercised non-trivially (a tail chunk gets its own stsc
    entry). Exists for fixtures and sink symmetry; decode is the
    production direction."""
    n = len(frames)
    timescale, delta = fps, 1
    mdat = b"".join(frames)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    data_base = len(ftyp) + 8  # mdat payload starts after its header

    spc = max(1, samples_per_chunk)
    sizes = [len(f) for f in frames]
    chunk_offsets, stsc_entries = [], []
    pos = data_base
    i = 0
    chunk_no = 0
    while i < n:
        take = min(spc, n - i)
        chunk_no += 1
        chunk_offsets.append(pos)
        if not stsc_entries or stsc_entries[-1][1] != take:
            stsc_entries.append((chunk_no, take))
        pos += sum(sizes[i : i + take])
        i += take

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi fixed-point
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # reserved + frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth + pre_defined
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(b"jpeg", entry))
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _mp4_full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", fc, c, 1) for fc, c in stsc_entries),
    )
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _mp4_full(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _mp4_full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _mp4_full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _mp4_box(b"dinf", dref)
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    duration = n * delta
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + _MP4_UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _MP4_UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + _mp4_box(b"mdat", mdat) + moov


_MP4_JPEG_ENTRIES = (b"jpeg", b"mjpa", b"mjpg", b"MJPG")


def _decode_mp4_mjpeg(payload: bytes) -> dict:
    """REAL codec: MP4 / ISO base media file format demux
    (ISO/IEC 14496-12) — box walk to the first 'vide' track's sample
    tables, expand stsc x stco x stsz into absolute per-sample byte
    ranges, and decode each sample with the repo's own baseline-JPEG
    decoder (MJPEG-family sample entries: intra-only, so container
    demux + still codec IS the full decode, exactly like the AVI
    path). fps recovers from mdhd timescale / stts delta. Inter-frame
    sample entries (avc1/hev1/mp4v...) raise to the documented
    external-decoder seam; the oracle-facing return shape matches the
    fake/AVI video codecs so frame_stats / video_fingerprint run
    unchanged."""
    from corrie_spark.operators.jpeg import decode_jpeg

    def find(body_iter, wanted: bytes):
        for btype, body, _ in body_iter:
            if btype == wanted:
                return body
        return None

    moov = find(_mp4_boxes(payload, 0, len(payload)), b"moov")
    if moov is None:
        raise ValueError("not an ISO-BMFF file (no moov box)")
    stbl = timescale = None
    for btype, trak, _ in _mp4_boxes(moov, 0, len(moov)):
        if btype != b"trak":
            continue
        mdia = find(_mp4_boxes(trak, 0, len(trak)), b"mdia")
        if mdia is None:
            continue
        hdlr = find(_mp4_boxes(mdia, 0, len(mdia)), b"hdlr")
        if hdlr is None or hdlr[8:12] != b"vide":
            continue
        mdhd = find(_mp4_boxes(mdia, 0, len(mdia)), b"mdhd")
        if mdhd is not None:
            version = mdhd[0]
            timescale = struct.unpack_from(
                ">I", mdhd, 20 if version == 1 else 12
            )[0]
        minf = find(_mp4_boxes(mdia, 0, len(mdia)), b"minf")
        if minf is not None:
            stbl = find(_mp4_boxes(minf, 0, len(minf)), b"stbl")
        break
    if stbl is None:
        raise ValueError("MP4 has no video track sample table")

    tables: dict[bytes, bytes] = {
        btype: body for btype, body, _ in _mp4_boxes(stbl, 0, len(stbl))
    }
    stsd = tables.get(b"stsd")
    if stsd is None or struct.unpack_from(">I", stsd, 4)[0] < 1:
        raise ValueError("MP4 stsd missing or empty")
    entry_fourcc = stsd[12:16]
    if entry_fourcc not in _MP4_JPEG_ENTRIES:
        raise ValueError(
            f"MP4 sample entry {entry_fourcc!r} not decoded natively "
            "(only MJPEG-family; inter-frame codecs fall to the external seam)"
        )

    stsz = tables.get(b"stsz")
    if stsz is None:
        raise ValueError("MP4 missing stsz")
    fixed, n = struct.unpack_from(">II", stsz, 4)
    sizes = (
        [fixed] * n
        if fixed
        else list(struct.unpack_from(f">{n}I", stsz, 12))
    )

    if b"stco" in tables:
        body = tables[b"stco"]
        (nc,) = struct.unpack_from(">I", body, 4)
        offsets = list(struct.unpack_from(f">{nc}I", body, 8))
    elif b"co64" in tables:
        body = tables[b"co64"]
        (nc,) = struct.unpack_from(">I", body, 4)
        offsets = list(struct.unpack_from(f">{nc}Q", body, 8))
    else:
        raise ValueError("MP4 missing stco/co64")

    stsc = tables.get(b"stsc")
    if stsc is None:
        raise ValueError("MP4 missing stsc")
    (ne,) = struct.unpack_from(">I", stsc, 4)
    runs = [struct.unpack_from(">III", stsc, 8 + 12 * i)[:2] for i in range(ne)]

    # expand sample-to-chunk: run r applies to chunks [first_r, first_{r+1})
    frames: list[bytes] = []
    si = 0
    for r, (first, per_chunk) in enumerate(runs):
        last = runs[r + 1][0] if r + 1 < len(runs) else len(offsets) + 1
        for chunk in range(first, last):
            pos = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= n:
                    break
                frames.append(payload[pos : pos + sizes[si]])
                pos += sizes[si]
                si += 1
    if si < n:
        raise ValueError("MP4 sample tables inconsistent (samples unmapped)")

    fps = None
    stts = tables.get(b"stts")
    if stts is not None and struct.unpack_from(">I", stts, 4)[0] >= 1:
        _, delta = struct.unpack_from(">II", stts, 8)
        if timescale and delta:
            fps = timescale // delta

    decoded = [decode_jpeg(f) for f in frames]
    w, h, ch = decoded[0]["width"], decoded[0]["height"], decoded[0]["channels"]
    if any(d["width"] != w or d["height"] != h or d["channels"] != ch for d in decoded):
        raise ValueError("MJPEG samples disagree on dimensions")
    return {
        "kind": "video",
        "n_frames": len(decoded),
        "frame_size": w * h * ch,
        "width": w,
        "height": h,
        "channels": ch,
        "fps": fps,
        "data": b"".join(d["data"] for d in decoded),
    }


# --- MPEG audio (MP3): frame-header scan + ID3 tags -------------------------
# ISO/IEC 11172-3 §2.4.1.3 frame-header layout (+ the 13818-3 LSF
# halved-frame variant) and the public id3.org ID3v2.3/2.4 and ID3v1
# layouts. METADATA ONLY — frame headers are parsed and stepped over
# by their computed byte length; the Huffman-coded granule payload is
# never decoded (the decode seam in decode_payload stays the
# documented external-decoder stub). This is the header-only walk the
# jpeg_metadata stage does for images, for audio: duration, bitrate,
# VBR-ness and tags per file at header-bytes cost.

# Layer III bitrate tables, kbit/s (index 0 = "free format", 15 = bad)
MP3_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
MP3_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
# sampling-rate tables by version bits (11=MPEG1, 10=MPEG2, 00=MPEG2.5)
MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _id3_syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3v2_parse(data: bytes) -> tuple[dict, int]:
    """ID3v2 tag at offset 0 -> ({tag frame id -> text}, total tag
    bytes consumed). Returns ({}, 0) when no tag. Text frames decode
    by their encoding byte (0 latin-1, 1 UTF-16+BOM, 3 UTF-8)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}, 0
    major = data[3]
    flags = data[5]
    size = _id3_syncsafe(data[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)
    tags: dict[str, str] = {}
    pos, end = 10, min(10 + size, len(data))
    if flags & 0x40 and pos + 4 <= end:
        # extended header precedes the frames (id3.org §3.2): skip it,
        # else its bytes get misread as a frame id/size and every tag
        # frame is silently dropped. v2.4 counts the whole ext header
        # in its (syncsafe) size; v2.3's (plain) size excludes the
        # 4 size bytes themselves.
        if major >= 4:
            pos += max(_id3_syncsafe(data[pos : pos + 4]), 6)
        else:
            pos += 4 + int.from_bytes(data[pos : pos + 4], "big")
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        fsz = (
            _id3_syncsafe(data[pos + 4 : pos + 8])
            if major >= 4
            else int.from_bytes(data[pos + 4 : pos + 8], "big")
        )
        body = data[pos + 10 : pos + 10 + fsz]
        pos += 10 + fsz
        if fid.startswith(b"T") and body:
            enc, text = body[0], body[1:]
            try:
                if enc == 0:
                    s = text.decode("latin-1")
                elif enc == 1:
                    s = text.decode("utf-16")
                elif enc == 3:
                    s = text.decode("utf-8")
                else:
                    continue
            except UnicodeDecodeError:
                continue
            tags[fid.decode("ascii")] = s.rstrip("\x00")
    return tags, total


def _mp3_header(b: bytes) -> dict | None:
    """Parse 4 header bytes; None unless a valid Layer III header."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version = (b[1] >> 3) & 0x3  # 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
    layer = (b[1] >> 1) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bidx = (b[2] >> 4) & 0xF
    sidx = (b[2] >> 2) & 0x3
    if bidx in (0, 15) or sidx == 3:
        return None
    kbps = (MP3_BITRATES_V1 if version == 3 else MP3_BITRATES_V2)[bidx]
    sr = MP3_RATES[version][sidx]
    pad = (b[2] >> 1) & 0x1
    mode = (b[3] >> 6) & 0x3  # 3 = mono
    # Layer III frame length incl. header (+CRC when protected):
    # MPEG1 144 bytes/kbit, LSF versions half that (§2.4.2.3 / 13818-3)
    factor = 144_000 if version == 3 else 72_000
    return {
        "version": version,
        "kbps": kbps,
        "sr": sr,
        "channels": 1 if mode == 3 else 2,
        "spf": 1152 if version == 3 else 576,
        "frame_len": factor * kbps // sr + pad,
    }


def mp3_scan_bytes(data: bytes) -> dict:
    """Whole-file MP3 scan: ID3v2 tags, frame walk with byte-wise
    resync (junk between tag and first frame, or after the last
    frame, costs its own bytes only — the gzip_members_at stance),
    ID3v1 trailer detection. Returns file-level stats; a file with
    zero valid frames reports ok=False."""
    tags, pos = _id3v2_parse(data)
    end = len(data)
    has_id3v1 = end >= 128 and data[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        if not tags:
            v1 = data[end - 128 :]
            tags = {
                "TIT2": v1[3:33].rstrip(b"\x00 ").decode("latin-1"),
                "TPE1": v1[33:63].rstrip(b"\x00 ").decode("latin-1"),
                "TALB": v1[63:93].rstrip(b"\x00 ").decode("latin-1"),
            }
        end -= 128
    n_frames = 0
    kbps_sum = 0
    kbps_set: set[int] = set()
    first: dict | None = None
    while pos + 4 <= end:
        h = _mp3_header(data[pos : pos + 4])
        if h is None or pos + h["frame_len"] > end:
            pos += 1  # resync
            continue
        if first is None:
            first = h
        elif (h["version"], h["sr"]) != (first["version"], first["sr"]):
            pos += 1  # stray sync inside payload bytes, not our stream
            continue
        n_frames += 1
        kbps_sum += h["kbps"]
        kbps_set.add(h["kbps"])
        pos += h["frame_len"]
    if first is None:
        return {"ok": False}
    return {
        "ok": True,
        "mpeg_version": "mpeg1" if first["version"] == 3 else "mpeg2",
        "sample_rate": first["sr"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "bitrate_kbps": kbps_sum / n_frames,
        "is_vbr": len(kbps_set) > 1,
        "duration_s": (n_frames * first["spf"]) / first["sr"],
        "title": tags.get("TIT2"),
        "artist": tags.get("TPE1"),
        "album": tags.get("TALB"),
        "has_id3v1": has_id3v1,
    }


def _mp3_frame(version: int, bidx: int, sidx: int, mode: int, pad: int,
               protected: bool, seed: bytes) -> bytes:
    """One fixture frame: header assembled from the same bit layout
    the scanner parses, payload = deterministic filler bytes."""
    b1 = 0xFF
    b2 = 0xE0 | (version << 3) | (1 << 1) | (0 if protected else 1)
    b3 = (bidx << 4) | (sidx << 2) | (pad << 1)
    b4 = mode << 6
    kbps = (MP3_BITRATES_V1 if version == 3 else MP3_BITRATES_V2)[bidx]
    sr = MP3_RATES[version][sidx]
    factor = 144_000 if version == 3 else 72_000
    flen = factor * kbps // sr + pad
    body = bytearray([b1, b2, b3, b4])
    if protected:
        body += b"\x00\x00"  # CRC16 placeholder (inside flen)
    import hashlib

    filler = hashlib.md5(seed).digest()
    while len(body) < flen:
        body += filler
    return bytes(body[:flen])


def encode_mp3(
    doc_id: int,
    n_frames: int,
    version: int = 3,
    bidx: int = 5,
    sidx: int = 0,
    mode: int = 0,
    vbr: bool = False,
    id3_major: int = 3,
    title: str | None = None,
    artist: str | None = None,
    album: str | None = None,
    id3v1: bool = False,
    junk_prefix: bytes = b"",
    junk_suffix: bytes = b"",
) -> bytes:
    """Deterministic fixture MP3 (oracle-twin builder): optional
    ID3v2.3/2.4 tag, junk between tag and audio, Layer III frames
    with alternating padding (and alternating bitrate when vbr),
    optional ID3v1 trailer."""
    out = bytearray()
    if title is not None:
        frames = bytearray()
        for fid, text in (("TIT2", title), ("TPE1", artist), ("TALB", album)):
            if text is None:
                continue
            body = (b"\x03" + text.encode("utf-8")
                    if id3_major >= 4 else b"\x00" + text.encode("latin-1"))
            sz = (bytes([(len(body) >> s) & 0x7F for s in (21, 14, 7, 0)])
                  if id3_major >= 4 else len(body).to_bytes(4, "big"))
            frames += fid.encode() + sz + b"\x00\x00" + body
        out += (b"ID3" + bytes([id3_major, 0, 0])
                + bytes([(len(frames) >> s) & 0x7F for s in (21, 14, 7, 0)])
                + frames)
    out += junk_prefix
    for i in range(n_frames):
        bi = bidx + (i % 2) if vbr else bidx
        out += _mp3_frame(
            version, bi, sidx, mode, (doc_id + i) % 2,
            protected=(doc_id % 7 == 0), seed=f"mp3:{doc_id}:{i}".encode(),
        )
    out += junk_suffix
    if id3v1:
        v1 = bytearray(b"TAG")
        v1 += (title or "").encode("latin-1")[:30].ljust(30, b"\x00")
        v1 += (artist or "").encode("latin-1")[:30].ljust(30, b"\x00")
        v1 += (album or "").encode("latin-1")[:30].ljust(30, b"\x00")
        v1 += b"2026" + b"\x00" * 30 + b"\xff"
        out += v1
    return bytes(out)


MP3_SCAN_DDL = (
    "doc_id long, ok boolean, mpeg_version string, sample_rate long, "
    "channels long, n_frames long, bitrate_kbps double, is_vbr boolean, "
    "duration_s double, title string, artist string, album string, "
    "has_id3v1 boolean"
)


def mp3_scan(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Crawl-scale MP3 metadata extraction (the audio twin of
    jpeg_metadata): duration, bitrate, VBR-ness, channel count and
    ID3 tags from a header-only frame walk — audio payload bytes are
    stepped over, never decoded. Arrow map stage, zero shuffle; at
    100 TB it rides the media scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                row = {
                    "doc_id": int(did), "ok": False, "mpeg_version": None,
                    "sample_rate": None, "channels": None, "n_frames": None,
                    "bitrate_kbps": None, "is_vbr": None, "duration_s": None,
                    "title": None, "artist": None, "album": None,
                    "has_id3v1": None,
                }
                try:
                    row.update(mp3_scan_bytes(bytes(payload)))
                except Exception:  # noqa: BLE001 — total function
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array([r["doc_id"] for r in out], dtype="Int64"),
                    "ok": [r["ok"] for r in out],
                    "mpeg_version": [r["mpeg_version"] for r in out],
                    "sample_rate": pd.array([r["sample_rate"] for r in out], dtype="Int64"),
                    "channels": pd.array([r["channels"] for r in out], dtype="Int64"),
                    "n_frames": pd.array([r["n_frames"] for r in out], dtype="Int64"),
                    "bitrate_kbps": [r["bitrate_kbps"] for r in out],
                    "is_vbr": [r["is_vbr"] for r in out],
                    "duration_s": [r["duration_s"] for r in out],
                    "title": [r["title"] for r in out],
                    "artist": [r["artist"] for r in out],
                    "album": [r["album"] for r in out],
                    "has_id3v1": [r["has_id3v1"] for r in out],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, MP3_SCAN_DDL)


# --- Ogg container (RFC 3533) + Vorbis/Opus headers --------------------------
# Page-level metadata scan, the Ogg twin of mp3_scan: codec id,
# channels, rates, duration from the final granule position, and the
# VorbisComment/OpusTags fields — audio packets are never decoded
# (the decode seam stays the documented stub). Page CRCs verified:
# Ogg uses a NON-reflected CRC-32, poly 0x04c11db7, init/xorout 0.

_OGG_CRC_TABLE: list[int] = []


def _ogg_crc(data: bytes) -> int:
    if not _OGG_CRC_TABLE:
        for b in range(256):
            r = b << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
            _OGG_CRC_TABLE.append(r)
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((r >> 24) ^ b) & 0xFF]
    return r


def _ogg_page(
    serial: int, seq: int, granule: int, packets: list[bytes], header_type: int
) -> bytes:
    """One Ogg page: lacing splits each packet into 255-byte segments
    with a final short segment (a 255-multiple packet gets a 0 lace)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    head = (
        b"OggS\x00"
        + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = bytearray(head + body)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _comment_block(tags: dict[str, str]) -> bytes:
    out = struct.pack("<I", 7) + b"fixture"  # vendor string
    out += struct.pack("<I", len(tags))
    for k, v in tags.items():
        kv = f"{k}={v}".encode()
        out += struct.pack("<I", len(kv)) + kv
    return out


def encode_ogg(
    doc_id: int,
    codec: str,
    channels: int,
    sample_rate: int,
    n_audio_pages: int,
    samples_per_page: int,
    tags: dict[str, str],
    preskip: int = 312,
) -> bytes:
    """Deterministic fixture Ogg stream: BOS page with the codec id
    header, a comment page (VorbisComment / OpusTags), then
    `n_audio_pages` audio pages with monotone granule positions —
    one >255-byte packet per audio page so segment lacing is live —
    and EOS on the last."""
    import hashlib

    serial = 0x1000 + doc_id % 977
    if codec == "opus":
        idh = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", preskip)
            + struct.pack("<I", sample_rate)
            + b"\x00\x00"  # output gain
            + b"\x00"  # channel mapping family 0
        )
        cmt = b"OpusTags" + _comment_block(tags)
    else:
        idh = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", 0, 0, 0)
            + b"\xb8\x01"
        )
        cmt = b"\x03vorbis" + _comment_block(tags) + b"\x01"
    pages = [
        _ogg_page(serial, 0, 0, [idh], 0x02),
        _ogg_page(serial, 1, 0, [cmt], 0x00),
    ]
    base = preskip if codec == "opus" else 0
    for i in range(n_audio_pages):
        filler = hashlib.md5(f"ogg:{doc_id}:{i}".encode()).digest()
        pkt = (filler * 25)[: 300 + (doc_id + i) % 64]
        granule = base + (i + 1) * samples_per_page
        eos = 0x04 if i + 1 == n_audio_pages else 0x00
        pages.append(_ogg_page(serial, 2 + i, granule, [pkt], eos))
    return b"".join(pages)


def ogg_scan_bytes(data: bytes) -> dict:
    """Whole-file Ogg scan: page walk with CRC verification and
    byte-wise resync (a corrupt page costs its own bytes), codec id
    from the BOS packet, tags from the comment packet, duration from
    the final granule (Opus granules run at 48 kHz less pre-skip,
    per RFC 7845 §4; Vorbis at the stream sample rate)."""
    pos = 0
    n_pages = 0
    codec = None
    channels = None
    sample_rate = None
    preskip = 0
    last_granule = 0
    tags: dict[str, str] = {}
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        nseg = data[pos + 26]
        head_end = pos + 27 + nseg
        if head_end > len(data):
            break
        body_len = sum(data[pos + 27 : head_end])
        page_end = head_end + body_len
        if page_end > len(data):
            break
        page = bytearray(data[pos:page_end])
        stored = struct.unpack_from("<I", page, 22)[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != stored:
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        header_type = data[pos + 5]
        granule = struct.unpack_from("<q", data, pos + 6)[0]
        body = data[head_end:page_end]
        if header_type & 0x02:  # BOS: codec id header
            if body.startswith(b"OpusHead"):
                codec = "opus"
                channels = body[9]
                preskip = struct.unpack_from("<H", body, 10)[0]
                sample_rate = struct.unpack_from("<I", body, 12)[0]
            elif body.startswith(b"\x01vorbis"):
                codec = "vorbis"
                channels = body[11]
                sample_rate = struct.unpack_from("<I", body, 12)[0]
        elif body.startswith((b"OpusTags", b"\x03vorbis")):
            off = 8 if body.startswith(b"OpusTags") else 7
            try:
                (vlen,) = struct.unpack_from("<I", body, off)
                p = off + 4 + vlen
                (ntags,) = struct.unpack_from("<I", body, p)
                p += 4
                for _ in range(ntags):
                    (ln,) = struct.unpack_from("<I", body, p)
                    p += 4
                    kv = body[p : p + ln].decode("utf-8", errors="replace")
                    p += ln
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        tags[k.upper()] = v
            except struct.error:
                pass
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = page_end
    if codec is None:
        return {"ok": False}
    if codec == "opus":
        duration = max(last_granule - preskip, 0) / 48_000
    else:
        duration = last_granule / sample_rate if sample_rate else 0.0
    return {
        "ok": True,
        "codec": codec,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_pages": n_pages,
        "duration_s": duration,
        "title": tags.get("TITLE"),
        "artist": tags.get("ARTIST"),
    }


OGG_SCAN_DDL = (
    "doc_id long, ok boolean, codec string, channels long, "
    "sample_rate long, n_pages long, duration_s double, "
    "title string, artist string"
)


def ogg_scan(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Crawl-scale Ogg metadata extraction (Vorbis + Opus): duration,
    channels, rates and tags from a page-header walk — audio packets
    are stepped over by the lacing table, never decoded. Arrow map
    stage, zero shuffle; the mp3_scan shape for the Ogg family."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                row = {
                    "doc_id": int(did), "ok": False, "codec": None,
                    "channels": None, "sample_rate": None, "n_pages": None,
                    "duration_s": None, "title": None, "artist": None,
                }
                try:
                    row.update(ogg_scan_bytes(bytes(payload)))
                except Exception:  # noqa: BLE001 — total function
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array([r["doc_id"] for r in out], dtype="Int64"),
                    "ok": [r["ok"] for r in out],
                    "codec": [r["codec"] for r in out],
                    "channels": pd.array([r["channels"] for r in out], dtype="Int64"),
                    "sample_rate": pd.array([r["sample_rate"] for r in out], dtype="Int64"),
                    "n_pages": pd.array([r["n_pages"] for r in out], dtype="Int64"),
                    "duration_s": [r["duration_s"] for r in out],
                    "title": [r["title"] for r in out],
                    "artist": [r["artist"] for r in out],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, OGG_SCAN_DDL)


def decode_payload(media_type: str, payload: bytes) -> dict:
    """Decode seam. `fake/*` types use the deterministic codec;
    image/bmp, image/png (8-bit grey/RGB/palette, zlib-inflated +
    unfiltered natively), image/ppm (P6), image/gif (LZW, stills AND
    GCE-composited animations), image/webp (VP8L stills and ANIM/ANMF
    animations via operators/webp.py), image/jpeg (baseline +
    progressive T.81), audio/wav (PCM, IMA ADPCM, G.711 mu-law/A-law),
    audio/flac (operators/flac.py, lossless bit-exact), video/avi
    (MJPEG) and video/mp4 (ISO-BMFF demux, MJPEG-family sample
    entries) are REAL decoders implemented from the public format
    specs. JPEG and PNG pixel decode DISPATCH to the system
    libjpeg/libpng through the compiled shim (sources/native_image.py,
    CORRIE_NATIVE_CODECS policy; the from-spec decoders stay as
    fallback + differential twins), the same pattern as the
    zstd/brotli/webp fast paths. MP3 gets a header-only metadata scan
    (mp3_scan — duration/bitrate/tags without decode); the remaining
    compressed formats (inter-frame video — H.26x/MP4V —, MP3/AAC
    sample decode, lossy VP8, exotic PNG variants) would dispatch to
    PIL/soundfile/av — unavailable in this environment, so they raise
    (clearly-marked stub)."""
    if media_type in ("image/jpeg", "image/jpg"):
        from corrie_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if media_type == "image/bmp":
        return _decode_bmp(payload)
    if media_type == "image/webp":
        # animations (VP8X anim flag + ANMF chunks) are inter-frame
        # VIDEO, the GIF routing twin; stills keep the image shape
        from corrie_spark.operators.webp import (
            decode_webp,
            decode_webp_animation,
            is_animated_webp,
        )

        if is_animated_webp(payload):
            return decode_webp_animation(payload)
        return decode_webp(payload)
    if media_type == "image/png":
        return _decode_png(payload)
    if media_type in ("image/x-portable-pixmap", "image/ppm"):
        return _decode_ppm(payload)
    if media_type in ("image/tiff", "image/tif"):
        return _decode_tiff(payload)
    if media_type == "image/gif":
        # animations (>1 image block) are inter-frame VIDEO: composite
        # under the GCE state machine; stills keep the image shape
        if _gif_image_count(payload) > 1:
            return _decode_gif_animation(payload)
        return _decode_gif(payload)
    if media_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return _decode_wav(payload)
    if media_type in ("audio/flac", "audio/x-flac"):
        import numpy as np

        from corrie_spark.operators.flac import decode_flac

        d = decode_flac(payload)
        # interleave channels into the WAV-decoder sample shape
        s = np.array(d["pcm"], dtype=np.int64).T.reshape(-1)
        return {
            "kind": "audio",
            "sample_rate": d["sample_rate"],
            "n_samples": d["total"],
            "channels": d["channels"],
            "samples": s,
            "data": s.astype("<i4").tobytes(),
        }
    if media_type in ("video/avi", "video/x-msvideo"):
        return _decode_avi_mjpeg(payload)
    if media_type in ("video/mp4", "video/quicktime"):
        return _decode_mp4_mjpeg(payload)
    if media_type.startswith("fake/"):
        if payload[:7] == IMG_MAGIC:
            w, h = struct.unpack("<ii", payload[7:15])
            return {"kind": "image", "width": w, "height": h, "data": payload[15:]}
        if payload[:7] == AUD_MAGIC:
            sr, n = struct.unpack("<ii", payload[7:15])
            return {"kind": "audio", "sample_rate": sr, "n_samples": n, "data": payload[15:]}
        if payload[:7] == VID_MAGIC:
            nf, fs = struct.unpack("<ii", payload[7:15])
            return {"kind": "video", "n_frames": nf, "frame_size": fs, "data": payload[15:]}
        raise ValueError("bad fake payload header")
    raise NotImplementedError(
        f"decoder for {media_type!r} not available in this environment "
        "(plug PIL/soundfile/av into decode_payload; BMP, 8-bit PNG, "
        "P6 PPM, PCM WAV and baseline JPEG are decoded natively above)"
    )


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas — Arrow-batched, shuffle-free)
# ---------------------------------------------------------------------------

def image_features(df: DataFrame) -> DataFrame:
    """Decode + per-image features. Corrupt/undecodable payloads yield
    ok=false rows instead of failing the task (K7-style isolation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                row = {"media_id": mid, "media_type": mtype, "width": None,
                       "height": None, "n_bytes": None, "mean_pixel": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        data = d["data"]
                        row.update(
                            width=d["width"], height=d["height"], n_bytes=len(data),
                            mean_pixel=_byte_mean(data), ok=True,
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "payload").mapInPandas(run, IMAGE_FEATURES_DDL)


def audio_features(df: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                row = {"media_id": mid, "media_type": mtype, "sample_rate": None,
                       "n_samples": None, "duration_s": None, "mean_amp": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "audio":
                        data = d["data"]
                        if "samples" in d:  # real decoder: exact int
                            # amplitudes (int64-accumulated |x| mean)
                            s = d["samples"]
                            amp = (
                                float(np.abs(s.astype(np.int64)).sum() / s.size)
                                if s.size
                                else 0.0
                            )
                        else:
                            amp = _byte_mean(data)
                        row.update(
                            sample_rate=d["sample_rate"], n_samples=d["n_samples"],
                            duration_s=d["n_samples"] / d["sample_rate"],
                            mean_amp=amp, ok=True,
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "payload").mapInPandas(run, AUDIO_FEATURES_DDL)


def resize_images(df: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Nearest-neighbor resize of fake images (the transform-and-
    rewrite-payload pattern: output is again a media column)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "image":
                    continue
                w, h, data = d["width"], d["height"], d["data"]
                # nearest-neighbor via one numpy gather, no python loop
                ys = np.arange(new_height) * h // new_height
                xs = np.arange(new_width) * w // new_width
                idx = (ys[:, None] * w + xs[None, :]).ravel()
                px = np.frombuffer(data, dtype=np.uint8)[idx].tobytes()
                out.append(
                    {"media_id": mid, "media_type": mtype,
                     "payload": IMG_MAGIC + struct.pack("<ii", new_width, new_height) + px,
                     "width": new_width, "height": new_height}
                )
            yield pd.DataFrame(out, columns=["media_id", "media_type", "payload", "width", "height"])

    return df.select("media_id", "media_type", "payload").mapInPandas(run, RESIZE_DDL)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every k-th frame (one row per sampled
    frame) — the fan-out stage before per-frame feature extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "video":
                    continue
                fs = d["frame_size"]
                for idx in range(0, d["n_frames"], every_k):
                    out.append(
                        {"media_id": mid, "frame_idx": idx,
                         "frame": d["data"][idx * fs : (idx + 1) * fs]}
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "media_type", "payload").mapInPandas(run, FRAME_SAMPLE_DDL)


FRAME_STATS_DDL = (
    "media_id bigint, frame_idx int, frame_bytes int, "
    "mean_val double, min_val int, max_val int"
)


def frame_stats(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame-sample videos and compute per-frame pixel stats in one
    python stage (sample + feature-extract fused: the frame bytes
    never cross a second Arrow boundary). All per-frame math is one
    numpy reshape over the whole clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                d = decode_payload(mtype, bytes(payload))
                if d["kind"] != "video":
                    continue
                fs, nf = d["frame_size"], d["n_frames"]
                frames = np.frombuffer(d["data"], dtype=np.uint8)[: nf * fs].reshape(nf, fs)
                for idx in range(0, nf, every_k):
                    fr = frames[idx]
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "frame_bytes": fs,
                            "mean_val": float(fr.sum(dtype=np.int64) / fr.size),
                            "min_val": int(fr.min()),
                            "max_val": int(fr.max()),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_bytes", "mean_val", "min_val", "max_val"],
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(run, FRAME_STATS_DDL)


AUDIO_SPECTRUM_DDL = (
    "media_id long, sample_rate long, n_samples long, "
    "dominant_bin long, dominant_hz double, energy long"
)


def audio_spectrum(df: DataFrame) -> DataFrame:
    """Frequency-domain audio analysis: decode each clip, mix to
    mono by channel sum (exact integer arithmetic), run one numpy
    rfft, and report the dominant non-DC bin, its frequency, and the
    exact time-domain signal energy (= spectrum energy by Parseval,
    but computed on the integer samples so it is exact). One Arrow
    stage, per-clip local work — the FFT is O(N log N) on
    clip-length windows, vectorized in numpy, bytes never shuffle.

    The integer outputs (bin index, energy) make the op oracle-able
    without cross-engine libm risk: for periodic fixtures the
    dominant bin is closed-form (N / period) and the energy is an
    integer sum of squares — no float spectrum value ever crosses
    the comparison boundary. Undecodable or non-audio payloads are
    skipped (the frame_stats convention)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    d = decode_payload(mtype, bytes(payload))
                except Exception:
                    continue
                if d.get("kind") != "audio":
                    continue
                s = np.asarray(d["samples"], dtype=np.int64)
                # interleaved multi-channel (samples = frames * nch):
                # mix to mono by exact integer channel sum
                nf = int(d.get("n_samples", 0) or 0)
                nch = s.size // nf if nf else 1
                if nch > 1 and s.size == nf * nch:
                    s = s.reshape(-1, nch).sum(axis=1)
                n = int(s.size)
                if n < 2:
                    continue
                spec = np.abs(np.fft.rfft(s.astype(np.float64)))
                k = 1 + int(np.argmax(spec[1:]))
                sr = int(d["sample_rate"])
                out.append(
                    {
                        "media_id": mid,
                        "sample_rate": sr,
                        "n_samples": n,
                        "dominant_bin": k,
                        "dominant_hz": float(k * sr) / n,
                        "energy": int((s * s).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "dominant_bin", "dominant_hz", "energy",
                ],
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        run, AUDIO_SPECTRUM_DDL
    )


# ---------------------------------------------------------------------------
# synthetic corpus builder (tests / demos; expression-level, no python)
# ---------------------------------------------------------------------------

def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media corpus from any keyed table: id % 3
    picks image/audio/video; payloads built JVM-side so the corpus
    itself needs no python stage."""
    mid = F.col(id_col).cast("bigint")
    kind = (mid % 3).cast("int")
    w = (8 + mid % 8).cast("int")
    h = (4 + mid % 4).cast("int")

    def le32(c: Column) -> Column:
        # int32 little-endian bytes, JVM-side
        return F.unhex(
            F.concat(
                *[
                    F.lpad(F.hex(F.shiftright(c.cast("int"), 8 * i) % 256), 2, "0")
                    for i in range(4)
                ]
            )
        )

    def rep_bytes(n: Column, seed: Column, a: int, b: int) -> Column:
        # bytes(((seed + i) * a + b) % 256 for i in range(n)).
        # The sequence is an arithmetic progression mod 256 (step a,
        # start (seed*a+b)%256), i.e. a ROTATION of the fixed 256-byte
        # cycle (j*a)%256 — so instead of per-byte transform/hex/join
        # (O(n) string ops per row) we take ONE substring of a repeated
        # constant: start index j0 = start * a^-1 mod 256 (a odd ->
        # invertible). ~20x less JVM work per payload, identical bytes.
        a_inv = pow(a, -1, 256)
        cycle_hex = "".join(f"{(j * a) % 256:02x}" for j in range(256))
        start = (seed * a + b) % 256
        j0 = (start * a_inv) % 256
        # 8 repetitions cover j0 + n for every payload size used here
        return F.unhex(
            F.repeat(F.lit(cycle_hex), 8).substr(
                (j0.cast("int") * 2 + 1), (n.cast("int") * 2)
            )
        )

    img = F.concat(F.lit(IMG_MAGIC), le32(w), le32(h), rep_bytes(w * h, mid, 31, 7))
    aud = F.concat(
        F.lit(AUD_MAGIC), le32(F.lit(16000)), le32(w * 100), rep_bytes(w * 100, mid, 17, 3)
    )
    vid = F.concat(
        F.lit(VID_MAGIC), le32(F.lit(4)), le32(w * h), rep_bytes(F.lit(4) * w * h, mid, 13, 11)
    )
    return df.select(
        mid.alias("media_id"),
        F.when(kind == 0, F.lit("fake/image"))
        .when(kind == 1, F.lit("fake/audio"))
        .otherwise(F.lit("fake/video"))
        .alias("media_type"),
        F.when(kind == 0, img).when(kind == 1, aud).otherwise(vid).alias("payload"),
    )


DHASH_BITS = 62  # stay inside a positive int64: bits 0..61

IMAGE_DHASH_DDL = "media_id bigint, dhash bigint, n_pixels int, ok boolean"


def image_dhash(df: DataFrame, n_bits: int = DHASH_BITS) -> DataFrame:
    """Perceptual gradient hash per image: bit i is set iff pixel i is
    brighter than pixel i+1 (the dHash idea applied to the decoded
    grayscale byte stream; a production variant downsamples to a fixed
    9x8 grid first — same Spark plumbing, different numpy line).
    Images with fewer than n_bits+1 pixels leave the high bits zero
    (defined, so two short images still compare). Returns
    (media_id, dhash, n_pixels, ok); undecodable payloads -> ok=false
    (K7-style per-row isolation).

    Scale: shuffle-free Arrow map stage like the other media ops —
    the hash is 8 bytes per image, so every downstream dedup join
    moves longs, never pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {"media_id": mid, "dhash": None, "n_pixels": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        px = np.frombuffer(d["data"], dtype=np.uint8).astype(np.int64)
                        bits = (px[:-1] > px[1:]).astype(np.int64)[:n_bits]
                        h = int(
                            (bits << np.arange(bits.size, dtype=np.int64)).sum()
                        )
                        row.update(dhash=h, n_pixels=int(px.size), ok=True)
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            # NULLABLE Int64 built straight from the python ints —
            # never let the DataFrame constructor see an int column
            # containing None: pandas coerces it to float64, silently
            # rounding hashes above 2^53 (observed: ...700 -> ...696)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(
                        [r["media_id"] for r in out], dtype="Int64"
                    ),
                    "dhash": pd.array([r["dhash"] for r in out], dtype="Int64"),
                    "n_pixels": pd.array(
                        [r["n_pixels"] for r in out], dtype="Int64"
                    ),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        run, IMAGE_DHASH_DDL
    )


AUDIO_FP_DDL = "media_id bigint, afp bigint, n_samples int, ok boolean"


def audio_fingerprint(df: DataFrame, n_windows: int = 32) -> DataFrame:
    """Perceptual AUDIO fingerprint — the audio twin of dHash: split
    the decoded sample stream into n_windows equal index windows
    (integer boundaries j*n//W, size-invariant like the 9x8 resample),
    take each window's |amplitude| sum (exact int64), and bit-pack the
    envelope gradient (bit j set iff energy_j > energy_{j+1}). Loud
    re-encodes of the same clip (PCM vs ADPCM, resampled, gain-scaled
    monotonically) keep their envelope SHAPE, which is all the hash
    reads. n_windows-1 bits (<= 62 for int64). Undecodable or
    non-audio rows -> ok=false.

    Scale: shuffle-free Arrow map stage; 8 bytes out per clip, so
    dedup joins (dhash_near_pairs works unchanged on any <=62-bit
    hash column) move longs, never waveforms."""
    if not 2 <= n_windows <= DHASH_BITS + 1:
        raise ValueError(f"n_windows must be in [2, {DHASH_BITS + 1}]")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {"media_id": mid, "afp": None, "n_samples": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "audio":
                        if "samples" in d:
                            s = np.abs(d["samples"].astype(np.int64))
                        else:  # fake codec: bytes are the samples
                            s = np.frombuffer(d["data"], dtype=np.uint8).astype(np.int64)
                        n = int(s.size)
                        if n >= n_windows:
                            bounds = (np.arange(n_windows + 1, dtype=np.int64) * n) // n_windows
                            env = np.add.reduceat(s, bounds[:-1])
                            bits = (env[:-1] > env[1:]).astype(np.int64)
                            h = int((bits << np.arange(bits.size, dtype=np.int64)).sum())
                            row.update(afp=h, n_samples=n, ok=True)
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "media_id": pd.array([r["media_id"] for r in out], dtype="Int64"),
                    "afp": pd.array([r["afp"] for r in out], dtype="Int64"),
                    "n_samples": pd.array([r["n_samples"] for r in out], dtype="Int64"),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(run, AUDIO_FP_DDL)


VIDEO_FP_DDL = "media_id bigint, vfp bigint, n_frames int, ok boolean"


def video_fingerprint(df: DataFrame, n_windows: int = 32) -> DataFrame:
    """Perceptual VIDEO fingerprint completing the modality set: the
    clip's frame-mean sequence (sum of pixel bytes per frame — exact
    int64) is windowed and gradient-packed exactly like the audio
    envelope, so cuts/retimings that preserve the brightness ARC keep
    the hash. Windows are index-proportional (size-invariant across
    frame rates); clips shorter than n_windows frames hash the raw
    frame sequence (bounds collapse is avoided by clamping W to
    n_frames). Same <= 62-bit int64 contract: banding, CC and the
    streaming store screen consume it unchanged."""
    if not 2 <= n_windows <= DHASH_BITS + 1:
        raise ValueError(f"n_windows must be in [2, {DHASH_BITS + 1}]")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {"media_id": mid, "vfp": None, "n_frames": None, "ok": False}
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "video" and d["n_frames"] >= 2:
                        nf, fs = int(d["n_frames"]), int(d["frame_size"])
                        fr = np.frombuffer(d["data"], dtype=np.uint8)[: nf * fs]
                        sums = fr.reshape(nf, fs).sum(axis=1, dtype=np.int64)
                        w = min(n_windows, nf)
                        bounds = (np.arange(w + 1, dtype=np.int64) * nf) // w
                        env = np.add.reduceat(sums, bounds[:-1])
                        bits = (env[:-1] > env[1:]).astype(np.int64)
                        h = int((bits << np.arange(bits.size, dtype=np.int64)).sum())
                        row.update(vfp=h, n_frames=nf, ok=True)
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "media_id": pd.array([r["media_id"] for r in out], dtype="Int64"),
                    "vfp": pd.array([r["vfp"] for r in out], dtype="Int64"),
                    "n_frames": pd.array([r["n_frames"] for r in out], dtype="Int64"),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(run, VIDEO_FP_DDL)


def dhash_near_pairs(
    hashes: DataFrame,
    max_dist: int = 4,
    band_bits: int | None = None,
    bucket_cap: int | None = 256,
) -> DataFrame:
    """Hamming near-duplicate image pairs from a (media_id, dhash)
    frame: block on equality of any band of the hash (the simhash
    banding idiom), then verify popcount(xor) <= max_dist on
    candidates only.

    Hot-bucket guards (the image twin of the text MinHash guards,
    operators/dedup.candidate_pairs — same two mechanisms, SCALE.md
    §14): (1) exact-collapse-first — only ONE representative per
    DISTINCT dhash enters the band join; members fan back out through
    hash-keyed joins (N byte-identical crawl images cost the join 1
    row; their N^2/2 dist-0 pairs — the operator's contract — come
    from cheap long-only joins); (2) a band-bucket cap with min-id-hub
    star overflow for buckets holding more than `bucket_cap` DISTINCT
    hashes, so a templated near-identical image flood emits O(B)
    candidates per bucket, never O(B^2), and still reaches CC as one
    cluster (star candidates pass the popcount verify in the
    motivating near-identical case). On the driver corpora both
    guards are output-identity by construction (distinct-hash buckets
    are far below the cap; verified by exceptAll in tests).

    RECALL BOUND (pigeonhole): with n_bands bands, banding is
    complete only for pairs differing in <= n_bands - 1 bits — a pair
    whose differing bits land in ALL bands shares no band and is
    silently missed; the popcount verify fixes precision, never
    recall. By default band_bits is DERIVED from max_dist so that
    n_bands >= max_dist + 1 and the result is exhaustive; passing
    band_bits explicitly raises ValueError when the requested
    max_dist exceeds the completeness bound (round-6 advice: the old
    16-bit default silently dropped recall for max_dist > 3).

    Scale: band explode is x n_bands, the candidate join is a
    band-keyed equi-join carrying (id, hash) longs — never payloads —
    and the verify is one JVM expression per candidate pair. Band
    widths are split EVENLY across the 64 bits (floor/ceil of
    64/n_bands): a ceil-division band count with a leftover narrow
    final band would be a scale trap — a 1-bit band has 2 distinct
    values, so its equi-join degenerates to ~n^2/4 candidate pairs.
    The same trap scales continuously: a w-bit band yields ~n^2/2^w
    expected candidates on random hashes, so derived widths below
    ~8 bits (max_dist > 6 with 62-bit hashes) emit a RuntimeWarning —
    the default max_dist=4 stays comfortably above it (12-13 bit
    bands); large radii should use a wider hash or exact verify."""
    import warnings

    from pyspark.sql import functions as F

    if band_bits is None:
        if max_dist >= DHASH_BITS:
            raise ValueError(
                f"max_dist {max_dist} >= {DHASH_BITS} hash bits: banding cannot "
                "be complete (a pair differing in every bit shares no band); "
                "use an exact all-pairs verify instead"
            )
        n_bands = max_dist + 1
        if DHASH_BITS // n_bands < 8:
            warnings.warn(
                f"max_dist={max_dist} derives {n_bands} bands of "
                f"{DHASH_BITS // n_bands}-{-(-DHASH_BITS // n_bands)} bits; "
                "bands narrower than ~8 bits degenerate toward n^2/2^width "
                "candidate pairs at corpus scale — use the 124-bit family "
                "(image_dhash_wide + dhash_wide_near_pairs, complete with "
                ">=8-bit bands up to max_dist 14) for large radii",
                RuntimeWarning,
                stacklevel=2,
            )
    else:
        n_bands = (DHASH_BITS + band_bits - 1) // band_bits
        if max_dist > n_bands - 1:
            raise ValueError(
                f"band_bits={band_bits} gives {n_bands} bands — complete only "
                f"for max_dist <= {n_bands - 1}, got {max_dist}; pass smaller "
                "band_bits or leave it None to derive"
            )
    # even split: band b covers [bounds[b], bounds[b+1]) of the 64 bits
    bounds = [b * DHASH_BITS // n_bands for b in range(n_bands + 1)]
    # materialize the 16-byte (id, hash) frame ONCE per call
    # (localCheckpoint, guide-standard plan truncation): this frame is
    # referenced by BOTH band-join sides, both member fan-out sides
    # and the within-hash self-join — unmaterialized, Catalyst re-runs
    # the upstream hash/decode Arrow stage once per reference (7
    # executions measured on q_multimodal_dhash_pairs). Recomputed
    # fresh on every call — no caching across invocations.
    h = (
        hashes.filter(F.col("dhash").isNotNull())
        .select("media_id", "dhash")
        .localCheckpoint()
    )
    # exact-collapse-first: one representative per distinct hash
    reps = h.groupBy("dhash").agg(F.min("media_id").alias("media_id"))
    bands = reps.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        (
                            F.shiftright(F.col("dhash"), bounds[b])
                            .bitwiseAND(F.lit((1 << (bounds[b + 1] - bounds[b])) - 1))
                        ).alias("bv"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "dhash", "bb.b", "bb.bv")
    star = None
    if bucket_cap is not None:
        from pyspark.sql import Window

        bucket = Window.partitionBy("b", "bv")
        ordered = bucket.orderBy("media_id")
        counted = bands.withColumn("_bn", F.count(F.lit(1)).over(bucket))
        hot = counted.where(F.col("_bn") > bucket_cap)
        bands = counted.where(F.col("_bn") <= bucket_cap).drop("_bn")
        star = (
            hot.select(
                "media_id",
                "dhash",
                F.min("media_id").over(bucket).alias("_hub"),
                F.first("dhash").over(ordered).alias("_hub_h"),
            )
            .where(F.col("media_id") != F.col("_hub"))
            .select(
                F.col("_hub").alias("id_a"),
                F.col("media_id").alias("id_b"),
                F.col("_hub_h").alias("ha"),
                F.col("dhash").alias("hb"),
            )
        )
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("dhash").alias("ha"), "b", "bv"
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("dhash").alias("hb"), "b", "bv"
    )
    joined = (
        a.join(b, ["b", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
    )
    if star is not None:
        joined = joined.unionByName(star)
    cand = joined.dropDuplicates(["id_a", "id_b"])
    # fan representative pairs back out to members (hash-keyed joins);
    # within-hash pairs are all dist-0 candidates by construction
    ma = h.select(F.col("dhash").alias("ha"), F.col("media_id").alias("_ma"))
    mb = h.select(F.col("dhash").alias("hb"), F.col("media_id").alias("_mb"))
    fanned = (
        cand.join(ma, "ha")
        .join(mb, "hb")
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
            "ha",
            "hb",
        )
    )
    m1 = h.select("dhash", F.col("media_id").alias("id_a"))
    m2 = h.select("dhash", F.col("media_id").alias("id_b"))
    within = (
        m1.join(m2, "dhash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("dhash").alias("ha"), F.col("dhash").alias("hb"))
    )
    pairs = fanned.unionByName(within)
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


# --- wide (124-bit) dHash: the supported strategy for radii > 6 -------------

DHASH_WIDE_BITS = 2 * DHASH_BITS  # two positive-int64 words, 124 bits

IMAGE_DHASH_WIDE_DDL = (
    "media_id bigint, dhash_lo bigint, dhash_hi bigint, n_pixels int, ok boolean"
)


def image_dhash_wide(df: DataFrame) -> DataFrame:
    """124-bit perceptual gradient hash as TWO int64 words: word `lo`
    packs gradient bits 0..61 (BIT-IDENTICAL to image_dhash, so the
    two hash families agree wherever they overlap — pinned by test)
    and `hi` packs bits 62..123. The wide hash exists for LARGE
    hamming radii: banding completeness needs max_dist+1 bands, and
    124 bits keep every band >= 8 bits up to max_dist 14, where the
    62-bit hash degenerates past max_dist 6 (the dhash_near_pairs
    RuntimeWarning envelope). Short images leave high bits zero
    (defined). Same shuffle-free Arrow stage; 16 bytes/image out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {
                    "media_id": mid, "dhash_lo": None, "dhash_hi": None,
                    "n_pixels": None, "ok": False,
                }
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        px = np.frombuffer(d["data"], dtype=np.uint8).astype(np.int64)
                        bits = (px[:-1] > px[1:]).astype(np.int64)[:DHASH_WIDE_BITS]
                        lo_b = bits[:DHASH_BITS]
                        hi_b = bits[DHASH_BITS:]
                        lo = int((lo_b << np.arange(lo_b.size, dtype=np.int64)).sum())
                        hi = int((hi_b << np.arange(hi_b.size, dtype=np.int64)).sum())
                        row.update(
                            dhash_lo=lo, dhash_hi=hi, n_pixels=int(px.size), ok=True
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "media_id": pd.array([r["media_id"] for r in out], dtype="Int64"),
                    "dhash_lo": pd.array([r["dhash_lo"] for r in out], dtype="Int64"),
                    "dhash_hi": pd.array([r["dhash_hi"] for r in out], dtype="Int64"),
                    "n_pixels": pd.array([r["n_pixels"] for r in out], dtype="Int64"),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        run, IMAGE_DHASH_WIDE_DDL
    )


def _wide_band(lo: str, hi: str, s: int, e: int):
    """Band value for bit range [s, e) of a 124-bit (lo, hi) hash —
    pure int64 shift/mask arithmetic even when the band straddles the
    word boundary."""
    from pyspark.sql import functions as F

    parts = []
    lo_width = 0
    if s < DHASH_BITS:
        lo_e = min(e, DHASH_BITS)
        lo_width = lo_e - s
        parts.append(
            F.shiftright(F.col(lo), s).bitwiseAND(F.lit((1 << lo_width) - 1))
        )
    if e > DHASH_BITS:
        hi_s = max(s, DHASH_BITS) - DHASH_BITS
        width = e - max(s, DHASH_BITS)
        hv = F.shiftright(F.col(hi), hi_s).bitwiseAND(F.lit((1 << width) - 1))
        parts.append(F.shiftleft(hv, lo_width) if lo_width else hv)
    return parts[0] if len(parts) == 1 else parts[0].bitwiseOR(parts[1])


def dhash_wide_near_pairs(
    hashes: DataFrame,
    max_dist: int = 12,
    bucket_cap: int | None = 256,
) -> DataFrame:
    """Hamming near-duplicate pairs over the 124-bit wide hash —
    dhash_near_pairs' large-radius twin (same two hot-bucket guards:
    exact-collapse-first on the (lo, hi) pair, band-bucket cap with
    min-id-hub star overflow). max_dist+1 bands split EVENLY across
    124 bits (pigeonhole completeness, see dhash_near_pairs), every
    band >= 8 bits up to max_dist 14 — the wide-radius operating
    envelope the 62-bit family warns about. Verify =
    popcount(xor lo) + popcount(xor hi), one JVM expression."""
    import warnings

    from pyspark.sql import functions as F

    if max_dist >= DHASH_WIDE_BITS:
        raise ValueError(
            f"max_dist {max_dist} >= {DHASH_WIDE_BITS} hash bits: banding "
            "cannot be complete; use an exact all-pairs verify instead"
        )
    n_bands = max_dist + 1
    if DHASH_WIDE_BITS // n_bands < 8:
        warnings.warn(
            f"max_dist={max_dist} derives {n_bands} bands of "
            f"{DHASH_WIDE_BITS // n_bands}+ bits over {DHASH_WIDE_BITS}; "
            "bands narrower than ~8 bits degenerate toward n^2/2^width "
            "candidates — wide dHash supports radii <= 14",
            RuntimeWarning,
            stacklevel=2,
        )
    bounds = [b * DHASH_WIDE_BITS // n_bands for b in range(n_bands + 1)]
    # materialize once per call (see dhash_near_pairs: the frame feeds
    # both band-join sides + member fan-out; unmaterialized, the
    # 124-bit hash Arrow stage re-runs per reference)
    h = (
        hashes.filter(
            F.col("dhash_lo").isNotNull() & F.col("dhash_hi").isNotNull()
        )
        .select("media_id", "dhash_lo", "dhash_hi")
        .localCheckpoint()
    )
    reps = h.groupBy("dhash_lo", "dhash_hi").agg(
        F.min("media_id").alias("media_id")
    )
    bands = reps.select(
        "media_id",
        "dhash_lo",
        "dhash_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        _wide_band(
                            "dhash_lo", "dhash_hi", bounds[b], bounds[b + 1]
                        ).alias("bv"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "dhash_lo", "dhash_hi", "bb.b", "bb.bv")
    star = None
    if bucket_cap is not None:
        from pyspark.sql import Window

        bucket = Window.partitionBy("b", "bv")
        ordered = bucket.orderBy("media_id")
        counted = bands.withColumn("_bn", F.count(F.lit(1)).over(bucket))
        hot = counted.where(F.col("_bn") > bucket_cap)
        bands = counted.where(F.col("_bn") <= bucket_cap).drop("_bn")
        star = (
            hot.select(
                "media_id",
                "dhash_lo",
                "dhash_hi",
                F.min("media_id").over(bucket).alias("_hub"),
                F.first("dhash_lo").over(ordered).alias("_hub_lo"),
                F.first("dhash_hi").over(ordered).alias("_hub_hi"),
            )
            .where(F.col("media_id") != F.col("_hub"))
            .select(
                F.col("_hub").alias("id_a"),
                F.col("media_id").alias("id_b"),
                F.col("_hub_lo").alias("la"),
                F.col("_hub_hi").alias("ua"),
                F.col("dhash_lo").alias("lb"),
                F.col("dhash_hi").alias("ub"),
            )
        )
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("dhash_lo").alias("la"),
        F.col("dhash_hi").alias("ua"),
        "b",
        "bv",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("dhash_lo").alias("lb"),
        F.col("dhash_hi").alias("ub"),
        "b",
        "bv",
    )
    joined = (
        a.join(b, ["b", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "la", "ua", "lb", "ub")
    )
    if star is not None:
        joined = joined.unionByName(star)
    cand = joined.dropDuplicates(["id_a", "id_b"])
    ma = h.select(
        F.col("dhash_lo").alias("la"),
        F.col("dhash_hi").alias("ua"),
        F.col("media_id").alias("_ma"),
    )
    mb = h.select(
        F.col("dhash_lo").alias("lb"),
        F.col("dhash_hi").alias("ub"),
        F.col("media_id").alias("_mb"),
    )
    fanned = (
        cand.join(ma, ["la", "ua"])
        .join(mb, ["lb", "ub"])
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
            "la",
            "ua",
            "lb",
            "ub",
        )
    )
    m1 = h.select(
        "dhash_lo", "dhash_hi", F.col("media_id").alias("id_a")
    )
    m2 = h.select(
        "dhash_lo", "dhash_hi", F.col("media_id").alias("id_b")
    )
    within = (
        m1.join(m2, ["dhash_lo", "dhash_hi"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("dhash_lo").alias("la"),
            F.col("dhash_hi").alias("ua"),
            F.col("dhash_lo").alias("lb"),
            F.col("dhash_hi").alias("ub"),
        )
    )
    pairs = fanned.unionByName(within)
    dist = F.bit_count(F.col("la").bitwiseXOR(F.col("lb"))) + F.bit_count(
        F.col("ua").bitwiseXOR(F.col("ub"))
    )
    return (
        pairs.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


DHASH_GRID_W, DHASH_GRID_H = 9, 8  # the classic dHash grid

IMAGE_DHASH_RS_DDL = (
    "media_id bigint, dhash bigint, width bigint, height bigint, ok boolean"
)


def image_dhash_resampled(
    df: DataFrame,
    grid_w: int = DHASH_GRID_W,
    grid_h: int = DHASH_GRID_H,
    n_bits: int = DHASH_BITS,
    normalize_orientation: bool = False,
) -> DataFrame:
    """PRODUCTION dHash: nearest-neighbor resample every image to a
    fixed grid_w x grid_h grayscale grid FIRST, then bit-pack the
    per-row horizontal gradients (bit j*(grid_w-1)+i set iff
    grid[j][i] > grid[j][i+1], low n_bits kept so the hash stays a
    positive int64). Fixing the grid makes hashes comparable across
    image sizes and kills the structural zero-band problem the raw
    variant has on short images (SCALE.md round-6 note): every hash
    always carries grid_h*(grid_w-1) meaningful gradient bits.

    Sampling is exact integer arithmetic — source column for grid x
    is (x * width) // grid_w, row likewise — so DuckDB replays the
    whole chain in closed form (q_multimodal_dhash_resampled).
    RGB images (3 bytes/pixel, e.g. PPM) collapse to integer-mean
    gray ((r+g+b)//3) before sampling; 1 byte/pixel streams (BMP 8bpp,
    fake codec) are used as-is.

    With `normalize_orientation`, JPEG payloads carrying an EXIF
    orientation tag are rotated/flipped UPRIGHT (header-only metadata
    parse + one numpy view transform) before the resample — so a
    crawl's rotated re-posts of the same photo hash identically and
    cluster with their upright twins (pinned by
    tests/test_exif.py::test_rotated_twin_pairs_when_normalized).

    Scale: identical shape to image_dhash — shuffle-free Arrow map
    stage, 8 bytes out per image."""
    from corrie_spark.operators import jpeg as J

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs0 = np.arange(grid_w, dtype=np.int64)
        ys0 = np.arange(grid_h, dtype=np.int64)
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {
                    "media_id": mid,
                    "dhash": None,
                    "width": None,
                    "height": None,
                    "ok": False,
                }
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        w, h = int(d["width"]), int(d["height"])
                        px = np.frombuffer(d["data"], dtype=np.uint8).astype(
                            np.int64
                        )
                        if px.size == 3 * w * h:  # RGB -> integer-mean gray
                            px = px.reshape(h * w, 3).sum(axis=1) // 3
                        if px.size != w * h or w < 1 or h < 1:
                            raise ValueError("pixel buffer does not match dims")
                        grid = px.reshape(h, w)
                        if (
                            normalize_orientation
                            and bytes(payload)[:2] == b"\xff\xd8"
                        ):
                            o = (
                                J.parse_jpeg_metadata(bytes(payload)).get(
                                    "orientation"
                                )
                                or 1
                            )
                            if o != 1:
                                grid = J.apply_exif_orientation(grid, o)
                                h, w = grid.shape
                        g = grid[(ys0 * h) // grid_h][:, (xs0 * w) // grid_w]
                        bits = (g[:, :-1] > g[:, 1:]).astype(np.int64).ravel()[
                            :n_bits
                        ]
                        hsh = int(
                            (bits << np.arange(bits.size, dtype=np.int64)).sum()
                        )
                        row.update(dhash=hsh, width=w, height=h, ok=True)
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(
                        [r["media_id"] for r in out], dtype="Int64"
                    ),
                    "dhash": pd.array([r["dhash"] for r in out], dtype="Int64"),
                    "width": pd.array([r["width"] for r in out], dtype="Int64"),
                    "height": pd.array(
                        [r["height"] for r in out], dtype="Int64"
                    ),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        run, IMAGE_DHASH_RS_DDL
    )


IMAGE_EMB_DDL = (
    "media_id bigint, emb array<bigint>, width bigint, height bigint, ok boolean"
)


def image_embedding(
    df: DataFrame, grid_w: int = 8, grid_h: int = 8
) -> DataFrame:
    """Visual FEATURE EXTRACTION: nearest-neighbor resample each
    decoded image to a fixed grid_w x grid_h grayscale grid and emit
    the grid VALUES as an exact-integer embedding (array<bigint>,
    grid_w*grid_h dims) — the deterministic stand-in for a learned
    visual encoder that makes the whole semantic-similarity stack
    (brute-force cosine, IVF, PQ, SemDeDup) applicable to IMAGES:
    decode -> embed here, then every downstream consumer is the
    existing exact-int vector machinery unchanged.

    Same sampling arithmetic as image_dhash_resampled (source index
    (x * width) // grid_w; RGB collapses to integer-mean gray), so
    DuckDB replays decode -> grid -> dot products in closed form.
    Scale: shuffle-free Arrow map stage; 8 bytes/dim out per image,
    payloads never leave the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs0 = np.arange(grid_w, dtype=np.int64)
        ys0 = np.arange(grid_h, dtype=np.int64)
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                row = {
                    "media_id": mid,
                    "emb": None,
                    "width": None,
                    "height": None,
                    "ok": False,
                }
                try:
                    d = decode_payload(mtype, bytes(payload))
                    if d["kind"] == "image":
                        w, h = int(d["width"]), int(d["height"])
                        px = np.frombuffer(d["data"], dtype=np.uint8).astype(
                            np.int64
                        )
                        if px.size == 3 * w * h:  # RGB -> integer-mean gray
                            px = px.reshape(h * w, 3).sum(axis=1) // 3
                        if px.size != w * h or w < 1 or h < 1:
                            raise ValueError("pixel buffer does not match dims")
                        g = px.reshape(h, w)[(ys0 * h) // grid_h][
                            :, (xs0 * w) // grid_w
                        ]
                        row.update(
                            emb=[int(v) for v in g.ravel()],
                            width=w,
                            height=h,
                            ok=True,
                        )
                except (ValueError, NotImplementedError, struct.error):
                    pass
                out.append(row)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(
                        [r["media_id"] for r in out], dtype="Int64"
                    ),
                    "emb": [r["emb"] for r in out],
                    "width": pd.array([r["width"] for r in out], dtype="Int64"),
                    "height": pd.array(
                        [r["height"] for r in out], dtype="Int64"
                    ),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        run, IMAGE_EMB_DDL
    )


JPEG_META_DDL = (
    "media_id bigint, has_jfif boolean, density_units bigint, "
    "x_density bigint, y_density bigint, has_exif boolean, "
    "orientation bigint, exif_datetime string, width bigint, "
    "height bigint, progressive boolean, n_app_segments bigint, ok boolean"
)


def jpeg_metadata(df: DataFrame) -> DataFrame:
    """Crawl-scale JPEG metadata extraction: JFIF density, EXIF
    orientation + capture timestamp (the dedup/recency signals real
    crawls carry), SOF dimensions and the progressive flag — all from
    a header-only segment walk (operators/jpeg.py parse_jpeg_metadata
    stops at SOS; the entropy stream is NEVER decoded, so this stage
    costs header bytes per image, not pixels). Arrow map stage, zero
    shuffle, same plumbing as image_features."""
    from corrie_spark.operators import jpeg as J

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {
                    "media_id": mid, "has_jfif": None, "density_units": None,
                    "x_density": None, "y_density": None, "has_exif": None,
                    "orientation": None, "exif_datetime": None, "width": None,
                    "height": None, "progressive": None,
                    "n_app_segments": None, "ok": False,
                }
                try:
                    md = J.parse_jpeg_metadata(bytes(payload))
                    row.update(md)
                    row["exif_datetime"] = md.get("datetime")
                    row["ok"] = True
                except (ValueError, struct.error):
                    pass
                row.pop("datetime", None)
                out.append(row)
            def col(k: str):  # Int64 for the integer columns (nullable)
                return pd.array([r[k] for r in out], dtype="Int64")

            # dict in exact JPEG_META_DDL order (mapInPandas matches
            # the Arrow batch to the schema positionally)
            yield pd.DataFrame(
                {
                    "media_id": col("media_id"),
                    "has_jfif": [r["has_jfif"] for r in out],
                    "density_units": col("density_units"),
                    "x_density": col("x_density"),
                    "y_density": col("y_density"),
                    "has_exif": [r["has_exif"] for r in out],
                    "orientation": col("orientation"),
                    "exif_datetime": [r["exif_datetime"] for r in out],
                    "width": col("width"),
                    "height": col("height"),
                    "progressive": [r["progressive"] for r in out],
                    "n_app_segments": col("n_app_segments"),
                    "ok": [r["ok"] for r in out],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, JPEG_META_DDL)


def png_metadata(payload: bytes) -> dict:
    """Header-only PNG scan (the parse_jpeg_metadata twin — no
    inflate, no unfilter): dims/depth/color/interlace from IHDR, DPI
    from pHYs (meters -> inches), and tEXt key/value pairs (latin-1
    per spec). Chunk CRCs are NOT verified here — a metadata sweep
    over a crawl should report what headers claim; the pixel decoder
    stays strict."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG file")
    out: dict = {"texts": {}}
    pos = len(PNG_SIG)
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            break
        if ctype == b"IHDR" and ln >= 13:
            (
                out["width"], out["height"], out["depth"], out["color_type"],
                _, _, interlace,
            ) = struct.unpack(">IIBBBBB", data[:13])
            out["interlaced"] = interlace == 1
        elif ctype == b"pHYs" and ln >= 9:
            px, py, unit = struct.unpack(">IIB", data[:9])
            if unit == 1:  # pixels per metre -> dpi
                out["dpi_x"] = round(px * 0.0254)
                out["dpi_y"] = round(py * 0.0254)
        elif ctype == b"tEXt":
            k, _, v = data.partition(b"\x00")
            out["texts"][k.decode("latin-1", "replace")] = v.decode(
                "latin-1", "replace"
            )
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if "width" not in out:
        raise ValueError("PNG missing IHDR chunk")
    return out


def gif_metadata(payload: bytes) -> dict:
    """Header-only GIF scan: logical-screen dims, global-palette
    size, frame count, per-frame GCE delays summed to a total
    duration (centiseconds -> ms), and the NETSCAPE2.0 loop count
    when present. Walks block framing only — LZW data is skipped
    sub-block by sub-block, never decoded."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    out: dict = {
        "width": sw,
        "height": sh,
        "version": payload[3:6].decode("ascii"),
        "n_palette": (2 << (packed & 7)) if packed & 0x80 else 0,
        "n_frames": 0,
        "total_duration_ms": 0,
        "loop_count": None,
    }
    pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:  # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else 0
            pos += 2
            if label == 0xF9 and pos < len(payload) and payload[pos] >= 4:
                (d,) = struct.unpack_from("<H", payload, pos + 2)
                out["total_duration_ms"] += d * 10
            if (
                label == 0xFF
                and pos < len(payload)
                and payload[pos] == 11
                and payload[pos + 1 : pos + 12] == b"NETSCAPE2.0"
            ):
                sub = pos + 12
                if sub + 3 < len(payload) and payload[sub] >= 3:
                    (out["loop_count"],) = struct.unpack_from(
                        "<H", payload, sub + 2
                    )
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            out["n_frames"] += 1
            ipacked = payload[pos + 9]
            pos += 10 + (3 * (2 << (ipacked & 7)) if ipacked & 0x80 else 0)
            pos += 1  # min code size
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    return out
