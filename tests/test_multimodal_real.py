

def test_tiff_roundtrip_matrix():
    """Compression x predictor x endianness x strip count, gray+RGB."""
    import numpy as np

    from corrie_spark.operators import multimodal as M

    rng = np.random.RandomState(11)
    for w, h, samples in [(7, 5, 1), (6, 4, 3)]:
        data = bytes(rng.randint(0, 256, w * h * samples, dtype=np.uint8))
        for comp in (1, 5, 32773):
            for pred in (1, 2) if comp != 1 else (1,):
                for be in (False, True):
                    t = M.encode_tiff(
                        w, h, data, compression=comp, predictor=pred,
                        samples=samples, rows_per_strip=2, big_endian=be,
                    )
                    d = M._decode_tiff(t)
                    assert (d["width"], d["height"]) == (w, h)
                    assert d["data"] == data


def test_tiff_lzw_shares_pdf_convention():
    """The TIFF LZW strips decode through sources/pdf._lzw_decode —
    one convention, two gated call sites."""
    from corrie_spark.operators import multimodal as M
    from corrie_spark.sources.pdf import _lzw_decode

    payload = bytes((i * 3) % 251 for i in range(5000))
    assert _lzw_decode(M._lzw_encode_msb(payload)) == payload


def test_tiff_poison_degrades():
    import pytest

    from corrie_spark.operators import multimodal as M

    t = M.encode_tiff(4, 4, bytes(16))
    with pytest.raises(ValueError):
        M._decode_tiff(t[:20])  # truncated strip/tags
    with pytest.raises(ValueError):
        M._decode_tiff(b"II+\x00" + t[4:])  # bad magic
    bad = bytearray(t)
    bad[-5] ^= 0xFF  # corrupt pixel data doesn't matter for none-comp;
    # instead corrupt the strip count tag region is overkill — check
    # unsupported compression degrades
    t2 = M.encode_tiff(4, 4, bytes(16), compression=5)
    b2 = bytearray(t2)
    # flip compression tag value 5 -> 7 (JPEG-in-TIFF, unsupported)
    idx = t2.find(b"\x03\x01")  # tag 259 little-endian
    assert idx > 0
    b2[idx + 8] = 7
    with pytest.raises(ValueError):
        M._decode_tiff(bytes(b2))


def test_mp3_scan_edge_cases():
    from corrie_spark.operators.multimodal import encode_mp3, mp3_scan_bytes

    # no frames at all -> ok=False, never raises
    assert mp3_scan_bytes(b"") == {"ok": False}
    assert mp3_scan_bytes(b"\xff\xfb\x00") == {"ok": False}
    # a truncated final frame is dropped (frame_len beyond EOF)
    full = encode_mp3(1, n_frames=3, title="t", artist="a", album="b")
    cut = mp3_scan_bytes(full[:-10])
    assert cut["ok"] and cut["n_frames"] == 2
    # ID3v1-only tags (no v2) surface through the fallback
    v1only = encode_mp3(2, n_frames=2, id3v1=True, title=None)
    blob = bytearray(v1only)
    # encode_mp3 writes no v2 when title=None but then v1 fields are
    # empty; build one with explicit v1 text instead
    v1 = bytearray(b"TAG")
    v1 += b"Solo Title".ljust(30, b"\x00")
    v1 += b"Solo Artist".ljust(30, b"\x00")
    v1 += b"Solo Album".ljust(30, b"\x00")
    v1 += b"2026" + b"\x00" * 30 + b"\xff"
    got = mp3_scan_bytes(bytes(blob) + bytes(v1))
    assert got["title"] == "Solo Title" and got["artist"] == "Solo Artist"
    assert got["has_id3v1"] is True
    # stray sync bytes inside junk do not fabricate frames of another
    # version/sample-rate stream
    j = encode_mp3(3, n_frames=2)
    other = encode_mp3(9, n_frames=1, version=2, sidx=1)  # different sr
    mixed = mp3_scan_bytes(j + other)
    assert mixed["n_frames"] == 2  # the second stream's frame is rejected


def test_mp3_id3v2_4_syncsafe_and_utf8():
    from corrie_spark.operators.multimodal import encode_mp3, mp3_scan_bytes

    blob = encode_mp3(
        5, n_frames=2, id3_major=4, title="Tïtle", artist="Ärtist", album="Älbum"
    )
    got = mp3_scan_bytes(blob)
    assert got["title"] == "Tïtle" and got["artist"] == "Ärtist"
    assert got["n_frames"] == 2


def test_png_adam7_equals_plain_scan():
    import numpy as np

    from corrie_spark.operators import multimodal as M

    rng = np.random.default_rng(3)
    for (w, h) in [(1, 1), (7, 5), (8, 8), (9, 9), (33, 17)]:
        for ct in (0, 2, 4, 6):
            ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
            px = rng.integers(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
            plain = M._decode_png(M.encode_png(w, h, px, color_type=ct))
            adam = M._decode_png(
                M.encode_png(w, h, px, color_type=ct, interlace=True)
            )
            assert plain["data"] == adam["data"], (w, h, ct)
    idx = rng.integers(0, 4, size=15 * 11, dtype=np.uint8).tobytes()
    pal = bytes(range(12))
    a = M._decode_png(
        M.encode_png(15, 11, idx, color_type=3, palette=pal, interlace=True)
    )
    b = M._decode_png(M.encode_png(15, 11, idx, color_type=3, palette=pal))
    assert a["data"] == b["data"]
    # truncated pass data degrades to ValueError, never a crash
    blob = M.encode_png(9, 9, bytes(81), color_type=0, interlace=True)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M._decode_png(blob[:60] + blob[60:][:-30])


def test_ogg_scan_edge_cases():
    from corrie_spark.operators.multimodal import encode_ogg, ogg_scan_bytes

    assert ogg_scan_bytes(b"") == {"ok": False}
    assert ogg_scan_bytes(b"OggS\x00garbage") == {"ok": False}
    blob = encode_ogg(9, "opus", 2, 48000, 4, 960, {"TITLE": "t", "X": "y"})
    got = ogg_scan_bytes(blob)
    assert got["ok"] and got["n_pages"] == 6
    assert got["duration_s"] == 4 * 960 / 48000
    # a corrupt page fails its CRC, costs only itself (resync)
    idxs, i = [], 0
    while (i := blob.find(b"OggS", i)) >= 0:
        idxs.append(i)
        i += 4
    bad = bytearray(blob)
    bad[idxs[3] + 40] ^= 0xFF
    cut = ogg_scan_bytes(bytes(bad))
    assert cut["ok"] and cut["n_pages"] == 5
    # vorbis granules run at the stream rate, not 48k
    v = ogg_scan_bytes(encode_ogg(4, "vorbis", 1, 16000, 3, 2048, {"TITLE": "v"}))
    assert v["duration_s"] == 3 * 2048 / 16000 and v["codec"] == "vorbis"

def _syncsafe4(n: int) -> bytes:
    return bytes([(n >> s) & 0x7F for s in (21, 14, 7, 0)])


def test_mp3_id3v2_extended_header():
    """The 0x40 flag interposes an extended header before the frames
    (id3.org §3.2); the scan must skip it, not misread its bytes as a
    frame id/size. v2.3 sizes it excluding the 4 size bytes; v2.4
    syncsafe-sizes the whole thing."""
    from corrie_spark.operators.multimodal import (
        _id3v2_parse,
        encode_mp3,
        mp3_scan_bytes,
    )

    audio = encode_mp3(4, n_frames=2)  # untagged frames
    # --- v2.3: ext header = size(4, excl. itself) + flags(2) + pad(4)
    body = b"\x00" + b"Ext Title"
    frame = b"TIT2" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    ext23 = (6).to_bytes(4, "big") + b"\x00\x00" + (0).to_bytes(4, "big")
    size = len(ext23) + len(frame)
    tag23 = b"ID3" + bytes([3, 0, 0x40]) + _syncsafe4(size) + ext23 + frame
    tags, consumed = _id3v2_parse(tag23 + audio)
    assert tags.get("TIT2") == "Ext Title"
    assert consumed == 10 + size
    got = mp3_scan_bytes(tag23 + audio)
    assert got["title"] == "Ext Title" and got["n_frames"] == 2
    # --- v2.4: ext header = syncsafe size(4, incl. itself) + nflags(1) + flags(1)
    body4 = b"\x03" + "Ext Tïtle".encode("utf-8")
    frame4 = b"TIT2" + _syncsafe4(len(body4)) + b"\x00\x00" + body4
    ext24 = _syncsafe4(6) + b"\x01\x00"
    size4 = len(ext24) + len(frame4)
    tag24 = b"ID3" + bytes([4, 0, 0x40]) + _syncsafe4(size4) + ext24 + frame4
    tags4, consumed4 = _id3v2_parse(tag24 + audio)
    assert tags4.get("TIT2") == "Ext Tïtle"
    assert consumed4 == 10 + size4
    got4 = mp3_scan_bytes(tag24 + audio)
    assert got4["title"] == "Ext Tïtle" and got4["n_frames"] == 2
