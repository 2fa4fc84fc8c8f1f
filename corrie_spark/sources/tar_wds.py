"""TAR shard ingestion (POSIX ustar, from spec) + WebDataset grouping.

Large-scale multimodal training data ships as TAR shards in the
WebDataset convention: each sample is a group of adjacent members
sharing a basename key — `000042.txt`, `000042.json`, `000042.jpg` —
and a pipeline consumes one ROW per sample with its parts as typed
columns. The reference engine has no archive readers (beyond-parity
LLM-pipeline surface, like sources/ooxml.py). Built from public
formats only: the POSIX.1-1988 ustar header layout (512-byte blocks,
octal size fields, checksum), the GNU 'L' longname extension, pax 'x'
extended headers (path override), and RFC 1952 gzip for .tar.gz.

Subset and its seams:
  - regular files only; directories / links / devices are skipped.
  - pax global headers ('g') are skipped; per-file 'x' headers are
    honored for `path=` only (the field WebDataset shards use).
  - sparse files and multi-volume archives are out of scope (never
    seen in training shards).

Scale shape mirrors sources/warc.py: one shard = one binaryFile row =
one task (WebDataset shards are written ~1 GiB each precisely so the
shard is the parallelism unit); member split + sample grouping run in
a mapInPandas stage, bytes never shuffle, malformed shards degrade to
an error row.
"""

from __future__ import annotations

import gzip
import lzma
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from corrie_spark.errors import classify_error


class TarError(ValueError):
    """Malformed archive (caught at the row boundary)."""


_BLOCK = 512


def _octal(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    # GNU base-256 extension: high bit of first byte set
    if field[0] & 0x80:
        return int.from_bytes(bytes([field[0] & 0x7F]) + field[1:], "big")
    try:
        return int(s, 8)
    except ValueError as e:
        raise TarError(f"bad octal field {s!r}") from None


def tar_members(data: bytes) -> Iterator[tuple[str, bytes]]:
    """Walk ustar members, yielding (name, bytes) per regular file.
    Handles GNU 'L' longnames and pax 'x' path overrides; stops at the
    two-zero-block terminator or end of data. A header that fails its
    checksum raises TarError (tar has no resync marker — unlike WARC's
    gzip members, a corrupt header poisons the remainder by design)."""
    pos = 0
    n = len(data)
    pending_name: str | None = None
    while pos + _BLOCK <= n:
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            return  # terminator
        stored = _octal(hdr[148:156])
        # checksum: header bytes with the chksum field read as spaces
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise TarError(f"header checksum mismatch at offset {pos}")
        size = _octal(hdr[124:136])
        typeflag = hdr[156:157]
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if prefix:
            name = f"{prefix}/{name}"
        body_start = pos + _BLOCK
        body = data[body_start : body_start + size]
        if len(body) < size:
            raise TarError("truncated member body")
        pos = body_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
        if typeflag == b"L":  # GNU longname: body is the NEXT name
            pending_name = body.split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
            continue
        if typeflag == b"x":  # pax extended header: honor path=
            for line in body.split(b"\n"):
                if b" path=" in line:
                    pending_name = line.split(b" path=", 1)[1].decode(
                        "utf-8", "replace"
                    )
            continue
        if typeflag == b"g":
            continue
        if typeflag not in (b"0", b"\x00"):
            continue  # dirs, links, devices: no payload for a corpus
        if pending_name is not None:
            name = pending_name
            pending_name = None
        yield name, body


def tar_build(entries: list[tuple[str, bytes]]) -> bytes:
    """Deterministic ustar writer (fixture twin): zero mtime/uid/gid,
    GNU 'L' longname records for names over 100 bytes."""
    out = bytearray()

    def block(name: str, body: bytes, typeflag: bytes) -> None:
        nm = name.encode("utf-8")
        hdr = bytearray(_BLOCK)
        hdr[0:100] = nm[:100].ljust(100, b"\x00")
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = b"%011o\x00" % len(body)
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156:157] = typeflag
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chksum = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % chksum
        out.extend(hdr)
        out.extend(body)
        pad = (-len(body)) % _BLOCK
        out.extend(b"\x00" * pad)

    for name, body in entries:
        if len(name.encode("utf-8")) > 100:
            block("././@LongLink", name.encode("utf-8") + b"\x00", b"L")
        block(name, body, b"0")
    out.extend(b"\x00" * (2 * _BLOCK))
    return bytes(out)


# ---------------------------------------------------------------------------
# WebDataset sample grouping
# ---------------------------------------------------------------------------

WDS_SCHEMA_DDL = (
    "shard string, key string, exts array<string>, txt string, "
    "json string, payload binary, n_parts bigint, error string, "
    "error_kind string"
)

WDS_COLUMNS = [
    "shard", "key", "exts", "txt", "json", "payload", "n_parts", "error",
    "error_kind",
]


def wds_samples(data: bytes) -> list[dict]:
    """TAR bytes -> one dict per WebDataset sample: members grouped by
    basename key (everything before the FIRST dot of the basename —
    the WebDataset convention, so `x.seg.png` is part `seg.png` of
    sample `x`). `.txt` decodes to `txt`, `.json` to `json`, the
    first non-txt/json part's bytes land in `payload` (the opaque
    multimodal column); all extensions are listed in order."""
    if data[:3] == b"\x1f\x8b\x08":
        data = gzip.decompress(data)
    elif data[:6] == b"\xfd7zXZ\x00":  # .tar.xz shard
        data = lzma.decompress(data, format=lzma.FORMAT_XZ)
    samples: dict[str, dict] = {}
    order: list[str] = []
    for name, body in tar_members(data):
        base = name.rsplit("/", 1)[-1]
        if "." not in base:
            continue
        key, ext = base.split(".", 1)
        dirpart = name.rsplit("/", 1)[0] + "/" if "/" in name else ""
        skey = dirpart + key
        s = samples.get(skey)
        if s is None:
            s = samples[skey] = {
                "key": skey, "exts": [], "txt": None,
                "json": None, "payload": None,
            }
            order.append(skey)
        s["exts"].append(ext)
        if ext == "txt":
            s["txt"] = body.decode("utf-8", "replace")
        elif ext == "json":
            s["json"] = body.decode("utf-8", "replace")
        elif s["payload"] is None:
            s["payload"] = body
    return [samples[k] for k in order]


def wds_records(
    bin_df: DataFrame, file_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(shard, tar bytes) -> one row per sample. Poison safety stance
    of warc_records: a malformed shard yields ONE error row."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf[file_col], pdf[content_col]):
                try:
                    for s in wds_samples(bytes(blob)):
                        out.append(
                            {
                                "shard": path,
                                "key": s["key"],
                                "exts": s["exts"],
                                "txt": s["txt"],
                                "json": s["json"],
                                "payload": s["payload"],
                                "n_parts": len(s["exts"]),
                                "error": None,
                                "error_kind": None,
                            }
                        )
                except Exception as e:  # noqa: BLE001 — poison row
                    reason = f"{type(e).__name__}: {e}"[:200]
                    out.append(
                        {
                            "shard": path,
                            "key": None,
                            "exts": [],
                            "txt": None,
                            "json": None,
                            "payload": None,
                            "n_parts": 0,
                            "error": reason,
                            "error_kind": classify_error(reason),
                        }
                    )
            yield pd.DataFrame(out, columns=WDS_COLUMNS)

    return bin_df.mapInPandas(run, WDS_SCHEMA_DDL)


def read_wds(spark: SparkSession, path: str) -> DataFrame:
    """Batch reader: binaryFile scan (one shard = one task, the
    WebDataset parallelism convention) -> sample grouping."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return wds_records(files)


def wds_to_documents(records: DataFrame) -> DataFrame:
    """Sample rows -> documents schema (txt-bearing samples only)."""
    from pyspark.sql import functions as F

    from corrie_spark.operators.dedup import hash60

    return records.where(
        F.col("error").isNull() & F.col("txt").isNotNull()
    ).select(
        hash60(
            F.concat_ws(":", F.col("shard"), F.col("key")), "wds-doc"
        ).alias("doc_id"),
        F.concat_ws("#", F.col("shard"), F.col("key")).alias("url"),
        F.col("txt").alias("text"),
    )


# ---------------------------------------------------------------------------
# WebDataset shard WRITER (the sink half: corpus -> training shards)
# ---------------------------------------------------------------------------

WDS_MANIFEST_DDL = (
    "shard string, n_samples bigint, n_bytes bigint, keys_md5 string"
)


def write_wds(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    gz: bool = False,
    key_col: str = "key",
    txt_col: str = "txt",
    json_col: str | None = None,
    payload_col: str | None = None,
    payload_ext: str = "bin",
) -> DataFrame:
    """Write a frame as WebDataset tar shards and return the
    materialized manifest (one row per shard: path, sample count,
    byte size, md5 of the sorted key list — the completeness marker a
    training job checks before consuming).

    Sharding is deterministic — crc32(key) % n_shards — and samples
    sort by key INSIDE each shard, so the same input always produces
    byte-identical shards (idempotent re-runs overwrite with the same
    bytes). One shard = one applyInPandas group = one written file;
    `out_dir` must be storage every executor can reach (true on
    local[n]; a shared filesystem or mounted object store on a
    cluster)."""
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, txt_col] + (
        [json_col] if json_col else []
    ) + ([payload_col] if payload_col else [])

    def build(skey, pdf):
        grp = int(skey[0])
        ext = "tar.gz" if gz else "tar"
        name = f"shard-{grp:05d}.{ext}"
        path = os.path.join(out_dir, name)
        entries: list[tuple[str, bytes]] = []
        keys = sorted(str(k) for k in pdf[key_col])
        order = pdf.sort_values(key_col)
        for _, row in order.iterrows():
            k = str(row[key_col])
            t = row[txt_col]
            if t is not None:
                entries.append((f"{k}.txt", str(t).encode("utf-8")))
            if json_col and row[json_col] is not None:
                entries.append(
                    (f"{k}.json", str(row[json_col]).encode("utf-8"))
                )
            if payload_col and row[payload_col] is not None:
                entries.append(
                    (f"{k}.{payload_ext}", bytes(row[payload_col]))
                )
        blob = tar_build(entries)
        if gz:
            # mtime=0 for deterministic bytes across re-runs
            import io as _io

            buf = _io.BytesIO()
            with gzip.GzipFile(
                fileobj=buf, mode="wb", compresslevel=1, mtime=0
            ) as g:
                g.write(blob)
            blob = buf.getvalue()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish
        import hashlib

        return pd.DataFrame(
            [
                {
                    "shard": path,
                    "n_samples": len(keys),
                    "n_bytes": len(blob),
                    "keys_md5": hashlib.md5(
                        "|".join(keys).encode()
                    ).hexdigest(),
                }
            ]
        )

    manifest = (
        df.select(*cols)
        .withColumn(
            "_shard", F.pmod(F.crc32(F.col(key_col).cast("string")), n_shards)
        )
        # keep the tiny shard shuffle parallel under AQE
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "_shard")
        .groupBy("_shard")
        .applyInPandas(build, WDS_MANIFEST_DDL)
        .persist()
    )
    manifest.count()  # materialize: the write IS the action
    return manifest


def documents_to_wds(
    docs: DataFrame, out_dir: str, n_shards: int = 8, gz: bool = False
) -> DataFrame:
    """documents schema -> WebDataset shards: key = zero-padded
    doc_id, `.txt` = text, `.json` = {"id", "url"} sidecar."""
    from pyspark.sql import functions as F

    framed = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("key"),
        F.col("text").alias("txt"),
        F.to_json(F.struct("doc_id", "url")).alias("json"),
    )
    return write_wds(
        framed, out_dir, n_shards=n_shards, gz=gz, json_col="json"
    )


# ---------------------------------------------------------------------------
# deterministic fixture builder
# ---------------------------------------------------------------------------


def build_wds_shard(
    docs: list[tuple[int, str]], gz: bool = False, xz: bool = False
) -> bytes:
    """One WebDataset shard: per doc a `{key}.txt` + `{key}.json` +
    `{key}.cls` triple, keys zero-padded doc ids in sorted order (the
    convention real shard writers follow so samples stay adjacent)."""
    entries: list[tuple[str, bytes]] = []
    for doc_id, text in sorted(docs):
        key = f"{doc_id:08d}"
        entries.append((f"{key}.txt", text.encode("utf-8")))
        entries.append(
            (
                f"{key}.json",
                json.dumps(
                    {"id": doc_id, "n": len(text)}, sort_keys=True
                ).encode("ascii"),
            )
        )
        entries.append((f"{key}.cls", str(doc_id % 10).encode("ascii")))
    blob = tar_build(entries)
    if xz:
        # 64 KiB-dict filter chain: cheap per-shard encoder init (the
        # warc.py fixture-encoder measurement), identical output size
        return lzma.compress(
            blob,
            format=lzma.FORMAT_XZ,
            filters=[{"id": lzma.FILTER_LZMA2, "preset": 1, "dict_size": 1 << 16}],
        )
    return gzip.compress(blob, compresslevel=1) if gz else blob
