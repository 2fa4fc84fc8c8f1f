"""Empirical scaling audit (round-8 verdict ask #4): the SCALE.md O()
claims, measured. Generates matched synthetic corpora at 1x and 10x
(both from THIS generator, so the comparison is apples-to-apples and
never mixes driver-generated data with probe data), times the key
operator families through the public registry, and prints observed
exponents alpha where wall ~ n^alpha (alpha = log10(t_10x / t_1x)).

Fixture discipline (verify-skill round-8 note): values are md5-derived
deterministic-uniform — affine/gradient formulas give collision
profiles that silently go quadratic. A 2% exact-duplicate fraction and
a 0.3-weight label structure in the embeddings keep the dedup families
realistic without manufacturing a pathological clique; output
cardinalities are reported next to the walls so a super-linear ROW
count is never mistaken for super-linear WORK.

    python tools/scaling_probe.py            # 1x vs 10x, prints a table
    python tools/scaling_probe.py 4          # custom scale factor
"""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DOCS = 5_000  # the sf0.1 shape
BASE_VECS = 2_000
DIM = 64
VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shard", "block", "plan", "cache", "disk", "node",
]
LANGS = ["en", "de", "fr", "es", "zh"]


def _u(salt: str, i: int) -> int:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)


def gen_corpus(out_dir: str, scale: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_docs = BASE_DOCS * scale
    n_vecs = BASE_VECS * scale
    os.makedirs(out_dir, exist_ok=True)

    texts, langs, sources = [], [], []
    for i in range(n_docs):
        if i % 50 == 49:  # 2% exact duplicates of an earlier doc
            texts.append(texts[i - 25])
        else:
            ln = 8 + _u("len", i) % 60
            # 20% common words + an open 5000-word tail: a FIXED tiny
            # vocab makes minhash slots collide corpus-wide and pair
            # counts go quadratic as a fixture artifact (verify-skill
            # round-8 note) — real crawl vocabulary grows with corpus
            texts.append(
                " ".join(
                    VOCAB[_u(f"w{j}", i) % len(VOCAB)]
                    if _u(f"c{j}", i) % 5 == 0
                    else f"w{_u(f'v{j}', i) % 5000}"
                    for j in range(ln)
                )
            )
        langs.append(LANGS[_u("lang", i) % len(LANGS)])
        sources.append(f"src{_u('src', i) % 20}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )

    rng = np.random.default_rng(7)
    labels = np.array([_u("lab", i) % 10 for i in range(n_vecs)])
    cents = rng.standard_normal((10, DIM))
    vecs = (rng.standard_normal((n_vecs, DIM)) + 0.3 * cents[labels]).astype(
        np.float32
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array(list(map(list, vecs)), pa.list_(pa.float32())),
                "label": pa.array(labels.tolist(), pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    # a minimal orders table (the avro_ingest family's source): same
    # column names/types as the driver testdata
    import datetime

    n_ord = n_docs * 3
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array([_u("ck", i) % 1500 for i in range(n_ord)], pa.int64()),
                "o_orderstatus": [statuses[_u("st", i) % 3] for i in range(n_ord)],
                "o_totalprice": pa.array(
                    [(_u("tp", i) % 10_000_000) / 100.0 for i in range(n_ord)],
                    pa.float64(),
                ),
                "o_orderdate": pa.array(
                    [
                        datetime.datetime(2025, 1, 1)
                        + datetime.timedelta(days=_u("od", i) % 365)
                        for i in range(n_ord)
                    ],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": [prios[_u("pr", i) % 5] for i in range(n_ord)],
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )


FAMILIES = [
    # (label, registry query) — one per family the verdict named
    ("minhash_lsh_pairs", "q_dedup_minhash_pairs"),
    ("near_dup_clusters", "q_dedup_clusters"),
    ("embedding_near_dup", "q_dedup_embedding"),
    # the round-9 weak item's fix target: cluster-bound consumers ride
    # the capped UNEXPANDED edge memo, so this family's alpha must sit
    # near 1 even where the pair-list family's rows-out go quadratic
    ("embedding_clusters", "q_dedup_embedding_clusters"),
    ("ann_ivfpq_topk", "q_sim_ivfpq_topk"),
    ("codec_jpeg_features", "q_multimodal_jpeg_features"),
    # round-11 families: container extraction must stay row-local
    # (alpha ~1) and revisit resolution is a metadata x distinct join
    ("warc_revisit_resolve", "q_warc_revisit_resolve"),
    ("office_container", "q_office_docx"),
    ("wds_shards", "q_wds_ingest"),
    ("mixed_format_crawl", "q_warc_mixed_formats"),
    # round-12 families: every new ingestion surface gets a measured
    # exponent the same round it lands (the round-9 lesson)
    ("sitemap_tree", "q_web_sitemap_index"),
    ("avro_ingest", "q_avro_ingest"),
    ("mp3_scan", "q_multimodal_mp3_scan"),
    # round-12b: .warc.zst ingestion (zstd codec + frame walk)
    ("warc_zstd", "q_warc_zstd"),
    ("flac_codec", "q_multimodal_flac"),
    ("wiki_dump", "q_wiki_ingest"),
    # round-13: .warc.xz (stdlib-lzma stream walk) and VP8L decode
    ("warc_xz", "q_warc_xz"),
    ("webp_vp8l", "q_multimodal_webp"),
    # round-14: per-clip FFT (audio spectral analysis)
    ("audio_spectrum", "q_multimodal_audio_spectrum"),
    ("jpeg_cmyk", "q_multimodal_jpeg_cmyk"),
    ("dsir_scores", "q_text_dsir_scores"),
]


def main() -> int:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:  # optional comma-separated family filter
        only = set(sys.argv[2].split(","))
        global FAMILIES
        FAMILIES = [f for f in FAMILIES if f[0] in only]

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.session import get_spark

    spark = get_spark("scaling-probe", int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    work = tempfile.mkdtemp(prefix="corrie_scaling_")
    results: dict[str, dict[int, tuple[float, int]]] = {}
    try:
        # untimed warm pass on a SEPARATE dir: pays JVM codegen +
        # python-worker spin-up once, while the timed runs still pay
        # their own per-dir memo builds (that cost must scale on the
        # record — it is part of the family's pipeline)
        warm_dir = os.path.join(work, "warm")
        gen_corpus(warm_dir, 1)
        for _, qname in FAMILIES:
            queries[qname](spark, warm_dir).count()
        for s in (1, scale):
            d = os.path.join(work, f"x{s}")
            gen_corpus(d, s)
            for label, qname in FAMILIES:
                fn = queries[qname]
                # one untimed run would hide memo-build cost we WANT to
                # see scale; instead time the first (cold) run per dir —
                # every family pays its full pipeline at both scales.
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                wall = time.perf_counter() - t0
                results.setdefault(label, {})[s] = (wall, n)
                print(f"  x{s} {label:24s} {wall:8.2f}s  rows={n}", flush=True)

        print(f"\nscale factor {scale}x — observed exponents (wall ~ n^a):")
        print(f"{'family':26s} {'t_1x':>8s} {'t_Nx':>8s} {'alpha':>6s} {'rows_1x':>9s} {'rows_Nx':>10s}")
        for label, _ in FAMILIES:
            (t1, n1), (tn, nn) = results[label][1], results[label][scale]
            alpha = math.log(tn / t1) / math.log(scale) if t1 > 0 else float("nan")
            print(
                f"{label:26s} {t1:8.2f} {tn:8.2f} {alpha:6.2f} {n1:9d} {nn:10d}"
            )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
