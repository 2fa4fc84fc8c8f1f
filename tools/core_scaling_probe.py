"""Core-count scaling audit (round-14 verdict ask #7): at sf0.1 the
whole suite sits at the per-query scheduling floor, so 8-core and
32-core totals tie and prove nothing about operator parallelism. This
probe times the scan/decode-heavy operator FAMILIES on a 10-30x
synthetic corpus (tools/scaling_probe.py's generator — matched
fixtures, measured collision profile) at the CURRENT $SPARK_GRAFT_CPUS
and records steady-state minima, so two runs (8 vs 32 cores) give a
per-family core-scaling ratio.

    SPARK_GRAFT_CPUS=32 python tools/core_scaling_probe.py /tmp/csp 10
    SPARK_GRAFT_CPUS=8  python tools/core_scaling_probe.py /tmp/csp 10
    python tools/core_scaling_probe.py /tmp/csp 10 --report

Timing discipline: one untimed cold run per family (memo/fixture
builds + codegen), then min of 3 steady-state runs — core scaling is a
property of the steady pipeline, and the one-shot build costs are
already priced separately by bench.py's `builds` map.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = [
    ("minhash_lsh_pairs", "q_dedup_minhash_pairs"),
    ("simhash_pairs", "q_dedup_simhash_pairs"),
    ("codec_jpeg_features", "q_multimodal_jpeg_features"),
    ("mp3_scan", "q_multimodal_mp3_scan"),
    ("flac_codec", "q_multimodal_flac"),
    ("webp_vp8l", "q_multimodal_webp"),
    ("avro_ingest", "q_avro_ingest"),
    ("warc_zstd", "q_warc_zstd"),
    ("warc_xz", "q_warc_xz"),
    ("wiki_dump", "q_wiki_ingest"),
    ("office_container", "q_office_docx"),
    ("dsir_scores", "q_text_dsir_scores"),
    ("pricing_summary", "q1_pricing_summary"),
    ("audio_spectrum", "q_multimodal_audio_spectrum"),
]


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corrie_core_scaling"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    only = None
    for a in sys.argv[3:]:
        if not a.startswith("--"):
            only = set(a.split(","))
    if only:
        global FAMILIES
        FAMILIES = [f for f in FAMILIES if f[0] in only]

    d = os.path.join(base, f"x{scale}")
    if "--report" in sys.argv:
        rows = {}
        for f in sorted(os.listdir(base)):
            if f.startswith("result_c") and f.endswith(".json"):
                cpus = int(f[len("result_c"):-len(".json")])
                rows[cpus] = json.load(open(os.path.join(base, f)))
        if len(rows) < 2:
            print("need results from two core counts first")
            return 1
        lo, hi = min(rows), max(rows)
        print(f"core scaling at {scale}x corpus: {lo} vs {hi} cores")
        print(f"{'family':24s} {'t_'+str(lo):>8s} {'t_'+str(hi):>8s} {'ratio':>6s}")
        for label, _ in FAMILIES:
            a, b = rows[lo].get(label), rows[hi].get(label)
            if a and b:
                print(f"{label:24s} {a:8.2f} {b:8.2f} {a / b:6.2f}")
        return 0

    from scaling_probe import gen_corpus  # noqa: E402 (same tools dir)

    marker = os.path.join(d, "_GENERATED")
    if not os.path.exists(marker):
        gen_corpus(d, scale)
        open(marker, "w").write("ok\n")

    from corrie_spark.queries.registry import all_queries
    from corrie_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("core-scaling-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    out = {}
    for label, qname in FAMILIES:
        fn = queries[qname]
        try:
            fn(spark, d).count()  # cold: memo/fixture builds + codegen
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, d).count()
                ts.append(time.perf_counter() - t0)
            out[label] = round(min(ts), 3)
            print(f"c{cpus} {label:24s} {out[label]:8.2f}s", flush=True)
        except Exception as e:  # one broken family must not sink the run
            print(f"c{cpus} {label}: FAILED {e}", flush=True)
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, f"result_c{cpus}.json"), "w") as f:
        json.dump(out, f)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
