"""Registry-wide plan-shape sweep: the mechanical enforcement of
PLANS.md. Every registered query's executed plan must be free of
CartesianProduct, and Python/Arrow stages may appear ONLY in the
documented set (partial top-k consumers, multimodal codecs).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

# queries whose plans legitimately contain an Arrow/Python stage:
# the partial-top-k consumers (local_topk mapInPandas) and the
# multimodal codec family (mapInPandas over binary payloads)
_PYTHON_OK = {
    "q_sim_cosine_topk",
    "q_sim_ann_lsh",
    "q_sim_ann_multiprobe",
    "q_sim_ivf",
    "q_sim_ivf_recall",
    "q_sim_ivf_trained_recall",
    "q_sim_pq_topk",
    "q_sim_pq_recall",
    "q_sim_ivfpq_topk",
    "q_sim_ivfpq_res_recall",
    "q_sim_ivfpq_res_topk",
    "q_multimodal_image_features",
    "q_multimodal_audio_features",
    "q_multimodal_frame_stats",
    "q_multimodal_real_codecs",
    "q_multimodal_image_dhash",  # mapInPandas decode + bit pack
    "q_multimodal_dhash_pairs",  # same Arrow stage feeds the band join
    "q_emb_covariance",  # gram_cells: one numpy X^T X per Arrow batch
    "q_sim_matryoshka_recall",  # partial-top-k consumer (prefix dims)
    "q_sim_hard_negatives",  # partial-top-k consumer (cluster-excluded)
    "q_semdedup_pairs",  # per-cell numpy Gram block (applyInPandas)
    "q_semdedup_survivors",  # consumes the same Gram pair frame
    "q_warc_ingest",  # applyInPandas fixture build + mapInPandas gzip/WARC split
    "q_warc_corpus",  # consumes the same ingested record frame
    "q_multimodal_exif",  # header-only APPn metadata walk (mapInPandas)
    "q_warc_html_pipeline",  # same WARC Arrow ingest stage, HTML fixture
    "q_web_robots_filter",  # robots.txt rule parse (tiny mapInPandas, host-sized)
    "q_wet_ingest",  # same WARC Arrow ingest stage, WET fixture
    "q_warc_cdx",  # consumes the same ingested record frame (CDX projection)
    "q_pdf_ingest",  # mapInPandas fixture build + from-spec PDF parse
    "q_pdf_corpus",  # consumes the same parsed page frame
    "q_multimodal_dhash_wide_pairs",  # mapInPandas 124-bit hash stage
    "q_warc_recrawl_diff",  # consumes the two ingested record memos
    "q_warc_revisit_resolve",  # consumes the two ingested record memos
    "q_warc_robots_pipeline",  # applyInPandas fixture + mapInPandas ingest + robots parse
    "q_multimodal_dhash_resampled",  # mapInPandas decode + 9x8 resample
    "q_sim_ivfpq_refined_recall",  # partial-top-k consumer (refine re-rank)
    "q_sim_sq8_topk",  # partial-top-k consumer (SQ8 ADC)
    "q_sim_sq8_recall",  # same
    "q_sim_seeding_quality",  # rides the trained/kcenter memos (local_topk lineage)
    "q_mix_weighted_sample",  # partial-top-k consumer (A-ES keys)
    "q_text_zipf",  # partial-top-k head cut before the regression
    "q_sim_matryoshka_cascade",  # two partial-top-k stages (beam + re-rank)
    "q_multimodal_dhash_clusters",  # mapInPandas decode feeds the hash grouping
    "q_multimodal_text_quality",  # rides the dhash-cluster memo (Arrow decode)
    "q_multimodal_jpeg_features",  # mapInPandas JPEG encode fixtures + decode
    "q_multimodal_mjpeg_frames",  # mapInPandas AVI build + per-frame JPEG decode
    "q_multimodal_palette_codecs",  # mapInPandas GIF/palette-PNG build + decode
    "q_multimodal_adpcm_features",  # mapInPandas ADPCM build + state-machine decode
    "q_multimodal_g711_features",  # mapInPandas G.711 build + table expand
    "q_multimodal_mp4_frames",  # mapInPandas ISO-BMFF build + demux + JPEG decode
    "q_multimodal_cross_container",  # mapInPandas AVI+MP4 twin build + arc hash
    "q_multimodal_semantic_topk",  # mapInPandas codec build + embedding extract
    "q_multimodal_gif_frames",  # mapInPandas animated-GIF build + composite
    "q_multimodal_audio_fingerprint",  # mapInPandas WAV build + envelope hash
    "q_multimodal_video_fingerprint",  # mapInPandas AVI build + frame-arc hash
    "q_web_polite_caps",  # robots.txt rule parse (host-sized mapInPandas)
    "q_pdf_fonts",  # mapInPandas fixture build + font-aware PDF parse
    "q_office_docx",  # mapInPandas ZIP/OOXML build + parse
    "q_office_pptx",  # same Arrow container stage, slide fan-out
    "q_office_xlsx",  # same Arrow container stage, sharedStrings index
    "q_office_rtf",  # same Arrow stage, control-word state machine
    "q_office_doc",  # same Arrow stage, CFB + piece-table walk
    "q_office_sniff",  # mixed-kind Arrow stage, routing by magic
    "q_pdf_links",  # mapInPandas fixture build + annotation walk
    "q_web_frontier",  # robots.txt parse stage (host-sized mapInPandas)
    "q_wds_media",  # applyInPandas shard build + tar walk + TIFF decode
    "q_office_crossformat_dedup",  # triple-format Arrow build + parse
    "q_office_epub",  # container stage; HTML strip is the JVM chain
    "q_text_markdown",  # Arrow fixture build; strip is the JVM chain
    "q_wds_ingest",  # applyInPandas shard build + mapInPandas tar walk
    "q_multimodal_tiff",  # mapInPandas TIFF build + decode
    "q_warc_mixed_formats",  # WARC ingest + PDF + OOXML Arrow stages
    "q_web_sitemap",  # sitemap XML parse (host-sized mapInPandas)
    "q_web_sitemap_index",  # host-sized tree fixture build + gz decode Arrow stages
}


@pytest.mark.slow
def test_registry_wide_plan_sweep(spark):
    from plan_audit import audit

    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_SMOKE

    offenders_cartesian = []
    offenders_python = []
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, SF_SMOKE)
        a = audit(df._jdf.queryExecution().executedPlan().toString())
        if a["cartesian"]:
            offenders_cartesian.append(name)
        if a["python"] and name not in _PYTHON_OK:
            offenders_python.append(name)
    assert offenders_cartesian == []
    assert offenders_python == []
