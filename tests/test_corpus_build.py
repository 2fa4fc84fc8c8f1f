"""End-to-end corpus build: stage monotonicity, determinism across
runs, near-dup-free output, shard budget bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark import corpus as C
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


_CACHE: dict = {}


def _build(spark, tmp_path, name):
    # one physical build per name per session — five tests share the
    # c1 artifact instead of re-running the whole pipeline each
    if name not in _CACHE:
        docs = load(spark, SF_SMOKE, "documents")
        out = str(tmp_path / name)
        manifest = C.build_corpus(spark, docs, out, shard_budget=2000)
        _CACHE[name] = (manifest, out)
    manifest, out = _CACHE[name]
    return manifest, spark.read.parquet(f"{out}/corpus")


def test_manifest_stage_monotonicity(spark, tmp_path):
    m, out = _build(spark, tmp_path, "c1")
    assert m["n_raw"] >= m["n_after_exact_dedup"] >= m["n_after_near_dedup"] >= m["n_after_quality"] >= m["n_written"]
    assert m["n_written"] > 0
    assert set(m["splits"]) <= {"train", "val", "test"}
    assert sum(s["n_docs"] for s in m["splits"].values()) == m["n_written"]


def test_build_is_deterministic(spark, tmp_path):
    m1, out1 = _build(spark, tmp_path, "c1")
    m2, out2 = _build(spark, tmp_path, "c2")
    assert m1 == m2
    r1 = sorted(tuple(r) for r in out1.collect())
    r2 = sorted(tuple(r) for r in out2.collect())
    assert r1 == r2


def test_output_has_no_duplicate_clusters(spark, tmp_path):
    """Near-dedup keeps exactly one representative per CC cluster, so
    no two written docs may share an LSH candidate pair."""
    from corrie_spark.operators import dedup as D

    _, out = _build(spark, tmp_path, "c1")
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    written = out.select("doc_id").join(docs, "doc_id")
    pairs = D.candidate_pairs(written, id_col="doc_id", text_col="text")
    assert pairs.count() == 0


def test_shard_budget_bound(spark, tmp_path):
    """A shard may overshoot only by the straddling doc: sum(tokens)
    per shard < budget + max doc tokens in that shard; and every
    non-final shard of a split reaches the budget."""
    _, out = _build(spark, tmp_path, "c1")
    per_shard = (
        out.groupBy("split", "shard")
        .agg(F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r in per_shard:
        assert r.tok < 2000 + r.mx


def test_exact_dup_never_written(spark, tmp_path):
    _, out = _build(spark, tmp_path, "c1")
    docs = load(spark, SF_SMOKE, "documents")
    from corrie_spark.operators.text import fingerprint

    written = out.select("doc_id").join(docs, "doc_id").select(fingerprint("text").alias("fp"))
    assert written.count() == written.distinct().count()


def test_staged_build_resumes_without_recompute(spark, tmp_path):
    """Stage checkpointing: run 1 executes all stages; run 2 (outputs
    present) executes none; deleting the final output re-runs ONLY
    the pack stage; and the staged result matches the in-memory
    build exactly."""
    import shutil

    docs = load(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "staged")
    m1 = C.build_corpus_staged(spark, docs, out, shard_budget=2000)
    assert m1["stages_run"] == ["clusters", "assigned", "pack"]

    m2 = C.build_corpus_staged(spark, docs, out, shard_budget=2000)
    assert m2["stages_run"] == []
    assert m2["splits"] == m1["splits"]

    shutil.rmtree(f"{out}/corpus")
    m3 = C.build_corpus_staged(spark, docs, out, shard_budget=2000)
    assert m3["stages_run"] == ["pack"]
    assert m3["splits"] == m1["splits"]

    # staged output == one-shot in-memory build output
    mem_manifest, mem_out = _build(spark, tmp_path, "c1")
    staged_rows = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/corpus").collect()
    )
    mem_rows = sorted(tuple(r) for r in mem_out.collect())
    assert staged_rows == mem_rows


def test_staged_build_rewrites_killed_stage(spark, tmp_path):
    """Crash-safety: a stage dir WITHOUT its post-commit marker (the
    on-disk state a killed write leaves) must be rewritten, not
    trusted."""
    import os

    docs = load(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "killed")
    C.build_corpus_staged(spark, docs, out, shard_budget=2000)
    # simulate a crash mid-rewrite of the assigned stage
    os.remove(f"{out}/stages/assigned/_STAGE_DONE")
    m = C.build_corpus_staged(spark, docs, out, shard_budget=2000)
    assert m["stages_run"] == ["assigned"]  # clusters trusted, assigned redone
    assert os.path.exists(f"{out}/stages/assigned/_STAGE_DONE")


def test_incremental_refresh_equals_from_scratch(spark, tmp_path):
    """The incremental refresh invariant (round-7 verdict #4): build
    the staged corpus on a base snapshot, fold the batch in via
    refresh_corpus_staged (batch-adjacent edges + contracted CC), and
    the refreshed stage dir — manifest, boundary counts, AND packed
    shard rows — must be byte-equal to a from-scratch staged build on
    the combined corpus."""
    from pyspark.sql import functions as F

    docs = load(spark, SF_SMOKE, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 3)
    batch = docs.filter(F.col("doc_id") % 4 == 3)

    incr = str(tmp_path / "incr")
    C.build_corpus_staged(spark, base, incr, shard_budget=2000)
    m_incr = C.refresh_corpus_staged(spark, base, batch, incr, shard_budget=2000)
    assert m_incr["stages_run"] == ["incremental_clusters", "assigned", "pack"]

    full = str(tmp_path / "full")
    m_full = C.build_corpus_staged(spark, docs, full, shard_budget=2000)

    for k in (
        "n_raw",
        "n_after_exact_dedup",
        "n_after_near_dedup",
        "n_after_quality",
        "n_written",
        "splits",
    ):
        assert m_incr[k] == m_full[k], k
    incr_rows = sorted(tuple(r) for r in spark.read.parquet(f"{incr}/corpus").collect())
    full_rows = sorted(tuple(r) for r in spark.read.parquet(f"{full}/corpus").collect())
    assert incr_rows == full_rows
