"""Index persistence: a reloaded PQ/IVF index must probe to
bit-identical results vs the freshly-trained one, with the codes /
cells tables staying distributed scans (never driver round-trips).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import index_store as IX
from corrie_spark.operators import pq
from corrie_spark.operators import similarity as S
from corrie_spark.tables import load
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pq_index_roundtrip_identical_topk(spark, tmp_path):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    books = pq.pq_codebooks(emb)
    codes = pq.pq_encode(emb, books)

    fresh = pq.pq_topk(q, emb, k=5, books=books, codes=codes)

    root = str(tmp_path / "pqidx")
    IX.save_pq_index(spark, root, books, codes)
    books2, codes2 = IX.load_pq_index(spark, root)

    assert books2 == books  # codebooks survive parquet exactly
    reloaded = pq.pq_topk(q, emb, k=5, books=books2, codes=codes2)
    assert _rows(fresh) == _rows(reloaded)


def test_ivf_index_roundtrip_identical_topk(spark, tmp_path):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    cells = S.kmeans_cells(emb, n_cells=4, n_iters=1)

    fresh = S.ivf_topk_trained(q, emb, k=5, nprobe=2, cells=cells)

    root = str(tmp_path / "ivfidx")
    IX.save_ivf_index(root, cells)
    cells2 = IX.load_ivf_index(spark, root, corpus=emb)
    assert sorted(cells2.columns) == ["cell", "qv", "vid"]

    reloaded = S.ivf_topk_trained(q, emb, k=5, nprobe=2, cells=cells2)
    assert _rows(fresh) == _rows(reloaded)


def test_saved_ivf_cells_drop_vectors(spark, tmp_path):
    """The stored inverted file must be (vid, cell) only — vectors
    live in the corpus table; duplicating them would double the
    largest index artifact."""
    emb = load(spark, SF_SMOKE, "embeddings")
    cells = S.kmeans_cells(emb, n_cells=4, n_iters=1)
    root = str(tmp_path / "ivfidx2")
    IX.save_ivf_index(root, cells)
    stored = spark.read.parquet(f"{root}/ivf_cells")
    assert sorted(stored.columns) == ["cell", "vid"]


def test_loaded_codes_stay_distributed(spark, tmp_path):
    """load_pq_index must return the codes as a parquet scan (lazy
    DataFrame), not driver-collected rows."""
    emb = load(spark, SF_SMOKE, "embeddings")
    books = pq.pq_codebooks(emb)
    codes = pq.pq_encode(emb, books)
    root = str(tmp_path / "pqidx3")
    IX.save_pq_index(spark, root, books, codes)
    _, codes2 = IX.load_pq_index(spark, root)
    plan = codes2._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "BatchScan" in plan


def test_incremental_append_matches_full_rebuild(spark, tmp_path):
    """Appending a delta batch (frozen codebooks) must yield the same
    probe results as encoding the full corpus in one pass."""
    emb = load(spark, SF_SMOKE, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    q = emb.filter(F.col("vec_id") < 3)

    books = pq.pq_codebooks(emb)  # trained once, frozen
    root = str(tmp_path / "pqinc")
    IX.save_pq_index(spark, root, books, pq.pq_encode(old, books))
    IX.append_to_pq_index(root, new, books)

    _, codes_inc = IX.load_pq_index(spark, root)
    full_codes = pq.pq_encode(emb, books)
    inc = pq.pq_topk(q, emb, k=5, books=books, codes=codes_inc)
    full = pq.pq_topk(q, emb, k=5, books=books, codes=full_codes)
    assert _rows(inc) == _rows(full)


def test_ivf_centroids_table_roundtrip(spark, tmp_path):
    """The optional centroid table persists and reloads exactly —
    the metadata a probe session broadcasts without retraining."""
    from corrie_spark.operators.similarity import ivf_centroids

    emb = load(spark, SF_SMOKE, "embeddings")
    cents = ivf_centroids(emb, "label", "embedding", 64)
    root = str(tmp_path / "ivfc")
    IX.save_ivf_index(root, S.kmeans_cells(emb, n_cells=4, n_iters=1), centroids=cents)
    back = spark.read.parquet(f"{root}/ivf_centroids")
    a = sorted((r.cell, tuple(r.centroid)) for r in cents.collect())
    b = sorted((r.cell, tuple(r.centroid)) for r in back.collect())
    assert a == b
