"""Chunking + packing invariants: chunk windows tile the token stream
with the configured overlap, and the two-phase distributed prefix sum
equals the naive single-window cumsum exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from corrie_spark.operators.packing import (
    chunk_documents,
    distributed_cumsum,
    pack_shards,
)


def _docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(150))),   # 3 chunks
        (1, " ".join(f"x{i}" for i in range(64))),    # exactly one chunk
        (2, " ".join(f"y{i}" for i in range(65))),    # just over -> 2
        (3, "short doc"),
        (4, ""),                                      # empty -> 1 empty chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_geometry(spark):
    out = chunk_documents(_docs(spark), chunk_tokens=64, overlap=16)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: 150 tokens, stride 48 -> starts 0,48,96 (96+64>=150) -> 3
    assert sorted(r.chunk_idx for r in by_doc[0]) == [0, 1, 2]
    assert [r.n_tokens for r in sorted(by_doc[0], key=lambda r: r.chunk_idx)] == [64, 64, 54]
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_tokens == 64
    assert sorted(r.n_tokens for r in by_doc[2]) == [17, 64]
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 2
    assert len(by_doc[4]) == 1 and by_doc[4][0].n_tokens == 0


def test_chunks_cover_every_token(spark):
    """Union of chunk windows == full token range, consecutive chunks
    overlap by exactly `overlap` (except a shorter tail)."""
    out = chunk_documents(_docs(spark), chunk_tokens=64, overlap=16).collect()
    for doc_id, n in [(0, 150), (2, 65)]:
        spans = sorted(
            (r.chunk_idx * 48, r.chunk_idx * 48 + r.n_tokens)
            for r in out
            if r.doc_id == doc_id
        )
        assert spans[0][0] == 0 and spans[-1][1] == n
        for (s0, e0), (s1, _e1) in zip(spans, spans[1:]):
            assert s1 < e0  # consecutive chunks overlap


def test_distributed_cumsum_equals_global_window(spark):
    df = spark.createDataFrame(
        [(i * 37 % 1000, (i % 13) + 1) for i in range(1000)], "k long, v long"
    )
    got = distributed_cumsum(df, "k", "v", out_col="cs", num_partitions=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("cs", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long"))
    assert sorted((r.k, r.cs) for r in got.collect()) == sorted(
        (r.k, r.cs) for r in want.collect()
    )


def test_pack_shards_budget_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(100)], "doc_id long, n_tokens long"
    )
    a = pack_shards(df, "doc_id", "n_tokens", budget=1000).collect()
    b = pack_shards(df, "doc_id", "n_tokens", budget=1000).collect()
    assert sorted((r.doc_id, r.shard) for r in a) == sorted(
        (r.doc_id, r.shard) for r in b
    )
    sizes = {}
    for r in a:
        sizes[r.shard] = sizes.get(r.shard, 0) + 100
    # 100 docs x 100 tokens @ 1000 budget -> exactly 10 shards of 1000
    assert sizes == {s: 1000 for s in range(10)}


def test_grouped_pack_equals_per_group_pack(spark):
    """pack_shards(group_cols=['split']) — the single-pass grouped
    cumsum pack_splits rides (round-15) — must equal filtering each
    split and packing it independently, row for row."""
    rows = [
        (i, 1 + (i * 7) % 40, ("train", "val", "test")[i % 3]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, split string")
    grouped = {
        (r.split, r.doc_id): (r.shard, r.n_tokens)
        for r in pack_shards(
            df, "doc_id", "n_tokens", 97, group_cols=["split"]
        ).collect()
    }
    per_split = {}
    for s in ("train", "val", "test"):
        for r in pack_shards(
            df.filter(F.col("split") == s), "doc_id", "n_tokens", 97
        ).collect():
            per_split[(s, r.doc_id)] = (r.shard, r.n_tokens)
    assert grouped == per_split
