"""Hot-band guard for MinHash-LSH candidate generation (VERDICT r08
ask #1): a crawl-scale corpus of templated near-identical pages must
NOT cost the band self-join a quadratic pair set.

Two fixtures, two guards:
  - templated near-identical text (distinct fingerprints, shared
    shingles -> shared band hashes): the band-frequency cap routes
    over-cap buckets out of the self-join into a per-bucket star
    (hub = min id), so candidate count is O((cap + 1) * n), never
    O(n^2), while the clique still reaches verify/CC via the hub;
  - byte-identical groups: exact-collapse-first keeps them out of the
    band join entirely (1 representative per distinct text); member
    pairs come back via the fingerprint fan-out with jaccard 1.0.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import dedup as D

CAP = 32  # small cap so a 1k-doc fixture exercises the guard


def _templated_docs(spark, n=1000):
    # Templated boilerplate: every doc shares the same long template,
    # differing only in a serial number — the classic crawl hot-band
    # shape (near-identical, NOT byte-identical).
    template = (
        "breaking news update number {i} from the city desk today the "
        "council voted again on the measure and the measure passed with "
        "the usual margin details inside the full report follows below"
    )
    rows = [(i, template.format(i=i)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_cap_bounds_hot_band_pairs(spark):
    n = 1000
    docs = _templated_docs(spark, n)
    guarded = D.candidate_pairs(docs, band_cap=CAP).count()
    # every doc differs only in one token: most shingles (and hence
    # most band hashes) collide across the whole corpus, so the
    # unguarded join would emit close to n^2/2 pairs. Spot-check the
    # blowup on a slice (full unguarded 1k run = ~4M-row join).
    slice_n = 200
    unguarded_slice = D.candidate_pairs(
        _templated_docs(spark, slice_n), collapse_exact=False, band_cap=None
    ).count()
    assert unguarded_slice > slice_n * (slice_n - 1) // 4, (
        "fixture must actually produce a hot band"
    )
    # O((cap+1) * n) bound: each kept bucket contributes <= cap^2/2
    # pairs, each hot bucket <= members-1 star edges, and each doc
    # sits in `bands` buckets.
    assert guarded <= D.DEFAULT_BANDS * (CAP / 2 + 1) * n
    # and concretely nowhere near quadratic:
    assert guarded < n * (n - 1) // 20
    # the star overflow keeps the clique visible to verify/CC —
    # a hot bucket must NOT silently vanish:
    assert guarded > 0


def test_exact_collapse_fanout_reproduces_duplicate_pairs(spark):
    # 3 distinct texts x group sizes (5, 3, 1): within-group pairs
    # must all surface with jaccard 1.0 even though only one rep per
    # text enters the band join.
    rows = []
    did = 0
    for g, size in enumerate((5, 3, 1)):
        text = f"completely distinct document body number {g} " + " ".join(
            f"tok{g}_{j}" for j in range(30)
        )
        for _ in range(size):
            rows.append((did, text))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.candidate_pairs(docs).collect()
    within = {(r.id_a, r.id_b): r.jaccard_est for r in pairs}
    # group 0 = ids 0..4 -> 10 pairs, group 1 = ids 5..7 -> 3 pairs
    expect = {(a, b) for a in range(5) for b in range(a + 1, 5)} | {
        (a, b) for a in range(5, 8) for b in range(a + 1, 8)
    }
    assert expect <= set(within)
    for p in expect:
        assert within[p] == 1.0


def test_guard_is_identity_on_uniform_corpus(spark):
    # Random distinct docs, no hot bands: guarded output must be
    # row-identical to the unguarded path (the hash-identity contract
    # the round-8 verdict requires on the real corpus).
    rows = [
        (i, " ".join(f"w{(i * 37 + j * 11) % 9973}" for j in range(25)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = D.candidate_pairs(docs, collapse_exact=False, band_cap=None)
    new = D.candidate_pairs(docs)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_capped_bucket_members_still_pair_via_cold_bands(spark):
    # Two docs that share one scorching band (shared prefix) and one
    # cold band must still pair when the hot band is dropped: build a
    # corpus where a common prefix floods one shingle region while a
    # shared distinct suffix keeps a private band hash for one pair.
    common = " ".join(f"c{j}" for j in range(12))
    rows = [(i, common + f" filler{i} end{i}") for i in range(200)]
    # docs 500/501: same suffix -> they share suffix shingles (cold
    # band) in addition to the flooded prefix shingles.
    rows += [(500, common + " special suffix shared here"),
             (501, common + " special suffix shared here word")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in D.candidate_pairs(docs, band_cap=CAP).collect()
    }
    assert (500, 501) in got


def test_simhash_hot_bucket_guard(spark):
    """SimHash twin: boilerplate pages landing on the IDENTICAL
    simhash fan out all their hamming-0 pairs through the value-keyed
    collapse, and a band-value flood of DISTINCT signatures stays
    bounded under the cap while a planted cold-band near-pair
    survives."""
    from pyspark.sql import functions as F

    rows = []
    # 500 distinct signatures sharing band 0 (low 12 bits = 0xABC)
    for i in range(500):
        rows.append((i, ((i * 2654435761) & 0xFFFFFFF) << 12 | 0xABC))
    # planted near-pair: one bit apart in a HIGH band, shares cold bands
    base = (0x5555555 << 12) | 0xABC
    rows += [(2000, base), (2001, base ^ (1 << 40))]
    # identical-signature group
    rows += [(3000 + j, (0x777 << 12) | 0xDEF) for j in range(8)]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_pairs(
            spark.range(0), signatures=sigs, band_cap=CAP
        ).collect()
    }
    assert got[(2000, 2001)] == 1
    ident = {(a, b) for a in range(3000, 3008) for b in range(a + 1, 3008)}
    assert ident <= set(got) and all(got[p] == 0 for p in ident)
    assert len(got) < 1200  # nothing quadratic from the hot band


def test_candidate_pairs_cc_edges_invariant(spark):
    """expand_members=False (the text cluster mode): connected
    components over the CC-sufficient edge set equal CC over the full
    expanded pair list on a duplicate-heavy corpus, at a fraction of
    the edge count."""
    from corrie_spark.operators import dedup as D

    rows, i = [], 0
    texts = [
        f"unique document number {k} with several distinct words {k * 7}"
        for k in range(20)
    ]
    for t in texts:
        for _ in range(1 + (i % 5)):  # exact-dup groups up to size 5
            rows.append((i, t))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = D.candidate_pairs(df)
    edges = D.candidate_pairs(df, expand_members=False)
    assert edges.count() < full.count()
    cc1 = D.connected_components(
        full.select("id_a", "id_b"), df.select("doc_id")
    )
    cc2 = D.connected_components(
        edges.select("id_a", "id_b"), df.select("doc_id")
    )
    assert cc1.exceptAll(cc2).count() == 0
    assert cc2.exceptAll(cc1).count() == 0
    # star edges score 1.0 through the same jaccard projection
    assert edges.where("jaccard_est > 1.0").count() == 0
