"""Dedup family: exactness, MinHash recall vs the exhaustive oracle."""

from pyspark.sql import functions as F

from refimage_spark.operators import dedup as D


def docs_sf001(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_exact_dedup_identity(spark, documents):
    # sf0.001 has no exact dups -> every doc is its own survivor
    out = D.exact_dedup(documents)
    assert out.count() == documents.count()
    assert out.agg(F.max("n_copies")).head()[0] == 1


def test_minhash_finds_planted_neardups(spark):
    docs = docs_sf001(spark)
    pairs = D.minhash_neardup_pairs(docs, threshold=0.4).collect()
    assert len(pairs) > 0  # the sf0.01 corpus plants near-duplicates
    # every reported pair really has jaccard >= threshold (verified exactly)
    assert all(p.jaccard >= 0.4 for p in pairs)


def test_minhash_recall_vs_exhaustive(spark):
    docs = docs_sf001(spark)
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    mh = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_neardup_pairs(docs, threshold=0.7).collect()
    }
    assert mh <= exact  # verification step guarantees no false positives
    if exact:
        recall = len(mh & exact) / len(exact)
        assert recall >= 0.8, (recall, exact - mh)


def test_simhash_pairs_are_close(spark):
    docs = docs_sf001(spark)
    pairs = D.simhash_neardup_pairs(docs, max_hamming=3).collect()
    for p in pairs:
        assert p.hamming <= 3
    fps = {r.doc_id: r.fp for r in D.simhash_fingerprints(docs).collect()}
    for p in pairs:
        assert bin(fps[p.doc_a] ^ fps[p.doc_b]).count("1") == p.hamming


def test_lsh_bucket_width_bound(spark):
    """Black-hole buckets: 20 boilerplate copies form one wide band
    bucket; the width bound drops it while narrow genuine buckets keep
    their pairs."""
    from refimage_spark.operators.dedup import minhash_neardup_pairs

    rows = [(1, "a unique sentence about crimson automobiles and roads x"),
            (2, "a unique sentence about crimson automobiles and roads x")]
    rows += [(10 + i, "the same boilerplate footer text repeated everywhere")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    unbounded = minhash_neardup_pairs(docs, threshold=0.9).collect()
    bounded = minhash_neardup_pairs(docs, threshold=0.9, max_bucket_width=10).collect()
    assert len(unbounded) == 1 + 20 * 19 // 2
    assert [(r.doc_a, r.doc_b) for r in bounded] == [(1, 2)]


def test_simhash_bucket_width_bound(spark):
    """SimHash's block join gets the same black-hole bound as MinHash:
    a boilerplate cluster whose fingerprints collide in every block is
    dropped by the width bound, while a genuine narrow pair survives."""
    rows = [(1, "a unique sentence about crimson automobiles and roads x"),
            (2, "a unique sentence about crimson automobiles and roads x")]
    rows += [(10 + i, "the same boilerplate footer text repeated everywhere")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    unbounded = D.simhash_neardup_pairs(docs, max_hamming=3).collect()
    bounded = D.simhash_neardup_pairs(
        docs, max_hamming=3, max_bucket_width=10
    ).collect()
    assert len(unbounded) == 1 + 20 * 19 // 2
    assert [(r.doc_a, r.doc_b) for r in bounded] == [(1, 2)]


def test_embedding_neardup_lsh_recall(spark):
    """Sign-LSH banded blocking must recover ~all cos>=0.9 pairs found by
    the exhaustive join (and by construction returns no false positives
    — every candidate is cosine-verified)."""
    import numpy as np

    from refimage_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.Generator(np.random.Philox(key=[11, 3]))
    centers = rng.standard_normal((30, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(30):
        for _ in range(8):
            v = centers[c] + 0.05 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {(r.vec_a, r.vec_b) for r in
             embedding_neardup_pairs(emb, threshold=0.9, block_col=None).collect()}
    got = {(r.vec_a, r.vec_b) for r in
           embedding_neardup_lsh(emb, dim=32, threshold=0.9).collect()}
    assert got <= exact  # verified candidates: no false positives
    assert exact, "fixture must contain near-dup pairs"
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, recall
