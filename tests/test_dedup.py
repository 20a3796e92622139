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
