"""Multimodal plumbing: Arrow-batched feature extraction over a binary
column — deterministic digests, unit-norm invariant, vector/summary
forms agree."""

import hashlib

from pyspark.sql import functions as F

from refimage_spark.operators.multimodal import (
    _fake_decode,
    extract_feature_vectors,
    extract_features,
    media_metadata,
)


def _media(documents):
    return documents.select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    ).limit(50)


def test_features_deterministic_and_hashable(spark, documents):
    rows = extract_features(_media(documents), "raw").collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.content_md5) == 32
        assert len(r.feature_digest) == 32
        assert r.feature_norm == 1.0  # encoder invariant, rounded to 4
    again = extract_features(_media(documents), "raw").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_vector_form_matches_summary_form(spark, documents):
    vecs = {r.doc_id: r for r in extract_feature_vectors(_media(documents), "raw").collect()}
    summ = {r.doc_id: r for r in extract_features(_media(documents), "raw").collect()}
    assert set(vecs) == set(summ)
    for did, v in vecs.items():
        assert v.content_md5 == summ[did].content_md5
        want = hashlib.md5(
            ",".join(f"{x:.6f}" for x in v.feature).encode()
        ).hexdigest()
        assert summ[did].feature_digest == want


def test_content_md5_matches_plain_md5(spark, documents):
    got = {r.doc_id: r.content_md5 for r in extract_features(_media(documents), "raw").collect()}
    want = {
        r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
        for r in documents.limit(50).collect()
    }
    for did, dig in got.items():
        assert dig == want[did]


def test_fake_decode_unit_norm_and_seeded():
    import numpy as np

    a = _fake_decode(b"hello world")
    b = _fake_decode(b"hello world")
    c = _fake_decode(b"hello worle")
    np.testing.assert_array_equal(a, b)
    assert abs(float(np.linalg.norm(a.astype(np.float64))) - 1.0) < 1e-5
    assert not np.array_equal(a, c)


def test_media_metadata_jvm_only(spark, documents):
    m = _media(documents)
    rows = media_metadata(m, "raw").collect()
    lens = {r.doc_id: r.meta.n_bytes for r in rows}
    want = {r.doc_id: len(r.raw) for r in m.collect()}
    assert lens == want
