"""ANN: exact brute-force, IVF recall on real table, LSH recall on
planted tight clusters (its actual guarantee regime), determinism."""

import numpy as np
import pytest

from refimage_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk


def emb_sf001(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _qvec(df, vid=0):
    row = df.where(f"vec_id = {vid}").select("embedding").head()
    return [float(x) for x in row[0]]


def test_exact_topk_self_first(spark):
    emb = emb_sf001(spark)
    q = _qvec(emb)
    top = cosine_topk(emb, q, k=5).collect()
    assert top[0].vec_id == 0 and abs(top[0].cos - 1.0) < 1e-6
    scores = [r.cos for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_on_table(spark):
    """Near-uniform vectors: IVF probing 4/16 cells must still beat the
    1/4 scan fraction on recall (directional cells concentrate neighbors)."""
    emb = emb_sf001(spark)
    q = _qvec(emb)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(emb, q, k=10, n_cells=16, nprobe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 0
    assert recall >= 0.5, (recall, exact, approx)


def _clustered_vectors(spark, n_clusters=20, per=25, dim=32, noise=0.06):
    rng = np.random.Generator(np.random.Philox(key=[7, 7]))
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + noise * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_lsh_recall_on_clustered(spark):
    """LSH's regime: tight clusters (cos≈0.95 within). Top-k of a member
    is its cluster; hamming<=2 probing must recover most of it."""
    emb = _clustered_vectors(spark)
    q = _qvec(emb, vid=0)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [
        r.vec_id for r in lsh_topk(emb, q, dim=32, k=10, n_planes=8).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_lsh_deterministic(spark):
    emb = emb_sf001(spark)
    q = _qvec(emb)
    a = [(r.vec_id, r.cos) for r in lsh_topk(emb, q, dim=64, k=10).collect()]
    b = [(r.vec_id, r.cos) for r in lsh_topk(emb, q, dim=64, k=10).collect()]
    assert a == b


def test_ivf_deterministic(spark):
    emb = emb_sf001(spark)
    q = _qvec(emb)
    a = [(r.vec_id, r.cos) for r in ivf_topk(emb, q, k=10).collect()]
    b = [(r.vec_id, r.cos) for r in ivf_topk(emb, q, k=10).collect()]
    assert a == b
