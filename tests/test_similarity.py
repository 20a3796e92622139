"""ANN over PERSISTED indexes: exact brute-force baseline, LSH/IVF
build-once query-many, partition pruning in the plan, recall gates,
determinism."""

import numpy as np
import pytest

from refimage_spark.operators.similarity import (
    ann_recall,
    build_ivf_index,
    build_lsh_index,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)


def emb_sf001(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _qvec(df, vid=0):
    row = df.where(f"vec_id = {vid}").select("embedding").head()
    return [float(x) for x in row[0]]


@pytest.fixture(scope="module")
def ann_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann"))
    emb = emb_sf001(spark)
    build_lsh_index(emb, d, dim=64)
    build_ivf_index(emb, d, n_cells=16)
    return d


def test_exact_topk_self_first(spark):
    emb = emb_sf001(spark)
    q = _qvec(emb)
    top = cosine_topk(emb, q, k=5).collect()
    assert top[0].vec_id == 0 and abs(top[0].cos - 1.0) < 1e-6
    scores = [r.cos for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_on_table(spark, ann_dir):
    """Near-uniform vectors: IVF probing 4/16 cells must still beat the
    1/4 scan fraction on recall (directional cells concentrate neighbors)."""
    emb = emb_sf001(spark)
    q = _qvec(emb)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(spark, ann_dir, q, k=10, nprobe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 0
    assert recall >= 0.5, (recall, exact, approx)


def test_lsh_recall_on_clustered(spark, tmp_path):
    """LSH's regime: tight clusters (cos≈0.95 within). Top-k of a member
    is its cluster; hamming<=2 probing must recover most of it."""
    rng = np.random.Generator(np.random.Philox(key=[7, 7]))
    centers = rng.standard_normal((20, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(25):
            v = centers[c] + 0.06 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    d = str(tmp_path / "lsh32")
    build_lsh_index(emb, d, dim=32, n_planes=8)
    q = _qvec(emb, vid=0)
    exact = [r.vec_id for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in lsh_topk(spark, d, q, k=10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def _partition_filters(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan
    return plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]

def test_lsh_partition_pruning_in_plan(spark, ann_dir):
    """The point of the persisted index: the parquet scan must prune to
    the probe buckets (PartitionFilters on the bucket partition column),
    not rescan the corpus."""
    q = _qvec(emb_sf001(spark))
    pf = _partition_filters(lsh_topk(spark, ann_dir, q, k=10))
    assert "bucket" in pf and "IN" in pf, pf


def test_ivf_partition_pruning_in_plan(spark, ann_dir):
    q = _qvec(emb_sf001(spark))
    pf = _partition_filters(ivf_topk(spark, ann_dir, q, k=10))
    assert "cell" in pf and "IN" in pf, pf


def test_lsh_deterministic(spark, ann_dir):
    q = _qvec(emb_sf001(spark))
    a = [(r.vec_id, r.cos) for r in lsh_topk(spark, ann_dir, q, k=10).collect()]
    b = [(r.vec_id, r.cos) for r in lsh_topk(spark, ann_dir, q, k=10).collect()]
    assert a == b


def test_ivf_deterministic_rebuild(spark, tmp_path):
    """The quantizer trains on a DETERMINISTIC sample: two independent
    builds of the same corpus yield identical indexes and results."""
    emb = emb_sf001(spark)
    q = _qvec(emb)
    outs = []
    for name in ("a", "b"):
        d = str(tmp_path / name)
        build_ivf_index(emb, d, n_cells=16)
        outs.append([(r.vec_id, r.cos) for r in ivf_topk(spark, d, q, k=10).collect()])
    assert outs[0] == outs[1]


def test_ann_recall_gate(spark, ann_dir):
    emb = emb_sf001(spark)
    q = _qvec(emb)
    rows = {r.method: r.recall for r in ann_recall(spark, emb, ann_dir, q).collect()}
    assert set(rows) == {"lsh", "ivf"}
    assert rows["ivf"] >= 0.5, rows
    assert rows["lsh"] >= 0.1, rows  # near-uniform vectors: LSH's worst regime


def test_lsh_bucket_tolerates_null_and_ragged_rows(spark):
    """One bad embedding row (null or wrong dimension) must not fail the
    whole bucket computation — it buckets to 0, matching the replaced
    JVM expression's null-falls-to-zero behavior."""
    import numpy as np

    from refimage_spark.operators.similarity import with_lsh_bucket

    rng = np.random.Generator(np.random.Philox(key=[5, 0]))
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(6)]
    rows.append((6, None))
    rows.append((7, [1.0, 2.0]))  # wrong dimension
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.bucket for r in
           with_lsh_bucket(emb, dim=16, n_planes=4).collect()}
    assert len(got) == 8
    assert got[6] == 0 and got[7] == 0
    assert any(got[i] != 0 for i in range(6))  # real rows still bucket
