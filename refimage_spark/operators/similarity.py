"""Similarity search over embedding columns (ANN).

The reference's core operator is exact cosine top-k over a dense matrix
(FAISS IndexFlatIP, src/refimage/search/__init__.py:202-266). Here:

- ``cosine_topk``   — exact brute-force baseline, pure DataFrame: the
  query vector is a broadcast literal; the scan is embarrassingly
  parallel; top-k is TakeOrdered (bounded heap per partition).
- ``lsh_topk``      — the scale path: random-hyperplane (sign) LSH
  bucketing; only the query's bucket (+ optional multi-probe neighbors)
  is scanned. At 10^12 vectors the bucket table is written
  partitioned-by(bucket) so a query prunes to one partition.

Hyperplanes are seed-pinned (deterministic across runs/cluster sizes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from refimage_spark.operators.dedup import cosine


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    threshold: float = -1.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by id (total order, reproducible
    — fixes the reference's nondeterministic set ordering, SURVEY.md §2.8)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
    )
    if threshold > -1.0:
        scored = scored.where(F.col("cos") >= threshold)
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, dim * 1_000 + n_planes]))
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a sign-LSH ``bucket`` int column (deterministic, JVM-only math:
    per-plane dot products via zip_with/aggregate over a literal plane)."""
    planes = _hyperplanes(dim, n_planes, seed)
    emb = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(
            F.zip_with(emb, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return embeddings.withColumn("bucket", bucket)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (numpy, seeded init, fixed iters).
    Trained on a bounded sample — standard IVF practice: at 10^12 vectors
    you train the coarse quantizer on ~10^6 sampled rows, never the corpus."""
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.Philox(key=[seed, k]))
    cent = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_sample: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: seeded k-means coarse quantizer; scan only the nprobe
    cells nearest the query, exact cosine rank within.

    Scale shape: cell assignment is one Arrow-batched pandas UDF pass
    (numpy matmul per batch); the cell table is written
    partitioned-by(cell) so a query prunes to nprobe partitions. The
    brute-force baseline is cosine_topk; this trades recall for a
    ~n_cells/nprobe scan reduction.
    """
    sample = np.asarray(
        [r[0] for r in embeddings.select(vec_col).limit(train_sample).collect()],
        dtype=np.float64,
    )
    cent = _kmeans(sample, n_cells, seed=seed)
    b_cent = cent  # closed over; ~n_cells*dim floats, broadcast with the task

    @pandas_udf(T.IntegerType())
    def cell_of(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ b_cent.T, axis=1).astype(np.int32))

    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    probe_cells = [int(c) for c in np.argsort(-(cent @ qv))[:nprobe]]
    cand = embeddings.withColumn("cell", cell_of(F.col(vec_col))).where(
        F.col("cell").isin(probe_cells)
    )
    return cosine_topk(cand, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan only buckets within hamming<=multiprobe of
    the query's bucket, then exact cosine rank inside the candidates."""
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qb = sum((1 << j) for j in range(n_planes) if float(planes[j] @ qv) > 0)
    probes = [qb]
    if multiprobe >= 1:
        probes += [qb ^ (1 << j) for j in range(n_planes)]
    if multiprobe >= 2:
        probes += [
            qb ^ (1 << j) ^ (1 << i)
            for j in range(n_planes)
            for i in range(j + 1, n_planes)
        ]
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, seed, vec_col)
    cand = bucketed.where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k=k, vec_col=vec_col, id_col=id_col)
