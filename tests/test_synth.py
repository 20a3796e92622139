"""Synthetic 10x-scale documents/embeddings generators (sources/synth.py):
schema-identical to the driver testdata, deterministic at any parallelism,
and clustered so the dedup/ANN ops have the structure they exercise."""

import numpy as np

from refimage_spark.sources.synth import generate_documents, generate_embeddings


def test_documents_schema_and_ids(spark, sf_dir):
    ref = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = generate_documents(spark, 400, seed=42, partitions=4)
    assert [(f.name, f.dataType.simpleString()) for f in d.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ref.schema.fields
    ]
    rows = d.collect()
    assert len(rows) == 400
    assert len({r.doc_id for r in rows}) == 400  # unique despite recrawl dups
    assert all(r.n_chars == len(r.text) for r in rows[:20])


def test_embeddings_schema_determinism_and_clustering(spark, sf_dir):
    ref = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = generate_embeddings(spark, 200, seed=42, partitions=4)
    assert [(f.name, f.dataType.simpleString()) for f in e.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ref.schema.fields
    ]
    rows = e.collect()
    assert len(rows) == 200
    # parallelism-invariant: 1 partition produces identical vectors
    again = {
        r.vec_id: tuple(r.embedding)
        for r in generate_embeddings(spark, 200, seed=42, partitions=1).collect()
    }
    assert all(tuple(r.embedding) == again[r.vec_id] for r in rows)
    # within-label cosines dominate between-label ones
    embs = {r.vec_id: np.array(r.embedding) for r in rows}
    labs = {r.vec_id: r.label for r in rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    within = [
        cos(embs[i], embs[j])
        for i in range(40)
        for j in range(i + 1, 40)
        if labs[i] == labs[j]
    ]
    between = [
        cos(embs[i], embs[j])
        for i in range(40)
        for j in range(i + 1, 40)
        if labs[i] != labs[j]
    ]
    assert np.mean(within) > np.mean(between) + 0.3
