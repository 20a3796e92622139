"""Deterministic synthetic `documents` / `embeddings` tables at any scale.

The driver ships fixed testdata up to sf0.1 (documents 5,000 rows,
embeddings 2,000 rows). Scale evidence beyond that (the sf1.0 bench
point) needs the SAME table shapes at 10x — these generators synthesize
them deterministically (pure function of seed + row id, no external
data), schema-identical to /root/testdata/sf*/:

    documents : doc_id:long, text:string, lang:string, source:string,
                n_chars:long
    embeddings: vec_id:long, embedding:array<float>, label:int

Documents reuse the pages corpus generator (sources/pages.py) so the
text distribution — vocabulary, Zipf-ish draws, ~1% exact duplicates —
matches the index-build input; embeddings are label-clustered gaussians
(center per label + per-row noise), which gives the dedup/ANN ops the
same "near-dups share a label" structure the testdata has.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from refimage_spark.sources.pages import _EPOCH_S, generate_pages


def generate_documents(
    spark: SparkSession, n_docs: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """documents-table twin of the pages corpus: doc_id is the generator
    row index (recovered from the deterministic warc_ts), so ids are
    unique even across the corpus's intentional recrawl/content dups."""
    pages = generate_pages(spark, n_docs, seed=seed, partitions=partitions)
    doc_id = (
        (F.col("warc_ts").cast("long") - F.lit(_EPOCH_S)) / 17
    ).cast("long")
    return pages.select(
        doc_id.alias("doc_id"),
        "text",
        "lang",
        F.concat(F.lit("src"), (doc_id % 7).cast("string")).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def generate_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_labels: int = 10,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Label-clustered float32 embeddings, one Philox stream per row
    (counter-based: any row is reproducible in isolation, at any
    parallelism). emb = center(label) + 0.7 * noise, so within-label
    cosines cluster well above between-label ones — the structure the
    embedding near-dup and ANN ops exercise."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        centers = np.stack(
            [
                np.random.Generator(
                    np.random.Philox(key=[seed + 1_000_003, lab])
                ).normal(size=dim)
                for lab in range(n_labels)
            ]
        )
        for rb in batches:
            ids = rb.column("id").to_numpy()
            labels = (ids % n_labels).astype(np.int32)
            emb = np.empty((ids.size, dim), np.float32)
            for j, i in enumerate(ids):
                rng = np.random.Generator(np.random.Philox(key=[seed, int(i)]))
                emb[j] = centers[labels[j]] + 0.7 * rng.normal(size=dim)
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(emb.ravel(), pa.float32()), dim
                    ).cast(pa.list_(pa.float32())),
                    pa.array(labels, pa.int32()),
                ],
                names=["vec_id", "embedding", "label"],
            )

    rng_df = spark.range(0, n_vecs, numPartitions=partitions)
    return rng_df.mapInArrow(
        gen, schema="vec_id long, embedding array<float>, label int"
    )
