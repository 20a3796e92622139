"""Multimodal (image/audio/video) column plumbing.

The reference's media path is image bytes -> PIL validate -> CLIP encode
(src/refimage/storage.py:190-202, src/refimage/models/clip_model.py:96-142).
This container has no image/audio codecs, so the DECODE step is stubbed
behind a deterministic fake (or NotImplementedError for real codecs) —
but the Spark-side plumbing is real and tested:

- media lives as an opaque ``binary`` column + typed metadata struct;
- decode/feature-extract runs in ``mapInPandas`` (Arrow batches, the
  shape a real torchvision/librosa kernel would use — swap
  `_fake_decode` for the real library call and nothing else changes);
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  so executor memory is bounded regardless of media size;
- at 100 TB: the media table is bucketed by content hash so repeated
  assets co-locate, and the feature extractor is a map-only stage that
  pipelines with the scan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 64

FEATURE_VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("feature_digest", T.StringType()),
        T.StructField("feature_norm", T.DoubleType()),
    ]
)


def _fake_decode(raw: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode + model encode: a seeded
    pseudo-embedding derived from the content hash. Replace with e.g.
    PIL.Image.open + model.encode in a real deployment — the Spark
    plumbing (schema, batching, partitioning) is identical."""
    digest = hashlib.sha256(raw).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    v = rng.standard_normal(FEATURE_DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_feature_vectors(media: DataFrame, binary_col: str = "html") -> DataFrame:
    """doc_id + content md5 + unit-norm feature vector, Arrow-batched —
    the pipeline-facing form (feeds similarity/dedup operators)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                _fake_decode(bytes(raw)).tolist() for raw in b[binary_col]
            ]
            md5s = [hashlib.md5(bytes(raw)).hexdigest() for raw in b[binary_col]]
            yield pd.DataFrame(
                {"doc_id": b["doc_id"], "content_md5": md5s, "feature": feats}
            )

    return media.select("doc_id", binary_col).mapInPandas(
        run, schema=FEATURE_VECTORS_SCHEMA
    )


def extract_features(media: DataFrame, binary_col: str = "html") -> DataFrame:
    """Checkable summary form: every column hashable/deterministic.

    - content_md5: md5 of the raw bytes (oracle-checkable: DuckDB
      md5(text) over the same content);
    - feature_digest: md5 of the 6-decimal-rounded vector repr —
      pins the decode stub's output bit-stably across runs/partitions;
    - feature_norm: ||v|| rounded to 4 — the unit-norm invariant of the
      encoder (oracle asserts 1.0).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            md5s, fdig, fnorm = [], [], []
            for raw in b[binary_col]:
                raw = bytes(raw)
                v = _fake_decode(raw)
                md5s.append(hashlib.md5(raw).hexdigest())
                fdig.append(
                    hashlib.md5(
                        ",".join(f"{x:.6f}" for x in v).encode()
                    ).hexdigest()
                )
                fnorm.append(round(float(np.linalg.norm(v.astype(np.float64))), 4))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "content_md5": md5s,
                    "feature_digest": fdig,
                    "feature_norm": fnorm,
                }
            )

    return media.select("doc_id", binary_col).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def media_metadata(media: DataFrame, binary_col: str = "html") -> DataFrame:
    """Typed metadata over the opaque binary column — JVM-side only."""
    return media.select(
        "doc_id",
        F.struct(
            F.lit("text/html").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
