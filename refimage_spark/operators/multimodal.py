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


def sniff_media(raw: bytes) -> tuple[str, int | None, int | None]:
    """(mime, width, height) from magic bytes + container headers — REAL
    detection in pure Python, no codec libraries (the reference's
    PIL-based probe is src/refimage/storage.py:190-202; dimensions come
    from the format headers, which never require a full decode):

    - PNG:  IHDR width/height at fixed offsets 16..24
    - GIF:  logical screen descriptor at 6..10 (little-endian u16)
    - JPEG: first SOFn marker's (height, width) big-endian u16s
    - WEBP: RIFF....WEBP (VP8x variants; dims omitted — fine-grained
      per-variant parsing isn't needed for routing)
    - PDF / HTML / plain text fallbacks
    """
    if raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 24:
        w = int.from_bytes(raw[16:20], "big")
        h = int.from_bytes(raw[20:24], "big")
        return "image/png", w, h
    if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
        w = int.from_bytes(raw[6:8], "little")
        h = int.from_bytes(raw[8:10], "little")
        return "image/gif", w, h
    if raw[:2] == b"\xff\xd8":
        # walk JPEG segments to the first frame header (SOF0..SOF15,
        # excluding DHT/DAC which share the range). Legal streams may pad
        # with extra 0xFF fill bytes between segments, and TEM/RSTn
        # markers are standalone (no length field) — both must be stepped
        # over, never length-parsed (a garbage seg_len derails the walk).
        i = 2
        n = len(raw)
        while i + 1 < n and raw[i] == 0xFF:
            while i + 1 < n and raw[i + 1] == 0xFF:  # fill bytes
                i += 1
            if i + 1 >= n:
                break
            marker = raw[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
                i += 2
                continue
            if marker == 0xD9:  # EOI with no SOF seen
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 >= n:
                    break
                h = int.from_bytes(raw[i + 5 : i + 7], "big")
                w = int.from_bytes(raw[i + 7 : i + 9], "big")
                return "image/jpeg", w, h
            if i + 3 >= n:
                break
            seg_len = int.from_bytes(raw[i + 2 : i + 4], "big")
            i += 2 + max(seg_len, 2)
        return "image/jpeg", None, None
    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
        return "image/webp", None, None
    if raw[:5] == b"%PDF-":
        return "application/pdf", None, None
    head = raw[:256].lstrip().lower()
    if head.startswith((b"<!doctype html", b"<html")) or b"<html" in head:
        return "text/html", None, None
    return "application/octet-stream", None, None


def media_metadata(media: DataFrame, binary_col: str = "html") -> DataFrame:
    """Typed metadata over the opaque binary column. MIME + dimensions
    come from a REAL header sniffer (magic bytes, no codec libraries) in
    one Arrow-batched pass; byte length stays a JVM expression joined in
    for free (same scan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mimes, ws, hs, nb = [], [], [], []
            for raw in b[binary_col]:
                raw = bytes(raw)
                m, w, h = sniff_media(raw)
                mimes.append(m)
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": pd.array(nb, dtype="Int64"),
                }
            )

    flat = media.select("doc_id", binary_col).mapInPandas(
        run,
        schema="doc_id long, mime string, width int, height int, n_bytes long",
    )
    return flat.select(
        "doc_id",
        F.struct("mime", "width", "height", "n_bytes").alias("meta"),
    )
