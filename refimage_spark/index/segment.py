"""Segment file format: self-contained per-partition inverted index.

Files per segment (under ``{index_dir}/segments/``):
- ``seg-{pid:05d}.post``         binary: per-term [docs_blob | tfs_blob |
                                 block_last_doc int64[] | block_max_tf u32[] |
                                 block_min_dl u32[]]
- ``seg-{pid:05d}.dict.parquet`` term dictionary, sorted by term:
                                 (term, df, n, off_docs, len_docs, off_tfs,
                                  len_tfs, off_bmax, n_blocks)
- ``seg-{pid:05d}.docs.parquet`` doc norms: (doc_id, dl, lang), sorted by
                                 doc_id (scoring looks dl up by searchsorted)

Block-max metadata (BLOCK=128 postings): per block the last doc id (skip
pointer) plus (max_tf, min_dl). The score-factor upper bound
q(max_tf, min_dl) = max_tf/(max_tf + k1*(1-b+b*min_dl/avgdl)) is computed
at QUERY time with the CURRENT global avgdl — q is monotone increasing in
tf and decreasing in dl, so the bound stays valid even after appends or
compactions shift corpus stats (a stored max_q would silently go stale
and break WAND's rank safety). It also makes segment bytes a pure
function of the corpus partition — stats drift never changes checksums.

The reference persisted its whole index as one monolithic binary+pickle
(/root/reference/src/refimage/search/__init__.py:322-396); segments give
partial load (only query terms' ranges are read), per-partition commit
(resume), and bounded merge units instead.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from refimage_spark.index.codec import (
    decode_postings,
    encode_postings,
    varbyte_decode,
)
from refimage_spark.tokenizer import BM25_B, BM25_K1

BLOCK = 128

DICT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("n", pa.int64()),
        ("off_docs", pa.int64()),
        ("len_docs", pa.int64()),
        ("off_tfs", pa.int64()),
        ("len_tfs", pa.int64()),
        ("off_bmax", pa.int64()),
        ("n_blocks", pa.int64()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("dl", pa.int32()), ("lang", pa.string())]
)


def seg_paths(index_dir: str, pid: int) -> tuple[str, str, str]:
    base = os.path.join(index_dir, "segments", f"seg-{pid:05d}")
    return base + ".post", base + ".dict.parquet", base + ".docs.parquet"


@dataclass
class SegmentStats:
    pid: int
    n_docs: int
    n_postings: int
    n_terms: int
    post_bytes: int
    checksum: str


class SegmentWriter:
    """Streams (part, term, doc_id)-sorted raw token rows into one segment.

    tf is computed by run-length over the sorted (term, doc_id) stream;
    doc norms (dl, lang) are supplied once via ``set_norms`` from the docs
    table (they never travel with the posting shuffle). Memory: O(current
    term's postings + this partition's norm arrays) — posting blobs are
    appended to the .post buffer as soon as a term run completes.
    """

    def __init__(self, index_dir: str, pid: int, avgdl: float):
        self.index_dir = index_dir
        self.pid = pid
        self.avgdl = float(avgdl)
        self.post = io.BytesIO()
        self.dict_rows: list[tuple] = []
        self._norm_ids: np.ndarray | None = None
        self._norm_dls: np.ndarray | None = None
        self._norm_langs: list[str] | None = None
        self._cur_term: str | None = None
        self._docs: list[np.ndarray] = []
        self.n_postings = 0

    def set_norms(
        self, doc_ids: np.ndarray, dls: np.ndarray, langs: list[str]
    ) -> None:
        """Doc norms for this partition, sorted by doc_id."""
        self._norm_ids = np.asarray(doc_ids, dtype=np.int64)
        self._norm_dls = np.asarray(dls, dtype=np.int64)
        self._norm_langs = langs

    # -- feeding -------------------------------------------------------------

    def add_raw(self, terms: np.ndarray, doc_ids: np.ndarray) -> None:
        """Raw (term, doc_id) rows, sorted; duplicates = tf counts."""
        if terms.size == 0:
            return
        change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        bounds = np.concatenate(([0], change, [terms.size]))
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            t = terms[lo]
            if self._cur_term is not None and t != self._cur_term:
                self._flush_term()
            self._cur_term = t
            self._docs.append(doc_ids[lo:hi])

    def _flush_term(self) -> None:
        term = self._cur_term
        raw = np.concatenate(self._docs)
        self._docs = []
        docs, tfs = np.unique(raw, return_counts=True)
        dls = self._norm_dls[np.searchsorted(self._norm_ids, docs)]
        n = docs.size
        docs_blob, tfs_blob = encode_postings(docs, tfs)
        # block-max metadata: stats-independent (see module docstring)
        n_blocks = (n + BLOCK - 1) // BLOCK
        last_doc = np.empty(n_blocks, dtype=np.int64)
        max_tf = np.empty(n_blocks, dtype=np.uint32)
        min_dl = np.empty(n_blocks, dtype=np.uint32)
        for b in range(n_blocks):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, n)
            last_doc[b] = docs[hi - 1]
            max_tf[b] = tfs[lo:hi].max()
            min_dl[b] = dls[lo:hi].min()
        off_docs = self.post.tell()
        self.post.write(docs_blob)
        off_tfs = self.post.tell()
        self.post.write(tfs_blob)
        off_bmax = self.post.tell()
        self.post.write(last_doc.tobytes())
        self.post.write(max_tf.tobytes())
        self.post.write(min_dl.tobytes())
        self.dict_rows.append(
            (
                term,
                n,  # df within this segment == n (one posting per doc)
                n,
                off_docs,
                len(docs_blob),
                off_tfs,
                len(tfs_blob),
                off_bmax,
                n_blocks,
            )
        )
        self.n_postings += n

    # -- committing ----------------------------------------------------------

    def finish(self) -> SegmentStats:
        if self._cur_term is not None:
            self._flush_term()
        post_path, dict_path, docs_path = seg_paths(self.index_dir, self.pid)
        os.makedirs(os.path.dirname(post_path), exist_ok=True)
        blob = self.post.getvalue()
        with open(post_path + ".tmp", "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(post_path + ".tmp", post_path)
        cols = list(zip(*self.dict_rows)) if self.dict_rows else [[]] * 9
        table = pa.table(
            {f.name: pa.array(cols[i], f.type) for i, f in enumerate(DICT_SCHEMA)}
        )
        pq.write_table(table, dict_path, compression="zstd")
        pq.write_table(
            pa.table(
                {
                    "doc_id": self._norm_ids,
                    "dl": self._norm_dls.astype(np.int32),
                    "lang": pa.array(self._norm_langs, pa.string()),
                }
            ),
            docs_path,
            compression="zstd",
        )
        return SegmentStats(
            pid=self.pid,
            n_docs=int(self._norm_ids.size),
            n_postings=int(self.n_postings),
            n_terms=len(self.dict_rows),
            post_bytes=len(blob),
            checksum=hashlib.sha256(blob).hexdigest(),
        )


# ---- reader ------------------------------------------------------------------


class SegmentReader:
    def __init__(self, index_dir: str, pid: int):
        self.post_path, self.dict_path, self.docs_path = seg_paths(index_dir, pid)
        self._norms: tuple[np.ndarray, np.ndarray, list[str]] | None = None

    def lookup_terms(self, terms: list[str]) -> dict[str, dict]:
        if not terms:  # e.g. no query term exists in the corpus vocabulary
            return {}
        t = pq.read_table(
            self.dict_path, filters=pc.field("term").isin(terms)
        )
        out = {}
        for row in t.to_pylist():
            out[row["term"]] = row
        return out

    def read_postings(self, entry: dict) -> tuple[np.ndarray, np.ndarray]:
        with open(self.post_path, "rb") as f:
            f.seek(entry["off_docs"])
            docs_blob = f.read(entry["len_docs"])
            f.seek(entry["off_tfs"])
            tfs_blob = f.read(entry["len_tfs"])
        return decode_postings(docs_blob, tfs_blob, entry["n"])

    def read_blockmax(
        self, entry: dict
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        nb = entry["n_blocks"]
        with open(self.post_path, "rb") as f:
            f.seek(entry["off_bmax"])
            raw = f.read(nb * 16)
        last_doc = np.frombuffer(raw[: nb * 8], dtype=np.int64)
        max_tf = np.frombuffer(raw[nb * 8 : nb * 12], dtype=np.uint32)
        min_dl = np.frombuffer(raw[nb * 12 :], dtype=np.uint32)
        return last_doc, max_tf, min_dl

    def read_block_postings(
        self, entry: dict, blocks: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the given block indices (needs full docs blob for
        gap reconstruction of arbitrary blocks, so used when blocks are a
        prefix or pruning is dense; falls back to full decode)."""
        return self.read_postings(entry)

    def norms(self) -> tuple[np.ndarray, np.ndarray, list[str]]:
        if self._norms is None:
            t = pq.read_table(self.docs_path)
            self._norms = (
                t["doc_id"].to_numpy(),
                t["dl"].to_numpy(),
                t["lang"].to_pylist(),
            )
        return self._norms

    def dl_for(self, doc_ids: np.ndarray) -> np.ndarray:
        ids, dls, _ = self.norms()
        pos = np.searchsorted(ids, doc_ids)
        return dls[pos]


# ---- manifest ------------------------------------------------------------------


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def write_manifest_row(index_dir: str, stats: SegmentStats, extra: dict) -> None:
    """The COMMIT POINT for a partition: segment files are fsynced first,
    then this row appears via atomic rename. A crash before this leaves a
    re-runnable partition; after, a skippable one."""
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = os.path.join(manifest_dir(index_dir), f"part-{stats.pid:05d}.json")
    row = {
        "segment_id": f"seg-{stats.pid:05d}",
        "partition_id": stats.pid,
        "n_docs": stats.n_docs,
        "n_postings": stats.n_postings,
        "n_terms": stats.n_terms,
        "bytes": stats.post_bytes,
        "checksum": stats.checksum,
        **extra,
    }
    with open(path + ".tmp", "w") as f:
        json.dump(row, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(path + ".tmp", path)


def read_manifest(index_dir: str) -> list[dict]:
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return []
    rows = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rows.append(json.load(f))
    return rows


def committed_pids(index_dir: str) -> set[int]:
    return {r["partition_id"] for r in read_manifest(index_dir)}
