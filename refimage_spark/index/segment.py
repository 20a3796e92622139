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
    """Accumulates (part, term, doc_id)-sorted raw token rows, then builds
    the whole segment in vectorized numpy passes at ``finish``.

    tf is run-length over the sorted stream; doc norms (dl, lang) are
    supplied once via ``set_norms`` from the docs table (they never travel
    with the posting shuffle). The per-term work is O(1) python (byte-blit
    of precomputed slices) — a naive term-at-a-time flush costs ~30us of
    Python per term and at 10k-term vocabularies dominates the whole
    build (measured ~3x slower).

    Memory: the partition's raw (term, doc_id) arrays — by construction
    corpus/P sized; P is the build's memory knob. (A streaming flush per
    sorted term-run would bound it further; not needed at sandbox scale.)
    """

    def __init__(self, index_dir: str, pid: int, avgdl: float):
        self.index_dir = index_dir
        self.pid = pid
        self.avgdl = float(avgdl)
        self._norm_ids: np.ndarray | None = None
        self._norm_dls: np.ndarray | None = None
        self._norm_langs: list[str] | None = None
        self._terms: list[np.ndarray] = []
        self._docs: list[np.ndarray] = []
        self.n_postings = 0
        self.dict_table: pa.Table | None = None

    def set_norms(
        self, doc_ids: np.ndarray, dls: np.ndarray, langs: list[str]
    ) -> None:
        """Doc norms for this partition, sorted by doc_id."""
        self._norm_ids = np.asarray(doc_ids, dtype=np.int64)
        self._norm_dls = np.asarray(dls, dtype=np.int64)
        self._norm_langs = langs

    def add_raw(self, terms, doc_ids: np.ndarray) -> None:
        """Raw (term, doc_id) rows, sorted; duplicates = tf counts.

        ``terms`` may be a pyarrow string Array (preferred — stays in
        Arrow, no per-row Python objects) or a numpy object array."""
        if len(terms):
            if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
                terms = pa.array(terms, pa.string())
            if isinstance(terms, pa.ChunkedArray):
                terms = terms.combine_chunks()
            self._terms.append(terms)
            self._docs.append(np.asarray(doc_ids, dtype=np.int64))

    # -- committing ----------------------------------------------------------

    def _build(self) -> tuple[bytes, pa.Table]:
        from refimage_spark.index.codec import varbyte_encode_with_lengths

        import pyarrow.compute as pc

        terms = (
            pa.concat_arrays(self._terms)
            if self._terms
            else pa.array([], pa.string())
        )
        docs = (
            np.concatenate(self._docs) if self._docs else np.empty(0, np.int64)
        )
        self._terms, self._docs = [], []
        n_rows = len(terms)
        if n_rows == 0:
            return b"", pa.table(
                {f.name: pa.array([], f.type) for f in DICT_SCHEMA}
            )
        assert docs.max() < (1 << 42), "doc_id exceeds 42-bit pair-key space"
        # term run boundaries via Arrow C++ string compare — no per-row
        # Python objects ever materialize (that conversion alone dominated
        # pass B at 10^8 postings)
        tchange = np.ones(n_rows, dtype=bool)
        if n_rows > 1:
            tchange[1:] = pc.not_equal(
                terms.slice(1), terms.slice(0, n_rows - 1)
            ).to_numpy(zero_copy_only=False)
        term_code = np.cumsum(tchange) - 1
        uniq_terms = terms.take(pa.array(np.flatnonzero(tchange)))
        # run-length tf over (term_code, doc) pairs
        key = (term_code.astype(np.int64) << 42) | docs
        kchange = np.empty(key.size, dtype=bool)
        kchange[0] = True
        kchange[1:] = key[1:] != key[:-1]
        pstart = np.flatnonzero(kchange)
        tfs = np.diff(np.append(pstart, key.size)).astype(np.int64)
        udocs = docs[pstart]
        utcode = term_code[pstart]
        self.n_postings = int(udocs.size)
        # per-term posting ranges in the unique-pair space
        tstart = np.flatnonzero(np.append(True, utcode[1:] != utcode[:-1]))
        tcount = np.diff(np.append(tstart, udocs.size)).astype(np.int64)
        n_terms = tstart.size
        # delta-encode doc ids with per-term reset
        gaps = np.empty_like(udocs)
        gaps[0] = udocs[0]
        np.subtract(udocs[1:], udocs[:-1], out=gaps[1:])
        gaps[tstart] = udocs[tstart]
        docs_blob, dlen = varbyte_encode_with_lengths(gaps)
        tfs_blob, tlen = varbyte_encode_with_lengths(tfs)
        dcum = np.concatenate(([0], np.cumsum(dlen)))
        tcum = np.concatenate(([0], np.cumsum(tlen)))
        tend = tstart + tcount
        len_docs = dcum[tend] - dcum[tstart]
        len_tfs = tcum[tend] - tcum[tstart]
        # block boundaries: per term, blocks of BLOCK postings
        nblk = (tcount + BLOCK - 1) // BLOCK
        blk_term = np.repeat(np.arange(n_terms), nblk)
        blk_idx = np.concatenate([np.arange(k) for k in nblk]) if n_terms else []
        blk_start = tstart[blk_term] + np.asarray(blk_idx) * BLOCK
        blk_end = np.minimum(blk_start + BLOCK, tend[blk_term])
        dls = self._norm_dls[np.searchsorted(self._norm_ids, udocs)]
        blk_last = udocs[blk_end - 1]
        blk_maxtf = np.maximum.reduceat(tfs, blk_start).astype(np.uint32)
        blk_mindl = np.minimum.reduceat(dls, blk_start).astype(np.uint32)
        # assemble: [docs region][tfs region][per-term block meta region]
        docs_region = np.frombuffer(docs_blob, dtype=np.uint8)
        tfs_region = np.frombuffer(tfs_blob, dtype=np.uint8)
        base_tfs = docs_region.size
        base_blk = base_tfs + tfs_region.size
        # per-term block meta is [last int64[nb] | max_tf u32[nb] | min_dl u32[nb]]
        blk_bytes_per_term = nblk * 16
        blk_off = base_blk + np.concatenate(
            ([0], np.cumsum(blk_bytes_per_term)[:-1])
        )
        blk_region = np.empty(int(blk_bytes_per_term.sum()), dtype=np.uint8)
        bstart = np.concatenate(([0], np.cumsum(nblk)[:-1]))
        pos = 0
        for t in range(n_terms):  # O(1) byte-blit per term
            nb = int(nblk[t])
            s = int(bstart[t])
            blk_region[pos : pos + nb * 8] = np.frombuffer(
                blk_last[s : s + nb].tobytes(), dtype=np.uint8
            )
            pos += nb * 8
            blk_region[pos : pos + nb * 4] = np.frombuffer(
                blk_maxtf[s : s + nb].tobytes(), dtype=np.uint8
            )
            pos += nb * 4
            blk_region[pos : pos + nb * 4] = np.frombuffer(
                blk_mindl[s : s + nb].tobytes(), dtype=np.uint8
            )
            pos += nb * 4
        blob = b"".join(
            [docs_region.tobytes(), tfs_region.tobytes(), blk_region.tobytes()]
        )
        dict_table = pa.table(
            {
                "term": uniq_terms,
                "df": pa.array(tcount, pa.int64()),
                "n": pa.array(tcount, pa.int64()),
                "off_docs": pa.array(dcum[tstart], pa.int64()),
                "len_docs": pa.array(len_docs, pa.int64()),
                "off_tfs": pa.array(base_tfs + tcum[tstart], pa.int64()),
                "len_tfs": pa.array(len_tfs, pa.int64()),
                "off_bmax": pa.array(blk_off, pa.int64()),
                "n_blocks": pa.array(nblk, pa.int64()),
            }
        )
        return blob, dict_table

    def finish(self) -> SegmentStats:
        blob, dict_table = self._build()
        self.dict_table = dict_table
        post_path, dict_path, docs_path = seg_paths(self.index_dir, self.pid)
        os.makedirs(os.path.dirname(post_path), exist_ok=True)
        with open(post_path + ".tmp", "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(post_path + ".tmp", post_path)
        pq.write_table(dict_table, dict_path, compression="zstd")
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
            n_terms=dict_table.num_rows,
            post_bytes=len(blob),
            checksum=hashlib.sha256(blob).hexdigest(),
        )


# ---- reader ------------------------------------------------------------------


class SegmentReader:
    # pin the whole term dictionary in memory while it's serving-sized;
    # beyond this, per-query filtered reads (row-group pruned on the
    # sorted term column) keep memory bounded
    DICT_PIN_LIMIT = 500_000

    def __init__(self, index_dir: str, pid: int):
        self.post_path, self.dict_path, self.docs_path = seg_paths(index_dir, pid)
        self._norms: tuple[np.ndarray, np.ndarray, list[str]] | None = None
        self._dict: dict[str, dict] | None = None

    def lookup_terms(self, terms: list[str]) -> dict[str, dict]:
        if not terms:  # e.g. no query term exists in the corpus vocabulary
            return {}
        if self._dict is None:
            full = pq.read_table(self.dict_path)
            if full.num_rows <= self.DICT_PIN_LIMIT:
                self._dict = {r["term"]: r for r in full.to_pylist()}
            else:
                self._dict = {}  # sentinel: too big, use filtered reads
        if self._dict:
            return {t: self._dict[t] for t in terms if t in self._dict}
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
