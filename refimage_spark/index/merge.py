"""Log-structured maintenance: incremental append, tombstone delete,
segment merge/compaction.

The reference handles deletes by REBUILDING the whole index
(/root/reference/src/refimage/search/__init__.py:268-320, O(N) per
delete) and growth by in-memory append with a monolithic save. Here:

- ``append_pages``  : new docs become NEW segments (ids continue after
  the current max); global stats/df are updated — O(new docs), the
  existing segments are untouched (log-structured append).
- ``delete_docs``   : tombstone rows only; queries mask them (O(1)).
- ``compact``       : physically drops tombstoned docs and merges each
  segment in place, distributed one task per segment; the manifest is
  swapped atomically at the end. Posting arrays of disjoint doc sets
  merge by sorted interleave — exactness is preserved because scores
  depend only on (tf, dl, global stats).

Scale note: compaction at 10^12 docs runs as a Spark job with one task
per segment (embarrassingly parallel — doc-partitioned segments never
interact); BM25 global stats (N, avgdl, df) are recomputed from the
docs table in one agg pass.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from refimage_spark.index.build import STATS_FILE, build_index, prepare_docs
from refimage_spark.index.segment import (
    SegmentReader,
    SegmentWriter,
    read_manifest,
    seg_paths,
    write_manifest_row,
)
from refimage_spark.tokenizer import spark_tokens

TOMBSTONES = "tombstones.parquet"


def delete_docs(index_dir: str, doc_ids: list[int]) -> None:
    """Tombstone-only delete; takes effect at query time immediately."""
    path = os.path.join(index_dir, TOMBSTONES)
    old = (
        pq.read_table(path)["doc_id"].to_numpy()
        if os.path.exists(path)
        else np.empty(0, np.int64)
    )
    merged = np.unique(np.concatenate([old, np.asarray(doc_ids, np.int64)]))
    pq.write_table(pa.table({"doc_id": merged}), path + ".tmp")
    os.replace(path + ".tmp", path)


def _recompute_global_stats(spark: SparkSession, index_dir: str) -> None:
    """N/avgdl from the docs table; df by re-aggregating segment dicts.
    Must run AFTER segments reflect the new corpus."""
    from refimage_spark.index.build import write_term_stats

    docs = spark.read.parquet(os.path.join(index_dir, "docs.parquet"))
    st = docs.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).head()
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    stats.update({"n_docs": st["n"], "avgdl": float(st["avgdl"])})
    tmp = os.path.join(index_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, STATS_FILE))
    write_term_stats(spark, index_dir)


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Drop tombstoned docs physically; rewrite segments + stats.

    NOTE: removing docs changes N/avgdl/df, hence every BM25 score —
    that's inherent to the scoring model, exactly as the reference's
    delete-rebuild changes its index (SURVEY.md §2.3 K4).
    """
    tomb_path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(tomb_path):
        return {"compacted": 0}
    tomb = pq.read_table(tomb_path)["doc_id"].to_numpy()
    if tomb.size == 0:
        os.remove(tomb_path)
        return {"compacted": 0}

    # 1. shrink the docs table (source of truth for stats)
    docs_path = os.path.join(index_dir, "docs.parquet")
    docs = spark.read.parquet(docs_path)
    kept = docs.where(~F.col("doc_id").isin([int(x) for x in tomb]))
    tmp_docs = docs_path + ".compact"
    kept.write.mode("overwrite").partitionBy("part").parquet(tmp_docs)
    shutil.rmtree(docs_path)
    os.replace(tmp_docs, docs_path)
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    avgdl = stats["avgdl"]  # manifest lineage only; refreshed below

    # 2. rewrite each segment without the tombstoned docs (1 task/segment)
    manifest = read_manifest(index_dir)
    pids = [r["partition_id"] for r in manifest]
    idx = index_dir
    tomb_b = tomb

    def rewrite(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            for pid in rb.column("pid").to_pylist():
                reader = SegmentReader(idx, int(pid))
                dict_all = pq.read_table(reader.dict_path).to_pylist()
                ids, dls, langs = reader.norms()
                keep_mask = ~np.isin(ids, tomb_b)
                writer = SegmentWriter(idx + "/compact_tmp", int(pid), avgdl)
                writer.set_norms(
                    ids[keep_mask],
                    dls[keep_mask],
                    [l for l, m in zip(langs, keep_mask) if m],
                )
                for entry in dict_all:  # dict is term-sorted
                    docs_a, tfs_a = reader.read_postings(entry)
                    m = ~np.isin(docs_a, tomb_b)
                    if not m.any():
                        continue
                    d, t = docs_a[m], tfs_a[m]
                    raw = np.repeat(d, t)  # writer recounts tf from runs
                    writer.add_raw(
                        np.full(raw.size, entry["term"], dtype=object), raw
                    )
                st = writer.finish()
                write_manifest_row(idx + "/compact_tmp", st, {"avgdl": avgdl})
                yield pa.record_batch(
                    [pa.array([int(pid)], pa.int32())], names=["pid"]
                )

    os.makedirs(os.path.join(index_dir, "compact_tmp"), exist_ok=True)
    pid_df = spark.createDataFrame([(p,) for p in pids], "pid int").repartition(
        min(len(pids), 64)
    )
    done = pid_df.mapInArrow(rewrite, schema="pid int").collect()
    assert len(done) == len(pids)

    # 3. atomic swap: segments + manifest
    for sub in ("segments", "manifest"):
        old = os.path.join(index_dir, sub)
        new = os.path.join(index_dir, "compact_tmp", sub)
        shutil.rmtree(old)
        os.replace(new, old)
    shutil.rmtree(os.path.join(index_dir, "compact_tmp"))
    os.remove(tomb_path)
    _recompute_global_stats(spark, index_dir)  # AFTER segments reflect removal
    return {"compacted": int(tomb.size), "segments": len(pids)}


def merge_segments(
    index_dir: str, pids: list[int], new_pid: int | None = None
) -> dict:
    """Log-structured merge: combine several (small) segments into one.

    Doc sets are disjoint, so per-term posting lists merge by doc-id
    sort; global stats/df are unchanged — queries return identical
    results before and after (asserted in tests). Maintenance-window
    operation (single writer): new segment files are written first, the
    manifest rows swap last.

    At 10^12 docs this runs as one task per OUTPUT segment (each input
    term dictionary is term-sorted, so a real implementation streams a
    k-way heap merge; here the per-term python loop is fine at segment
    sizes the sandbox produces).
    """
    import glob as _glob

    assert len(pids) >= 2
    manifest = {r["partition_id"]: r for r in read_manifest(index_dir)}
    for p in pids:
        assert p in manifest, f"segment {p} not in manifest"
    if new_pid is None:
        new_pid = max(manifest) + 1
    readers = [SegmentReader(index_dir, p) for p in pids]
    dicts = [
        {r["term"]: r for r in pq.read_table(rd.dict_path).to_pylist()}
        for rd in readers
    ]
    writer = SegmentWriter(index_dir, new_pid, 0.0)
    # merged norms (doc-id sorted; ids are disjoint across segments)
    nid, ndl, nlang = [], [], []
    for rd in readers:
        ids, dls, langs = rd.norms()
        nid.append(ids)
        ndl.append(dls)
        nlang.extend(langs)
    nid_all = np.concatenate(nid)
    order = np.argsort(nid_all)
    writer.set_norms(
        nid_all[order],
        np.concatenate(ndl)[order],
        [nlang[i] for i in order],
    )
    # k-way term merge: union of term-sorted dictionaries
    all_terms = sorted(set().union(*[d.keys() for d in dicts]))
    for term in all_terms:
        docs_l, tfs_l = [], []
        for rd, d in zip(readers, dicts):
            if term in d:
                dd, tt = rd.read_postings(d[term])
                docs_l.append(dd)
                tfs_l.append(tt)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        o = np.argsort(docs)
        raw = np.repeat(docs[o], tfs[o])  # writer recounts tf from runs
        writer.add_raw(
            pa.array(np.full(raw.size, term, dtype=object), pa.string()), raw
        )
    st = writer.finish()
    write_manifest_row(index_dir, st, {"merged_from": pids})
    # swap: drop the old manifest rows, then the old files
    for p in pids:
        os.remove(os.path.join(index_dir, "manifest", f"part-{p:05d}.json"))
        for f in _glob.glob(os.path.join(index_dir, "segments", f"seg-{p:05d}.*")):
            os.remove(f)
    return {
        "merged": pids,
        "new_pid": new_pid,
        "n_docs": st.n_docs,
        "n_postings": st.n_postings,
    }


def append_pages(
    spark: SparkSession, new_pages: DataFrame, index_dir: str
) -> dict:
    """Log-structured append: index new pages as ADDITIONAL segments.

    New doc ids continue after the current corpus; new partition ids
    continue after the current max pid, so existing segments and
    manifest rows are untouched. Global stats/df are refreshed (BM25
    scores legitimately shift — same semantics as reference add).
    """
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    num_parts = stats["num_parts"]
    docs_path = os.path.join(index_dir, "docs.parquet")
    old_docs = spark.read.parquet(docs_path)
    base_id = old_docs.agg(F.max("doc_id")).head()[0] + 1
    base_pid = max(r["partition_id"] for r in read_manifest(index_dir)) + 1

    # drop urls we already have (recrawl -> keep existing, matching S10)
    fresh = new_pages.join(
        old_docs.select("url"), "url", "left_anti"
    )
    new_docs = prepare_docs(fresh, num_parts, content_dedup=True).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(int(base_id))).cast("long")
    ).withColumn("part", (F.col("part") + F.lit(int(base_pid))).cast("int"))
    new_docs.write.mode("append").partitionBy("part").parquet(docs_path)

    # build segments for the new parts only (same writer machinery),
    # THEN refresh global stats from the updated dictionaries
    from refimage_spark.index.build import _write_segments_for

    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    n_new = _write_segments_for(
        spark, index_dir, stats["avgdl"], part_filter=lambda p: p >= base_pid
    )
    _recompute_global_stats(spark, index_dir)
    return {"appended_docs": int(new_docs.count()), "new_segments": n_new}
