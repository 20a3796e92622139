"""Distributed, resumable inverted-index build.

Pipeline (rebuild of the reference's batch index build,
/root/reference/src/refimage/search/__init__.py:147-200, re-architected
for Spark):

  pass A (docs):   pages -> url-dedup (keep latest recrawl) -> optional
                   content-hash dedup -> deterministic dense doc_id ->
                   docs.parquet (partitioned by part) + stats.json +
                   term_stats.parquet (global df for idf)
  pass B (index):  docs -> tokenize -> explode -> ONE wide shuffle
                   (repartition by part) -> sortWithinPartitions(part,
                   term, doc_id) -> mapInArrow segment writer ->
                   manifest row per partition (the commit point)

Design notes for 100 TB:
- doc ids are deterministic WITHOUT a global window: part =
  pmod(xxhash64(url), P); per-part counts give offsets; row_number
  within part (per-part sort only). Reproducible at any parallelism.
- document-partitioned segments: every part holds its doc range's
  postings for ALL terms, so Zipf head terms are split across all P
  segments structurally — no hot shuffle key, no custom salting needed
  (the skew knob is P itself). Compare SURVEY.md §7.4(2).
- ONE shuffle moves token rows (part, term, doc_id); doc norms ship via
  the (tiny) docs table instead of being duplicated per posting.
- resume: partitions whose manifest row exists are skipped entirely —
  re-running the same build command after a crash completes the index
  (idempotent: segment content is a pure function of (corpus, P)).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from refimage_spark.index.segment import (
    SegmentWriter,
    committed_pids,
    read_manifest,
    write_manifest_row,
)
from refimage_spark.tokenizer import spark_tokens

STATS_FILE = "stats.json"


def _docs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "docs.parquet")


def _term_stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats.parquet")


def _part_col(num_parts: int):
    return F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")


def _part_profile(slim: DataFrame, num_parts: int) -> tuple[dict, int, float]:
    """One aggregation pass over the deduped table: per-part row counts
    (for dense id offsets) AND the global corpus stats (N, avgdl) —
    folding the stats into the counts job saves a full extra pass."""
    rows = (
        slim.groupBy(_part_col(num_parts).alias("part"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.size(spark_tokens("text"))).alias("dl_sum"),
        )
        .collect()
    )
    counts = {r["part"]: r["cnt"] for r in rows}
    n = sum(counts.values())
    avgdl = sum(r["dl_sum"] for r in rows) / n if n else 0.0
    return counts, n, float(avgdl)


def _with_doc_ids(
    with_part: DataFrame, counts: dict, num_parts: int
) -> DataFrame:
    offsets, acc = {}, 0
    for p in range(num_parts):
        offsets[p] = acc
        acc += counts.get(p, 0)
    off_map = F.create_map(
        *[x for p in range(num_parts) for x in (F.lit(p), F.lit(offsets[p]))]
    )
    w = Window.partitionBy("part").orderBy("url")
    return with_part.withColumn(
        "doc_id",
        (off_map[F.col("part")] + F.row_number().over(w) - 1).cast("long"),
    )


def assign_doc_ids(pages: DataFrame, num_parts: int) -> DataFrame:
    """Deterministic dense doc_id (SURVEY.md §2.7 F7) scalable to 10^12
    rows: hash-part by url, sort within part, add per-part offsets."""
    with_part = pages.withColumn("part", _part_col(num_parts))
    counts = dict(
        (r["part"], r["cnt"])
        for r in with_part.groupBy("part").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    return _with_doc_ids(with_part, counts, num_parts)


def _tags_col(tag_cols: tuple[str, ...]):
    """The doc's tag set = its tag-column values (raw; matching lowers),
    mirroring the DataFrame compiler's tags := {lang, source, ...}."""
    return F.array(*[F.col(c) for c in tag_cols])


def _dedup_slim(
    pages: DataFrame,
    content_dedup: bool = True,
    tag_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """url-dedup (keep latest warc_ts — recrawl wins, matching the
    reference's UNIQUE-hash ingest semantics src/refimage/storage.py:278-281)
    + optional content-hash dedup (keep smallest url).

    html is reduced to its sha2 in the very first projection: the raw
    bytes are ~10x the text and pass A shuffles the corpus three times
    (url-dedup, hash-dedup, id-assignment) — none of them needs the body."""
    slim = pages.select(
        "url",
        "warc_ts",
        *tag_cols,
        "text",
        F.sha2("html", 256).alias("content_hash"),
    )
    w_url = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    deduped = (
        slim.withColumn("_rn", F.row_number().over(w_url))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if content_dedup:
        w_hash = Window.partitionBy("content_hash").orderBy("url")
        deduped = (
            deduped.withColumn("_rh", F.row_number().over(w_hash))
            .where(F.col("_rh") == 1)
            .drop("_rh")
        )
    return deduped


def _assign_and_project(
    deduped: DataFrame, num_parts: int, tag_cols: tuple[str, ...] = ("lang",)
) -> DataFrame:
    toks = spark_tokens("text")
    return assign_doc_ids(deduped, num_parts).select(
        "doc_id",
        "part",
        "url",
        *tag_cols,
        _tags_col(tag_cols).alias("tags"),
        "text",
        F.size(toks).alias("dl"),
        "content_hash",
    )


def prepare_docs(
    pages: DataFrame,
    num_parts: int,
    content_dedup: bool = True,
    tag_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """dedup + deterministic id assignment (un-persisted form; build_index
    persists the intermediate to avoid running the dedup twice)."""
    return _assign_and_project(
        _dedup_slim(pages, content_dedup, tag_cols), num_parts, tag_cols
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    num_parts: int = 16,
    content_dedup: bool = True,
    tag_cols: tuple[str, ...] = ("lang",),
) -> dict:
    """Build (or resume) the index. Returns build metrics."""
    t0 = time.perf_counter()
    os.makedirs(index_dir, exist_ok=True)
    stats_path = os.path.join(index_dir, STATS_FILE)

    # ---- pass A: docs + global stats (skipped on resume) --------------------
    t_pass_a = 0.0
    if not os.path.exists(stats_path):
        # the deduped slim table feeds TWO consumers (per-part counts for
        # id offsets + the partitioned write); persist it so the 3-window
        # dedup pipeline runs once, spilling to disk if it outgrows memory
        from pyspark import StorageLevel

        slim = _dedup_slim(pages, content_dedup, tag_cols).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            counts, n_total, avgdl_total = _part_profile(slim, num_parts)
            toks = spark_tokens("text")
            docs = _with_doc_ids(
                slim.withColumn("part", _part_col(num_parts)), counts, num_parts
            ).select(
                "doc_id",
                "part",
                "url",
                *tag_cols,
                _tags_col(tag_cols).alias("tags"),
                "text",
                F.size(toks).alias("dl"),
                "content_hash",
            )
            # co-locate each part before the partitioned write: one file
            # per part dir instead of (tasks x parts) small files
            docs.repartition(num_parts, "part").write.mode(
                "overwrite"
            ).partitionBy("part").parquet(_docs_path(index_dir))
        finally:
            slim.unpersist()
        with open(stats_path + ".tmp", "w") as f:
            json.dump(
                {
                    "n_docs": n_total,
                    "avgdl": avgdl_total,
                    "num_parts": num_parts,
                    "tag_cols": list(tag_cols),
                    "tokenizer": "lower-split-[^a-z0-9]+",
                },
                f,
            )
        os.replace(stats_path + ".tmp", stats_path)
        t_pass_a = time.perf_counter() - t0
    stats = json.loads(open(stats_path).read())
    avgdl = stats["avgdl"]
    num_parts = stats["num_parts"]

    # ---- pass B: postings shuffle + segment write ---------------------------
    t_b0 = time.perf_counter()
    n_written = _write_segments_for(spark, index_dir, avgdl, num_parts=num_parts)
    t_pass_b = time.perf_counter() - t_b0

    # ---- term_stats: global df = sum of per-segment dict dfs ----------------
    # (docs live in exactly one segment, so the sum is exact). Reading the
    # dictionaries is ~1000x cheaper than re-tokenizing the corpus.
    if n_written or not os.path.exists(_term_stats_path(index_dir)):
        write_term_stats(spark, index_dir)

    elapsed = time.perf_counter() - t0
    manifest = read_manifest(index_dir)
    n_docs = stats["n_docs"]
    n_postings = sum(r["n_postings"] for r in manifest)
    total_bytes = sum(r["bytes"] for r in manifest)
    metrics = {
        "n_docs": n_docs,
        "n_postings": n_postings,
        "post_bytes": total_bytes,
        "n_segments": len(manifest),
        "build_sec": round(elapsed, 3),
        "pass_a_sec": round(t_pass_a, 3),
        "pass_b_sec": round(t_pass_b, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "postings_per_sec": round(n_postings / elapsed, 1),
        "segments_written_this_run": n_written,
    }
    with open(os.path.join(index_dir, "build_metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def write_term_stats(spark: SparkSession, index_dir: str) -> None:
    (
        spark.read.parquet(os.path.join(index_dir, "segments", "*.dict.parquet"))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .repartition(1)
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(_term_stats_path(index_dir))
    )


def _write_segments_for(
    spark: SparkSession,
    index_dir: str,
    avgdl: float,
    num_parts: int | None = None,
    part_filter=None,
) -> int:
    """Pass B: shuffle token rows by part, write one segment per part.
    Skips committed partitions (resume); ``part_filter`` restricts to a
    subset (used by incremental append)."""
    done = committed_pids(index_dir)
    docs_r = spark.read.parquet(_docs_path(index_dir))
    if done:
        docs_r = docs_r.where(~F.col("part").isin([int(p) for p in done]))
    if part_filter is not None:
        parts_all = [r["part"] for r in docs_r.select("part").distinct().collect()]
        keep = [int(p) for p in parts_all if part_filter(int(p))]
        docs_r = docs_r.where(F.col("part").isin(keep))
    if num_parts is None:
        num_parts = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())[
            "num_parts"
        ]
    tokens = docs_r.select(
        "part", "doc_id", F.explode(spark_tokens("text")).alias("term")
    )
    shuffled = tokens.repartition(num_parts, "part").sortWithinPartitions(
        "part", "term", "doc_id"
    )

    out_schema = pa.schema(
        [("pid", pa.int32()), ("n_docs", pa.int64()), ("n_postings", pa.int64())]
    )
    idx_dir = index_dir
    docs_path = _docs_path(index_dir)

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer: SegmentWriter | None = None
        cur_pid = None
        skip_pid = None
        done_local = committed_pids(idx_dir)

        def finish():
            nonlocal writer
            if writer is None:
                return None
            segstats = writer.finish()
            write_manifest_row(idx_dir, segstats, {"avgdl": avgdl})
            writer = None
            return segstats

        results = []
        for rb in batches:
            parts = rb.column("pid" if "pid" in rb.schema.names else "part").to_numpy()
            terms = rb.column("term")  # stays Arrow — no Python strings
            docs = rb.column("doc_id").to_numpy()
            if parts.size == 0:
                continue
            # split batch by pid runs (sorted by part first)
            import numpy as np

            change = np.flatnonzero(parts[1:] != parts[:-1]) + 1
            bounds = np.concatenate(([0], change, [parts.size]))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                pid = int(parts[lo])
                if pid == skip_pid:
                    continue
                if pid != cur_pid:
                    st = finish()
                    if st is not None:
                        results.append((st.pid, st.n_docs, st.n_postings))
                    if pid in done_local:
                        skip_pid = pid
                        cur_pid = None
                        continue
                    # load this part's norms from the docs table
                    nt = pq.read_table(
                        docs_path,
                        filters=pc.field("part") == pid,
                        columns=["doc_id", "dl", "tags"],
                    ).sort_by("doc_id")
                    writer = SegmentWriter(idx_dir, pid, avgdl)
                    writer.set_norms(
                        nt["doc_id"].to_numpy(),
                        nt["dl"].to_numpy(),
                        nt["tags"].combine_chunks(),
                    )
                    cur_pid = pid
                    skip_pid = None
                writer.add_raw(terms.slice(lo, hi - lo), docs[lo:hi])
        st = finish()
        if st is not None:
            results.append((st.pid, st.n_docs, st.n_postings))
        if results:
            pids, nd, npost = zip(*results)
            yield pa.record_batch(
                [
                    pa.array(pids, pa.int32()),
                    pa.array(nd, pa.int64()),
                    pa.array(npost, pa.int64()),
                ],
                schema=out_schema,
            )

    seg_stats = shuffled.mapInArrow(
        write_partition, schema="pid int, n_docs long, n_postings long"
    ).collect()
    return len(seg_stats)
