"""Distributed, resumable inverted-index build.

Pipeline (rebuild of the reference's batch index build,
/root/reference/src/refimage/search/__init__.py:147-200, re-architected
for Spark):

  pass A (docs):   pages -> url-dedup (keep latest recrawl) -> optional
                   content-hash dedup -> deterministic dense doc_id ->
                   docs.parquet (partitioned by part) + stats.json +
                   term_stats.parquet (global df for idf)
  pass B (index):  ONE TASK PER PART, zero shuffle: each task reads its
                   already-co-located part directory, tokenizes in
                   Arrow C++ (split_pattern_regex — bit-identical to
                   spark_tokens, golden-tested), sorts (term, doc_id)
                   locally in numpy, writes the segment -> manifest row
                   per partition (the commit point)

Design notes for 100 TB:
- doc ids are deterministic WITHOUT a global window: part =
  pmod(xxhash64(url), P); per-part counts give offsets; row_number
  within part (per-part sort only). Reproducible at any parallelism.
- document-partitioned segments: every part holds its doc range's
  postings for ALL terms, so Zipf head terms are split across all P
  segments structurally — no hot shuffle key, no custom salting needed
  (the skew knob is P itself). Compare SURVEY.md §7.4(2).
- THE shuffle is pass A's hash-partitioned WRITE of the slim docs
  table. Pass B never exchanges: tokens are derived, sorted and
  segment-encoded inside the task that owns the part — measured ~2-3x
  faster than the previous explode->exchange->sortWithinPartitions form
  at local[8] (45.7s -> ~16s median pass B on the 500k-page corpus),
  and its scaling tracks the machine's memory-bandwidth ceiling instead
  of the strictly-worse JVM exchange path (BENCH/BASELINE.md).
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
    FORMAT_VERSION,
    SegmentWriter,
    committed_pids,
    read_manifest,
    write_manifest_row,
)
from refimage_spark.tokenizer import spark_tokens

STATS_FILE = "stats.json"
# term_stats rollup: total dict-parquet bytes under this bound run as a
# driver-side Arrow group_by (env-overridable for cluster deployments)
_TERM_STATS_LOCAL_BYTES = int(
    os.environ.get("REFIMAGE_TERM_STATS_LOCAL_BYTES", str(256 << 20))
)


def _docs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "docs.parquet")


def _term_stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats.parquet")


def _part_col(num_parts: int):
    return F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int")


def _corpus_totals(slim: DataFrame) -> tuple[int, float]:
    """ONE-ROW aggregate over the deduped table: (n_docs, avgdl) for
    stats.json. ``dl`` was computed in the slim projection, so this pass
    never re-tokenizes; avgdl is derived from the exact integer totals
    in Python (bit-identical to the previous per-part-sums form)."""
    row = slim.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    n = int(row["n"] or 0)
    # exact-int division (not float(sum)/n): identical to the previous
    # per-part-sums form at any magnitude, incl. dl totals beyond 2^53
    return n, (int(row["dl_sum"]) / n if n else 0.0)


def _offsets_df(with_part: DataFrame) -> DataFrame:
    """(part, _off) — exclusive running sum of per-part row counts, as a
    tiny P-row DataFrame (a single-partition window over the counts).
    Replaces the former driver-side counts collect + 2P-entry
    ``create_map`` literal, which bloated the plan and made the driver
    do O(P) work — at 100-TB scale P is 10^5-10^6 (the cache-sized-part
    rule), where a broadcast join is the right shape. Absent parts
    contribute zero rows, so the cumulative offsets are unchanged."""
    w = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
    return (
        with_part.groupBy("part")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "part",
            F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off"),
        )
    )


def _with_doc_ids(with_part: DataFrame, offsets: DataFrame) -> DataFrame:
    """doc_id = part offset + rank within part (by url). The offsets side
    is P rows — broadcast, so the corpus side is not re-exchanged by the
    join; the id window's hash(part) exchange is the only corpus move."""
    w = Window.partitionBy("part").orderBy("url")
    return (
        with_part.join(F.broadcast(offsets), "part")
        .withColumn(
            "doc_id",
            (F.col("_off") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_off")
    )


def assign_doc_ids(pages: DataFrame, num_parts: int) -> DataFrame:
    """Deterministic dense doc_id (SURVEY.md §2.7 F7) scalable to 10^12
    rows: hash-part by url, sort within part, add per-part offsets
    (broadcast-joined, never a driver-side literal)."""
    with_part = pages.withColumn("part", _part_col(num_parts))
    return _with_doc_ids(with_part, _offsets_df(with_part))


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
    bytes are ~10x the text and pass A shuffles the corpus — the
    exchanges never carry the body. ``dl`` is computed here too, so the
    corpus is tokenized exactly ONCE in pass A.

    Keep-one is a struct-max/min AGGREGATION, not a window: partial
    aggregation combines duplicates map-side before the exchange, and a
    hash aggregate needs no per-partition sort — both scale better than
    row_number windows at high parallelism. Struct comparison is
    lexicographic by field order, so the survivor is a deterministic
    total-order choice: (max warc_ts, then max content_hash) per url;
    (min url) per content_hash.

    This linear two-aggregation form shuffles the corpus text twice
    (once per keep-one agg); the build path uses ``_dedup_slim_build``
    below, which persists the url-deduped intermediate and applies the
    content-dedup as a key-only semi-join, so text crosses the wire
    exactly once. This form stays for the un-persisted callers (append
    increments are small)."""
    slim = pages.select(
        "url",
        "warc_ts",
        *tag_cols,
        "text",
        F.sha2("html", 256).alias("content_hash"),
        F.size(spark_tokens("text")).alias("dl"),
    )
    carry = [*tag_cols, "dl", "text"]
    deduped = (
        slim.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "content_hash", *carry)).alias("p"))
        .select("url", "p.*")
    )
    if content_dedup:
        deduped = (
            deduped.groupBy("content_hash")
            .agg(F.min(F.struct("url", "warc_ts", *carry)).alias("p"))
            .select("content_hash", "p.*")
        )
    return deduped


def _dedup_slim_build(
    pages: DataFrame,
    content_dedup: bool = True,
    tag_cols: tuple[str, ...] = ("lang",),
):
    """Build-path dedup: corpus text crosses the wire exactly ONCE.

    The url keep-one aggregation (the unavoidable text exchange — texts
    of one url must meet) lands in a persisted intermediate; the
    content-dedup decision then needs only (content_hash, url) — a
    key-only aggregation over the CACHED rows — and applies as a
    left-semi join whose big side reads the cache already hash(url)-
    partitioned (no re-exchange; only survivor urls move). The linear
    form (_dedup_slim) instead shuffled the full text through BOTH
    aggregations — measured at 500k pages local[8]: 886 MB shuffled ->
    676 MB (-24%), wall within the VM's noise band. On a real cluster
    the removed exchange is a corpus-sized NETWORK transfer while the
    cache write is node-local, so the gap widens with scale.

    Returns (deduped_df, persisted_handles); the caller unpersists the
    handles once its consumers are done."""
    from pyspark import StorageLevel

    slim = pages.select(
        "url",
        "warc_ts",
        *tag_cols,
        "text",
        F.sha2("html", 256).alias("content_hash"),
        F.size(spark_tokens("text")).alias("dl"),
    )
    carry = [*tag_cols, "dl", "text"]
    d1 = (
        slim.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "content_hash", *carry)).alias("p"))
        .select("url", "p.*")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if not content_dedup:
        return d1, [d1]
    surv_urls = (
        d1.select("content_hash", "url")
        .groupBy("content_hash")
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    # persist the JOINED result too: pass A has two consumers (profile +
    # partitioned write) and the semi-join is only cheap when the
    # survivor side broadcasts — at corpus scale it merges sorted runs,
    # which must not run once per consumer. d1 is dropped by the caller
    # as soon as this cache fills (the profile pass materializes it).
    joined = d1.join(surv_urls, "url", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return joined, [joined, d1]


def _assign_and_project(
    deduped: DataFrame, num_parts: int, tag_cols: tuple[str, ...] = ("lang",)
) -> DataFrame:
    return assign_doc_ids(deduped, num_parts).select(
        "doc_id",
        "part",
        "url",
        *tag_cols,
        _tags_col(tag_cols).alias("tags"),
        "text",
        "dl",
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
        # the persisted url-dedup intermediate feeds the content-dedup
        # prepass AND both downstream consumers (per-part counts for id
        # offsets + the partitioned write) — the corpus text is exchanged
        # once and cached, spilling to disk if it outgrows memory
        slim, handles = _dedup_slim_build(pages, content_dedup, tag_cols)
        try:
            n_total, avgdl_total = _corpus_totals(slim)
            # the totals pass filled the final cache — drop intermediate
            # caches now (halves peak cache before the write pass)
            for h in handles[1:]:
                h.unpersist()
            handles = handles[:1]
            with_part = slim.withColumn("part", _part_col(num_parts))
            docs = _with_doc_ids(with_part, _offsets_df(with_part)).select(
                "doc_id",
                "part",
                "url",
                *tag_cols,
                _tags_col(tag_cols).alias("tags"),
                "text",
                "dl",
                "content_hash",
            )
            # the id-assignment window already exchanged rows hash(part),
            # so every part lives wholly in one task: the partitioned
            # write yields one file per part dir with NO extra shuffle
            docs.write.mode("overwrite").partitionBy("part").parquet(
                _docs_path(index_dir)
            )
        finally:
            for h in handles:
                h.unpersist()
        with open(stats_path + ".tmp", "w") as f:
            json.dump(
                {
                    "n_docs": n_total,
                    "avgdl": avgdl_total,
                    "num_parts": num_parts,
                    "tag_cols": list(tag_cols),
                    "tokenizer": "lower-split-[^a-z0-9]+",
                    "format_version": FORMAT_VERSION,
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
    """Global df = sum of per-segment dict dfs.

    ATOMIC for concurrent readers: spark's mode("overwrite") deletes
    the target before writing — a serving query reading mid-refresh
    would see a partial or schema-less table — so the aggregation lands
    in a scratch dir and its single sorted part file is os.replace'd
    over term_stats.parquet (now a plain file, not a spark directory).

    Inputs come from the MANIFEST's dict paths, not a directory glob:
    superseded-but-not-yet-cleaned segment files (merge/compact crash
    window) must not double-count df.

    SIZE-ADAPTIVE (guide §1.2 — fix the algorithm before the config):
    the output is vocabulary-sized, so while the dict files together are
    driver-sized (<= _TERM_STATS_LOCAL_BYTES of parquet — the final
    table is smaller still) the rollup runs as ONE driver-side Arrow
    group_by instead of a Spark job (scan + shuffle + single-writer
    stage + scheduling ~0.4-0.6s per build, measured). A 100-TB-scale
    vocabulary falls through to the distributed aggregation unchanged."""
    import glob as _glob
    import shutil

    from refimage_spark.index.segment import read_manifest, seg_paths

    dicts = [
        seg_paths(index_dir, r["partition_id"])[1]
        for r in read_manifest(index_dir)
    ]
    dst = _term_stats_path(index_dir)
    if sum(os.path.getsize(p) for p in dicts) <= _TERM_STATS_LOCAL_BYTES:
        import pyarrow as pa

        tables = [
            pq.read_table(p, columns=["term", "df"]) for p in dicts
        ]
        agg = (
            (
                pa.concat_tables(tables)
                if tables
                else pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64()),
                    }
                )
            )
            .group_by("term")
            .aggregate([("df", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
        pq.write_table(agg, dst + ".tmp")
        if os.path.isdir(dst):
            shutil.rmtree(dst)  # one-time migration from the directory layout
        os.replace(dst + ".tmp", dst)
        return
    scratch = dst + ".build"
    (
        spark.read.parquet(*dicts)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .repartition(1)
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(scratch)
    )
    part = _glob.glob(os.path.join(scratch, "part-*.parquet"))[0]
    if os.path.isdir(dst):
        shutil.rmtree(dst)  # one-time migration from the directory layout
    os.replace(part, dst)
    shutil.rmtree(scratch)


def build_segment_from_part(
    index_dir: str, pid: int, avgdl: float
) -> tuple[int, int, int]:
    """Build one segment from its (already co-located) docs part dir.

    Everything is vectorized: Arrow C++ tokenization (utf8_lower +
    split_pattern_regex + empty-filter = exactly ``spark_tokens``,
    golden-tested 3-way in tests/test_tokenizer.py), dictionary-encoded
    term ranks, one numpy lexsort by (term, doc_id). No per-posting
    Python objects, no JVM exchange. Deterministic: a pure function of
    the part's rows, identical at any cluster size."""
    import numpy as np

    from refimage_spark.tokenizer import arrow_token_list

    part_dir = os.path.join(_docs_path(index_dir), f"part={pid}")
    t = pq.read_table(
        part_dir, columns=["doc_id", "dl", "tags", "text"]
    ).sort_by("doc_id")
    ids = t["doc_id"].to_numpy()
    writer = SegmentWriter(index_dir, pid, avgdl)
    writer.set_norms(ids, t["dl"].to_numpy(), t["tags"].combine_chunks())
    splits = arrow_token_list(t["text"].combine_chunks())
    flat = splits.flatten()
    doc_rep = np.repeat(ids, np.diff(splits.offsets.to_numpy()))
    keep = pc.not_equal(flat, "")  # split artifacts at string edges
    flat = flat.filter(keep)
    doc_rep = doc_rep[keep.to_numpy(zero_copy_only=False)]
    # sort by (lexicographic term, doc_id): rank the unique terms once,
    # lexsort the (rank, doc) pairs — never the strings themselves
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary
    order = pc.sort_indices(vocab).to_numpy(zero_copy_only=False)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[order] = np.arange(len(vocab))
    o = np.lexsort((doc_rep, rank[codes]))
    writer.add_raw(flat.take(pa.array(o)), doc_rep[o])
    st = writer.finish()
    write_manifest_row(index_dir, st, {"avgdl": avgdl})
    return st.pid, st.n_docs, st.n_postings


def _write_segments_for(
    spark: SparkSession,
    index_dir: str,
    avgdl: float,
    num_parts: int | None = None,
    part_filter=None,
) -> int:
    """Pass B: one task per part — the docs table is ALREADY partitioned
    by part on disk, so segment building is embarrassingly parallel with
    zero exchange. Skips committed partitions (resume); ``part_filter``
    restricts to a subset (used by incremental append)."""
    done = committed_pids(index_dir)
    docs_path = _docs_path(index_dir)
    pending = []
    for name in sorted(os.listdir(docs_path)):
        if not name.startswith("part="):
            continue
        pid = int(name.split("=", 1)[1])
        if pid in done:
            continue
        if part_filter is not None and not part_filter(pid):
            continue
        pending.append(pid)
    if not pending:
        return 0
    idx_dir = index_dir

    def write_parts(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # re-check THIS pid's commit row only (a retried/speculative task
        # racing another attempt is harmless — segment writes are
        # idempotent). The previous full committed_pids() scan re-read
        # the whole manifest dir in EVERY task: O(P^2) file opens per
        # build — ~100ms of aggregate listing at P=320, unusable at the
        # 100-TB-scale P of 10^5+.
        from refimage_spark.index.segment import manifest_dir

        for rb in batches:
            for pid in rb.column("pid").to_pylist():
                if os.path.exists(
                    os.path.join(manifest_dir(idx_dir), f"part-{pid:05d}.json")
                ):
                    continue
                p, nd, npost = build_segment_from_part(idx_dir, int(pid), avgdl)
                yield pa.record_batch(
                    [
                        pa.array([p], pa.int32()),
                        pa.array([nd], pa.int64()),
                        pa.array([npost], pa.int64()),
                    ],
                    names=["pid", "n_docs", "n_postings"],
                )

    # a few pids per task, not one: per-task Spark overhead is ~5ms and
    # segment builds are ~50ms, so one-task-per-pid spent ~25% of pass B
    # on scheduling at P=320. 4 waves per core keeps the tail short
    # (segments are near-equal by the hash partitioner).
    n_tasks = min(len(pending), max(spark.sparkContext.defaultParallelism * 4, 1))
    pid_df = spark.createDataFrame([(p,) for p in pending], "pid int").repartition(
        n_tasks
    )
    seg_stats = pid_df.mapInArrow(
        write_parts, schema="pid int, n_docs long, n_postings long"
    ).collect()
    return len(seg_stats)
