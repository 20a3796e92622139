"""Segment engine: build -> query, rank+score identity vs the DataFrame
oracle, WAND vs vectorized identity, resume-from-checkpoint."""

import glob
import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from refimage_spark.index.build import build_index
from refimage_spark.index.query import (
    eval_node,
    make_idfs,
    search_index,
    wand_topk_segment,
)
from refimage_spark.index.segment import SegmentReader, read_manifest
from refimage_spark import dsl
from refimage_spark.operators.bm25 import Corpus
from refimage_spark.plans.compiler import search
from refimage_spark.sources.pages import generate_pages
from refimage_spark.tokenizer import py_tokens

N_DOCS = 1200
N_PARTS = 8

QUERY_SET = [  # FIXTURES.md §3
    "red car",
    "fast car #en",
    "red car OR blue house",
    "sports car AND #en",
    "luxury car^0.8",
    "beach sunset NOT person",
    "red car^0.8 OR blue car^0.6",
    'EXCLUDE(TEXT("beach sunset"), TEXT("person"))',
    "car",  # head term
    "mountain river train engine",  # rare conjunction-ish bag
]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    pages = generate_pages(spark, N_DOCS, seed=42, partitions=6)
    metrics = build_index(spark, pages, d, num_parts=N_PARTS)
    assert metrics["n_segments"] == N_PARTS
    return d


@pytest.fixture(scope="module")
def oracle_corpus(spark, index_dir):
    """Corpus over the SAME docs table the build produced (same doc_ids,
    same post-dedup doc set)."""
    docs = spark.read.parquet(f"{index_dir}/docs.parquet")
    from refimage_spark.tokenizer import spark_tokens

    toks = spark_tokens("text")
    return Corpus(
        docs.select(
            "doc_id",
            toks.alias("tokens"),
            F.size(toks).alias("dl"),
            F.array("lang").alias("tags"),
            "lang",
        )
    )


def test_manifest_complete(spark, index_dir):
    rows = read_manifest(index_dir)
    stats = json.load(open(f"{index_dir}/stats.json"))
    assert sum(r["n_docs"] for r in rows) == stats["n_docs"]
    assert all(r["checksum"] for r in rows)
    # dedup happened: planted url+content dups removed
    assert stats["n_docs"] < N_DOCS


@pytest.mark.parametrize("q", QUERY_SET)
def test_rank_identity_vs_oracle(spark, index_dir, oracle_corpus, q):
    got = search_index(spark, index_dir, q, k=10).collect()
    want = search(oracle_corpus, q, limit=10).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want], q
    for g, w in zip(got, want):
        assert g.score == pytest.approx(w.score, rel=1e-9), (q, g, w)


def test_threshold(spark, index_dir, oracle_corpus):
    got = search_index(spark, index_dir, "red car", k=50, threshold=1.0).collect()
    want = search(oracle_corpus, "red car", limit=50, threshold=1.0).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert all(r.score >= 1.0 for r in got)


def test_wand_equals_vectorized(spark, index_dir):
    stats = json.load(open(f"{index_dir}/stats.json"))
    terms = ["red", "car", "house"]
    idfs = make_idfs(index_dir, terms)
    for pid in range(N_PARTS):
        r = SegmentReader(index_dir, pid)
        node = dsl.TextQuery("red car house", 1.0)
        vids, vsc = eval_node(r, node, idfs, stats["avgdl"], 0.0)
        from refimage_spark.index.query import topk_arrays

        vids, vsc = topk_arrays(vids, vsc, 10)
        wids, wsc = wand_topk_segment(r, terms, idfs, stats["avgdl"], 10)
        assert vids.tolist() == wids.tolist(), pid
        np.testing.assert_allclose(vsc, wsc, rtol=1e-9)


def _raw_segment(tmp_path, postings: dict, n_docs: int, dl: int = 10):
    """Hand-built single segment: postings = {term: [(doc, tf), ...]}."""
    import pyarrow as pa

    from refimage_spark.index.segment import SegmentWriter

    d = str(tmp_path / "rawseg")
    w = SegmentWriter(d, 0, float(dl))
    ids = np.arange(n_docs, dtype=np.int64)
    w.set_norms(ids, np.full(n_docs, dl, np.int64), [["en"]] * n_docs)
    for term in sorted(postings):
        docs = np.array([p[0] for p in postings[term]], dtype=np.int64)
        tfs = np.array([p[1] for p in postings[term]], dtype=np.int64)
        w.add_raw(pa.array([term] * docs.size, pa.string()), docs, tfs)
    w.finish()
    return d


def test_wand_pivot_extension_rank_safe(spark, tmp_path):
    """Regression (ADVICE r1, high): a cursor BEYOND the pivot sitting on
    pivot_doc contributes real score; without BMW pivot extension the
    block bound understates the doc and a true top-1 hit is pruned.

    Setup: term x tf=10 at doc 0, tf=1 on docs 1..199 (2 blocks); term y
    tf=10 at doc 150 only; k=1. True top-1 is doc 150 (x's tf=1 part +
    y's tf=10 part); the buggy prune returned doc 0."""
    from refimage_spark.index.query import topk_arrays
    from refimage_spark.index.segment import SegmentReader

    post_x = [(0, 10)] + [(i, 1) for i in range(1, 200)]
    post_y = [(150, 10)]
    d = _raw_segment(tmp_path, {"x": post_x, "y": post_y}, n_docs=200)
    r = SegmentReader(d, 0)
    idfs = {"x": 1.0, "y": 1.0}
    wids, wsc = wand_topk_segment(r, ["x", "y"], idfs, 10.0, 1)
    vids, vsc = eval_node(r, dsl.TextQuery("x y", 1.0), idfs, 10.0, 0.0)
    vids, vsc = topk_arrays(vids, vsc, 1)
    assert wids.tolist() == vids.tolist() == [150]
    np.testing.assert_allclose(wsc, vsc, rtol=1e-12)
    assert wsc[0] == pytest.approx(1.0 + 10 * 2.2 / 11.2, rel=1e-9)


def test_wand_skips_block_decode(spark, tmp_path):
    """Block-lazy IO: seek() jumps whole blocks via the skip pointers;
    blocks that are never landed on are never DECODED (gap resets at
    block boundaries make each block self-contained). Rank identity
    with the vectorized scorer still holds."""
    from refimage_spark.index.query import topk_arrays
    from refimage_spark.index.segment import SegmentReader

    # term a: 10 blocks of tf=1 postings; term b: rare, high idf, at the
    # two ends — after doc 0 fills the heap, a's cursor seeks straight
    # to 1200 skipping blocks 1..8 undecoded
    post_a = [(i, 1) for i in range(1280)]
    post_b = [(0, 10), (1200, 10)]
    d = _raw_segment(tmp_path, {"a": post_a, "b": post_b}, n_docs=1280)
    r = SegmentReader(d, 0)
    idfs = {"a": 0.05, "b": 5.0}
    counters: dict = {}
    wids, wsc = wand_topk_segment(
        r, ["a", "b"], idfs, 10.0, 1, counters=counters
    )
    assert counters["decoded_blocks"] < counters["total_blocks"], counters
    vids, vsc = eval_node(r, dsl.TextQuery("a b", 1.0), idfs, 10.0, 0.0)
    vids, vsc = topk_arrays(vids, vsc, 1)
    assert wids.tolist() == vids.tolist()
    np.testing.assert_allclose(wsc, vsc, rtol=1e-12)


def test_index_tag_queries_match_compiler(spark, index_dir, oracle_corpus):
    """Segment docs store the FULL tag array, so #tag queries agree
    between the segment engine and the DataFrame compiler (r1 gap: the
    engine matched lang only)."""
    for q in ["#en", "#en #de", "fast car #en"]:
        got = search_index(spark, index_dir, q, k=500).collect()
        want = search(oracle_corpus, q, limit=500).collect()
        assert [r.doc_id for r in got] == [r.doc_id for r in want], q


def test_resume_after_partial_build(spark, tmp_path):
    d = str(tmp_path / "idx2")
    pages = generate_pages(spark, 400, seed=42, partitions=4)
    build_index(spark, pages, d, num_parts=6)
    full_manifest = {r["segment_id"]: r["checksum"] for r in read_manifest(d)}
    res_full = search_index(spark, d, "red car", k=10).collect()

    # simulate a crash: wipe 3 partitions' segments + manifest rows
    d2 = str(tmp_path / "idx3")
    shutil.copytree(d, d2)
    for pid in [1, 3, 4]:
        for f in glob.glob(f"{d2}/segments/seg-{pid:05d}*"):
            os.remove(f)
        os.remove(f"{d2}/manifest/part-{pid:05d}.json")
    assert len(read_manifest(d2)) == 3

    metrics = build_index(spark, pages, d2, num_parts=6)  # resume
    assert metrics["segments_written_this_run"] == 3
    resumed = {r["segment_id"]: r["checksum"] for r in read_manifest(d2)}
    assert resumed == full_manifest  # byte-identical segments
    res_resumed = search_index(spark, d2, "red car", k=10).collect()
    assert [tuple(r) for r in res_resumed] == [tuple(r) for r in res_full]


def test_build_deterministic_across_parallelism(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, generate_pages(spark, 300, seed=42, partitions=2), a, num_parts=4)
    build_index(spark, generate_pages(spark, 300, seed=42, partitions=7), b, num_parts=4)
    ma = {r["segment_id"]: r["checksum"] for r in read_manifest(a)}
    mb = {r["segment_id"]: r["checksum"] for r in read_manifest(b)}
    assert ma == mb


def test_local_mode_equals_spark_mode(spark, index_dir):
    for q in ["red car", "beach sunset NOT person", "#en", "car"]:
        loc = search_index(spark, index_dir, q, k=10, mode="local").collect()
        dist = search_index(spark, index_dir, q, k=10, mode="spark").collect()
        assert [r.doc_id for r in loc] == [r.doc_id for r in dist], q
        for a, b in zip(loc, dist):  # scorers associate floats differently
            assert a.score == pytest.approx(b.score, rel=1e-12), q


def test_index_stats(spark, index_dir):
    from refimage_spark.index.query import index_stats

    st = index_stats(index_dir)
    assert st["n_segments"] == N_PARTS
    assert st["n_docs"] > 0 and st["n_postings"] > 0 and st["post_bytes"] > 0
    assert st["tokenizer"] == "lower-split-[^a-z0-9]+"


def test_index_stats_serving_observability(spark, index_dir):
    """Serving keys: no in-flight queries at rest; an in-flight query is
    visible in active_queries/pool_saturation while it runs (observed
    mid-query via a plan-side hook)."""
    from refimage_spark.index import query as Q

    st = Q.index_stats(index_dir)
    s = st["serving"]
    assert s["active_queries"] == 0
    assert set(s) == {"active_queries", "pool_started", "pool_workers",
                      "pool_saturation"}
    seen: list[int] = []
    orig = Q._query_plan

    def spying_plan(*a, **kw):
        seen.append(Q.index_stats(index_dir)["serving"]["active_queries"])
        return orig(*a, **kw)

    Q._query_plan = spying_plan
    try:
        Q.search_local(index_dir, "red car", k=5)
    finally:
        Q._query_plan = orig
    assert seen and seen[0] == 1  # the query counted itself while running
    assert Q.index_stats(index_dir)["serving"]["active_queries"] == 0


def test_search_local_concurrent_clients(spark, index_dir):
    """Concurrency regression: many clients sharing the serving pool and
    the mtime-keyed caches must neither crash (the cache sweep used to
    race concurrent inserts) nor diverge from the sequential result."""
    from concurrent.futures import ThreadPoolExecutor

    from refimage_spark.index.query import _CACHE, search_local

    queries = ["red car", "blue house", "beach sunset NOT person",
               "sports car AND #en", "car"]
    _CACHE.clear()  # force every client through cold loads
    expected = {q: search_local(index_dir, q, k=10) for q in queries}
    _CACHE.clear()

    def client(i: int):
        out = {}
        for q in queries:
            out[q] = search_local(index_dir, q, k=10)
        return out

    with ThreadPoolExecutor(16) as ex:
        results = list(ex.map(client, range(16)))
    for r in results:
        assert r == expected


def test_search_local_process_path_identity(spark, index_dir, monkeypatch):
    """The load-adaptive serving path has two executions: inline
    sequential (lone query) and chunked process-pool fan-out (under
    load / huge indexes). Force the pool path for every query and
    assert it is result-identical to inline — and that the chunking
    covers all segments (a dropped pid chunk would silently lose
    docs, not error)."""
    from refimage_spark.index import query as Q

    queries = ["red car", "fast car #en", "beach sunset NOT person", "car"]
    inline = {q: Q.search_local(index_dir, q, k=10) for q in queries}
    Q.warm_serving_pool(index_dir)
    # force the sharded path: pretend every index is too big to inline,
    # and shrink the affinity block so the 8-segment index spans 3 shards
    monkeypatch.setattr(Q, "_INLINE_MAX_SEGMENTS", 0)
    monkeypatch.setattr(Q, "_SHARD_BLOCK", 3)
    pooled = {q: Q.search_local(index_dir, q, k=10) for q in queries}
    assert pooled == inline
    # concurrent queries through the per-shard batcher stay identical
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as ex:
        outs = list(
            ex.map(lambda q: Q.search_local(index_dir, q, k=10), queries * 4)
        )
    for q, o in zip(queries * 4, outs):
        assert o == inline[q], q


def test_replicate_and_shard_modes_identical(spark, index_dir, monkeypatch):
    """The replicate-vs-shard serving switch (keyed on index bytes) must
    be invisible to results: force each mode on the same index and
    compare against the inline sweep."""
    from refimage_spark.index import query as Q

    queries = ["red car", "car", "beach sunset NOT person"]
    inline = {q: Q.search_local(index_dir, q, k=10) for q in queries}
    monkeypatch.setattr(Q, "_INLINE_MAX_SEGMENTS", 0)
    monkeypatch.setattr(Q, "_REPLICATE_MAX_BYTES", 1 << 60)  # force replicate
    Q.warm_serving_pool(index_dir)
    assert {q: Q.search_local(index_dir, q, k=10) for q in queries} == inline
    monkeypatch.setattr(Q, "_REPLICATE_MAX_BYTES", 0)  # force shard
    Q.warm_serving_pool(index_dir)
    assert {q: Q.search_local(index_dir, q, k=10) for q in queries} == inline


def test_search_index_local_mode_passes_wand_through(spark, index_dir,
                                                     monkeypatch):
    """An explicit use_wand=True must reach the serving path in local
    mode (regression: the flag was silently dropped); use_wand=None
    keeps the serving path's measured vectorized default."""
    from refimage_spark.index import query as Q

    seen = []
    orig = Q.search_local

    def spy(*a, **kw):
        seen.append(kw.get("use_wand", False))
        return orig(*a, **kw)

    monkeypatch.setattr(Q, "search_local", spy)
    Q.search_index(spark, index_dir, "red car", k=5, mode="local",
                   use_wand=True).collect()
    Q.search_index(spark, index_dir, "red car", k=5, mode="local").collect()
    assert seen == [True, False]


def test_cached_none_is_a_hit(spark, tmp_path):
    """A loader that legitimately returns None (global_df's
    too-big-to-pin vocabulary) must be cached as None, not re-loaded on
    every call (regression: the full term_stats parquet was re-read per
    query)."""
    from refimage_spark.index import query as Q

    p = str(tmp_path / "probe")
    open(p, "w").write("x")
    calls = []

    def loader():
        calls.append(1)
        return None

    assert Q._cached("none-probe", p, loader) is None
    assert Q._cached("none-probe", p, loader) is None
    assert len(calls) == 1
