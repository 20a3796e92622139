"""Physical-plan audits: the plans we'd want at 100 TB, asserted.

- predicate pushdown reaches the parquet scan (PushedFilters)
- small sides broadcast (no shuffle of the corpus on the query path)
- top-k compiles to TakeOrderedAndProject (bounded heap, no global sort)
- column pruning: BM25 never reads text columns it doesn't need
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from refimage_spark.operators import metadata as M
from refimage_spark.operators.bm25 import Corpus, bm25_topk
from refimage_spark.plans.compiler import search


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_point_lookup_pushdown(spark, documents):
    p = plan_str(M.point_lookup(documents, 42))
    assert "PushedFilters" in p
    assert "EqualTo(doc_id,42)" in p.replace(" ", "")


def test_topk_is_take_ordered(spark, documents):
    corpus = Corpus.from_documents(documents)
    p = plan_str(bm25_topk(corpus, "spark join", k=10))
    assert "TakeOrderedAndProject" in p
    # stats + df joins are broadcast: the big exploded side never shuffles
    # for a join (its only exchange is the tf groupBy)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_bm25_scan_prunes_columns(spark, documents):
    corpus = Corpus.from_documents(documents)
    p = plan_str(bm25_topk(corpus, "spark join", k=10))
    # only doc_id + text needed; metadata cols must not be read
    scan = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scan and all("n_chars" not in l and "source" not in l for l in scan)


def test_hydrate_broadcasts_results(spark, documents):
    top = documents.select("doc_id").limit(5).withColumn("score", F.lit(1.0))
    p = plan_str(M.hydrate(top, documents, keep=["lang"]))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pagination_no_global_sort_at_offset0(spark, documents):
    p = plan_str(M.list_documents(documents, limit=10, sort_by="n_chars"))
    assert "TakeOrderedAndProject" in p


def test_dsl_not_uses_anti_join(spark, documents):
    corpus = Corpus.from_documents(documents)
    p = plan_str(search(corpus, "table NOT slow", limit=10))
    assert "LeftAnti" in p


def test_build_dedup_exchanges_text_once(spark):
    """_dedup_slim_build's contract: corpus text crosses exactly ONE
    exchange (the url keep-one agg into the persisted intermediate); the
    content-dedup applies as a semi-join over the CACHE with no
    re-exchange of the big side (only survivor urls move)."""
    from refimage_spark.index.build import _dedup_slim_build
    from refimage_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 500, seed=42, partitions=4)
    deduped, handles = _dedup_slim_build(pages, content_dedup=True)
    try:
        deduped.count()  # materialize through the caches
        p = deduped._jdf.queryExecution().executedPlan().toString()
        # consumers read the final (joined) cache — nothing above it
        assert "InMemoryTableScan" in p
        post_cache = p.split("InMemoryRelation")[0]
        assert "Exchange hashpartitioning" not in post_cache, post_cache
        # the INNERMOST cache (the url keep-one agg, where the full rows
        # incl. text travel) holds exactly ONE exchange — the only
        # exchange in the whole tree that carries the corpus text (the
        # joined cache's own exchanges are key-only: the survivor-url
        # agg and the semi-join's right side). AQE dumps Final+Initial;
        # scan the Final section only.
        cached_d1 = p.rsplit("InMemoryRelation", 1)[-1]
        final = cached_d1.split("== Final Plan ==", 1)[-1].split(
            "== Initial Plan ==", 1
        )[0]
        n_ex = sum(
            1
            for line in final.splitlines()
            if "Exchange hashpartitioning" in line
        )
        assert n_ex == 1, p
    finally:
        for h in handles:
            h.unpersist()


def test_update_metadata_broadcasts_updates(spark, documents):
    """UPDATE compiles to ONE broadcast left join — the documents scan
    never shuffles for an attribute upsert."""
    u = spark.createDataFrame([(7, "xx")], "doc_id long, lang string")
    p = plan_str(M.update_metadata(documents, u, set_cols=["lang"]))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Exchange hashpartitioning" not in p
