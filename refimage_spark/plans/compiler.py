"""Compile a DSL AST into a DataFrame plan over a Corpus.

Pinned executor semantics (deterministic refinement of
/root/reference/src/refimage/dsl.py — see SURVEY.md §2.4, §2.8):

- every node evaluates to (doc_id, score);
- TextQuery  -> BM25 scores x clause weight, then the min-score
  threshold applied post-weight at the leaf (dsl.py:89-90 semantics);
- TagFilter  -> unscored metadata predicate (score 0.0); any = overlap,
  all = containment; tags matched lowercased (dsl.py:117,144);
- And        -> inner join on doc_id, scores ADD (conjunctive BM25);
- Or         -> union + groupBy sum (a doc matching several clauses
  accumulates all clause scores);
- Not        -> left_anti join (base minus exclude);
- root       -> total order (score desc, doc_id asc) + limit.

Catalyst owns the physical plan: leaf stats joins are broadcast; the
AND/OR algebra is ordinary equi-join/union-agg so AQE can reorder,
coalesce and skew-split at 100 TB. Boolean nodes never collect().
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from refimage_spark import dsl
from refimage_spark.operators.bm25 import Corpus, bm25_scores, topk

DEFAULT_LIMIT = 50  # reference default: src/refimage/dsl.py:82
DEFAULT_THRESHOLD = 0.0


def _tag_filter(corpus: Corpus, node: dsl.TagFilter) -> DataFrame:
    tags_lc = F.transform(F.col("tags"), lambda t: F.lower(t))
    want = F.array(*[F.lit(t) for t in node.tags])
    if node.mode == "all":
        pred = F.forall(want, lambda t: F.array_contains(tags_lc, t))
    else:
        pred = F.arrays_overlap(tags_lc, want)
    return corpus.docs.where(pred).select("doc_id", F.lit(0.0).alias("score"))


def compile_node(
    node: dsl.Node, corpus: Corpus, threshold: float, stats: DataFrame | None = None
) -> DataFrame:
    if isinstance(node, dsl.TextQuery):
        scored = bm25_scores(corpus, node.text, node.weight, stats=stats)
        if threshold > 0.0:
            scored = scored.where(F.col("score") >= F.lit(threshold))
        return scored
    if isinstance(node, dsl.TagFilter):
        return _tag_filter(corpus, node)
    if isinstance(node, dsl.And):
        kids = [compile_node(c, corpus, threshold, stats) for c in node.children]
        acc = kids[0].select("doc_id", F.col("score").alias("s0"))
        for i, k in enumerate(kids[1:], start=1):
            acc = acc.join(
                k.select("doc_id", F.col("score").alias(f"s{i}")), "doc_id"
            )
        total = reduce(lambda a, b: a + b, [F.col(f"s{i}") for i in range(len(kids))])
        return acc.select("doc_id", total.alias("score"))
    if isinstance(node, dsl.Or):
        kids = [compile_node(c, corpus, threshold, stats) for c in node.children]
        return (
            reduce(DataFrame.unionByName, kids)
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )
    if isinstance(node, dsl.Not):
        base = compile_node(node.base, corpus, threshold, stats)
        excl = compile_node(node.exclude, corpus, threshold, stats)
        return base.join(excl.select("doc_id"), "doc_id", "left_anti")
    raise TypeError(f"unknown node {node!r}")


def search(
    corpus: Corpus,
    query: str,
    limit: int = DEFAULT_LIMIT,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Parse + compile + rank: the rebuild of POST /search/dsl
    (/root/reference/src/refimage/api.py:494-540, fixed semantics).

    ONE corpus-stats DataFrame is shared by every text leaf: the leaves'
    broadcast subtrees are then plan-identical, so exchange reuse builds
    the one-row (n_docs, avgdl) aggregate once per query instead of
    once per leaf."""
    from refimage_spark.operators.bm25 import corpus_stats

    node = dsl.parse(query)
    scored = compile_node(node, corpus, threshold, stats=corpus_stats(corpus))
    return topk(scored, limit, 0.0)
