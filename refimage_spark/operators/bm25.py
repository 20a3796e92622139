"""BM25 retrieval as pure DataFrame algebra (the "naive oracle" form).

This is the declarative twin of the segment/WAND engine
(refimage_spark.index): same pinned scoring spec, expressed as
explode/join/groupBy so Catalyst owns the physical plan. It rebuilds
the reference's exact top-k scan (`VectorSearchEngine.search`,
/root/reference/src/refimage/search/__init__.py:202-266) with lexical
BM25 in place of cosine similarity.

Pinned spec (SURVEY.md §2.3 K6, §7.4):
    idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(d) = sum_t w_clause * idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    k1=1.2, b=0.75 ; total order (score desc, doc_id asc)

Scale notes (100 TB):
- query terms and their df-stats are tiny -> broadcast joins, never a
  shuffle of the postings side on the query path;
- the exploded-terms scan filters to query terms BEFORE any shuffle
  (predicate as early as possible; the groupBy that follows only sees
  matching postings);
- `orderBy(...).limit(k)` compiles to TakeOrderedAndProject — a
  per-partition bounded heap + driver merge, NOT a global sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from refimage_spark.tokenizer import BM25_B, BM25_K1, py_tokens, spark_tokens


@dataclass(frozen=True)
class Corpus:
    """A tokenized document collection ready for search.

    docs: DataFrame(doc_id long, tokens array<string>, dl int,
                    tags array<string>, ...metadata passthrough)
    """

    docs: DataFrame

    @staticmethod
    def from_documents(documents: DataFrame) -> "Corpus":
        """From the driver testdata `documents` table
        (doc_id, text, lang, source, n_chars); tags := {lang, source}.

        Deliberately NOT spread_small_scan'd: measured at sf0.1, the
        round-robin exchange + 32-task scheduling cost MORE than the
        single-partition explode saves (0.36s vs 0.43s for bm25_topk);
        real corpora scan as many partitions natively."""
        toks = spark_tokens("text")
        return Corpus(
            documents.select(
                "doc_id",
                toks.alias("tokens"),
                F.size(toks).alias("dl"),
                F.array("lang", "source").alias("tags"),
                "lang",
                "source",
                "n_chars",
            )
        )

    @staticmethod
    def from_pages(pages: DataFrame, text_col: str = "text") -> "Corpus":
        """From the Common-Crawl-style pages table. doc_id is assigned
        deterministically as row_number over url (SURVEY.md §2.7 F7) so
        ranks are reproducible across runs/parallelism. At 10^12 rows a
        single-partition window is not viable — the segment build
        (index/build.py) uses a two-level deterministic assignment
        instead; this form is for oracle-scale corpora."""
        from pyspark.sql import Window

        w = Window.orderBy("url")
        toks = spark_tokens(text_col)
        return Corpus(
            pages.select(
                F.row_number().over(w).cast("long").alias("doc_id"),
                toks.alias("tokens"),
                F.size(toks).alias("dl"),
                F.array("lang").alias("tags"),
                "url",
                "lang",
            )
        )


def postings(corpus: Corpus) -> DataFrame:
    """(term, doc_id, tf) — the logical inverted file."""
    return (
        corpus.docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def corpus_stats(corpus: Corpus) -> DataFrame:
    """(n_docs, avgdl) — one row."""
    return corpus.docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def term_df(corpus: Corpus, terms: list[str] | None = None) -> DataFrame:
    """(term, df) — df counts DISTINCT docs.

    With a term list, dedup-and-filter happens in ONE native expression
    BEFORE the explode: array_intersect(tokens, terms) yields the
    distinct tokens that are query terms, so Generate emits <=|terms|
    rows per doc instead of every distinct token (the previous
    explode(array_distinct)->filter shape exploded ~100 rows/doc to
    keep ~1). Without a list, array_distinct before the explode is
    still map-side dedup (no extra shuffle vs explode+distinct)."""
    if terms is not None:
        ex = corpus.docs.select(
            F.explode(
                F.array_intersect(
                    "tokens", F.array(*[F.lit(t) for t in terms])
                )
            ).alias("term")
        )
    else:
        ex = corpus.docs.select(
            F.explode(F.array_distinct("tokens")).alias("term")
        )
    return ex.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def _idf(df_col: Column, n_col: Column) -> Column:
    return F.log((n_col - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def bm25_scores(
    corpus: Corpus,
    query: str | list[str],
    weight: float = 1.0,
    stats: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score) for every doc matching >=1 query term.

    Physical shape: one scan of docs -> explode -> early filter on the
    (tiny) query-term set -> partial/final agg -> broadcast-join the
    one-row stats and the per-term df. No posting-side shuffle beyond
    the tf groupBy.
    """
    terms = py_tokens(query) if isinstance(query, str) else list(query)
    terms = list(dict.fromkeys(terms))  # unique, order-stable
    if not terms:
        return corpus.docs.select(
            "doc_id", F.lit(0.0).alias("score")
        ).where(F.lit(False))

    ex = corpus.docs.select("doc_id", "dl", F.explode("tokens").alias("term")).where(
        F.col("term").isin(terms)
    )
    tf = ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    # df is DERIVED FROM tf: the tf table has exactly one row per
    # (doc, term-present-in-doc), so count-over-window partitionBy(term)
    # IS count(DISTINCT doc) per term — bit-identical to the separate
    # term_df subquery, but it removes one full corpus scan (the
    # explode(array_distinct) subtree) and one broadcast-build job per
    # text leaf (guide §2.4: remove shuffles/passes outright). The
    # window exchange moves only the tiny tf rows.
    from pyspark.sql import Window

    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    # callers with several text leaves pass ONE shared stats DataFrame:
    # identical broadcast subtrees are then deduplicated by Spark's
    # exchange reuse instead of aggregating the corpus once per leaf
    if stats is None:
        stats = corpus_stats(corpus)
    scored = (
        with_df
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.lit(weight)
                * _idf(F.col("df"), F.col("n_docs"))
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    return scored


def topk(scored: DataFrame, k: int, threshold: float = 0.0) -> DataFrame:
    """threshold + total-order top-k. orderBy+limit => TakeOrdered (bounded
    per-partition heap, driver merge), not a global sort."""
    out = scored
    if threshold > 0.0:
        out = out.where(F.col("score") >= F.lit(threshold))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk(
    corpus: Corpus,
    query: str | list[str],
    k: int = 10,
    threshold: float = 0.0,
    weight: float = 1.0,
) -> DataFrame:
    return topk(bm25_scores(corpus, query, weight), k, threshold)
