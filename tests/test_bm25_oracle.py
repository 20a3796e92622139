"""BM25 DataFrame form vs an independent pure-Python/duckdb computation."""

import duckdb
import math

import pytest
from pyspark.sql import functions as F

from refimage_spark.operators.bm25 import Corpus, bm25_topk, corpus_stats, term_df
from refimage_spark.plans.compiler import search
from refimage_spark.tokenizer import BM25_B, BM25_K1, py_tokens


def _py_bm25(rows, query, k=10, weight=1.0):
    """Independent reference implementation (plain python)."""
    toks = {r["doc_id"]: py_tokens(r["text"]) for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    terms = list(dict.fromkeys(py_tokens(query)))
    out = {}
    for t in terms:
        df = sum(1 for tk in toks.values() if t in tk)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        for d, tk in toks.items():
            tf = tk.count(t)
            if tf:
                dl = len(tk)
                s = idf * tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
                out[d] = out.get(d, 0.0) + weight * s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


@pytest.fixture(scope="module")
def doc_rows(documents):
    return [r.asDict() for r in documents.collect()]


def test_bm25_matches_python_oracle(spark, documents, doc_rows):
    corpus = Corpus.from_documents(documents)
    for q in ["spark join", "fast scan", "window agg sort", "vector"]:
        got = bm25_topk(corpus, q, k=10).collect()
        want = _py_bm25(doc_rows, q, k=10)
        assert [(r.doc_id, pytest.approx(r.score, rel=1e-12)) for r in got] == [
            (d, pytest.approx(s, rel=1e-12)) for d, s in want
        ], q


def test_stats(spark, documents, doc_rows):
    corpus = Corpus.from_documents(documents)
    st = corpus_stats(corpus).collect()[0]
    toks = [py_tokens(r["text"]) for r in doc_rows]
    assert st.n_docs == len(toks)
    assert st.avgdl == pytest.approx(sum(map(len, toks)) / len(toks))
    dfs = {r.term: r.df for r in term_df(corpus, ["spark", "join"]).collect()}
    assert dfs["spark"] == sum(1 for t in toks if "spark" in t)


def test_dsl_and_or_not_semantics(spark, documents, doc_rows):
    corpus = Corpus.from_documents(documents)
    # AND = intersection with additive scores
    got = {r.doc_id: r.score for r in search(corpus, "spark AND join", limit=10000).collect()}
    a = dict(_py_bm25(doc_rows, "spark", k=10**9))
    b = dict(_py_bm25(doc_rows, "join", k=10**9))
    want = {d: a[d] + b[d] for d in a.keys() & b.keys()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # OR = union with summed scores
    got_or = {r.doc_id: r.score for r in search(corpus, "spark OR join", limit=10**6).collect()}
    want_or = {d: a.get(d, 0) + b.get(d, 0) for d in a.keys() | b.keys()}
    assert set(got_or) == set(want_or)
    # NOT = difference
    got_not = {r.doc_id for r in search(corpus, "spark NOT join", limit=10**6).collect()}
    assert got_not == a.keys() - b.keys()


def test_weight_and_threshold(spark, documents, doc_rows):
    corpus = Corpus.from_documents(documents)
    got = search(corpus, "vector^0.5", limit=10).collect()
    want = _py_bm25(doc_rows, "vector", k=10, weight=0.5)
    assert [(r.doc_id,) for r in got] == [(d,) for d, _ in want]
    assert got[0].score == pytest.approx(want[0][1], rel=1e-12)


def test_tag_filter(spark, documents):
    corpus = Corpus.from_documents(documents)
    got = {r.doc_id for r in search(corpus, "#en", limit=10**6).collect()}
    want = {r.doc_id for r in documents.where(F.col("lang") == "en").collect()}
    assert got == want
