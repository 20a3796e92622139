"""Metadata ops: pagination consistency, sort whitelist, hydrate join."""

import pytest
from pyspark.sql import functions as F

from refimage_spark.operators import metadata as M


def test_pagination_partitions_cleanly(spark, documents):
    total = documents.count()
    seen = []
    off = 0
    while True:
        page = M.list_documents(documents, limit=7, offset=off, sort_by="n_chars",
                                sort_order="desc").collect()
        if not page:
            break
        seen += [r.doc_id for r in page]
        off += 7
    assert len(seen) == total
    assert len(set(seen)) == total  # no overlap, no gaps


def test_sort_whitelist(spark, documents):
    with pytest.raises(ValueError):
        M.list_documents(documents, sort_by="__proto__")
    with pytest.raises(ValueError):
        M.list_documents(documents, sort_order="sideways")


def test_tag_filter_any(spark, documents):
    got = M.list_documents(documents, limit=10**6, tags_filter=["EN"]).collect()
    want = documents.where(F.lower("lang") == "en").count()
    assert len(got) == want


def test_hydrate_equals_point_lookups(spark, documents):
    top = documents.select("doc_id").limit(5).withColumn("score", F.lit(1.0))
    out = M.hydrate(top, documents, keep=["lang", "n_chars"]).collect()
    assert len(out) == 5
    assert set(out[0].asDict()) == {"doc_id", "lang", "n_chars", "score"}


def test_parse_tags(spark):
    df = spark.createDataFrame([("a, b ,,c ",), ("",)], ["raw"])
    got = [r.tags for r in df.select(M.parse_tags("raw").alias("tags")).collect()]
    assert got == [["a", "b", "c"], []]


def test_doc_terms_forward_lookup(spark, documents):
    import collections
    from refimage_spark.tokenizer import py_tokens

    row = documents.where("doc_id = 7").head()
    want = collections.Counter(py_tokens(row.text))
    got = {r.term: r.tf for r in M.doc_terms(documents, 7).collect()}
    assert got == dict(want)
