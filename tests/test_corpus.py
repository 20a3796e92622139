"""Pages corpus: determinism, schema, extraction byte-identity, dups."""

from pyspark.sql import functions as F

from refimage_spark.functions.extract import extract_text, extract_text_py
from refimage_spark.sources.pages import generate_pages


def test_schema_and_determinism(spark):
    a = generate_pages(spark, 50, seed=42, partitions=4).collect()
    b = generate_pages(spark, 50, seed=42, partitions=7).collect()  # diff parallelism
    assert [r.url for r in a] != []
    ka = sorted((r.url, r.warc_ts, bytes(r.html), r.text, r.lang) for r in a)
    kb = sorted((r.url, r.warc_ts, bytes(r.html), r.text, r.lang) for r in b)
    assert ka == kb


def test_extraction_byte_identical(spark):
    df = generate_pages(spark, 200, seed=42, partitions=4)
    bad = (
        df.withColumn("ext", extract_text("html"))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extraction_golden_edge_cases():
    cases = [
        (b"<article>plain text</article>", "plain text"),
        (b"<article>a &amp; b</article>", "a & b"),
        (b"<article>a&#32;b</article>", "a b"),
        (b"<article><b>bold</b> word</article>", "bold word"),
        (b"<article>x<!-- hidden -->y</article>", "xy"),
        (b"<article>keep<script>var a=1;</script>this</article>", "keepthis"),
        (b"<article>s<style>.c{}</style>t</article>", "st"),
        (b"no article at all", "no article at all"),
    ]
    for raw, want in cases:
        assert extract_text_py(raw) == want, raw


def test_planted_duplicates(spark):
    df = generate_pages(spark, 500, seed=42, partitions=4).cache()
    n = df.count()
    n_url = df.select("url").distinct().count()
    n_html = df.select(F.sha2(F.col("html"), 256)).distinct().count()
    assert n == 500
    assert n_url < n  # url dups planted
    assert n_html < n_url  # content dups beyond url dups
    df.unpersist()
