"""Text analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token counting,
and document fingerprinting — all pure built-in-function DataFrame ops
(JVM codegen, no UDFs), each with an exact SQL oracle.

At 100 TB these are map-only passes over the corpus scan: no shuffle at
all, so they pipeline into the same stage as the parquet read and come
essentially for free next to the index build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from refimage_spark.tokenizer import spark_tokens

# tiny pinned stopword sets (lowercase) — parity-tested vs the SQL oracle
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic argmax tiebreak
MIN_LANG_RATIO = 0.02


def _ratio_in(tokens: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(words)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def token_counts(documents: DataFrame) -> DataFrame:
    toks = spark_tokens("text")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """md5 over the normalized token stream — a canonical-form fingerprint
    robust to case/punctuation/whitespace variance (vs the reference's raw
    byte SHA-256, src/refimage/storage.py:130-138)."""
    toks = spark_tokens("text")
    return documents.select(
        "doc_id", F.md5(F.concat_ws(" ", toks)).alias("fingerprint")
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, pred_ratio) — argmax stopword-ratio with the
    pinned LANG_PRIORITY tiebreak; 'und' (undetermined) below MIN_LANG_RATIO."""
    toks = spark_tokens("text")
    ratios = {lg: _ratio_in(toks, ws) for lg, ws in STOPWORDS.items()}
    best = F.greatest(*[ratios[lg] for lg in LANG_PRIORITY])
    pred = F.lit("und")
    for lg in reversed(LANG_PRIORITY):
        pred = F.when(
            (ratios[lg] == best) & (best >= MIN_LANG_RATIO), F.lit(lg)
        ).otherwise(pred)
    return documents.select(
        "doc_id", pred.alias("pred_lang"), F.round(best, 6).alias("pred_ratio")
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, quality) in [0,1]: length saturation + lexical diversity +
    alpha ratio + stopword presence. Pinned weights; round(…,6) for oracle
    hash parity."""
    toks = spark_tokens("text")
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1)).cast("double")
    length_part = F.least(n.cast("double") / F.lit(200.0), F.lit(1.0))
    uniq_part = F.size(F.array_distinct(toks)) / n1
    alpha_part = F.size(
        F.filter(toks, lambda t: t.rlike("^[a-z]+$"))
    ) / n1
    stop_part = F.least(
        _ratio_in(toks, STOPWORDS["en"]) * F.lit(10.0), F.lit(1.0)
    )
    q = (
        F.lit(0.3) * length_part
        + F.lit(0.3) * uniq_part
        + F.lit(0.2) * alpha_part
        + F.lit(0.2) * stop_part
    )
    return documents.select("doc_id", F.round(q, 6).alias("quality"))
