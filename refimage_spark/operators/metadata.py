"""Metadata-table operators — the rebuild of refimage's SQLite CRUD layer.

Reference: src/refimage/storage.py:283-437 (point lookup, paged list with
tag filter + whitelisted sort), :714-745 (stats rollup). All expressed as
Catalyst-native DataFrame ops: predicates push to the parquet/Iceberg scan,
pagination avoids a global sort via TakeOrdered when possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ≅ reference whitelist {created_at, filename, file_size} + default sort
# created_at DESC (src/refimage/storage.py:358,379-387): timestamp keys
# (warc_ts/created_at) are first-class sort columns here too
SORT_WHITELIST = {"doc_id", "n_chars", "lang", "source", "warc_ts", "created_at"}


def point_lookup(documents: DataFrame, doc_id: int) -> DataFrame:
    """S2: SELECT by primary key. On a sorted/bucketed table this prunes to
    near-one file via min/max stats."""
    return documents.where(F.col("doc_id") == F.lit(doc_id))


def list_documents(
    documents: DataFrame,
    limit: int = 20,
    offset: int = 0,
    tags_filter: list[str] | None = None,
    sort_by: str = "doc_id",
    sort_order: str = "asc",
) -> DataFrame:
    """S3/W4/W5: WHERE + ORDER + LIMIT/OFFSET.

    OFFSET needs a global row numbering; we keep the window keyed by the
    (whitelisted) sort column + doc_id tiebreak so the order is total and
    deterministic. For offset=0 Spark plans TakeOrderedAndProject.
    """
    if sort_by not in SORT_WHITELIST:
        raise ValueError(f"sort_by {sort_by!r} not in {sorted(SORT_WHITELIST)}")
    if sort_order not in ("asc", "desc"):
        raise ValueError("sort_order must be asc|desc")
    df = documents
    if tags_filter:
        tags = [t.lower() for t in tags_filter]
        doc_tags = F.array(F.lower("lang"), F.lower("source"))
        df = df.where(
            F.arrays_overlap(doc_tags, F.array(*[F.lit(t) for t in tags]))
        )
    key = F.col(sort_by).asc() if sort_order == "asc" else F.col(sort_by).desc()
    if offset <= 0:
        return df.orderBy(key, F.col("doc_id").asc()).limit(limit)
    w = Window.orderBy(key, F.col("doc_id").asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
        .drop("_rn")
    )


def stats_rollup(documents: DataFrame) -> DataFrame:
    """A1/A2/A3: corpus-level stats in one partial+final agg pass."""
    return documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.avg("n_chars").alias("avg_chars"),
    )


def update_metadata(
    documents: DataFrame, updates: DataFrame, set_cols: list[str]
) -> DataFrame:
    """UPDATE by id (reference update_metadata,
    src/refimage/storage.py:439-508): set the given attribute columns for
    the docs named in ``updates``; a NULL update value keeps the existing
    value (the reference's None-keeps-existing semantics); ids absent
    from ``documents`` are ignored (reference returns None).

    One broadcast left join + coalesce — the documents scan stays
    shuffle-free, so this is the expression to feed a MERGE INTO /
    dynamic-partition-overwrite write at cluster scale (the index-side
    twin is index.merge.update_doc_tags)."""
    u = updates.select(
        "doc_id", *[F.col(c).alias(f"_u_{c}") for c in set_cols]
    )
    out = documents.join(F.broadcast(u), "doc_id", "left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_u_{c}"), F.col(c)))
    return out.drop(*[f"_u_{c}" for c in set_cols])


def parse_tags(col) -> "F.Column":
    """F9 (reference src/refimage/api.py:822-824): comma-split a tag
    string, trim, drop empties — as one JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(c, ","), lambda t: F.trim(t)),
        lambda t: t != F.lit(""),
    )


def doc_terms(documents: DataFrame, doc_id: int) -> DataFrame:
    """S4 (reference get_embedding, src/refimage/storage.py:607-649): the
    forward-index lookup — one document's term vector (term, tf)."""
    from refimage_spark.tokenizer import spark_tokens

    return (
        documents.where(F.col("doc_id") == F.lit(doc_id))
        .select(F.explode(spark_tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def hydrate(results: DataFrame, documents: DataFrame, keep: list[str]) -> DataFrame:
    """P5: replace the reference's per-id point-lookup loop
    (src/refimage/api.py:575-588) with ONE join. The results side is tiny
    (top-k), so broadcast it and keep the documents scan shuffle-free."""
    return documents.join(F.broadcast(results), "doc_id").select(
        "doc_id", *keep, *[c for c in results.columns if c != "doc_id"]
    )
