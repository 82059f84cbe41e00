"""Facet counts over query matches — the Solr ``facet=true`` analog.

Solr returns, next to the hit list, a histogram of the MATCHING
documents bucketed by a field (field facets / range facets). The
reference's delegated Solr surface carries that capability for every
query it forwards (app/process/solr.go:100-124 queries a stored core
whose full response surface includes faceting). Here: a range facet
over document length (``dl`` — tokens per doc), the doc attribute the
posting rows already carry.

Plan shape (scale-first):

1. dictionary pre-filter the postings to the query terms (``isin`` →
   parquet row-group pruning) — only matching posting rows are read;
2. ONE hash aggregation per doc_id dedupes multi-term matches
   (map-side partial combine; dl is constant per doc so ``max`` is
   exact);
3. bucket + count — the second aggregation's input is one row per
   matching doc and its output is |buckets| rows, so the final
   shuffle moves a histogram, not a corpus.

No doc_meta join: ``dl`` rides on the posting rows precisely so query
operators never touch the doc table before top-k/aggregation
(late-materialization discipline, operators/score.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..functions.tokenizer import query_terms
from .build import Index
from .score import _suppress


def facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Range-facet histogram of the docs matching ANY query term
    (Solr's default OR semantics for ``q``): (bucket, n_docs) with
    ``bucket = floor(dl / width)``, ordered by bucket ASC.
    ``exclude_docs`` (tombstones) anti-joins before the bucket count —
    Solr facets likewise never count deleted docs."""
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([], "bucket long, n_docs long")
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    return (
        matched.select(
            F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("bucket")
    )
