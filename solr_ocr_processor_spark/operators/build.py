"""Inverted-index build.

The capability Solr performed for the reference (Lucene segment build,
delegated at app/process/solr.go:171-202 where pages are POSTed per
document): tokenize -> posting lists with positions -> compressed
blocks with max-score metadata.

Two layers:

- ``build_postings`` (M1): plain DataFrame postings
  (term, doc_id, tf, positions[]) + corpus stats. 100% Catalyst:
  one shuffle on (term, doc_id) with map-side partial aggregation.
  This layer is the correctness spine — the oracle-checked queries
  run on it.

- ``build_index`` (M2): SPIMI-style compressed posting BLOCKS —
  delta+varint doc-id gaps, per-block max_score for block-max WAND,
  hot-term salting — written as a parquet/Iceberg table. This is the
  scale path: postings for one term are split into blocks of
  ``cfg.block_size`` docs, so no single task ever holds a stopword's
  full posting list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..functions.tokenizer import tokenize_docs
from ..plans.materialize import Materialized, materialize_docs


@dataclass
class Index:
    postings: DataFrame   # term, doc_id, tf, positions array<struct<token_pos,char_start,char_end>>
    doc_meta: DataFrame   # doc_id, conv_id, dl, n_turns, n_chars [, doc_text if full]
    term_stats: DataFrame # term, df, cf
    corpus: DataFrame     # single row: n_docs, avgdl, total_tokens
    mat: Materialized


def build_postings(
    transcripts: DataFrame,
    cfg: IndexConfig = DEFAULT,
    doc_map: DataFrame | None = None,
) -> Index:
    mat = materialize_docs(transcripts, doc_map)
    tokens = tokenize_docs(mat.docs, cfg)

    # (term, doc_id) aggregation: Spark hash-agg gives partial (map-side)
    # combine before the shuffle — the classic SPIMI "local dictionaries"
    # effect without custom code. Positions kept sorted by token_pos.
    postings = tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.array_sort(
            F.collect_list(F.struct("token_pos", "char_start", "char_end"))
        ).alias("positions"),
    )

    # Doc lengths in tokens (dl) — BM25 length normalization input.
    doc_len = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    doc_cols = ["doc_id", "conv_id", "n_turns", "n_chars"]
    if cfg.index_type == "full":
        doc_cols.append("doc_text")  # inline text (reference "full" indexing)
    doc_meta = mat.docs.select(*doc_cols).join(doc_len, "doc_id", "left").fillna(
        {"dl": 0}
    )

    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )

    corpus = doc_meta.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    return Index(
        postings=postings,
        doc_meta=doc_meta,
        term_stats=term_stats,
        corpus=corpus,
        mat=mat,
    )
