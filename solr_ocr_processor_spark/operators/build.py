"""Inverted-index build.

The capability Solr performed for the reference (Lucene segment build,
delegated at app/process/solr.go:171-202 where pages are POSTed per
document): tokenize -> positional postings -> compressed blocks with
max-score metadata.

Two layers:

- ``build_postings`` (M1): the **flat positional token table**
  ``tokens(doc_id, token_pos, term, char_start, char_end, dl)`` plus
  corpus stats. This IS the positional index in columnar form — one
  row per token occurrence, doc length denormalized on. There is
  deliberately NO collect_list / array column anywhere: list columns
  cost ~10x in Arrow->JVM conversion and grouping into per-doc arrays
  is work the block encoder does vectorized in numpy anyway. Query
  operators filter by term FIRST (dictionary pre-filter), so the flat
  layout never forces a full-width scan at query time; at rest the
  table is written term-bucketed so term filters prune files.

- ``build_block_index`` (operators/blocks.py, M2): compressed posting
  BLOCKS — delta+varint doc-id gaps, tf/dl/position streams, per-block
  max_score for block-max WAND — built straight from the flat table
  with one groupBy(term, range_id) shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..functions.tokenizer import tokenize_turns
from ..plans.materialize import Materialized, materialize_docs


@dataclass
class Index:
    tokens: DataFrame     # doc_id, token_pos, term, char_start, char_end, dl
    doc_meta: DataFrame   # doc_id, conv_id, dl, n_turns, n_chars [, doc_text if full]
    term_stats: DataFrame # term, df, cf
    corpus: DataFrame     # single row: n_docs, avgdl, total_tokens
    mat: Materialized

    @property
    def postings(self) -> DataFrame:
        """(term, doc_id, tf, dl) — classic posting rows, derived on
        demand. Callers that can pre-filter by term should filter
        ``tokens`` first instead (see bm25_scores)."""
        return self.tokens.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.first("dl").alias("dl"),
        )


def build_postings(
    transcripts: DataFrame,
    cfg: IndexConfig = DEFAULT,
    doc_map: DataFrame | None = None,
) -> Index:
    mat = materialize_docs(
        transcripts, doc_map, with_text=(cfg.index_type == "full")
    )
    # docs feeds doc_meta; tokens feed blocks, dl, and stats. Persist
    # both hubs so each subtree runs once.
    mat.docs.persist()
    tokens = tokenize_turns(mat.turns, cfg).persist()

    # Doc lengths in tokens — dl is constant per doc on token rows.
    doc_len = tokens.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    doc_cols = ["doc_id", "conv_id", "n_turns", "n_chars"]
    if cfg.index_type == "full":
        doc_cols.append("doc_text")  # inline text (reference "full" indexing)
    doc_meta = mat.docs.select(*doc_cols).join(doc_len, "doc_id", "left").fillna(
        {"dl": 0}
    )

    # df/cf per term: two-level aggregation, both with map-side partial
    # combine; only (term, doc_id) pairs shuffle, never positions.
    per_doc = tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    term_stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )

    # Corpus stats WITHOUT the doc_len shuffle: sum(dl over docs) ==
    # count(token rows) and n_docs comes from the (much smaller) docs
    # frame, so avgdl needs only two counts — same longs, same double
    # division, bit-identical value. This keeps the per-doc-id shuffle
    # (doc_len above) off the block builder's critical path: its DAG
    # pulls corpus for the 3 scalars but only scorers pull doc_meta.
    corpus = (
        mat.docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(tokens.agg(F.count(F.lit(1)).cast("long").alias("total_tokens")))
        .select(
            "n_docs",
            "total_tokens",
            (F.col("total_tokens") / F.col("n_docs")).alias("avgdl"),
        )
    )

    return Index(
        tokens=tokens,
        doc_meta=doc_meta,
        term_stats=term_stats,
        corpus=corpus,
        mat=mat,
    )
