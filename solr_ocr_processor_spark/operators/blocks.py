"""SPIMI-style compressed posting-block index (M2).

The capability Lucene's segment writer performed for the reference
(delegated at app/process/solr.go:171-202): turn (term, doc) postings
into compressed, skippable blocks with score-upper-bound metadata.

Layout
------
Every posting block covers ONE term within ONE doc-id range
(``range_id = doc_id // cfg.range_size``) and at most
``cfg.block_size`` documents:

    blocks(term, range_id, block_id, first_doc, last_doc, n_docs,
           sum_tf, max_tfnorm, max_score,
           doc_ids BINARY,   -- delta + varint gaps (sorted doc ids)
           tfs BINARY,       -- varint
           dls BINARY,       -- varint (doc lengths, scoring-local)
           positions BINARY) -- per-doc delta + varint token positions

Why range alignment instead of salting: the dataflow is one shuffle,
``groupBy(term, range_id)``, and a (term, range) group can never hold
more than ``range_size`` postings — a stopword appearing in every doc
is split into ``n_docs / range_size`` independent groups. That removes
hot-term skew *structurally* (SURVEY §4.2-1 proposed salting + merge;
range alignment achieves the same bound with no second pass, and the
ranges double as the WAND pruning/skip unit at query time).

Carrying ``dls`` inside the block denormalizes doc length into the
index (≈1 varint byte per posting) so the scorer never joins doc_meta
on the hot path — at 10^12 turns that join would shuffle the posting
table on doc_id every query.

``max_score = idf(N, df) * max(tfnorm)`` over the block is the
block-max WAND bound (SURVEY Q9); it upper-bounds any document's
contribution from this term within the block.

At cluster scale the blocks table is written to Iceberg partitioned by
``bucket(term)`` and sorted by (term, range_id) — query-side term
lookups prune to a handful of files. Locally it stays a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT, IndexConfig
from ..functions.bm25 import tf_norm
from ..functions.codec import delta_encode, encode_positions, varint_encode
from .build import Index

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("range_id", T.LongType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("max_tfnorm", T.DoubleType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), False),
    ]
)


@dataclass
class BlockIndex:
    blocks: DataFrame      # compressed posting blocks (schema above)
    term_stats: DataFrame  # term, df, cf  (the "dictionary")
    doc_meta: DataFrame    # doc_id, conv_id, dl, ...
    n_docs: int
    avgdl: float
    cfg: IndexConfig


def _make_block_builder(block_size: int, avgdl: float, k1: float, b: float):
    """Grouped-map encoder: one (term, range_id) group of FLAT token
    rows (doc_id, token_pos, dl) in, block rows out. Per-doc grouping
    happens here, vectorized (lexsort + run boundaries) — never as a
    JVM collect_list (list columns cost ~10x in Arrow<->JVM)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iat[0]
        range_id = int(pdf["range_id"].iat[0])
        dids = pdf["doc_id"].values.astype(np.int64)
        toks = pdf["token_pos"].values.astype(np.int64)
        dl_all = pdf["dl"].values.astype(np.int64)
        order = np.lexsort((toks, dids))
        dids, toks, dl_all = dids[order], toks[order], dl_all[order]
        # run boundaries -> per-doc postings
        bound = np.flatnonzero(np.concatenate(([True], dids[1:] != dids[:-1])))
        doc_ids = dids[bound]
        dls = dl_all[bound]
        tfs = np.diff(np.concatenate((bound, [dids.size])))
        rows = []
        for bi, lo in enumerate(range(0, len(doc_ids), block_size)):
            hi = min(lo + block_size, len(doc_ids))
            d, t, l = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
            flat_pos = toks[bound[lo] : bound[hi] if hi < len(doc_ids) else dids.size]
            rows.append(
                {
                    "term": term,
                    "range_id": range_id,
                    "block_id": bi,
                    "first_doc": int(d[0]),
                    "last_doc": int(d[-1]),
                    "n_docs": int(hi - lo),
                    "sum_tf": int(t.sum()),
                    "max_tfnorm": float(np.max(tf_norm(t, l, avgdl, k1, b))),
                    "doc_ids": delta_encode(d.astype(np.uint64)),
                    "tfs": varint_encode(t.astype(np.uint64)),
                    "dls": varint_encode(l.astype(np.uint64)),
                    "positions": encode_positions(t, flat_pos),
                }
            )
        return pd.DataFrame(rows)

    return build


def build_block_index(index: Index, cfg: IndexConfig = DEFAULT) -> BlockIndex:
    """Compress an M1 postings index into posting blocks.

    One shuffle: groupBy(term, range_id) — every group is bounded by
    ``range_size`` postings regardless of term frequency (see module
    docstring), then applyInPandas encodes the blocks with the numpy
    codec. No collect, no driver-side state beyond the 3 corpus
    scalars.
    """
    crow = index.corpus.first()
    n_docs, avgdl = int(crow["n_docs"]), float(crow["avgdl"])

    flat = index.tokens.withColumn(
        "range_id", (F.col("doc_id") / F.lit(cfg.range_size)).cast("long")
    ).select("term", "range_id", "doc_id", "token_pos", "dl")
    builder = _make_block_builder(cfg.block_size, avgdl, cfg.k1, cfg.b)
    blocks = flat.groupBy("term", "range_id").applyInPandas(builder, BLOCK_SCHEMA)

    return BlockIndex(
        blocks=blocks,
        term_stats=index.term_stats,
        doc_meta=index.doc_meta,
        n_docs=n_docs,
        avgdl=avgdl,
        cfg=cfg,
    )
