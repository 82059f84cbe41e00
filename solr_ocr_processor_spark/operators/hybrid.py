"""Hybrid lexical + vector retrieval: Reciprocal Rank Fusion.

The retrieval stack a reference user migrating to this engine ends up
running: BM25 over the inverted index (operators/score.py) for exact
lexical match, ANN over the embedding column (operators/ann.py) for
semantic recall, fused into one ranking. RRF (Cormack et al.; what
Solr exposes via combining query stages and vector search ships as
`knn` + rerank) is the standard score-free fusion:

    rrf(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60

Rank-based fusion needs no score calibration between BM25 logits and
cosines — which is why it is the default in production hybrid stacks.

Spark-first shape: each leg is already a TakeOrderedAndProject top-n
(n = fusion window, corpus-size-independent); ranking the two n-row
lists is a window over n rows, the fusion itself a full-outer join of
two n-row frames — driver-scale work after two index probes, the same
"probe then fuse a bounded window" discipline as rerank_topk.

Determinism: ranks are total orders ((score DESC, doc_id ASC) /
(cos DESC, id ASC)); each fused score is 1/(c+r1) + 1/(c+r2) — a
fixed-shape two-term IEEE sum both engines evaluate identically
(no data-order dependence), rounded to 6dp like every score surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import numpy as np

from ..config import DEFAULT, IndexConfig
from .ann import _dot_expr, _norm_expr
from .build import Index
from .score import bm25_topk

RRF_C = 60  # the constant from the original RRF paper; Solr's default


def rrf_fusion_topk(
    spark: SparkSession,
    index: Index,
    embs: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    window: int = 50,
    c: int = RRF_C,
    cfg: IndexConfig = DEFAULT,
) -> DataFrame:
    """Fuse BM25 top-``window`` and cosine top-``window`` by RRF and
    return the top ``k``: (doc_id, conv_id, rrf_score, lex_rank,
    vec_rank) — NULL rank when a doc appears in only one list.

    Embedding ids join to lexical doc identity through the corpus key
    rule (vec_id == source doc_id -> conv_id = 'c' || lpad(id, 8)),
    the same dimension bridge as query.join_topk.
    """
    if k > window:
        raise ValueError(f"k={k} must be <= fusion window={window}")
    # Both legs rank over their UNROUNDED scores with id tie-breaks —
    # the same total order every top-k surface in this engine cuts by
    # (and the oracle replays). The rank window runs over the already
    # TakeOrderedAndProject-cut `window` rows, never the corpus.
    lex = bm25_topk(spark, index, query, k=window, cfg=cfg).select(
        "conv_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("lex_rank"),
    )
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    sim = embs.select(
        F.col("vec_id").alias("id"),
        (_dot_expr("embedding", query_vec) / (_norm_expr("embedding") * F.lit(qn))).alias(
            "cos"
        ),
    )
    vec = (
        sim.orderBy(F.desc("cos"), F.asc("id"))
        .limit(window)
        .select(
            F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
                "conv_id"
            ),
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("id")))
            .cast("long")
            .alias("vec_rank"),
        )
    )
    fused = lex.join(vec, "conv_id", "full_outer").select(
        "conv_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(c) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    # Cut to k and COLLECT the fused page (k rows of driver traffic —
    # the CLI's already-collected-hit-list discipline), then resolve
    # doc ids via an isin-pruned point read of doc_meta: the predicate
    # pushes into the parquet scan, so resolution is a k-row probe.
    # Broadcasting doc_meta here would ship the corpus-sized dimension
    # to every executor; joining it lazily would re-execute both legs.
    page = fused.orderBy(F.desc("rrf_score"), F.asc("conv_id")).limit(k).collect()
    top_fused = spark.createDataFrame(
        [(r["conv_id"], r["lex_rank"], r["vec_rank"], r["rrf_score"]) for r in page],
        "conv_id string, lex_rank long, vec_rank long, rrf_score double",
    )
    keys = [r["conv_id"] for r in page]
    doc_ids = index.doc_meta.where(F.col("conv_id").isin(keys)).select(
        "doc_id", "conv_id"
    )
    return (
        top_fused.join(F.broadcast(doc_ids), "conv_id", "left")
        .orderBy(F.desc("rrf_score"), F.asc("conv_id"))
        .select("doc_id", "conv_id", "rrf_score", "lex_rank", "vec_rank")
    )


def blend_fusion_topk(
    spark: SparkSession,
    index: Index,
    embs: DataFrame,
    query: str,
    query_vec: list[float],
    alpha: float = 0.5,
    k: int = 10,
    window: int = 50,
    cfg: IndexConfig = DEFAULT,
) -> DataFrame:
    """Hybrid fusion by CONVEX SCORE COMBINATION — the other standard
    next to :func:`rrf_fusion_topk`: min-max normalize each leg's
    top-``window`` scores to [0, 1] inside its own window, then

        blend(d) = alpha * norm_bm25(d) + (1 - alpha) * norm_cos(d)

    (what Weaviate/Vespa-style hybrid `alpha` exposes; Solr users
    build it with two query stages). Score-based blending preserves
    MARGIN information RRF throws away — a runaway best lexical hit
    stays runaway — at the price of the normalization window; both
    fusions share the probe-then-fuse-a-bounded-window plan.

    A doc missing from a leg contributes 0 from that leg; a
    degenerate window (max == min) normalizes to 1.0 for all its
    docs. Returns (doc_id, conv_id, blend_score, norm_lex, norm_vec)
    ordered (blend_score desc, conv_id asc), scores rounded 6 dp.

    Plan: each leg is a TakeOrderedAndProject top-``window``; min/max
    are 1-row aggregates of those ``window`` rows (broadcast back);
    the fusion is a full-outer join of two ``window``-row frames and
    doc-id resolution is the k-row isin point-read — identical
    discipline to RRF, corpus-size-independent after the two probes."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if k > window:
        raise ValueError(f"k={k} must be <= fusion window={window}")
    lex = bm25_topk(spark, index, query, k=window, cfg=cfg).select(
        "conv_id", "score"
    )
    lb = lex.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    )
    nlex = lex.crossJoin(F.broadcast(lb)).select(
        "conv_id",
        F.when(
            F.col("hi") > F.col("lo"),
            (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo")),
        )
        .otherwise(F.lit(1.0))
        .alias("norm_lex"),
    )
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    sim = embs.select(
        F.col("vec_id").alias("id"),
        (
            _dot_expr("embedding", query_vec)
            / (_norm_expr("embedding") * F.lit(qn))
        ).alias("cos"),
    )
    vec = sim.orderBy(F.desc("cos"), F.asc("id")).limit(window).select(
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        "cos",
    )
    vb = vec.agg(F.min("cos").alias("lo"), F.max("cos").alias("hi"))
    nvec = vec.crossJoin(F.broadcast(vb)).select(
        "conv_id",
        F.when(
            F.col("hi") > F.col("lo"),
            (F.col("cos") - F.col("lo")) / (F.col("hi") - F.col("lo")),
        )
        .otherwise(F.lit(1.0))
        .alias("norm_vec"),
    )
    fused = nlex.join(nvec, "conv_id", "full_outer").select(
        "conv_id",
        F.round(
            F.lit(float(alpha)) * F.coalesce(F.col("norm_lex"), F.lit(0.0))
            + F.lit(1.0 - float(alpha))
            * F.coalesce(F.col("norm_vec"), F.lit(0.0)),
            6,
        ).alias("blend_score"),
        F.round(F.coalesce(F.col("norm_lex"), F.lit(0.0)), 6).alias("norm_lex"),
        F.round(F.coalesce(F.col("norm_vec"), F.lit(0.0)), 6).alias("norm_vec"),
    )
    page = fused.orderBy(F.desc("blend_score"), F.asc("conv_id")).limit(k).collect()
    top_fused = spark.createDataFrame(
        [
            (r["conv_id"], r["blend_score"], r["norm_lex"], r["norm_vec"])
            for r in page
        ],
        "conv_id string, blend_score double, norm_lex double, norm_vec double",
    )
    keys = [r["conv_id"] for r in page]
    doc_ids = index.doc_meta.where(F.col("conv_id").isin(keys)).select(
        "doc_id", "conv_id"
    )
    return (
        top_fused.join(F.broadcast(doc_ids), "conv_id", "left")
        .orderBy(F.desc("blend_score"), F.asc("conv_id"))
        .select("doc_id", "conv_id", "blend_score", "norm_lex", "norm_vec")
    )


def passage_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    size: int = 64,
    stride: int = 48,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Passage-level retrieval with maxP aggregation — the BERT-era
    recipe (Dai & Callan 2019) the RAG stack standardized on: score
    sliding-window PASSAGES (:func:`operators.split.chunk_overlap`)
    as the retrieval unit, then rank each document by its BEST
    passage. Long documents stop winning on accumulated length and
    the returned (tok_start, chunk_idx) IS the retrieval locator —
    the passage a RAG pipeline stuffs into context, the same
    coordinates-not-content contract as the engine's highlight
    offsets.

    BM25 statistics are computed over the PASSAGE collection (N =
    number of passages, dl = passage length, df = passages containing
    the term — the standard passage-index formulation). Query terms
    are the engine's [a-z0-9]+ lowercase analysis. Returns (doc_id,
    chunk_idx, tok_start, score): the winning passage per doc for the
    top-k docs, ordered (score desc, doc_id asc); score rounded 6 dp
    BEFORE the per-doc argmax and the cut, ties between a doc's
    passages by chunk_idx asc.

    Plan: chunking is the map-only projection; passage stats are one
    aggregate each (scalar + |Q|-row broadcast); the per-doc argmax is
    a max(struct) aggregate — no window over the corpus; the cut
    lowers to TakeOrderedAndProject."""
    import re as _re

    from .split import chunk_overlap

    qterms = sorted(set(_re.findall(r"[a-z0-9]+", query.lower())))
    if not qterms:
        raise ValueError(f"query {query!r} has no analyzable terms")
    ch = chunk_overlap(docs, size=size, stride=stride)
    tok = ch.select(
        "doc_id",
        "chunk_idx",
        "tok_start",
        "n_tokens",
        F.explode(F.split("chunk_text", " ")).alias("term"),
    )
    stats = ch.agg(
        F.count(F.lit(1)).alias("n_chunks"), F.avg("n_tokens").alias("avgdl")
    )
    tf = (
        tok.where(F.col("term").isin(qterms))
        .groupBy("doc_id", "chunk_idx", "tok_start", "n_tokens", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dft.crossJoin(F.broadcast(stats)).select(
        "term",
        "avgdl",
        F.log(
            F.lit(1.0)
            + (F.col("n_chunks") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("n_tokens") / F.col("avgdl"))
        )
    )
    # sorted term fold (the sorted_term_fold contract): the per-passage
    # score is bit-identical on every partitioning
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select("doc_id", "chunk_idx", "tok_start", "term", contrib.alias("c"))
        .groupBy("doc_id", "chunk_idx", "tok_start")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["c"],
                ),
                6,
            ).alias("score")
        )
    )
    # per-doc argmax without a corpus window: lexicographic max over
    # (score, -chunk_idx) picks best score, ties to the SMALLEST
    # chunk_idx; chunk_idx is unique per doc so later fields never
    # decide — they just ride along
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("chunk_idx")).alias("nci"),
                F.col("tok_start"),
            )
        ).alias("w")
    )
    return (
        best.select(
            "doc_id",
            (-F.col("w.nci")).cast("int").alias("chunk_idx"),
            F.col("w.tok_start").cast("int").alias("tok_start"),
            F.col("w.score").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
