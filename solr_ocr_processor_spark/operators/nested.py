"""Nested-document (block-join) queries — Solr's ``{!parent}`` /
``{!child}`` query parsers.

The reference's Solr core indexes one doc per OCR *page* and the
ingest loop posts pages under a shared item id
(app/handler/indexer.go:98-148, app/process/solr.go:171-202) — the
classic Lucene nested-block layout: children (pages / here: turns)
are separate index docs living next to their parent (item / here:
conversation). A user of the reference who asks Solr for
``{!parent which=...}text:term`` gets parents ranked by their
children's scores; ``{!child of=...}`` inverts it and returns the
children of matching parents.

Spark-first mapping:

- **Child index**: each non-empty turn is re-keyed as its own
  single-turn conversation (``conv_id#ordinal``) and fed through the
  UNCHANGED index build (operators/build.py) — exactly how Lucene
  block-join indexes children as ordinary docs. Turn-level dl / df /
  avgdl therefore come out of the same tested code path as the
  document index, and the child index is a build-once artifact
  (cached/persisted like the main index), not per-query work.
- **parent_topk**: BM25-score the children (broadcast idf join +
  hash agg — the standard scorer), resolve each hit's parent key by
  splitting the child conv_id, and aggregate child scores per parent
  with Solr's ``score=`` modes (max | sum | avg | min). ONE extra
  groupBy(parent) shuffle of only the *matching* children — at
  10^12 turns the shuffle carries the hit set, never the corpus.
- **child_expand**: children of the top-k parents of a *parent-level*
  query — the ``{!child}`` / expand-component read path. The parent
  top-k is k rows, so the child fetch is a broadcast semi-join
  against the turns table (late materialization, same discipline as
  lazy content resolution Q11).

Determinism: per-child scores use the shared sorted-term fold
(score.py::sorted_term_fold); cross-child ``sum``/``avg`` folds sort
by child key first — float addition order is pinned everywhere, so
ranks are identical across partitionings and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from .build import Index, build_postings
from .score import bm25_scores, bm25_topk

#: separator between parent conv_id and child ordinal in the child
#: index's conv_id key. The tokenizer strips non-alnum, so '#' can
#: never appear inside a real conv_id token stream; materialize's
#: dense doc ids sort by the full child key, keeping a parent's
#: children contiguous — the Lucene block layout, preserved.
CHILD_SEP = "#"


def child_transcripts(transcripts: DataFrame) -> DataFrame:
    """Re-key each turn as a single-turn conversation (a *child doc*).

    ``conv_id -> conv_id#<ordinal lpad 10>``, ``turn_idx -> 0``. Empty /
    whitespace-only turns are dropped here with the same predicate the
    materializer uses, so child ordinals equal the parent's dense
    ordinals (reference rule: skip-then-number,
    app/handler/indexer.go:98-148). Pad width 10 covers the full int32
    turn_idx domain — Spark's lpad TRUNCATES beyond the width, which
    would silently collide two ordinals into one child key.
    """
    return (
        transcripts.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            F.concat(
                F.col("conv_id"),
                F.lit(CHILD_SEP),
                F.lpad(F.col("turn_idx").cast("string"), 10, "0"),
            ).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )


def build_child_index(transcripts: DataFrame, cfg: IndexConfig = DEFAULT) -> Index:
    """Index turns as child docs — the block-join write side.

    Same build as the document index (build_postings), different doc
    unit. On a cluster both indexes share the ingest scan; the child
    build's extra cost is the one conv_id#ordinal hash partition its
    tokenizer pays (each child is one turn, so the per-conv ordinal
    window degenerates to a pass-through).
    """
    return build_postings(child_transcripts(transcripts), cfg)


_SCORE_MODES = ("max", "sum", "avg", "min")


def parent_topk(
    spark: SparkSession,
    child_index: Index,
    query: str,
    k: int = 10,
    mode: str = "max",
    cfg: IndexConfig = DEFAULT,
) -> DataFrame:
    """``{!parent score=<mode>}`` — rank parents by their children's
    BM25 scores.

    Returns (conv_id, score, n_child_hits) for the top-k parents;
    ties break by conv_id ASC. ``n_child_hits`` is the number of
    matching children (Solr exposes it via ``numFound`` on the child
    facet), aggregated in the SAME groupBy as the score.
    """
    if mode not in _SCORE_MODES:
        raise ValueError(f"mode must be one of {_SCORE_MODES}, got {mode!r}")
    scores = bm25_scores(spark, child_index, query, cfg)
    kids = scores.join(
        child_index.doc_meta.select("doc_id", "conv_id"), "doc_id"
    ).select(
        F.substring_index(F.col("conv_id"), CHILD_SEP, 1).alias("parent_id"),
        F.col("conv_id").alias("child_id"),
        "score",
    )
    if mode in ("max", "min"):
        score_agg = (F.max if mode == "max" else F.min)("score")
    else:
        # Deterministic cross-child fold: sort by child key before
        # summing (float addition order pinned, as everywhere else).
        fold = F.aggregate(
            F.array_sort(F.collect_list(F.struct("child_id", "score"))),
            F.lit(0.0),
            lambda acc, s: acc + s["score"],
        )
        score_agg = fold if mode == "sum" else fold / F.count(F.lit(1))
    parents = kids.groupBy("parent_id").agg(
        score_agg.alias("score"),
        F.count(F.lit(1)).cast("int").alias("n_child_hits"),
    )
    # Rank by the 6-dp-ROUNDED score, ties by parent id: turn-level
    # scoring produces wide exact-tie plateaus (fixed-width turns give
    # many children identical (tf, dl)), and the top-k boundary
    # regularly lands inside one. Engines that sum floats in parallel
    # (DuckDB's aggregate; Spark without the sorted fold) order such a
    # plateau by last-ulp noise, run-dependently — collapsing the key
    # to 6 dp before ranking makes the boundary pick identical on
    # every engine and every run, while raw scores stay in the output.
    return (
        parents.orderBy(F.desc(F.round(F.col("score"), 6)), F.asc("parent_id"))
        .limit(k)
        .select(F.col("parent_id").alias("conv_id"), "score", "n_child_hits")
    )


def child_expand(
    spark: SparkSession,
    index: Index,
    query: str,
    k: int = 5,
    cfg: IndexConfig = DEFAULT,
) -> DataFrame:
    """``{!child of=<all parents>}`` — the turns of the top-k parents
    of a *document-level* BM25 query (the expand-component read path).

    Returns (conv_id, ordinal, role, parent_score) for every non-empty
    turn of each winning parent. The parent top-k is k rows, so the
    child fetch broadcasts the winner keys against the turns table —
    no shuffle of the corpus.
    """
    top = bm25_topk(spark, index, query, k=k, cfg=cfg).select(
        "conv_id", F.col("score").alias("parent_score")
    )
    turns = index.mat.turns.select("conv_id", "ordinal", "role")
    return turns.join(F.broadcast(top), "conv_id").select(
        "conv_id", "ordinal", "role", "parent_score"
    )
