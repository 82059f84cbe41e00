"""Round-3 continuation surfaces (batch kk): PageRank power
iteration, lexical topic segmentation."""

from __future__ import annotations

import datetime

from solr_ocr_processor_spark.operators.conversation import topic_segments
from solr_ocr_processor_spark.operators.graph import pagerank
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def _g(spark, pairs, n):
    e = spark.createDataFrame(pairs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    return e, nodes


def test_pagerank_star_center_wins(spark):
    # everyone links to 0; 0 links to 1. The 0<->1 two-cycle makes
    # finite power iteration oscillate between the pair, so assert the
    # structural facts: the cycle pair dominates the leaves, and the
    # symmetric leaves tie exactly.
    e, nodes = _g(spark, [(1, 0), (2, 0), (3, 0), (0, 1)], 4)
    out = pagerank(e, nodes, iters=10, k=4).collect()
    assert {out[0]["node"], out[1]["node"]} == {0, 1}
    ranks = {r["node"]: r["rank"] for r in out}
    assert min(ranks[0], ranks[1]) > max(ranks[2], ranks[3])
    assert ranks[2] == ranks[3]  # symmetric leaves tie exactly


def test_pagerank_mass_approximately_conserved(spark):
    # a cycle has no dangling leakage: ranks sum to ~1 and are uniform
    e, nodes = _g(spark, [(0, 1), (1, 2), (2, 0)], 3)
    out = pagerank(e, nodes, iters=10, k=3).collect()
    ranks = [r["rank"] for r in out]
    assert abs(sum(ranks) - 1.0) < 1e-4
    assert max(ranks) - min(ranks) < 1e-9  # symmetric cycle -> uniform


def test_pagerank_hand_one_iteration(spark):
    # one iteration from uniform on 0->1: r1(1) = 0.15/2 + 0.85*(0.5)
    e, nodes = _g(spark, [(0, 1)], 2)
    out = {r["node"]: r["rank"] for r in pagerank(e, nodes, iters=1, k=2).collect()}
    assert out[1] == round((1.0 - 0.85) / 2 + 0.85 * 0.5, 6)
    assert out[0] == round((1.0 - 0.85) / 2, 6)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", x, None, TS) for (c, t, x) in rows], TRANSCRIPT_SCHEMA
    )


def test_topic_segments_boundary_detection(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "spark shuffle merge join"),
            ("a", 1, "spark shuffle merge sort"),  # high overlap
            ("a", 2, "banana smoothie recipe blender"),  # topic shift
            ("a", 3, "banana smoothie recipe fruit"),
        ],
    )
    out = topic_segments(t, tau=0.2).collect()
    r = out[0]
    assert r["n_turns"] == 4
    assert r["n_segments"] == 2  # one boundary at the shift
    assert r["mean_jacc"] is not None


def test_topic_segments_single_turn_and_empty(spark):
    t = _tr(spark, [("a", 0, "only turn"), ("b", 0, "x"), ("b", 1, "   ")])
    got = {r["conv_id"]: r for r in topic_segments(t, tau=0.2).collect()}
    assert got["a"]["n_segments"] == 1 and got["a"]["mean_jacc"] is None
    # whitespace turn dropped BEFORE segmentation -> b has 1 turn
    assert got["b"]["n_turns"] == 1 and got["b"]["n_segments"] == 1


def test_topic_segments_identical_turns_one_segment(spark):
    t = _tr(spark, [("a", i, "same text every turn") for i in range(5)])
    out = topic_segments(t, tau=0.2).collect()[0]
    assert out["n_segments"] == 1
    assert out["mean_jacc"] == 1.0
