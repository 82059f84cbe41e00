"""Round-3 continuation surfaces (batch ee): shortestPath() BFS with
min-parent tie-break, scoreNodes() idf-weighted gather, RLHF
preference-pair mining."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.conversation import preference_pairs
from solr_ocr_processor_spark.operators.graph import (
    score_nodes,
    shortest_path,
)
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------------------
# shortest_path
# ---------------------------------------------------------------------------


def test_shortest_path_basic_chain(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = shortest_path(e, 0, 3, max_depth=6).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_shortest_path_prefers_min_parent(spark):
    # two shortest paths to 3: 0->1->3 and 0->2->3; min-parent picks 1
    e = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    out = shortest_path(e, 0, 3, max_depth=4).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 0), (1, 1), (2, 3)]


def test_shortest_path_takes_true_shortcut(spark):
    # long chain 0->1->2->3->4 plus a direct edge 0->4: BFS depth wins
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)])
    out = shortest_path(e, 0, 4, max_depth=6).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 0), (1, 4)]


def test_shortest_path_unreachable_and_depth_cap(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert shortest_path(e, 0, 9, max_depth=6).count() == 0
    # node 3 is 3 hops out; a 2-hop cap must come back empty
    assert shortest_path(e, 0, 3, max_depth=2).count() == 0


def test_shortest_path_src_equals_dst(spark):
    e = _edges(spark, [(0, 1)])
    out = shortest_path(e, 0, 0, max_depth=3).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 0)]


def test_shortest_path_cycle_terminates(spark):
    e = _edges(spark, [(0, 1), (1, 0), (1, 2)])
    out = shortest_path(e, 0, 2, max_depth=5).collect()
    assert [(r["step"], r["node"]) for r in out] == [(0, 0), (1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# score_nodes
# ---------------------------------------------------------------------------


def test_score_nodes_idf_weighting(spark):
    # hub node 9 is reached by every root but has global indeg 4;
    # node 5 is reached once with indeg 1 -> higher idf per hit.
    e = _edges(
        spark,
        [(0, 9), (1, 9), (2, 9), (3, 9), (0, 5)],
    )
    roots = spark.createDataFrame([(0,), (1,), (2,), (3,)], "node long")
    out = score_nodes(e, roots, n_nodes=10, k=10).collect()
    got = {r["node"]: r for r in out}
    assert set(got) == {9, 5}
    assert got[9]["cnt"] == 4 and got[9]["indeg"] == 4
    assert got[5]["cnt"] == 1 and got[5]["indeg"] == 1
    assert got[5]["score"] == round(math.log(11 / 2), 6)
    assert got[9]["score"] == round(4 * math.log(11 / 5), 6)


def test_score_nodes_ordering_and_k(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    roots = spark.createDataFrame([(0,)], "node long")
    out = score_nodes(e, roots, n_nodes=6, k=3).collect()
    assert len(out) == 3
    # all scores equal -> node-asc tie-break
    assert [r["node"] for r in out] == [1, 2, 3]


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, t, r, x, None, TS) for (c, t, r, x) in rows], TRANSCRIPT_SCHEMA
    )


def test_preference_pairs_picks_extremes(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "user", "How do I sort?"),
            ("a", 1, "assistant", "use sort"),
            ("b", 0, "user", "how do  I sort?"),  # same prompt after norm
            ("b", 1, "assistant", "call the sort function with a key"),
            ("c", 0, "user", "HOW DO I SORT?"),
            ("c", 1, "assistant", "sort sort sort"),  # 1 distinct token
        ],
    )
    out = preference_pairs(t, min_replies=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_replies"] == 3
    assert r["chosen_conv"] == "b" and r["rejected_conv"] == "c"
    assert r["chosen_reward"] == 7 and r["rejected_reward"] == 1
    assert r["margin"] == 6


def test_preference_pairs_drops_zero_margin_and_singletons(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "user", "ping"),
            ("a", 1, "assistant", "pong"),
            ("b", 0, "user", "ping"),
            ("b", 1, "assistant", "pang"),  # same reward (1 token)
            ("c", 0, "user", "solo prompt"),
            ("c", 1, "assistant", "reply here"),
        ],
    )
    assert preference_pairs(t, min_replies=2).count() == 0


def test_preference_pairs_only_user_prompts_pair(spark):
    # assistant->user adjacency must not create a pair
    t = _tr(
        spark,
        [
            ("a", 0, "assistant", "greeting"),
            ("a", 1, "user", "hello there friend"),
            ("b", 0, "assistant", "greeting"),
            ("b", 1, "user", "hi"),
        ],
    )
    assert preference_pairs(t, min_replies=2).count() == 0


def test_preference_pairs_tie_break_within_equal_reward(spark):
    # two max-reward replies with equal reward: conv asc wins chosen side
    t = _tr(
        spark,
        [
            ("a", 0, "user", "q"),
            ("a", 1, "assistant", "alpha beta"),
            ("b", 0, "user", "q"),
            ("b", 1, "assistant", "gamma delta"),
            ("c", 0, "user", "q"),
            ("c", 1, "assistant", "one"),
        ],
    )
    out = preference_pairs(t, min_replies=2).collect()
    assert len(out) == 1
    assert out[0]["chosen_conv"] == "a"  # (reward 2, conv asc)
    assert out[0]["rejected_conv"] == "c"


def test_preference_pairs_reward_is_distinct_tokens(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "user", "explain joins"),
            ("a", 1, "assistant", "join join join join join"),
            ("b", 0, "user", "explain joins"),
            ("b", 1, "assistant", "hash merge"),
        ],
    )
    out = preference_pairs(t, min_replies=2).collect()
    assert out[0]["chosen_conv"] == "b"
    assert out[0]["chosen_reward"] == 2 and out[0]["rejected_reward"] == 1
