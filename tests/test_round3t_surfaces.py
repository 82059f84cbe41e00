"""Round-3 continuation surfaces (batch gg): size-tiered merge
planning, FaceNet hard-triplet mining."""

from __future__ import annotations

import math

from solr_ocr_processor_spark.operators.ann import hard_triplets
from solr_ocr_processor_spark.operators.lifecycle import tiered_merge_plan


def _segs(spark, rows):
    return spark.createDataFrame(rows, "seg string, n_docs long")


def test_merge_plan_groups_within_tier(spark):
    # tier 3 (8-15 docs): five segments -> one complete group of the
    # 4 smallest; the largest waits
    rows = [(f"s{i}", n) for i, n in enumerate([8, 9, 10, 11, 15])]
    out = tiered_merge_plan(_segs(spark, rows), merge_factor=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tier"] == 3 and r["merge_ord"] == 0
    assert r["seg_ids"] == "s0,s1,s2,s3"
    assert r["total_docs"] == 38


def test_merge_plan_never_mixes_tiers(spark):
    # two docs in tier 1 (2-3), two in tier 4 (16-31): no group forms
    rows = [("a", 2), ("b", 3), ("c", 16), ("d", 31)]
    assert tiered_merge_plan(_segs(spark, rows), merge_factor=4).count() == 0


def test_merge_plan_multiple_groups_and_cap(spark):
    rows = [(f"s{i:02d}", 4 + i % 4) for i in range(9)]  # tier 2, 9 segs
    out = tiered_merge_plan(_segs(spark, rows), merge_factor=4).collect()
    assert [r["merge_ord"] for r in out] == [0, 1]  # 2 complete groups
    # size-asc grouping: group 0 holds the 4 smallest
    assert out[0]["total_docs"] <= out[1]["total_docs"]
    capped = tiered_merge_plan(
        _segs(spark, rows), merge_factor=4, max_merged_docs=out[0]["total_docs"]
    ).collect()
    assert [r["merge_ord"] for r in capped] == [0]


def test_merge_plan_ignores_empty_segments(spark):
    rows = [("a", 0), ("b", 5), ("c", 5), ("d", 6), ("e", 7)]
    out = tiered_merge_plan(_segs(spark, rows), merge_factor=4).collect()
    assert len(out) == 1 and out[0]["seg_ids"] == "b,c,d,e"


def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(rows)],
        "vec_id long, embedding array<float>, label long",
    )


def test_hard_triplets_picks_extremes(spark):
    # anchor 0 (label 0): positives 1 (identical) and 2 (orthogonal-ish)
    # -> hardest positive is 2; negatives 3 (close) and 4 (far) ->
    # hardest negative is 3.
    rows = [
        ([1.0, 0.0], 0),  # anchor
        ([1.0, 0.0], 0),  # easy positive
        ([0.1, 1.0], 0),  # hard positive
        ([0.9, 0.2], 1),  # hard negative (close impostor)
        ([-1.0, 0.0], 1),  # easy negative
    ]
    out = hard_triplets(_embs(spark, rows), n_anchors=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pos_id"] == 2 and r["neg_id"] == 3
    pc = 0.1 / math.hypot(0.1, 1.0)
    nc = 0.9 / math.hypot(0.9, 0.2)
    assert r["pos_cos"] == round(pc, 6)
    assert r["neg_cos"] == round(nc, 6)
    assert r["margin"] == round(pc - nc, 6)
    assert r["margin"] < 0  # violated triplet


def test_hard_triplets_excludes_self_and_requires_both_sides(spark):
    # anchor 1's only same-label vector is itself -> no positive ->
    # anchor dropped; anchor 0 has both sides.
    rows = [
        ([1.0, 0.0], 0),
        ([0.0, 1.0], 5),  # lone label
        ([0.5, 0.5], 0),
    ]
    out = hard_triplets(_embs(spark, rows), n_anchors=2).collect()
    assert [r["anchor"] for r in out] == [0]
    assert out[0]["pos_id"] == 2 and out[0]["neg_id"] == 1


def test_hard_triplets_tie_breaks_by_id(spark):
    rows = [
        ([1.0, 0.0], 0),
        ([0.0, 1.0], 0),  # pos, cos 0
        ([0.0, 1.0], 0),  # pos, cos 0 (tie) -> id 1 wins
        ([1.0, 0.0], 1),  # neg, cos 1
        ([1.0, 0.0], 1),  # neg, cos 1 (tie) -> id 3 wins
    ]
    out = hard_triplets(_embs(spark, rows), n_anchors=1).collect()
    assert out[0]["pos_id"] == 1 and out[0]["neg_id"] == 3
