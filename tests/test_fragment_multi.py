"""hl.snippets=N multi-passage highlighting (round-4:
operators/score.fragment_snippets_multi) — island formation, per-doc
passage ranking, window rendering."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.score import (
    fragment_snippets,
    fragment_snippets_multi,
)
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

T0 = datetime.datetime(2026, 1, 1)


def _idx(spark, rows):
    return build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))


def test_two_islands_two_passages_ranked_by_idf_mass(spark):
    # hits at pos 3 and pos 12: gap 9 > 2*fw=4 -> two islands; the
    # second island has TWO visible hits (pos 12, 14) so it outscores
    # the single-hit first island and ranks frag_rank=1
    rows = [
        ("cA", 0, "user",
         "a b c spark d e f g h i j k spark l spark m n", None, T0),
    ]
    idx = _idx(spark, rows)
    out = fragment_snippets_multi(
        spark, idx, "spark", k=5, frag_words=2, n_snippets=5
    ).collect()
    assert len(out) == 2
    assert out[0]["frag_rank"] == 1
    # island 2 anchor = pos 12, window [10,14]: 'j k spark l spark'
    assert out[0]["fragment"] == "… j k <em>spark</em> l <em>spark</em> …"
    assert out[1]["fragment"] == "… b c <em>spark</em> d e …"
    assert out[0]["passage_score_scaled"] == 2 * out[1]["passage_score_scaled"]


def test_n_snippets_cuts_per_doc(spark):
    rows = [
        ("cA", 0, "user",
         "spark a b c d e f spark g h i j k spark l", None, T0),
    ]
    idx = _idx(spark, rows)
    out = fragment_snippets_multi(
        spark, idx, "spark", k=5, frag_words=1, n_snippets=2
    ).collect()
    assert len(out) == 2
    assert [r["frag_rank"] for r in out] == [1, 2]
    # equal single-hit scores tie-break by (turn_idx, anchor): the
    # earliest island wins rank 1
    assert "spark</em> a" in out[0]["fragment"]


def test_single_island_matches_single_fragment_op(spark):
    # one hit cluster per turn -> the rank-1 passage of the multi op
    # renders exactly what fragment_snippets renders for that turn
    rows = [
        ("cA", 0, "user", "a b c spark d e f", None, T0),
        ("cB", 0, "user", "spark x y z", None, T0),
    ]
    idx = _idx(spark, rows)
    single = {
        r["conv_id"]: r["fragment"]
        for r in fragment_snippets(
            spark, idx, "spark", k=10, frag_words=2
        ).collect()
    }
    multi = {
        r["conv_id"]: r["fragment"]
        for r in fragment_snippets_multi(
            spark, idx, "spark", k=10, frag_words=2, n_snippets=1
        ).collect()
    }
    assert multi == single


def test_islands_cross_turns_rank_within_doc(spark):
    # hits in two different turns of the same conversation: passages
    # compete doc-wide; two hits in turn 1 beat one hit in turn 0
    rows = [
        ("cA", 0, "user", "x spark y", None, T0),
        ("cA", 1, "assistant", "z spark w spark q", None, T0),
    ]
    idx = _idx(spark, rows)
    out = fragment_snippets_multi(
        spark, idx, "spark", k=5, frag_words=2, n_snippets=2
    ).collect()
    assert [r["turn_idx"] for r in out] == [1, 0]
    assert out[0]["frag_rank"] == 1


def test_validations(spark):
    rows = [("cA", 0, "user", "spark a", None, T0)]
    idx = _idx(spark, rows)
    with pytest.raises(ValueError):
        fragment_snippets_multi(spark, idx, "spark", frag_words=-1)
    with pytest.raises(ValueError):
        fragment_snippets_multi(spark, idx, "spark", n_snippets=0)
