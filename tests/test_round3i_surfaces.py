"""Round-3 continuation surfaces (batch r): payload scoring, analysis
chain debug, MLT interesting terms, shingle containment, tokenizer
fertility. Hand-computed expectations on purpose-built minis."""

from __future__ import annotations

import datetime
import math

import pytest

from solr_ocr_processor_spark.functions.textstats import tokenizer_fertility
from solr_ocr_processor_spark.functions.tokenizer import analysis_stages
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.dedup import containment_pairs
from solr_ocr_processor_spark.operators.expand import mlt_interesting_terms
from solr_ocr_processor_spark.operators.query import payload_score_topk
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ---------------------------------------------------------- payload_score

@pytest.fixture(scope="module")
def pidx(spark):
    rows = [
        # c0 tokens: spark(0) at(1) zero(2) then(3) spark(4) again(5)
        ("c0", 0, "user", "spark at zero then spark again", None, TS),
        ("c1", 0, "user", "late mention of spark", None, TS),  # pos 3
        ("c2", 0, "user", "no match here", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    idx.postings.persist().count()
    return idx


def test_payload_score_max(spark, pidx):
    got = [
        (r["doc_id"], r["conv_id"], r["payload"])
        for r in payload_score_topk(spark, pidx, "spark", func="max").collect()
    ]
    assert got == [(0, "c0", 4), (1, "c1", 3)]


def test_payload_score_min_reorders(spark, pidx):
    got = [
        (r["conv_id"], r["payload"])
        for r in payload_score_topk(spark, pidx, "spark", func="min").collect()
    ]
    # min payload: c0 -> 0, c1 -> 3; score DESC puts c1 first
    assert got == [("c1", 3), ("c0", 0)]


def test_payload_score_avg_integer_scaled(spark, pidx):
    got = {
        r["conv_id"]: r["payload"]
        for r in payload_score_topk(spark, pidx, "spark", func="avg").collect()
    }
    # c0: floor(1e6 * (0+4)/2) = 2_000_000; c1: floor(1e6 * 3/1)
    assert got == {"c0": 2_000_000, "c1": 3_000_000}


def test_payload_score_bad_func(spark, pidx):
    with pytest.raises(ValueError):
        payload_score_topk(spark, pidx, "spark", func="sum")


# ---------------------------------------------------------- analysis chain

def test_analysis_stages_hand_computed(spark):
    rows = [
        (r["stage"], r["pos"], r["token"])
        for r in analysis_stages(spark, "The Cats and dogs").collect()
    ]
    assert rows == [
        ("1_tokenize", 0, "the"),
        ("1_tokenize", 1, "cats"),
        ("1_tokenize", 2, "and"),
        ("1_tokenize", 3, "dogs"),
        # stopwords removed, original positions kept (position
        # increments survive for phrase queries)
        ("2_stop", 1, "cats"),
        ("2_stop", 3, "dogs"),
        ("3_stem", 1, "cat"),
        ("3_stem", 3, "dog"),
    ]


def test_analysis_stages_all_stopwords(spark):
    rows = analysis_stages(spark, "the and of to").collect()
    stages = {r["stage"] for r in rows}
    assert stages == {"1_tokenize"}  # stages 2/3 empty
    assert len(rows) == 4


# ---------------------------------------------------------- MLT details

def test_mlt_interesting_terms_hand_computed(spark):
    rows = [
        ("c0", 0, "user", "alpha alpha beta", None, TS),
        ("c1", 0, "user", "beta gamma", None, TS),
        ("c2", 0, "user", "gamma gamma delta", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = [
        (r["term"], r["tf"], r["df"], r["weight"])
        for r in mlt_interesting_terms(spark, idx, 0).collect()
    ]
    w_alpha = round(2 * math.log1p((3 - 1 + 0.5) / (1 + 0.5)), 6)
    w_beta = round(1 * math.log1p((3 - 2 + 0.5) / (2 + 0.5)), 6)
    assert got == [("alpha", 2, 1, w_alpha), ("beta", 1, 2, w_beta)]


def test_mlt_interesting_terms_cap(spark):
    rows = [
        ("c0", 0, "user", "alpha beta gamma delta", None, TS),
        ("c1", 0, "user", "alpha beta", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    assert mlt_interesting_terms(spark, idx, 0, max_query_terms=2).count() == 2


# ---------------------------------------------------------- containment

def test_containment_directional(spark):
    docs = spark.createDataFrame(
        [
            (10, "one two three four"),
            (20, "zero one two three four five"),
            (30, "unrelated text entirely here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
        for r in containment_pairs(docs, n=3, tau_num=1, tau_den=2).collect()
    }
    # S(10) = 2 shingles, both inside S(20) (4 shingles):
    # C(10->20) = 2/2 = 1.0; C(20->10) = 2/4 = 0.5 (>= 1/2 boundary,
    # kept by the integer cross-multiplication with no float compare)
    assert got == {(10, 20): 1_000_000, (20, 10): 500_000}


def test_containment_threshold_excludes(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),   # 6 shingles
            (2, "a b c unrelated tail words here"),  # shares only "a b c"
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
        for r in containment_pairs(docs, n=3, tau_num=1, tau_den=2).collect()
    }
    # C(1->2) = 1/6, C(2->1) = 1/5 — both below 1/2
    assert got == {}


# ---------------------------------------------------------- fertility

def test_tokenizer_fertility_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world", "srcA"),
            (2, "a b-c", "srcA"),
            (3, "", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (
            r["n_docs"], r["n_words"], r["n_pieces"], r["n_bytes"],
            r["fertility_scaled"], r["bytes_per_piece_scaled"],
        )
        for r in tokenizer_fertility(docs).collect()
    }
    # srcA: doc1 words 2 / pieces ["hello", " world"] 2 / bytes 11;
    #       doc2 words 3 (a,b,c) / pieces ["a", " b", "-", "c"] 4 / bytes 5
    # srcB: empty text -> all zero, 0-denominator ratios -> 0
    assert got == {
        "srcA": (2, 5, 6, 16, 1_200_000, 2_666_666),
        "srcB": (1, 0, 0, 0, 0, 0),
    }
