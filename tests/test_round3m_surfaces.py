"""Round-3 continuation surfaces (batch v): recall@k evaluator,
term drift (smoothed odds ratio), unordered span-near queries."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.functions.textstats import term_drift
from solr_ocr_processor_spark.operators.ann import recall_at_k
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.query import proximity_topk, span_near_topk
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ----------------------------------------------------------- recall@k

def test_recall_at_k_counts_overlap(spark):
    exact = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    approx = spark.createDataFrame([(2,), (3,), (9,)], "id long")
    r = recall_at_k(exact, approx, 3).collect()[0]
    assert (r["k"], r["n_hit"], r["recall_scaled"]) == (3, 2, 666_666)


def test_recall_at_k_perfect_and_zero(spark):
    a = spark.createDataFrame([(1,), (2,)], "id long")
    b = spark.createDataFrame([(3,), (4,)], "id long")
    assert recall_at_k(a, a, 2).collect()[0]["recall_scaled"] == 1_000_000
    assert recall_at_k(a, b, 2).collect()[0]["n_hit"] == 0


# ----------------------------------------------------------- term drift

def test_term_drift_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana", "src0"),
            (2, "banana cherry", "src1"),
        ],
        "doc_id long, text string, source string",
    )
    got = [
        (r["term"], r["c_a"], r["c_b"], r["drift_scaled"])
        for r in term_drift(docs, "src0", "src1", k=10).collect()
    ]
    # N_a=3 N_b=2 V=3:
    # apple  (3*(2+3)*1e6)//(1*(3+3)) = 2_500_000
    # banana (2*5*1e6)//(2*6)         =   833_333
    # cherry (1*5*1e6)//(2*6)         =   416_666
    assert got == [
        ("apple", 2, 0, 2_500_000),
        ("banana", 1, 1, 833_333),
        ("cherry", 0, 1, 416_666),
    ]


def test_term_drift_ignores_other_sources(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple", "src0"),
            (2, "apple", "src1"),
            (3, "zebra zebra zebra", "src9"),  # must not leak in
        ],
        "doc_id long, text string, source string",
    )
    got = [r["term"] for r in term_drift(docs, "src0", "src1", k=10).collect()]
    assert got == ["apple"]


# ----------------------------------------------------------- span near

@pytest.fixture(scope="module")
def spidx(spark):
    rows = [
        ("c0", 0, "user", "table value", None, TS),
        ("c1", 0, "user", "value table", None, TS),  # reversed
        ("c2", 0, "user", "table x x x value", None, TS),  # gap 4 > win 3
        ("c3", 0, "user", "table x value", None, TS),  # gap 2
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    idx.postings.persist().count()
    return idx


def test_span_near_unordered_matches_reversed(spark, spidx):
    got = [
        r["conv_id"]
        for r in span_near_topk(spark, spidx, "table value", slop=2).collect()
    ]
    # c0/c1 same dl -> same score, tie doc asc; c3 longer dl scores lower
    assert got == ["c0", "c1", "c3"]


def test_ordered_proximity_excludes_reversed(spark, spidx):
    got = {
        r["conv_id"]
        for r in proximity_topk(spark, spidx, "table value", slop=2).collect()
    }
    assert "c1" not in got and "c0" in got


def test_span_near_requires_two_terms(spark, spidx):
    with pytest.raises(ValueError):
        span_near_topk(spark, spidx, "table", slop=1)
