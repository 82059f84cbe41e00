"""Round-3 continuation surfaces (batch s): knn post-filter, code
profile, PMI collocations, topic() incremental pull, facet.contains."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.functions.textstats import code_profile, collocations
from solr_ocr_processor_spark.operators.ann import (
    knn_filtered_topk,
    knn_postfilter_topk,
)
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.facet import field_facet_counts
from solr_ocr_processor_spark.operators.query import topic_pull
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ----------------------------------------------------------- knn postfilter

@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0], 1),
        (2, [0.9, 0.1], 2),
        (3, [0.0, 1.0], 2),
        (4, [0.5, 0.5], 2),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_postfilter_underfills(spark, vecs):
    got = [
        r["id"]
        for r in knn_postfilter_topk(
            vecs, [1.0, 0.0], k=2, prefetch_k=2, predicate=F.col("label") == 2
        ).collect()
    ]
    # prefetch-2 = {1, 2}; label filter then leaves only 2 -> UNDER-FILL
    assert got == [2]


def test_prefilter_fills_where_postfilter_cannot(spark, vecs):
    got = [
        r["id"]
        for r in knn_filtered_topk(
            vecs, [1.0, 0.0], k=2, predicate=F.col("label") == 2
        ).collect()
    ]
    assert got == [2, 4]  # pre-filter semantics: always k matching rows


def test_postfilter_equals_plain_when_filter_passes_all(spark, vecs):
    post = knn_postfilter_topk(
        vecs, [1.0, 0.0], k=3, prefetch_k=4, predicate=F.col("label") > 0
    ).collect()
    assert [r["id"] for r in post] == [1, 2, 4]


# ----------------------------------------------------------- code profile

def test_code_profile_hand_computed(spark):
    code_text = "def foo(): return bar[1] == {}"
    docs = spark.createDataFrame(
        [(1, code_text), (2, "just plain prose here"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_chars"], r["n_symbols"], r["n_kw"], r["n_camel"],
            r["symbol_ratio_scaled"], r["is_code"],
        )
        for r in code_profile(docs).collect()
    }
    n = len(code_text)
    # symbols: ( ) [ ] = = { }  -> 8; keywords: def, return -> 2
    assert got[1] == (n, 8, 2, 0, 8 * 1_000_000 // n, 1)
    assert got[2] == (21, 0, 0, 0, 0, 0)
    assert got[3] == (0, 0, 0, 0, 0, 0)


def test_code_profile_camel_and_kw_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "fooBar bazQux import class def plain words")],
        "doc_id long, text string",
    )
    r = code_profile(docs).collect()[0]
    assert r["n_camel"] == 2
    assert r["n_kw"] == 3 and r["is_code"] == 1  # kw boundary is >= 3


# ----------------------------------------------------------- collocations

def test_collocations_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = [
        (r["t1"], r["t2"], r["c_ab"], r["pmi_scaled"])
        for r in collocations(docs, min_count=1, k=10).collect()
    ]
    # unigrams a:4 b:4 c:1, N=9; bigrams (a,b):4 (b,a):2 (b,c):1
    # scores: (a,b) 4*81//16=20, (b,c) 81//4=20, (b,a) 162//16=10
    assert got == [("a", "b", 4, 20), ("b", "c", 1, 20), ("b", "a", 2, 10)]


def test_collocations_min_count_and_no_cross_doc_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id long, text string"
    )
    # (y, x) exists inside doc 2 only; doc boundaries add no (y, x)
    got = collocations(docs, min_count=2, k=10).collect()
    assert got == []  # each bigram occurs once, below min_count=2


def test_collocations_single_token_docs(spark):
    docs = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    assert collocations(docs, min_count=1, k=5).collect() == []


# ----------------------------------------------------------- topic pull

@pytest.fixture(scope="module")
def tidx(spark):
    rows = [
        ("c0", 0, "user", "spark alpha", None, TS),
        ("c1", 0, "user", "spark beta", None, TS),
        ("c1", 1, "user", "gamma", None, TS + datetime.timedelta(minutes=10)),
        ("c2", 0, "user", "spark delta", None, TS + datetime.timedelta(minutes=20)),
        ("c3", 0, "user", "no match", None, TS + datetime.timedelta(minutes=30)),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    idx.postings.persist().count()
    return idx


def test_topic_pull_checkpoint_and_order(spark, tidx):
    got = [
        (r["conv_id"], r["last_ts"])
        for r in topic_pull(
            spark, tidx, "spark", TS + datetime.timedelta(minutes=5)
        ).collect()
    ]
    assert got == [
        ("c1", TS + datetime.timedelta(minutes=10)),
        ("c2", TS + datetime.timedelta(minutes=20)),
    ]


def test_topic_pull_limit_pages_oldest_first(spark, tidx):
    got = topic_pull(
        spark, tidx, "spark", TS + datetime.timedelta(minutes=5), limit=1
    ).collect()
    assert [r["conv_id"] for r in got] == ["c1"]
    # resume from the returned checkpoint -> the next page
    nxt = topic_pull(spark, tidx, "spark", got[0]["last_ts"], limit=1).collect()
    assert [r["conv_id"] for r in nxt] == ["c2"]


def test_topic_pull_empty_when_caught_up(spark, tidx):
    assert (
        topic_pull(
            spark, tidx, "spark", TS + datetime.timedelta(hours=2)
        ).count()
        == 0
    )


# ----------------------------------------------------------- facet.contains

def test_facet_contains_filters_values(spark):
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("beta",), ("gamma",), (None,)],
        "src string",
    )
    got = [
        (r["value"], r["n"])
        for r in field_facet_counts(
            df, "src", missing=False, sort="count", contains="et"
        ).collect()
    ]
    assert got == [("beta", 2)]


def test_facet_contains_missing_bucket_independent(spark):
    df = spark.createDataFrame(
        [("alpha",), ("beta",), (None,)], "src string"
    )
    got = [
        (r["value"], r["n"])
        for r in field_facet_counts(
            df, "src", missing=True, sort="count", contains="zzz"
        ).collect()
    ]
    # no value contains zzz, but the missing bucket still appears
    assert got == [(None, 1)]
