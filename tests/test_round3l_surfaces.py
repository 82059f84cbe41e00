"""Round-3 continuation surfaces (batch u): context-filtered
suggester, vector-field diagnostics, BPE merge candidates."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.functions.textstats import bpe_merge_candidates
from solr_ocr_processor_spark.operators.ann import vector_stats
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.expand import suggest_terms_context
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ------------------------------------------------------ suggest context

@pytest.fixture(scope="module")
def sidx(spark):
    rows = [
        ("c0", 0, "user", "spark scan", None, TS),
        ("c1", 0, "user", "spark spark sort", None, TS),
        ("c2", 0, "user", "spark stream", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    idx.postings.persist().count()
    return idx


def test_suggest_context_scopes_df(spark, sidx):
    allowed = spark.createDataFrame([(0,), (1,)], "doc_id long")
    got = [
        (r["term"], r["df"])
        for r in suggest_terms_context(spark, sidx, "s", allowed).collect()
    ]
    # 'stream' lives only in the excluded doc 2 and must vanish;
    # spark's df is 2 within the context (docs 0 and 1)
    assert got == [("spark", 2), ("scan", 1), ("sort", 1)]


def test_suggest_context_invalid_prefix_empty(spark, sidx):
    allowed = spark.createDataFrame([(0,)], "doc_id long")
    assert suggest_terms_context(spark, sidx, "?!", allowed).count() == 0


# ------------------------------------------------------ vector stats

def test_vector_stats_hand_computed(spark):
    embs = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),       # norm 5
            (2, [0.0, 0.0]),       # zero-norm
            (3, [1.0, 0.0, 0.0]),  # dim outlier, norm 1
            (4, None),             # null vector
        ],
        "vec_id long, embedding array<float>",
    )
    r = vector_stats(embs).collect()[0]
    assert (
        r["n_vecs"], r["n_null"], r["dim_min"], r["dim_max"],
        r["n_zero_norm"], r["sum_norm_scaled"], r["avg_norm_scaled"],
    ) == (4, 1, 2, 3, 1, 6_000_000, 2_000_000)


# ------------------------------------------------------ BPE merges

def test_bpe_merges_weighted_by_word_freq(spark):
    docs = spark.createDataFrame(
        [(1, "aba ab"), (2, "ab")], "doc_id long, text string"
    )
    got = [
        (r["c1"], r["c2"], r["n"])
        for r in bpe_merge_candidates(docs, k=10).collect()
    ]
    # words: aba x1 -> (a,b),(b,a); ab x2 -> (a,b). totals (a,b)=3
    assert got == [("a", "b", 3), ("b", "a", 1)]


def test_bpe_merges_single_char_words(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_merge_candidates(docs).collect() == []
