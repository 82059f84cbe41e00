"""Rank-identity: Spark BM25 vs the in-repo exhaustive oracle scorer.

The BASELINE.json gate: rank-identical docIDs + scores (1e-6), ties by
doc_id asc, on a fixed query set.
"""

import math

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.score import bm25_topk, highlights
from solr_ocr_processor_spark.oracle import oracle_bm25_topk, oracle_materialize
from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

QUERIES = [
    "spark shuffle",
    "the window merge",
    "posting term score",
    "café naïve",  # unicode normalization path
    "zzz_absent_term",
    "spark spark spark",  # duplicate query terms collapse
]


@pytest.fixture(scope="module")
def corpus(spark):
    t = synth_transcripts(spark, n_convs=40, max_turns=10, seed=42)
    index = build_postings(t)
    pdf = t.toPandas()
    docs = oracle_materialize(pdf)
    return t, index, docs


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identical_vs_oracle(spark, corpus, q):
    _, index, docs = corpus
    k = 10
    got = bm25_topk(spark, index, q, k=k).collect()
    want = oracle_bm25_topk(docs, q, k=k)
    assert [r.doc_id for r in got] == list(want["doc_id"])
    for r, ws in zip(got, want["score"]):
        assert math.isclose(r.score, ws, rel_tol=0, abs_tol=1e-6)


def test_highlights_point_at_query_terms(spark, corpus):
    t, index, _ = corpus
    hits = highlights(spark, index, "spark window", k=5).collect()
    assert hits
    turn_text = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.collect()
    }
    for h in hits:
        src = turn_text[(h.conv_id, h.turn_idx)]
        # offsets are in normalized (casefolded NFKC) turn space
        import unicodedata

        norm = unicodedata.normalize("NFKC", src).casefold()
        assert norm[h.start_in_turn : h.end_in_turn] == h.term


def test_snippets_wrap_matched_terms(spark, corpus):
    """Rendered snippets: the matched turn's NORMALIZED text with every
    query-term token wrapped in <em></em> — stripping the markers must
    recover the normalized turn text exactly, and every marked span
    must be a query term."""
    import re
    import unicodedata

    from solr_ocr_processor_spark.operators.score import snippets

    t, index, _ = corpus
    got = snippets(spark, index, "spark window", k=5).collect()
    assert got
    turn_text = {(r.conv_id, r.turn_idx): r.text for r in t.collect()}
    for r in got:
        norm = unicodedata.normalize("NFKC", turn_text[(r.conv_id, r.turn_idx)]).casefold()
        assert r.snippet.replace("<em>", "").replace("</em>", "") == norm
        marked = re.findall(r"<em>(.*?)</em>", r.snippet)
        assert marked and set(marked) <= {"spark", "window"}


def test_sum_tf_equals_token_count(spark, corpus):
    """Property: sum of tf over postings == total token count."""
    _, index, docs = corpus
    from solr_ocr_processor_spark.functions.tokenizer import tokenize_text

    total = int(index.corpus.first()["total_tokens"])
    expect = sum(len(tokenize_text(t)) for t in docs["doc_text"])
    assert total == expect
    import pyspark.sql.functions as F

    assert index.postings.agg(F.sum("tf")).first()[0] == expect
