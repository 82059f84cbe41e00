"""Round-3 late surfaces (batch l): dismax tie=, edismax pf2 bigram
boost, C4 line-level rules, sliding-window chunking, hashed-linear
quality classifier. Hand-computed expectations on purpose-built mini
collections."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.bm25f import dismax_tie_topk
from solr_ocr_processor_spark.operators.pipeline import (
    c4_rules_profile,
    quality_classifier,
)
from solr_ocr_processor_spark.operators.split import chunk_overlap

K1, B = 1.2, 0.75


# ---------------------------------------------------------------- dismax tie

def _turns(spark):
    rows = [
        # conv a: 'spark' in assistant AND user; conv b: only user
        ("a", 0, "user", "spark things", None, None),
        ("a", 1, "assistant", "spark spark reply", None, None),
        ("b", 0, "user", "spark question", None, None),
        ("b", 1, "assistant", "plain reply", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _clause(w, idf, tf, dl, avgdl):
    return w * idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_dismax_tie_hand_computed(spark):
    out = {
        r["conv_id"]: r["score"]
        for r in dismax_tie_topk(
            _turns(spark), ["spark"], {"assistant": 2.0, "user": 1.0},
            tie=0.3, k=10,
        ).collect()
    }
    # per-field stats: n_docs=2.
    # assistant field: dl a=3, b=2, avgdl=2.5; df('spark')=1 (only a)
    # user field: dl a=2, b=2, avgdl=2.0; df('spark')=2
    idf_a = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    idf_u = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))
    sa = _clause(2.0, idf_a, 2, 3, 2.5)   # conv a, assistant, tf=2
    ua = _clause(1.0, idf_u, 1, 2, 2.0)   # conv a, user
    ub = _clause(1.0, idf_u, 1, 2, 2.0)   # conv b, user only
    exp_a = max(sa, ua) + 0.3 * (sa + ua - max(sa, ua))
    assert out["a"] == pytest.approx(round(exp_a, 6), abs=1e-6)
    assert out["b"] == pytest.approx(round(ub, 6), abs=1e-6)


def test_dismax_tie_extremes(spark):
    t = _turns(spark)
    # tie=1 degrades to the plain per-field sum; tie=0 = best field only
    s1 = {r["conv_id"]: r["score"]
          for r in dismax_tie_topk(t, ["spark"], tie=1.0).collect()}
    s0 = {r["conv_id"]: r["score"]
          for r in dismax_tie_topk(t, ["spark"], tie=0.0).collect()}
    assert s1["a"] > s0["a"]          # a matches both fields
    assert s1["b"] == s0["b"]         # b matches one field: tie irrelevant
    with pytest.raises(ValueError):
        dismax_tie_topk(t, ["spark"], tie=1.5)
    with pytest.raises(ValueError):
        dismax_tie_topk(t, [])


# ---------------------------------------------------------------- pf2

def test_pf2_rewards_adjacency(spark, sf_dir):
    """Over the real index: pf2 score >= plain BM25 for every doc, and
    docs holding an adjacent bigram strictly gain."""
    import __spark_entry__ as e

    idx = e._index(spark, sf_dir)
    from solr_ocr_processor_spark.operators.query import bm25_topk, pf2_topk

    base = {r["doc_id"]: r["score"]
            for r in bm25_topk(spark, idx, e.FLAGSHIP_QUERY, k=50).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in pf2_topk(
                   spark, idx, e.FLAGSHIP_QUERY, pf2_weight=0.5, k=50
               ).collect()}
    common = set(base) & set(boosted)
    assert common
    assert all(boosted[d] >= base[d] - 1e-9 for d in common)
    assert any(boosted[d] > base[d] + 1e-9 for d in common)


def test_pf2_single_term_is_plain_bm25(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.query import bm25_topk, pf2_topk

    idx = e._index(spark, sf_dir)
    a = [(r["doc_id"], round(r["score"], 6))
         for r in bm25_topk(spark, idx, "spark", k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 6))
         for r in pf2_topk(spark, idx, "spark", k=10).collect()]
    assert a == b


# ---------------------------------------------------------------- C4 rules

def _c4docs(spark):
    good = "\n".join(
        ["This is a perfectly fine sentence here.",
         "Another good long sentence follows it now.",
         "And a third complete sentence closes the doc."]
    )
    few = "Only one good long sentence lives here.\nshort\nno punct line"
    lorem = good + "\nLorem Ipsum dolor sit amet filler text."
    brace = good + "\nfunction f() { return 1; }"
    js = "\n".join(
        ["This line mentions javascript so it drops out.",
         "Another good long sentence follows it now.",
         "And a third complete sentence closes the doc."]
    )
    rows = [
        (0, good, "s1"), (1, few, "s1"), (2, lorem, "s1"),
        (3, brace, "s2"), (4, js, "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_c4_rules_hand_computed(spark):
    out = {r["source"]: r for r in c4_rules_profile(_c4docs(spark)).collect()}
    s1, s2 = out["s1"], out["s2"]
    # s1: good keeps (3 kept lines); few fails few-lines (1 kept);
    # lorem has 4 kept lines but trips lorem-ipsum
    assert (s1["n_docs"], s1["n_kept"]) == (3, 1)
    assert s1["n_fail_few_lines"] == 1 and s1["n_fail_lorem"] == 1
    # s2: brace trips {, js drops the javascript line -> 2 kept lines
    # -> fails few-lines too
    assert (s2["n_docs"], s2["n_kept"]) == (2, 0)
    assert s2["n_fail_brace"] == 1 and s2["n_fail_few_lines"] == 1
    # line ratio: s1 lines kept 3 + 1 + 4 of 3 + 3 + 4 = 8/10
    assert s1["kept_line_frac"] == pytest.approx(0.8, abs=1e-6)


# ---------------------------------------------------------------- chunking

def test_chunk_overlap_layout(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_overlap(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6,9 -> lengths 4,4,4,1
    got = [(r["chunk_idx"], r["tok_start"], r["n_tokens"], r["chunk_text"])
           for r in by_doc[1]]
    assert got == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 3, 4, "w3 w4 w5 w6"),
        (2, 6, 4, "w6 w7 w8 w9"),
        (3, 9, 1, "w9"),
    ]
    assert [(r["chunk_idx"], r["n_tokens"]) for r in by_doc[2]] == [(0, 1)]
    assert 3 not in by_doc  # empty doc emits nothing


def test_chunk_overlap_every_token_covered(spark):
    text = " ".join(f"t{i}" for i in range(57))
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = chunk_overlap(docs, size=16, stride=11).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["tok_start"], r["tok_start"] + r["n_tokens"]))
    assert covered == set(range(57))
    with pytest.raises(ValueError):
        chunk_overlap(docs, size=0, stride=3)


# ---------------------------------------------------------------- classifier

def test_quality_classifier_exact_integer_replay(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_classifier(docs, n_buckets=16).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def w_int(b):
        return h60(f"qw:{b}") % 2_000_001 - 1_000_000

    dot = 2 * w_int(h60("alpha") % 16) + w_int(h60("beta") % 16)
    n = 3
    exp_ppm = (1 if dot >= 0 else -1) * ((2 * abs(dot) + n) // (2 * n))
    r1 = out[1]
    assert (r1["n_feats"], r1["logit_ppm"]) == (3, exp_ppm)
    assert r1["prob"] == pytest.approx(
        round(1 / (1 + math.exp(-exp_ppm / 1e6)), 6), abs=1e-6
    )
    # feature-less doc: neutral score
    assert (out[2]["n_feats"], out[2]["logit_ppm"], out[2]["prob"]) == (0, 0, 0.5)


def test_quality_classifier_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i % 7} other{i % 3} text") for i in range(40)],
        "doc_id long, text string",
    )
    a = quality_classifier(docs).collect()
    b = quality_classifier(docs.repartition(13)).orderBy("doc_id").collect()
    assert a == b
