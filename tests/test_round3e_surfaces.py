"""Round-3 late surfaces (batch e): DSIR importance weights,
group.facet (count groups not docs), /admin/luke index summary.
Hand-computed expectations on purpose-built mini-collections."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.pipeline import dsir_importance

DOCS = [
    # (doc_id, text, lang, source): tgt docs are 'alpha beta' prose,
    # src2 doc 4 repeats the target phrasing, doc 5 is off-domain.
    (0, "alpha beta alpha beta gamma", "en", "tgt"),
    (1, "alpha beta delta alpha beta", "en", "tgt"),
    (2, "alpha beta epsilon beta", "en", "tgt"),
    (3, "alpha beta alpha zeta", "en", "src2"),
    (4, "alpha beta alpha beta gamma", "en", "src2"),
    (5, "zeta eta theta iota kappa", "en", "src2"),
    (6, "", "en", "src2"),
]


@pytest.fixture(scope="module")
def dsir(spark):
    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )
    out = dsir_importance(docs, target_source="tgt", n_buckets=64, alpha=1.0)
    return {r.doc_id: r for r in out.collect()}


def test_dsir_every_doc_reported_and_featureless_zero(dsir):
    assert sorted(dsir) == [0, 1, 2, 3, 4, 5, 6]
    assert dsir[6].dsir_logratio == 0.0
    assert dsir[6].n_feats == 0


def test_dsir_feature_count_is_unigrams_plus_bigrams(dsir):
    # n tokens -> n unigrams + (n-1) bigrams
    assert dsir[0].n_feats == 5 + 4
    assert dsir[5].n_feats == 5 + 4


def test_dsir_in_domain_scores_above_off_domain(dsir):
    # doc 4 repeats target phrasing verbatim; doc 5 shares nothing
    # with the target sample -> strictly lower importance weight.
    assert dsir[4].dsir_logratio > dsir[5].dsir_logratio
    # every tgt-like doc beats the off-domain doc
    for d in (0, 1, 2, 3):
        assert dsir[d].dsir_logratio > dsir[5].dsir_logratio


def test_dsir_weight_matches_hand_model(spark):
    # 2 docs, 1 bucket: with B=1 every feature collides -> the
    # log-ratio per feature is log((ct+1)/(tt+1)) - log((cr+1)/(tr+1))
    # with ct=cr=total target / raw feature counts; weight = n_feats*lr.
    docs = spark.createDataFrame(
        [(0, "a b", "x", "tgt"), (1, "c d", "y", "raw")],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r.doc_id: r.dsir_logratio
        for r in dsir_importance(
            docs, target_source="tgt", n_buckets=1, alpha=1.0
        ).collect()
    }
    # per-feature lr: target model has tt=3 feats (a, b, 'a b'),
    # raw tr=6; single bucket: tc=3, rc=6.
    lr = math.log((3 + 1) / (3 + 1)) - math.log((6 + 1) / (6 + 1))
    assert out[0] == pytest.approx(round(3 * lr, 6), abs=1e-9)
    assert out[1] == pytest.approx(round(3 * lr, 6), abs=1e-9)


def test_dsir_rejects_bad_params(spark):
    docs = spark.createDataFrame(
        [(0, "a", "x", "s")], "doc_id long, text string, lang string, source string"
    )
    with pytest.raises(ValueError):
        dsir_importance(docs, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_importance(docs, alpha=0.0)


# --- group.facet + luke ---------------------------------------------------


@pytest.fixture(scope="module")
def mini_idx(spark):
    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1, 0, 0)
    t1 = datetime.datetime(2026, 1, 1, 0, 15)  # next 10-min bucket
    long_pad = " ".join(["pad"] * 70)  # pushes dl into bucket 1 (>=64)
    rows = [
        ("cA", 0, "user", "spark rocks", None, t0),            # grp 0, ts0
        ("cB", 0, "user", f"spark {long_pad}", None, t0),       # grp 1, ts0
        ("cC", 0, "user", "spark again", None, t1),            # grp 0, ts1
        ("cD", 0, "user", "nothing relevant", None, t1),       # no match
    ]
    return build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))


def test_group_facet_counts_counts_groups_not_docs(spark, mini_idx):
    from solr_ocr_processor_spark.operators.facet import group_facet_counts

    out = group_facet_counts(spark, mini_idx, "spark", width=64, gap_minutes=10)
    rows = {r.ts_bucket: r.n_groups for r in out.collect()}
    # ts0 holds matching docs in dl-groups {0, 1} -> 2 groups;
    # ts1 holds one matching doc in group 0 -> 1 group (cD no match).
    assert sorted(rows.values()) == [1, 2]
    b0, b1 = sorted(rows)
    assert rows[b0] == 2 and rows[b1] == 1
    assert b1 - b0 == 600


def test_group_facet_counts_validates(spark, mini_idx):
    from solr_ocr_processor_spark.operators.facet import group_facet_counts

    with pytest.raises(ValueError):
        group_facet_counts(spark, mini_idx, "spark", width=0)
    assert group_facet_counts(spark, mini_idx, "").count() == 0


def test_luke_report_matches_index_tables(spark, mini_idx):
    from solr_ocr_processor_spark.operators.terms import luke_report

    r = luke_report(spark, mini_idx).first()
    assert r.n_docs == 4
    assert r.n_terms == mini_idx.term_stats.count()
    assert r.n_postings == mini_idx.postings.count()
    assert r.total_tokens == mini_idx.postings.agg(F.sum("tf")).first()[0]
    assert r.avgdl == pytest.approx(
        round(r.total_tokens / r.n_docs, 6), abs=1e-9
    )
    # 'spark' appears in 3 docs and is the hottest entry alongside pad
    assert r.max_df == mini_idx.term_stats.agg(F.max("df")).first()[0]
    assert r.max_dl >= 71 and r.min_dl == 2


# ---------------------------------------------------------------------------
# CCNet LM-quality routing (head/middle/tail terciles)
# ---------------------------------------------------------------------------


def test_ccnet_buckets_order_and_empty(spark):
    from solr_ocr_processor_spark.operators.pipeline import ccnet_lm_buckets

    # common-token doc is most fluent (head), rare-token doc least
    # fluent (tail); empty doc routed explicitly.
    docs = spark.createDataFrame(
        [
            (0, "common common common common common common"),
            (1, "common common rare1 rare2"),
            (2, "rare3 rare4 rare5 rare6"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ccnet_lm_buckets(docs).collect()}
    assert got[0].bucket == "head"
    assert got[1].bucket == "middle"
    assert got[2].bucket == "tail"
    assert got[3].bucket == "empty"
    assert got[3].n_tokens == 0 and got[3].avg_key == 0
    # avg_key monotone with fluency
    assert got[0].avg_key < got[1].avg_key < got[2].avg_key


def test_ccnet_buckets_ties_share_cut_bucket(spark):
    from solr_ocr_processor_spark.operators.pipeline import ccnet_lm_buckets

    # every doc identical -> one distinct key -> t1 == t2 == key:
    # all docs land in head (quantile_disc tie semantics).
    docs = spark.createDataFrame(
        [(i, "same same same") for i in range(6)],
        "doc_id long, text string",
    )
    got = ccnet_lm_buckets(docs).collect()
    assert {r.bucket for r in got} == {"head"}


# ---------------------------------------------------------------------------
# BM25F (field-weighted BM25 over roles)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm25f_turns(spark):
    rows = [
        # A: tf 1 in each field        B: tf 2 in user only
        ("A", 0, "user", "spark x"), ("A", 1, "assistant", "spark y"),
        ("B", 0, "user", "spark spark"), ("B", 1, "assistant", "y z"),
        # C: no match                   D: match only in unweighted role
        ("C", 0, "user", "x y"), ("C", 1, "assistant", "y z"),
        ("D", 0, "user", "x y"), ("D", 1, "assistant", "y z"),
        ("D", 2, "tool", "spark spark spark"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_bm25f_saturates_weighted_sum_once(spark, bm25f_turns):
    from solr_ocr_processor_spark.operators.bm25f import bm25f_topk

    # every weighted field has dl_f = 2 and avgdl_f = 2, so B_f = 1:
    # with equal weights, tf (1+1) across fields == tf 2 in one field
    # — the defining BM25F property (per-field BM25 would saturate
    # each field separately and score A above B).
    got = bm25f_topk(
        bm25f_turns, ["spark"], {"user": 1.0, "assistant": 1.0}, k=10
    ).collect()
    assert [r.conv_id for r in got] == ["A", "B"]  # tie -> conv_id asc
    assert got[0].score == got[1].score > 0


def test_bm25f_field_weights_rank(spark, bm25f_turns):
    from solr_ocr_processor_spark.operators.bm25f import bm25f_topk

    got = bm25f_topk(
        bm25f_turns, ["spark"], {"assistant": 2.0, "user": 1.0}, k=10
    ).collect()
    # A's weighted tf = 2*1 + 1*1 = 3 beats B's = 1*2 = 2
    assert [r.conv_id for r in got] == ["A", "B"]
    assert got[0].score > got[1].score


def test_bm25f_unweighted_roles_excluded(spark, bm25f_turns):
    from solr_ocr_processor_spark.operators.bm25f import bm25f_topk

    got = bm25f_topk(
        bm25f_turns, ["spark"], {"user": 1.0, "assistant": 1.0}, k=10
    ).collect()
    # D's only match is in the tool role -> no score row at all
    assert "D" not in {r.conv_id for r in got}
    with pytest.raises(ValueError):
        bm25f_topk(bm25f_turns, [], {"user": 1.0})


# ---------------------------------------------------------------------------
# group.ngroups + facet.missing
# ---------------------------------------------------------------------------


def test_field_facet_missing_bucket(spark):
    from solr_ocr_processor_spark.operators.facet import field_facet_counts

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b"), (5, None), (6, None)],
        "id long, tool string",
    )
    got = [(r.value, r.n) for r in field_facet_counts(df, "tool").collect()]
    assert got == [(None, 3), ("a", 2), ("b", 1)]
    no_missing = field_facet_counts(df, "tool", missing=False).collect()
    assert [(r.value, r.n) for r in no_missing] == [("a", 2), ("b", 1)]


def test_function_fields_decoration(spark, mini_idx):
    from solr_ocr_processor_spark.operators.terms import function_fields

    idx = mini_idx
    out = function_fields(spark, idx, "spark merge", "spark", k=10).collect()
    assert out, "flagship-style query must match the mini collection"
    # page invariants: score order, O(k) decoration values
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    tf_map = {
        r["doc_id"]: r["tf"]
        for r in idx.postings.where("term = 'spark'").collect()
    }
    df_spark = {
        r["term"]: r["df"] for r in idx.term_stats.collect()
    }.get("spark", 0)
    for r in out:
        assert r.tf_term == tf_map.get(r.doc_id, 0)
        assert r.df_term == df_spark
        assert r.dl > 0
    # out-of-vocab term: tf 0 everywhere, docfreq() = 0 (Solr contract)
    oov = function_fields(spark, idx, "spark merge", "zzznope", k=5).collect()
    assert oov and all(r.tf_term == 0 and r.df_term == 0 for r in oov)


def test_fragment_snippets_window_and_ellipses(spark):
    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.operators.score import fragment_snippets
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("cA", 0, "user", "a b c spark d e f g spark h", None, t0),
        ("cB", 0, "user", "spark x y z", None, t0),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = {
        r.conv_id: r.fragment
        for r in fragment_snippets(spark, idx, "spark", k=10, frag_words=2).collect()
    }
    # window = 2 words either side of the FIRST hit, trimmed sides
    # marked; the second hit (pos 8) is outside the window and dropped
    assert got["cA"] == "… b c <em>spark</em> d e …"
    # hit at turn start: no leading ellipsis, trailing trim marked
    assert got["cB"] == "<em>spark</em> x y …"
    with pytest.raises(ValueError):
        fragment_snippets(spark, idx, "spark", frag_words=-1)


def test_dsir_resample_gumbel_topk(spark):
    from solr_ocr_processor_spark.operators.pipeline import (
        dsir_importance,
        dsir_resample,
    )

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )
    got = dsir_resample(docs, target_source="tgt", n=3, n_buckets=64).collect()
    assert len(got) == 3
    keys = [r.key for r in got]
    assert keys == sorted(keys, reverse=True)
    # determinism: same seed -> identical sample; n > docs -> all docs
    again = dsir_resample(docs, target_source="tgt", n=3, n_buckets=64).collect()
    assert [(r.doc_id, r.key) for r in got] == [(r.doc_id, r.key) for r in again]
    assert dsir_resample(docs, target_source="tgt", n=100, n_buckets=64).count() == 7
    # the keys really are weight + Gumbel: a doc's key minus its weight
    # is its fixed noise regardless of the other docs' weights
    w = {
        r.doc_id: r.dsir_logratio
        for r in dsir_importance(docs, target_source="tgt", n_buckets=64).collect()
    }
    all_rows = dsir_resample(docs, target_source="tgt", n=100, n_buckets=64).collect()
    noise = {r.doc_id: round(r.key - w[r.doc_id], 4) for r in all_rows}
    w2 = {
        r.doc_id: r
        for r in dsir_resample(
            docs.withColumn("source", F.lit("tgt")), target_source="tgt",
            n=100, n_buckets=64,
        ).collect()
    }
    # weights all collapse when every doc is target-sourced, but the
    # per-doc noise (key - weight, now key - 0) is unchanged
    for d, g in noise.items():
        assert round(w2[d].key, 4) == pytest.approx(g, abs=2e-4)
    with pytest.raises(ValueError):
        dsir_resample(docs, n=0)


def test_bm25_batch_topk_bit_identical_to_single(spark, mini_idx):
    from solr_ocr_processor_spark.operators.score import bm25_batch_topk, bm25_topk

    idx = mini_idx
    qs = {"a": "spark", "b": "spark pad", "c": "nothing"}
    batch = bm25_batch_topk(spark, idx, qs, k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, q in qs.items():
        single = bm25_topk(spark, idx, q, k=10).collect()
        got = by_q.get(qid, [])
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in single
        ], f"batch != single for {qid!r}"  # EXACT float equality
        assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # degenerate workloads
    assert bm25_batch_topk(spark, idx, {}, k=5).count() == 0
    assert bm25_batch_topk(spark, idx, {"x": "???"}, k=5).count() == 0


def test_parse_mm_spec_solr_semantics():
    from solr_ocr_processor_spark.operators.query import parse_mm_spec

    # absolute / negative / percentage (int-truncated) / neg-percentage
    assert parse_mm_spec("3", 5) == 3
    assert parse_mm_spec("-2", 5) == 3
    assert parse_mm_spec("75%", 5) == 3          # (5*75)//100
    assert parse_mm_spec("-25%", 5) == 4         # 5 - (5*25)//100
    # clamping: over-large -> n, under-small -> 1
    assert parse_mm_spec("9", 4) == 4
    assert parse_mm_spec("-9", 4) == 1
    # conditionals: greatest threshold below n wins; n at/below every
    # threshold -> all clauses required
    assert parse_mm_spec("2<75% 5<50%", 6) == 3   # 5<50% -> (6*50)//100
    assert parse_mm_spec("2<75% 5<50%", 4) == 3   # 2<75% -> (4*75)//100
    assert parse_mm_spec("2<75%", 2) == 2         # no clause applies -> all
    assert parse_mm_spec("3", 0) == 0
    for bad in ("", "x", "5<", "a<50%", "50%%", "1<2<3"):
        with pytest.raises(ValueError):
            parse_mm_spec(bad, 5)


def test_collapse_expand_component(spark):
    import datetime

    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.operators.collapse import (
        collapse_expand,
        collapse_topk,
    )
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1)
    pad = " ".join(["pad"] * 70)  # bucket 1 at width 64
    rows = [
        # group 0: three docs with spark tf 3/2/1 (dl equal)
        ("g0a", 0, "user", "spark spark spark x y z", None, t0),
        ("g0b", 0, "user", "spark spark x y z w", None, t0),
        ("g0c", 0, "user", "spark x y z w v", None, t0),
        # group 1: single long doc
        ("g1a", 0, "user", f"spark {pad}", None, t0),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    out = collapse_expand(spark, idx, "spark", width=64, k=10, expand_rows=2)
    got = [(r.conv_id, r.group, r.expanded) for r in out.collect()]
    page = [(c, g) for c, g, e in got if not e]
    exp = [(c, g) for c, g, e in got if e]
    # page == collapse_topk's champions
    champs = [(r.conv_id, r.group)
              for r in collapse_topk(spark, idx, "spark", width=64, k=10).collect()]
    assert sorted(page) == sorted(champs)
    # group 0 expands to its two runners-up in score order; group 1
    # has nothing hidden
    assert exp == [("g0b", 0), ("g0c", 0)]
    # k=1: only the best champion's group expands
    one = collapse_expand(spark, idx, "spark", width=64, k=1, expand_rows=2)
    rows1 = one.collect()
    assert len([r for r in rows1 if not r.expanded]) == 1
    assert {r.group for r in rows1} == {rows1[0].group}
    with pytest.raises(ValueError):
        collapse_expand(spark, idx, "spark", expand_rows=0)


def test_group_sort_within_groups(spark, mini_idx):
    from solr_ocr_processor_spark.operators.collapse import group_topk

    idx = mini_idx
    # default group.sort == score desc (regression: same as before)
    base = group_topk(spark, idx, "spark", width=64, k=5, group_limit=3)
    b = [(r.group, r.rn, r.conv_id) for r in base.collect()]
    # dl asc: within group 0, the SHORTEST doc ranks first, while
    # group ordering stays by each group's best score
    dl_sorted = group_topk(
        spark, idx, "spark", width=64, k=5, group_limit=3,
        group_sort="dl asc",
    )
    d = [(r.group, r.rn, r.conv_id) for r in dl_sorted.collect()]
    g0_base = [c for g, _, c in b if g == 0]
    g0_dl = [c for g, _, c in d if g == 0]
    assert set(g0_base) == set(g0_dl)          # same members
    # group 0 docs: cA dl=2, cC dl=2, cD dl=2? (cD has no match) —
    # both orders deterministic; dl ties fall to doc_id asc
    assert g0_dl == sorted(g0_dl, key=lambda c: c)  # dl equal -> doc order
    with pytest.raises(ValueError):
        group_topk(spark, idx, "spark", group_sort="nope asc")
    with pytest.raises(ValueError):
        group_topk(spark, idx, "spark", group_sort="score sideways")


def test_field_facet_sort_limit_offset(spark):
    from solr_ocr_processor_spark.operators.facet import field_facet_counts

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(["b"] * 3 + ["a"] * 3 + ["c"] + [None])],
        "id long, tool string",
    )
    # facet.sort=index: pure value order; the missing bucket appends
    # AFTER the value list (Solr's response shape)
    idx_order = [r.value for r in
                 field_facet_counts(df, "tool", sort="index").collect()]
    assert idx_order == ["a", "b", "c", None]
    # paging over count order (a/b tie at 3 -> value asc)
    page = field_facet_counts(df, "tool", limit=2, offset=1).collect()
    assert [(r.value, r.n) for r in page] == [("b", 3), ("c", 1)]
    assert [r.value for r in field_facet_counts(df, "tool", limit=1).collect()] == ["a"]
    for bad in (dict(sort="nope"), dict(limit=-1), dict(offset=-2)):
        with pytest.raises(ValueError):
            field_facet_counts(df, "tool", **bad)
