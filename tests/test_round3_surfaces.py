"""Round-3 late surfaces: terms/tv components, {!join}, hybrid RRF,
unigram-LM perplexity scoring, substring-window dedup, session
windows. Hand-computed expectations on purpose-built mini-corpora."""

from __future__ import annotations

import datetime
import math

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("c00000000", 0, "user", "spark shuffle spark merge", None, TS),
        ("c00000001", 0, "user", "spark window functions", None, TS),
        ("c00000002", 0, "user", "sort merge join plans", None, TS),
        ("c00000003", 0, "user", "window window sort spark", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    idx = build_postings(t)
    idx.postings.persist().count()
    return idx


# ---------------------------------------------------------------------------
# terms component
# ---------------------------------------------------------------------------


def test_terms_enum_regex_and_mincount(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import terms_enum

    # df: spark=3, window=2, sort=2, merge=2, shuffle=1, ...
    got = [
        (r["term"], r["df"], r["cf"])
        for r in terms_enum(spark, tiny, regex="s[a-z]*", mincount=2).collect()
    ]
    assert got == [("spark", 3, 4), ("sort", 2, 2)]


def test_terms_enum_order_and_limit(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import terms_enum

    got = [r["term"] for r in terms_enum(spark, tiny, mincount=2, limit=2).collect()]
    # df desc then term asc: spark(3), then merge/sort/window(2) -> merge
    assert got == ["spark", "merge"]


def test_terms_enum_bad_regex_empty(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import terms_enum

    assert terms_enum(spark, tiny, regex="s[").count() == 0


def test_terms_regex_validator_rejects_dialect_divergence():
    """Patterns that compile in Python but crash Java (`a{`) or that
    Java accepts and RE2 rejects (backreferences) must be rejected
    BEFORE reaching either engine."""
    from solr_ocr_processor_spark.operators.terms import is_valid_terms_regex

    assert not is_valid_terms_regex("a{")  # Java PatternSyntaxException
    assert not is_valid_terms_regex("a{1,2}")  # braces excluded outright
    assert not is_valid_terms_regex(r"(a)\1")  # backrefs: Java-only
    assert not is_valid_terms_regex("")
    assert is_valid_terms_regex("s[a-z]*")
    assert is_valid_terms_regex("(sp|so)rk?")


def test_term_vectors_values(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import term_vectors

    got = {
        r["term"]: (r["tf"], r["df"], r["tf_idf_scaled"])
        for r in term_vectors(spark, tiny, "c00000003").collect()
    }
    assert set(got) == {"window", "sort", "spark"}
    assert got["window"][:2] == (2, 2)
    assert got["sort"][:2] == (1, 2)
    assert got["spark"][:2] == (1, 3)
    # tf * ln(4/df) * 1e6, rounded
    assert got["window"][2] == round(2 * math.log(4 / 2) * 1e6)
    assert got["spark"][2] == round(1 * math.log(4 / 3) * 1e6)


def test_term_vectors_unknown_doc_empty(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import term_vectors

    assert term_vectors(spark, tiny, "cNOPE").count() == 0


# ---------------------------------------------------------------------------
# {!join} query parser
# ---------------------------------------------------------------------------


def test_join_topk_restricts_but_keeps_scores(spark, tiny):
    from solr_ocr_processor_spark.operators.query import join_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    # dimension: doc_id matches the conv key rule c0000000N -> N
    dim = spark.createDataFrame(
        [(0, "web"), (1, "web"), (2, "code"), (3, "code")],
        "doc_id long, source string",
    )
    unfiltered = {
        r["conv_id"]: r["score"]
        for r in bm25_topk(spark, tiny, "spark merge", k=10).collect()
    }
    joined = join_topk(spark, tiny, "spark merge", dim, "source:web", k=10).collect()
    assert {r["conv_id"] for r in joined} == {"c00000000", "c00000001"}
    # Solr rule: the join filters the match set, never the statistics
    for r in joined:
        assert r["score"] == unfiltered[r["conv_id"]]


def test_join_topk_bad_filter(spark, tiny):
    from solr_ocr_processor_spark.operators.query import JoinSyntaxError, join_topk

    dim = spark.createDataFrame([(0, "web")], "doc_id long, source string")
    with pytest.raises(JoinSyntaxError):
        join_topk(spark, tiny, "spark", dim, "nosuchfield:x")
    with pytest.raises(JoinSyntaxError):
        join_topk(spark, tiny, "spark", dim, "source = web")
    # dimension missing the filtered column is a 400, not a traceback
    with pytest.raises(JoinSyntaxError):
        join_topk(spark, tiny, "spark", dim, "lang:en")
    no_key = spark.createDataFrame([("web",)], "source string")
    with pytest.raises(JoinSyntaxError):
        join_topk(spark, tiny, "spark", no_key, "source:web")


# ---------------------------------------------------------------------------
# hybrid RRF fusion
# ---------------------------------------------------------------------------


def test_rrf_fusion_hand_check(spark, tiny):
    from solr_ocr_processor_spark.operators.hybrid import rrf_fusion_topk

    # embeddings: make c00000002 the vector winner while lexical top is
    # c00000000/c00000003 — fusion must combine both lists.
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = rrf_fusion_topk(
        spark, tiny, embs, "spark merge", [0.0, 1.0], k=4, window=4
    ).collect()
    by_conv = {r["conv_id"]: r for r in out}
    # vector ranks: cos with [0,1]: id2=1.0, id3=.707, id1=.110, id0=0
    assert by_conv["c00000002"]["vec_rank"] == 1
    # every fused score = 1/(60+lex) + 1/(60+vec) for present ranks
    for r in out:
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (60 + r["lex_rank"])
        if r["vec_rank"] is not None:
            want += 1.0 / (60 + r["vec_rank"])
        assert r["rrf_score"] == pytest.approx(round(want, 6), abs=1e-9)
    # ordering is rrf desc
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_k_gt_window_rejected(spark, tiny):
    from solr_ocr_processor_spark.operators.hybrid import rrf_fusion_topk

    embs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        rrf_fusion_topk(spark, tiny, embs, "spark", [1.0, 0.0], k=20, window=10)


# ---------------------------------------------------------------------------
# unigram-LM scoring
# ---------------------------------------------------------------------------


def test_doc_nll_hand_values(spark):
    from solr_ocr_processor_spark.functions.lm import doc_nll

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")],
        "doc_id long, text string",
    )
    # corpus: a=2, b=2, c=1, total=5
    lp = {
        "a": round(math.log(2 / 5) * 1e6),
        "b": round(math.log(2 / 5) * 1e6),
        "c": round(math.log(1 / 5) * 1e6),
    }
    got = {r["doc_id"]: r for r in doc_nll(docs).collect()}
    assert got[0]["n_tokens"] == 3
    assert got[0]["nll_scaled"] == -(2 * lp["a"] + lp["b"])
    assert got[0]["avg_nll"] == round(-(2 * lp["a"] + lp["b"]) / 3 / 1e6, 4)
    assert got[1]["nll_scaled"] == -(lp["b"] + lp["c"])
    # empty doc survives with zero tokens and NULL avg
    assert got[2]["n_tokens"] == 0
    assert got[2]["nll_scaled"] == 0
    assert got[2]["avg_nll"] is None


def test_doc_nll_rare_tokens_score_worse(spark):
    from solr_ocr_processor_spark.functions.lm import doc_nll

    docs = spark.createDataFrame(
        [(0, "common common common common"), (1, "rare1 rare2 rare3 rare4")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_nll"] for r in doc_nll(docs).collect()}
    assert got[1] > got[0]  # higher perplexity for the rare-token doc


# ---------------------------------------------------------------------------
# substring-window dedup
# ---------------------------------------------------------------------------


def test_dup_span_profile_shared_window(spark):
    from solr_ocr_processor_spark.operators.dedup import dup_span_profile

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (0, shared + " tail0 alpha beta"),
            (1, "head1 " + shared),
            (2, "totally different words with no overlap here at all ok"),
            (3, "short doc"),  # < 8 tokens -> zero windows
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_profile(docs, k=8).collect()}
    # doc0: 11 tokens -> 4 windows, the first equals doc1's last window
    assert got[0]["n_windows"] == 4
    assert got[0]["n_dup_windows"] == 1
    assert got[0]["dup_frac"] == round(1 / 4, 6)
    assert got[1]["n_windows"] == 2
    assert got[1]["n_dup_windows"] == 1
    assert got[2]["n_dup_windows"] == 0
    assert got[3]["n_windows"] == 0 and got[3]["dup_frac"] is None


def test_dup_span_profile_within_doc_repeat_not_dup(spark):
    from solr_ocr_processor_spark.operators.dedup import dup_span_profile

    rep = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [(0, rep + " " + rep), (1, "unrelated text entirely here ok")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_span_profile(docs, k=8).collect()}
    # the repeated window occurs twice in doc0 but in no OTHER doc:
    # cross-doc dup count must be 0 (distinct (doc, window) first)
    assert got[0]["n_dup_windows"] == 0


# ---------------------------------------------------------------------------
# session windows
# ---------------------------------------------------------------------------


def _ev(uid, minute, value=1.0):
    return (
        uid * 1000 + minute,
        datetime.datetime(2026, 1, 1, 0, minute),
        uid,
        "click",
        value,
        "{}",
    )


EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_sessionize_merges_within_gap(spark):
    from solr_ocr_processor_spark.streaming.ingest import sessionize_events

    events = spark.createDataFrame(
        [
            _ev(1, 0, 2.0),
            _ev(1, 5, 3.0),   # within 10m of prev -> same session
            _ev(1, 30),       # 25m gap -> new session
            _ev(2, 0),        # other user: own session
        ],
        EV_SCHEMA,
    )
    got = [
        (r["user_id"], r["session_start"], r["n_events"], r["value_sum_scaled"])
        for r in sessionize_events(events, gap="10 minutes")
        .orderBy("user_id", "session_start")
        .collect()
    ]
    t0 = int(datetime.datetime(2026, 1, 1).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got == [
        (1, t0, 2, 5_000_000),
        (1, t0 + 1800, 1, 1_000_000),
        (2, t0, 1, 1_000_000),
    ]


def test_sessionize_gap_boundary_exact(spark):
    from solr_ocr_processor_spark.streaming.ingest import sessionize_events

    # Spark extends a session while next.ts <= prev.ts + gap: a diff of
    # exactly gap still MERGES; one microsecond past it does not. The
    # DuckDB twin's island break is therefore strictly `> gap`.
    events = spark.createDataFrame([_ev(1, 0), _ev(1, 10)], EV_SCHEMA)
    assert len(sessionize_events(events, gap="10 minutes").collect()) == 1
    late = datetime.datetime(2026, 1, 1, 0, 10, 0, 1)
    events2 = spark.createDataFrame(
        [_ev(1, 0), (1001, late, 1, "click", 1.0, "{}")], EV_SCHEMA
    )
    assert len(sessionize_events(events2, gap="10 minutes").collect()) == 2


def test_sessionize_streaming_availablenow(spark, tmp_path):
    """The SAME plan runs as a real stream (session_window + watermark
    in append mode) — batch/stream parity for the session operator."""
    from solr_ocr_processor_spark.streaming.ingest import sessionize_events

    events = spark.createDataFrame(
        [_ev(1, 0), _ev(1, 5), _ev(1, 30)], EV_SCHEMA
    )
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        sessionize_events(stream, gap="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sess_test").collect()
    # watermark closes no windows in a single availableNow batch unless
    # max event time passes gap+watermark; accept either flushed rows
    # or a clean empty append — the assertion is the plan RUNS as a
    # stream. Batch-mode equality is covered above.
    assert isinstance(rows, list)


# ---------------------------------------------------------------------------
# stats.percentiles + bloom decontamination
# ---------------------------------------------------------------------------


def test_stats_percentiles_hand_values(spark, tiny):
    from solr_ocr_processor_spark.operators.facet import stats_percentiles

    # query "spark": matches docs c0 (dl=4), c1 (dl=3), c3 (dl=4)
    row = stats_percentiles(
        spark, tiny, "spark", field="dl", percentiles=(0.5, 0.9)
    ).first()
    assert row["n"] == 3
    # sorted v = [3, 4, 4]; p50: idx (3-1)*0.5 = 1 -> 4.0
    assert row["p50"] == 4.0
    # p90: idx 1.8 -> 4 + 0.8*(4-4) = 4.0
    assert row["p90"] == 4.0


def test_stats_percentiles_interpolation(spark, tiny):
    from solr_ocr_processor_spark.operators.facet import stats_percentiles

    # query "spark merge": matches c0(4), c1(3), c2(4), c3(4)
    row = stats_percentiles(
        spark, tiny, "spark merge", field="dl", percentiles=(0.25,)
    ).first()
    # sorted [3,4,4,4]; idx (4-1)*0.25 = 0.75 -> 3 + 0.75*(4-3) = 3.75
    assert row["n"] == 4 and row["p25"] == 3.75


def test_stats_percentiles_validation(spark, tiny):
    import pytest as _pytest

    from solr_ocr_processor_spark.operators.facet import stats_percentiles

    with _pytest.raises(ValueError):
        stats_percentiles(spark, tiny, "spark", field="nope")
    with _pytest.raises(ValueError):
        stats_percentiles(spark, tiny, "spark", percentiles=(1.5,))
    # zero-match query still yields one n=0 row (stats_field contract);
    # an unanalyzable (empty) query yields zero rows
    row = stats_percentiles(spark, tiny, "zzzz absent").first()
    assert row["n"] == 0 and row["p25"] is None
    assert stats_percentiles(spark, tiny, "").count() == 0


def test_bloom_no_false_negatives(spark):
    from solr_ocr_processor_spark.operators.pipeline import (
        bloom_contamination_flags,
        contamination_flags,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six"),
            (2, "unique words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "gamma delta epsilon zeta something else")],
        "doc_id long, text string",
    )
    ex = {r["doc_id"]: r["n_hits"] for r in contamination_flags(docs, ev, n=3).collect()}
    bl = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in bloom_contamination_flags(docs, ev, n=3).collect()
    }
    # Bloom may over-flag (false positives) but NEVER under-flag
    assert set(bl) == set(ex)
    assert all(bl[k] >= ex[k] for k in ex)
    # on this tiny key set the filter is far under capacity: exact match
    assert bl == ex


def test_bloom_m_validation(spark):
    import pytest as _pytest

    from solr_ocr_processor_spark.operators.pipeline import (
        bloom_contamination_flags,
    )

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bloom_contamination_flags(docs, docs, n=3, m=100)
    with _pytest.raises(ValueError):
        bloom_contamination_flags(docs, docs, n=0)


def test_token_count_bpe_hand_values(spark):
    from solr_ocr_processor_spark.functions.textstats import token_count_bpe

    docs = spark.createDataFrame(
        [
            (0, "it's over 9000 tokens, isn't it?  yes"),
            (1, ""),
            (2, "plain words here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_count_bpe(docs).collect()}
    # hand split: it|'s| over| 900|0| tokens|,| isn|'t| it|?|yes = 12
    assert got[0]["n_pieces"] == 12 and got[0]["n_tokens"] == 9
    assert got[0]["pieces_per_token"] == round(12 / 9, 6)
    assert got[1]["n_pieces"] == 0 and got[1]["pieces_per_token"] is None
    # plain lowercase words: pieces == words
    assert got[2]["n_pieces"] == got[2]["n_tokens"] == 3


# ---------------------------------------------------------------------------
# int8 quantized ANN
# ---------------------------------------------------------------------------


def test_quantize_embeddings_bounds_and_ties(spark):
    from solr_ocr_processor_spark.operators.ann import quantize_embeddings

    half = 0.5 / 127  # scales exactly to 0.5 -> away-from-zero tie
    embs = spark.createDataFrame(
        [(0, [1.0, half, -half]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["id"]: r for r in quantize_embeddings(embs).collect()}
    # float32 storage perturbs `half` slightly off the exact .5 tie,
    # so assert the quantized magnitude bound rather than the tie value
    q0 = got[0]["qvec"]
    assert q0[0] == 127 and abs(q0[1]) <= 1 and abs(q0[2]) <= 1
    assert all(-127 <= x <= 127 for x in q0)
    assert got[1]["qvec"] == [0, 0, 0] and got[1]["scale"] == 0.0
    assert got[1]["qnorm"] == 0.0


def test_int8_topk_matches_brute_top1(spark):
    import numpy as np

    from solr_ocr_processor_spark.operators.ann import cosine_topk, int8_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).astype("float32")
    embs = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[3]]
    brute = cosine_topk(embs, qv, k=5).collect()
    quant = int8_topk(embs, qv, k=5, refine=4).collect()
    # the quantized path reranks exactly, so the self-match leads and
    # the reported cosines are the exact ones
    assert quant[0]["id"] == brute[0]["id"] == 3
    assert quant[0]["cos"] == brute[0]["cos"]
    # int8 at dim 16 is high-fidelity: top-5 should agree on this data
    assert [r["id"] for r in quant] == [r["id"] for r in brute]


def test_int8_topk_zero_query(spark):
    from solr_ocr_processor_spark.operators.ann import int8_topk

    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = int8_topk(embs, [0.0, 0.0], k=2).collect()
    # zero query: all quantized cosines 0, exact rerank gives NaN-free 0s
    assert len(out) == 2


def test_doc_bigram_nll_hand_values_with_backoff(spark):
    from solr_ocr_processor_spark.functions.lm import doc_bigram_nll

    train = spark.createDataFrame([(100, "a b a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a c"), (2, "")],
        "doc_id long, text string",
    )
    # train corpus: a=2 b=2 total=4; bigrams (a,b)x2 (b,a)x1
    uni = round(math.log(2 / 4) * 1e6)          # -693147
    bg_ab = round(math.log(2 / 2) * 1e6)        # 0
    bg_ba = round(math.log(1 / 2) * 1e6)        # -693147
    ln_alpha = round(math.log(0.4) * 1e6)       # -916291
    floor = round(math.log(1 / 4) * 1e6)        # OOV: one count's worth
    got = {r.doc_id: r for r in doc_bigram_nll(docs, train_docs=train).collect()}
    # doc0: (·,a)=uni, (a,b), (b,a), (a,b)
    assert got[0].n_tokens == 4
    assert got[0].nll_scaled == -(uni + bg_ab + bg_ba + bg_ab)
    assert got[0].avg_nll == round(got[0].nll_scaled / 4 / 1e6, 4)
    # doc1: (·,b)=uni, (b,a)=bigram, (a,c)=unseen bigram + OOV w2
    assert got[1].n_tokens == 3
    assert got[1].nll_scaled == -(uni + bg_ba + (ln_alpha + floor))
    # empty doc survives
    assert got[2].n_tokens == 0 and got[2].nll_scaled == 0
    assert got[2].avg_nll is None


def test_doc_bigram_nll_self_trained_orders_fluency(spark):
    from solr_ocr_processor_spark.functions.lm import doc_bigram_nll, doc_nll

    docs = spark.createDataFrame(
        [
            (0, "the cat sat the cat sat the cat sat"),
            (1, "the the the cat cat cat sat sat sat"),  # same unigrams, regrouped
        ],
        "doc_id long, text string",
    )
    big = {r.doc_id: r for r in doc_bigram_nll(docs).collect()}
    # identical unigram NLL, but the repeated-bigram doc is more
    # predictable under the bigram model
    un = {r.doc_id: r.nll_scaled for r in doc_nll(docs).collect()}
    assert un[0] == un[1]
    assert big[0].nll_scaled < big[1].nll_scaled
    assert big[0].n_tokens == big[1].n_tokens == 9
