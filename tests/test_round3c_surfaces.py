"""Round-3 late surfaces: block-join nested docs ({!parent}/{!child}),
query elevation, atomic update (MERGE), and the C4 token-blocklist
gate. Hand-computed expectations on purpose-built mini-corpora."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.nested import (
    build_child_index,
    child_expand,
    parent_topk,
)
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)

ROWS = [
    # conv A: two turns, 'spark' concentrated in turn 1
    ("convA", 0, "user", "spark spark spark merge", None, TS),
    ("convA", 1, "assistant", "sort join plans", None, TS),
    # conv B: one long diluted turn
    ("convB", 0, "user", "spark window sort join merge filter scan agg", None, TS),
    # conv C: no query terms
    ("convC", 0, "user", "rows columns tables", None, TS),
    # conv D: empty turn must not become a child doc
    ("convD", 0, "user", "   ", None, TS),
    ("convD", 1, "assistant", "spark merge", None, TS),
]


@pytest.fixture(scope="module")
def tiny(spark):
    t = spark.createDataFrame(ROWS, TRANSCRIPT_SCHEMA)
    idx = build_postings(t)
    idx.postings.persist().count()
    return idx


@pytest.fixture(scope="module")
def child_idx(spark):
    t = spark.createDataFrame(ROWS, TRANSCRIPT_SCHEMA)
    cidx = build_child_index(t)
    cidx.postings.persist().count()
    return cidx


# ---------------------------------------------------------------------------
# {!parent} block join
# ---------------------------------------------------------------------------


def test_child_index_units_are_nonempty_turns(child_idx):
    # 5 non-empty turns total (A has 2, B 1, C 1, D 1-after-skip)
    assert child_idx.corpus.first()["n_docs"] == 5
    metas = {r["conv_id"] for r in child_idx.doc_meta.collect()}
    assert metas == {
        "convA#0000000000",
        "convA#0000000001",
        "convB#0000000000",
        "convC#0000000000",
        "convD#0000000001",
    }


def test_parent_max_equals_best_child(spark, tiny, child_idx):
    from solr_ocr_processor_spark.operators.score import bm25_topk

    # per-child scores straight from the child index's own scorer
    kids = bm25_topk(spark, child_idx, "spark merge", k=100).collect()
    best: dict[str, float] = {}
    hits: dict[str, int] = {}
    for r in kids:
        p = r["conv_id"].split("#")[0]
        best[p] = max(best.get(p, float("-inf")), r["score"])
        hits[p] = hits.get(p, 0) + 1
    got = parent_topk(spark, child_idx, "spark merge", k=10, mode="max").collect()
    assert [r["conv_id"] for r in got] == sorted(
        best, key=lambda p: (-best[p], p)
    )
    for r in got:
        assert r["score"] == pytest.approx(best[r["conv_id"]], abs=1e-12)
        assert r["n_child_hits"] == hits[r["conv_id"]]
    # convC matches nothing; convD's empty turn contributed no child
    assert "convC" not in {r["conv_id"] for r in got}


def test_parent_modes_sum_avg_min(spark, child_idx):
    from solr_ocr_processor_spark.operators.score import bm25_topk

    kids = bm25_topk(spark, child_idx, "spark merge", k=100).collect()
    per: dict[str, list[float]] = {}
    for r in kids:
        per.setdefault(r["conv_id"].split("#")[0], []).append(r["score"])
    for mode, fn in (
        ("sum", sum),
        ("min", min),
        ("avg", lambda v: sum(v) / len(v)),
    ):
        got = parent_topk(spark, child_idx, "spark merge", k=10, mode=mode).collect()
        for r in got:
            assert r["score"] == pytest.approx(fn(per[r["conv_id"]]), rel=1e-12)
    with pytest.raises(ValueError):
        parent_topk(spark, child_idx, "spark", mode="total")


def test_dilution_ranks_concentrated_turn_first(spark, child_idx):
    # convA's 4-token turn has tf(spark)=3; convB's 8-token turn tf=1 —
    # turn-level BM25 must put A first even though doc-level dl is close.
    got = parent_topk(spark, child_idx, "spark", k=2, mode="max").collect()
    assert got[0]["conv_id"] == "convA"


# ---------------------------------------------------------------------------
# {!child} expand
# ---------------------------------------------------------------------------


def test_child_expand_returns_all_turns_of_winners(spark, tiny):
    out = child_expand(spark, tiny, "spark merge", k=2).collect()
    by_conv: dict[str, set[int]] = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], set()).add(r["ordinal"])
    # top-2 parents by doc-level BM25 both come back with every turn
    assert len(by_conv) == 2
    for conv, ords in by_conv.items():
        if conv == "convA":
            assert ords == {0, 1}
        else:
            assert ords == {0}
    # parent_score is constant per conv
    for conv in by_conv:
        scores = {r["parent_score"] for r in out if r["conv_id"] == conv}
        assert len(scores) == 1


# ---------------------------------------------------------------------------
# query elevation
# ---------------------------------------------------------------------------


def test_elevation_pins_in_order_then_organic(spark, tiny):
    from solr_ocr_processor_spark.operators.query import elevation_topk

    got = elevation_topk(
        spark, tiny, "spark merge", ["convC", "convB"], k=4
    ).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4]
    assert got[0]["conv_id"] == "convC" and got[0]["elevated"]
    assert got[1]["conv_id"] == "convB" and got[1]["elevated"]
    # convC never matches the query -> injected with score 0.0
    assert got[0]["score"] == 0.0
    # convB does match -> keeps its real (positive) score
    assert got[1]["score"] > 0.0
    # organic tail excludes the pins and stays score-ordered
    tail = [r for r in got if not r["elevated"]]
    assert {r["conv_id"] for r in tail}.isdisjoint({"convB", "convC"})
    assert [r["score"] for r in tail] == sorted(
        (r["score"] for r in tail), reverse=True
    )


def test_elevation_without_pins_is_plain_bm25(spark, tiny):
    from solr_ocr_processor_spark.operators.query import elevation_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    got = elevation_topk(spark, tiny, "spark merge", [], k=3).collect()
    want = bm25_topk(spark, tiny, "spark merge", k=3).collect()
    assert [r["conv_id"] for r in got] == [r["conv_id"] for r in want]
    assert all(not r["elevated"] for r in got)


# ---------------------------------------------------------------------------
# atomic update (MERGE INTO)
# ---------------------------------------------------------------------------


def test_atomic_update_set_inc_upsert(spark):
    from solr_ocr_processor_spark.operators.lifecycle import atomic_update

    base = spark.createDataFrame(
        [("a", "en", 10), ("b", "de", 20), ("c", "fr", 30)],
        "conv_id string, lang string, views long",
    )
    updates = spark.createDataFrame(
        [
            ("a", "xx", None),   # set only
            ("b", None, 5),      # inc only
            ("c", "yy", 7),      # both on one row
            ("d", None, 3),      # upsert: inc starts from 0
            ("e", "zz", None),   # upsert: set only, views stays NULL
        ],
        "conv_id string, set_lang string, inc_views long",
    )
    got = {r["conv_id"]: r for r in atomic_update(base, updates).collect()}
    assert (got["a"]["lang"], got["a"]["views"]) == ("xx", 10)
    assert (got["b"]["lang"], got["b"]["views"]) == ("de", 25)
    assert (got["c"]["lang"], got["c"]["views"]) == ("yy", 37)
    assert (got["d"]["lang"], got["d"]["views"]) == (None, 3)
    assert (got["e"]["lang"], got["e"]["views"]) == ("zz", None)
    assert len(got) == 5


def test_atomic_update_untouched_rows_pass_through(spark):
    from solr_ocr_processor_spark.operators.lifecycle import atomic_update

    base = spark.createDataFrame(
        [("a", 1), ("b", 2)], "conv_id string, views long"
    )
    updates = spark.createDataFrame([("a", 10)], "conv_id string, inc_views long")
    got = {r["conv_id"]: r["views"] for r in atomic_update(base, updates).collect()}
    assert got == {"a": 11, "b": 2}


def test_atomic_update_rejects_unknown_target(spark):
    from solr_ocr_processor_spark.operators.lifecycle import atomic_update

    base = spark.createDataFrame([("a", 1)], "conv_id string, views long")
    updates = spark.createDataFrame([("a", 1)], "conv_id string, inc_clicks long")
    with pytest.raises(ValueError, match="clicks"):
        atomic_update(base, updates)


# ---------------------------------------------------------------------------
# blocklist gate
# ---------------------------------------------------------------------------


def test_blocklist_profile_counts(spark):
    from solr_ocr_processor_spark.operators.pipeline import blocklist_profile

    docs = spark.createDataFrame(
        [
            (0, "clean words only", "s1"),
            (1, "has a GPU inside", "s1"),     # case-insensitive hit
            (2, "gpuless but vector here", "s2"),  # 'gpuless' != 'gpu'; 'vector' hits
            (3, "nothing bad", "s2"),
            (4, "vector vector vector", "s2"),  # multiple hits count once
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (r["n_docs"], r["n_dropped"], r["n_kept"])
        for r in blocklist_profile(docs, ("vector", "gpu")).collect()
    }
    assert got == {"s1": (2, 1, 1), "s2": (3, 2, 1)}


# ---------------------------------------------------------------------------
# incremental (cross-corpus) dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_new_vs_corpus_only(spark):
    from solr_ocr_processor_spark.operators.dedup import incremental_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [
            (100, base),
            (101, "completely different words in this corpus document here"),
            # near-dup INSIDE the corpus: must never be reported
            (102, base + " ok"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (0, base + " yes"),   # near-dup of 100 and 102
            (1, "unrelated new content with no overlap whatsoever today"),
        ],
        "doc_id long, text string",
    )
    got = incremental_minhash_dedup(new, corpus, n=3, tau=0.3).collect()
    pairs = {(r["doc_id"], r["dup_of"]) for r in got}
    assert (0, 100) in pairs and (0, 102) in pairs
    # asymmetric: only (new, corpus) pairs, nothing corpus x corpus
    assert all(d in (0, 1) and o in (100, 101, 102) for d, o in pairs)
    assert not any(d == 1 for d, _ in pairs)
    for r in got:
        assert 0.3 <= r["jaccard"] <= 1.0


def test_incremental_dedup_matches_exact_jaccard(spark):
    """LSH + verify == brute-force jaccard on a high-similarity corpus."""
    from solr_ocr_processor_spark.operators.dedup import (
        incremental_minhash_dedup,
        shingles,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [(i, " ".join(words[: 7 + (i % 3)])) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    new = docs.where("doc_id < 3")
    corpus = docs.where("doc_id >= 3")
    got = {
        (r["doc_id"], r["dup_of"]): r["jaccard"]
        for r in incremental_minhash_dedup(new, corpus, tau=0.3).collect()
    }
    # brute force
    sh = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in shingles(docs).collect():
        sh[r["doc_id"]].add(r["shingle"])
    for d in range(3):
        for o in range(3, 10):
            i = len(sh[d] & sh[o])
            u = len(sh[d] | sh[o])
            jac = i / u if u else 0.0
            if jac >= 0.3:
                assert got[(d, o)] == pytest.approx(jac, abs=1e-6)
            else:
                assert (d, o) not in got


# ---------------------------------------------------------------------------
# LTR linear rerank
# ---------------------------------------------------------------------------


def test_ltr_model_scores_and_order(spark, tiny):
    from solr_ocr_processor_spark.operators.query import ltr_topk
    from solr_ocr_processor_spark.operators.score import bm25_scores_terms

    w = (1.0, 0.5, -0.25)
    got = ltr_topk(spark, tiny, "spark merge", k=10, rerank_docs=50, weights=w).collect()
    assert got, "expected matches"
    avgdl = float(tiny.corpus.first()["avgdl"])
    feats = {
        r["doc_id"]: (r["score"], r["n_matched"], r["dl"])
        for r in bm25_scores_terms(
            spark, tiny, ["merge", "spark"], with_match_count=True, with_dl=True
        ).collect()
    }
    for r in got:
        s, n, dl = feats[r["doc_id"]]
        want = w[0] * s + w[1] * (n / 2.0) + w[2] * (dl / avgdl)
        assert r["ltr_score"] == pytest.approx(want, rel=1e-12)
        assert r["bm25"] == pytest.approx(s, rel=1e-12)
    assert [r["ltr_score"] for r in got] == sorted(
        (r["ltr_score"] for r in got), reverse=True
    )


def test_ltr_negative_dl_weight_prefers_short_docs(spark, tiny):
    """With bm25 weight zeroed and a negative dl weight, shorter
    matching docs must outrank longer ones."""
    from solr_ocr_processor_spark.operators.query import ltr_topk

    got = ltr_topk(
        spark, tiny, "spark", k=10, rerank_docs=50, weights=(0.0, 0.0, -1.0)
    ).collect()
    meta = {r["doc_id"]: r["dl"] for r in tiny.doc_meta.collect()}
    dls = [meta[r["doc_id"]] for r in got]
    assert dls == sorted(dls)


# ---------------------------------------------------------------------------
# facet.interval / realtime get / spellcheck.collate / length histogram
# ---------------------------------------------------------------------------


def test_interval_facet_overlapping_counts(spark, tiny):
    from solr_ocr_processor_spark.operators.facet import interval_facet_counts

    # matched docs for 'spark': A(dl=7), B(dl=8), D(dl=2)
    got = {
        r["ival"]: (r["lo"], r["hi"], r["n_docs"])
        for r in interval_facet_counts(
            spark, tiny, "spark", intervals=((0, 7), (7, 8), (0, 100))
        ).collect()
    }
    assert got[0] == (0, 7, 2)     # A and D
    assert got[1] == (7, 8, 2)     # A and B — overlap with ival 0 on A
    assert got[2] == (0, 100, 3)   # everything matched


def test_realtime_get_returns_stored_fields_and_omits_absent(spark, tiny):
    from solr_ocr_processor_spark.operators.query import realtime_get

    got = realtime_get(spark, tiny, ["convA", "convD", "nope"]).collect()
    assert [r["conv_id"] for r in got] == ["convA", "convD"]
    a = got[0]
    assert a["dl"] == 7 and a["n_turns"] == 2
    d = got[1]
    assert d["dl"] == 2 and d["n_turns"] == 1  # empty turn dropped


def test_spellcheck_collate_equals_corrected_query(spark, tiny):
    from solr_ocr_processor_spark.operators.expand import spellcheck_collate
    from solr_ocr_processor_spark.operators.score import bm25_topk

    got = spellcheck_collate(spark, tiny, "sparc merg", k=5).collect()
    want = bm25_topk(spark, tiny, "spark merge", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_spellcheck_collate_identity_on_wellspelled(spark, tiny):
    from solr_ocr_processor_spark.operators.expand import spellcheck_collate
    from solr_ocr_processor_spark.operators.score import bm25_topk

    got = spellcheck_collate(spark, tiny, "spark merge", k=5).collect()
    want = bm25_topk(spark, tiny, "spark merge", k=5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_length_histogram_buckets(spark):
    from solr_ocr_processor_spark.operators.pipeline import length_histogram

    docs = spark.createDataFrame(
        [
            (0, "one", "s"),                  # 1 token  -> bucket 0
            (1, "a b", "s"),                  # 2 tokens -> bucket 1
            (2, "a b c d", "s"),              # 4 tokens -> bucket 2
            (3, "a b c d e f g", "s"),        # 7 tokens -> bucket 2
            (4, "", "s"),                     # 0 tokens -> bucket 0
        ],
        "doc_id long, text string, source string",
    )
    got = {r["bucket"]: r["n_docs"] for r in length_histogram(docs).collect()}
    assert got == {0: 2, 1: 1, 2: 2}


def test_elevation_pin_list_longer_than_page(spark, tiny):
    from solr_ocr_processor_spark.operators.query import elevation_topk

    got = elevation_topk(
        spark, tiny, "spark", ["convC", "convB", "convA"], k=2
    ).collect()
    assert [(r["rank"], r["conv_id"]) for r in got] == [(1, "convC"), (2, "convB")]


# ---------------------------------------------------------------------------
# synonym expansion / boost query
# ---------------------------------------------------------------------------


def test_synonym_group_semantics(spark, tiny):
    """SynonymQuery: group tf = sum of members, df = max of members."""
    import math

    from solr_ocr_processor_spark.operators.expand import synonym_topk

    got = {r["conv_id"]: r["score"] for r in
           synonym_topk(spark, tiny, "merge", {"merge": ("join",)}, k=10).collect()}
    crow = tiny.corpus.first()
    n_docs, avgdl = crow["n_docs"], float(crow["avgdl"])
    stats = {r["term"]: r["df"] for r in tiny.term_stats.collect()}
    gdf = max(stats["merge"], stats["join"])
    idf = math.log1p((n_docs - gdf + 0.5) / (gdf + 0.5))

    def score(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    # convA: merge tf 1 + join tf 1 = 2, dl 7; convB: 1+1=2, dl 8;
    # convD: merge only, tf 1, dl 2
    assert got["convA"] == pytest.approx(score(2, 7), rel=1e-12)
    assert got["convB"] == pytest.approx(score(2, 8), rel=1e-12)
    assert got["convD"] == pytest.approx(score(1, 2), rel=1e-12)
    assert "convC" not in got


def test_synonym_empty_map_is_plain_bm25(spark, tiny):
    from solr_ocr_processor_spark.operators.expand import synonym_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    got = synonym_topk(spark, tiny, "spark merge", {}, k=5).collect()
    want = bm25_topk(spark, tiny, "spark merge", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_synonym_absent_member_contributes_nothing(spark, tiny):
    from solr_ocr_processor_spark.operators.expand import synonym_topk

    base = synonym_topk(spark, tiny, "spark", {}, k=10).collect()
    with_dead = synonym_topk(
        spark, tiny, "spark", {"spark": ("zzzznope",)}, k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in base] == [
        (r["doc_id"], r["score"]) for r in with_dead
    ]


def test_bq_adds_weighted_boost_leg(spark, tiny):
    from solr_ocr_processor_spark.operators.query import bq_topk
    from solr_ocr_processor_spark.operators.score import bm25_scores

    got = bq_topk(spark, tiny, "spark", bq="sort", bq_weight=0.5, k=10).collect()
    main = {r["doc_id"]: r["score"] for r in bm25_scores(spark, tiny, "spark").collect()}
    boost = {r["doc_id"]: r["score"] for r in bm25_scores(spark, tiny, "sort").collect()}
    assert {r["doc_id"] for r in got} == set(main)  # match set = main query only
    for r in got:
        want = main[r["doc_id"]] + 0.5 * boost.get(r["doc_id"], 0.0)
        assert r["boosted"] == pytest.approx(want, rel=1e-12)
        assert r["score"] == pytest.approx(main[r["doc_id"]], rel=1e-12)
    bs = [r["boosted"] for r in got]
    assert bs == sorted(bs, reverse=True)


def test_gopher_rules_per_rule_flags(spark):
    from solr_ocr_processor_spark.operators.pipeline import gopher_rules_profile

    long_ok = " ".join(["word"] * 60)                 # passes everything
    too_short = "only three words"                    # fails word count
    numeric = " ".join(["12345"] * 60)                # fails alpha frac
    longwords = " ".join(["extraordinarily"] * 60)    # fails mean len (15 > 10)
    dup_lines = "\n".join(["same line of words"] * 10)  # fails dup lines + wc
    docs = spark.createDataFrame(
        [
            (0, long_ok, "s1"),
            (1, too_short, "s1"),
            (2, numeric, "s2"),
            (3, longwords, "s2"),
            (4, dup_lines, "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r.asDict() for r in gopher_rules_profile(docs).collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_kept"] == 1
    assert got["s1"]["n_fail_word_count"] == 1
    s2 = got["s2"]
    assert s2["n_kept"] == 0
    assert s2["n_fail_alpha"] == 1
    assert s2["n_fail_mean_len"] == 1
    assert s2["n_fail_dup_lines"] == 1


def test_gopher_rules_multi_fail_counts_each(spark):
    from solr_ocr_processor_spark.operators.pipeline import gopher_rules_profile

    # 10 numeric words: fails word count AND alpha — both tallies tick
    docs = spark.createDataFrame(
        [(0, " ".join(["9"] * 10), "s")], "doc_id long, text string, source string"
    )
    r = gopher_rules_profile(docs).collect()[0]
    assert r["n_fail_word_count"] == 1 and r["n_fail_alpha"] == 1
    assert r["n_kept"] == 0


def test_sft_pairs_bounded_context(spark):
    from solr_ocr_processor_spark.operators.pipeline import sft_pairs

    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "q one"),
            ("c1", 1, "assistant", "a one"),
            ("c1", 2, "user", "q two"),
            ("c1", 3, "assistant", "a two"),
            ("c1", 4, "user", "q three"),
            ("c1", 5, "assistant", "a three"),
            ("c2", 0, "assistant", "opener"),
        ],
        "conv_id string, ordinal int, role string, text string",
    )
    got = {(r["conv_id"], r["ordinal"]): r for r in sft_pairs(turns, 3).collect()}
    assert got[("c1", 1)]["prompt"] == "user: q one"
    assert got[("c1", 1)]["completion"] == "a one"
    assert got[("c1", 3)]["prompt"] == "user: q one\nassistant: a one\nuser: q two"
    # window caps at 3 prior turns — ordinal 0/1 fall out of frame
    assert got[("c1", 5)]["prompt"] == (
        "user: q two\nassistant: a two\nuser: q three"
    )
    # assistant-first conv: empty prompt, still emitted
    assert got[("c2", 0)]["prompt"] == ""
    # user turns never become completions
    assert all(k[1] % 2 == 1 or k[0] == "c2" for k in got)


def test_score_explain_reconstructs_total(spark, tiny):
    from solr_ocr_processor_spark.operators.score import bm25_topk, explain_scores

    rows = explain_scores(spark, tiny, "spark merge", k=3).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top = bm25_topk(spark, tiny, "spark merge", k=3).collect()
    assert set(by_doc) == {r["doc_id"] for r in top}
    for t in top:
        parts = by_doc[t["doc_id"]]
        # per-term components multiply/sum back to the doc total
        assert sum(p["term_score"] for p in parts) == pytest.approx(
            t["score"], rel=1e-9
        )
        for p in parts:
            assert p["term_score"] == pytest.approx(
                p["idf"] * p["tf_norm"], rel=1e-12
            )
            assert p["score"] == pytest.approx(t["score"], rel=1e-12)


def test_synonym_multiword_member_phrase_semantics(spark):
    """SynonymGraphFilter path: a multi-word synonym contributes its
    exact PHRASE occurrences (adjacent, in order) as tf and its
    phrase df to the group max — non-adjacent co-occurrence of the
    words contributes nothing."""
    import datetime
    import math

    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.operators.expand import synonym_topk
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("mlA", 0, "user", "ml rocks a lot today yes", None, t0),
        ("phB", 0, "user", "machine learning rocks so hard now", None, t0),
        ("nonC", 0, "user", "machine shop learning curve x y", None, t0),
        ("bothD", 0, "user", "ml and machine learning win big", None, t0),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = {
        r.conv_id: r.score
        for r in synonym_topk(
            spark, idx, "ml", {"ml": ("machine learning",)}, k=10
        ).collect()
    }
    # phrase docs: phB (1 occurrence), bothD (tf = ml 1 + phrase 1 = 2);
    # nonC has machine+learning NOT adjacent -> excluded entirely
    assert set(got) == {"mlA", "phB", "bothD"}
    crow = idx.corpus.first()
    n_docs, avgdl = crow["n_docs"], float(crow["avgdl"])
    # df: ml in 2 docs, phrase in 2 docs -> group df = 2
    idf = math.log1p((n_docs - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert got["mlA"] == pytest.approx(score(1, 6), rel=1e-12)
    assert got["phB"] == pytest.approx(score(1, 6), rel=1e-12)
    assert got["bothD"] == pytest.approx(score(2, 6), rel=1e-12)
