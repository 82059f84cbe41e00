"""Round-3 late surfaces (batch m): alpha-blend hybrid fusion,
stop+stem analysis chain, tool-transition mining, conversation lint.
Hand-computed expectations on purpose-built mini collections."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.functions.tokenizer import STOPWORDS_EN
from solr_ocr_processor_spark.operators.bm25f import _py_s_stem, stopstem_topk
from solr_ocr_processor_spark.operators.conversation import (
    conv_lint,
    tool_transitions,
)


# ---------------------------------------------------------------- s-stem

@pytest.mark.parametrize(
    "word,stem",
    [
        ("queries", "query"),      # ies -> y
        ("merges", "merge"),       # es -> drop s
        ("windows", "window"),     # s -> drop
        ("goes", "goes"),          # oes guard
        ("trees", "trees"),        # ees guard
        ("bus", "bus"),            # us guard
        ("class", "class"),        # ss guard
        ("as", "as"),              # len <= 2 passes through
        ("merge", "merge"),        # no suffix
    ],
)
def test_py_s_stem_rules(word, stem):
    assert _py_s_stem(word) == stem


def test_s_stem_column_matches_python(spark):
    from solr_ocr_processor_spark.functions.tokenizer import s_stem

    words = ["queries", "merges", "windows", "goes", "trees", "bus",
             "class", "as", "merge", "eies", "aies", "aes"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"] for r in df.select("w", s_stem("w").alias("s")).collect()}
    assert got == {w: _py_s_stem(w) for w in words}


# ---------------------------------------------------------------- stopstem

def test_stopstem_conflates_plural_and_drops_stopwords(spark):
    rows = [
        ("a", 0, "user", "merges windows queries", None, None),
        ("b", 0, "user", "merge window query", None, None),
        ("c", 0, "user", "the and of to", None, None),  # all stopwords
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r["score"]
           for r in stopstem_topk(t, "the merges window query", k=10).collect()}
    # a and b analyze to the identical token bag (merge, window, query)
    # with identical dl -> identical scores; c never matches
    assert out["a"] == out["b"]
    assert "c" not in out
    with pytest.raises(ValueError, match="stopwords"):
        stopstem_topk(t, "the and of", k=10)
    assert "the" in STOPWORDS_EN and "merge" not in STOPWORDS_EN


# ---------------------------------------------------------------- tools

def _tturns(spark):
    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        ("a", 0, "user", "q", None, ts(0)),
        ("a", 1, "assistant", "r", "search", ts(1)),
        ("a", 2, "assistant", "r", None, ts(2)),      # transparent
        ("a", 3, "assistant", "r", "code", ts(3)),
        ("a", 4, "assistant", "r", "search", ts(4)),
        ("b", 0, "assistant", "r", "search", ts(0)),
        ("b", 1, "assistant", "r", "code", ts(1)),
        ("c", 0, "user", "no tools here", None, ts(0)),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_tool_transitions_hand_computed(spark):
    got = {(r["src_tool"], r["dst_tool"]): r["n"]
           for r in tool_transitions(_tturns(spark)).collect()}
    assert got == {
        ("START", "search"): 2,   # conv a + conv b first tool
        ("search", "code"): 2,    # a (through the transparent turn) + b
        ("code", "search"): 1,    # a
    }


# ---------------------------------------------------------------- lint

def test_conv_lint_hand_computed(spark):
    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # clean: user -> assistant -> user -> assistant
        ("ok", 0, "user", "hi", None, ts(0)),
        ("ok", 1, "assistant", "hello", None, ts(1)),
        ("ok", 2, "user", "more", None, ts(2)),
        ("ok", 3, "assistant", "done", None, ts(3)),
        # bad: starts assistant, double-assistant, empty turn,
        # ends with user
        ("bad", 0, "assistant", "hi", None, ts(0)),
        ("bad", 1, "assistant", "again", None, ts(1)),
        ("bad", 2, "user", "   ", None, ts(2)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conv_lint(t).collect()}
    ok, bad = out["ok"], out["bad"]
    assert ok["clean"] and ok["n_turns"] == 4
    assert ok["n_same_role_adjacent"] == 0 and ok["n_empty_turns"] == 0
    assert not bad["clean"]
    assert not bad["starts_with_user"] and not bad["ends_with_assistant"]
    assert bad["n_same_role_adjacent"] == 1 and bad["n_empty_turns"] == 1


def test_conv_lint_order_uses_ts_tiebreak(spark):
    # same turn_idx, ts decides first/last
    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        ("x", 0, "assistant", "late", None, ts(5)),
        ("x", 0, "user", "early", None, ts(1)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = conv_lint(t).collect()[0]
    assert r["starts_with_user"] and r["ends_with_assistant"]


# ---------------------------------------------------------------- blend

def test_blend_alpha_one_matches_bm25_ranking(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.hybrid import blend_fusion_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    idx = e._index(spark, sf_dir)
    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    blend = blend_fusion_topk(
        spark, idx, embs, e.FLAGSHIP_QUERY, qv, alpha=1.0, k=5
    ).collect()
    base = bm25_topk(spark, idx, e.FLAGSHIP_QUERY, k=5).collect()
    assert [r["conv_id"] for r in blend] == [r["conv_id"] for r in base]
    # best lexical hit normalizes to exactly 1.0
    assert blend[0]["norm_lex"] == 1.0
    assert all(0.0 <= r["norm_lex"] <= 1.0 for r in blend)


def test_blend_validations(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.hybrid import blend_fusion_topk

    idx = e._index(spark, sf_dir)
    embs = e._embs(spark, sf_dir)
    with pytest.raises(ValueError, match="alpha"):
        blend_fusion_topk(spark, idx, embs, "q", [0.1], alpha=1.5)
    with pytest.raises(ValueError, match="window"):
        blend_fusion_topk(spark, idx, embs, "q", [0.1], k=100, window=50)


# ---------------------------------------------------------------- ivf-pq

def test_ivfpq_full_probe_matches_inmemory_pq(spark, sf_dir, tmp_path):
    """With every list probed, the stored IVF-PQ path must reproduce
    the in-memory pq_topk exactly (same codebooks, same ADC order,
    same rerank)."""
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann import pq_topk
    from solr_ocr_processor_spark.operators.ann_store import (
        build_ann_store,
        build_pq_store,
        ivfpq_topk_stored,
    )

    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    store = build_ann_store(spark, embs, str(tmp_path / "ann"), dim=64)
    build_pq_store(spark, store, embs)
    full = ivfpq_topk_stored(
        spark, store, embs, qv, k=10, nprobe=store.n_centroids, refine=4
    ).collect()
    mem = pq_topk(embs, qv, k=10, refine=4).collect()
    assert [(r["id"], r["cos"]) for r in full] == [
        (r["id"], r["cos"]) for r in mem
    ]


def test_ivfpq_narrow_probe_subset_and_plan_prunes(spark, sf_dir, tmp_path):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann_store import (
        build_ann_store,
        build_pq_store,
        ivfpq_topk_stored,
    )

    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    store = build_ann_store(spark, embs, str(tmp_path / "ann"), dim=64)
    build_pq_store(spark, store, embs)
    out = ivfpq_topk_stored(spark, store, embs, qv, k=10, nprobe=2)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    # the query vector itself lives in a probed list -> self-retrieval
    assert rows[0]["id"] == 0 and rows[0]["cos"] == 1.0
    # the candidate scan prunes to the probed list partitions: the
    # list_id predicate must reach the scan as a partition filter
    pq = spark.read.parquet(store.path("pq")).where(
        F.col("list_id").isin([0, 1])
    )
    plan = pq._sc._jvm.PythonSQLUtils.explainString(
        pq._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "list_id" in plan


# ---------------------------------------------------------------- matryoshka

def test_matryoshka_full_prefix_is_exact(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann import (
        cosine_topk,
        matryoshka_topk,
    )

    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    full = matryoshka_topk(embs, qv, k=10, prefix_dim=len(qv), refine=4).collect()
    exact = cosine_topk(embs, qv, k=10).collect()
    assert [(r["id"], r["cos"]) for r in full] == [
        (r["id"], r["cos"]) for r in exact
    ]
    with pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_topk(embs, qv, prefix_dim=0)
    with pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_topk(embs, qv, prefix_dim=len(qv) + 1)


def test_matryoshka_self_retrieval(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann import matryoshka_topk

    rows = matryoshka_topk(
        e._embs(spark, sf_dir), e._qvec(spark, sf_dir), k=5, prefix_dim=16
    ).collect()
    assert rows[0]["id"] == 0 and rows[0]["cos"] == 1.0


# ---------------------------------------------------------------- passage

def test_passage_maxp_picks_best_window(spark):
    from solr_ocr_processor_spark.operators.hybrid import passage_topk

    filler = " ".join(["pad"] * 8)
    # doc 1: both terms together in the SECOND window (tokens 6..11);
    # doc 2: terms far apart (never share a window of 6)
    d1 = filler + " alpha beta " + " ".join(["tail"] * 4)
    d2 = "alpha " + " ".join(["mid"] * 30) + " beta"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    out = passage_topk(docs, "alpha beta", k=5, size=6, stride=4).collect()
    assert out[0]["doc_id"] == 1          # co-occurring window wins maxP
    w = out[0]
    # the winning passage actually contains both terms
    assert 4 <= w["tok_start"] <= 8
    assert all(r["score"] > 0 for r in out)
    with pytest.raises(ValueError, match="analyzable"):
        passage_topk(docs, "!!!", k=5)


# ---------------------------------------------------------------- facet.prefix

def test_facet_prefix_filters_and_suppresses_missing(spark):
    from solr_ocr_processor_spark.operators.facet import field_facet_counts

    df = spark.createDataFrame(
        [("apple",), ("apricot",), ("banana",), (None,), ("apple",)],
        "tool string",
    )
    out = field_facet_counts(df, "tool", prefix="ap", missing=False).collect()
    assert {(r["value"], r["n"]) for r in out} == {("apple", 2), ("apricot", 1)}
    # Solr: the missing bucket is INDEPENDENT of facet.prefix
    withm = field_facet_counts(df, "tool", prefix="ap", missing=True).collect()
    assert {(r["value"], r["n"]) for r in withm} == {
        ("apple", 2), ("apricot", 1), (None, 1),
    }
    # no prefix: missing bucket present
    allv = field_facet_counts(df, "tool").collect()
    assert any(r["value"] is None and r["n"] == 1 for r in allv)


# ---------------------------------------------------------------- rm3

def test_rm3_orig_weight_one_is_plain_bm25(spark, sf_dir):
    """ow=1.0 zeroes the expansion leg: ranking must equal plain BM25
    (expansion terms ride with weight 0)."""
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.query import rm3_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    idx = e._index(spark, sf_dir)
    a = [(r["doc_id"], round(r["score"], 6))
         for r in rm3_topk(spark, idx, e.FLAGSHIP_QUERY, k=10,
                           orig_weight=1.0).collect()]
    b = [(r["doc_id"], round(r["score"], 6))
         for r in bm25_topk(spark, idx, e.FLAGSHIP_QUERY, k=10).collect()]
    assert a == b


def test_rm3_expansion_is_deterministic_and_moves_ranking(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.query import rm3_topk

    idx = e._index(spark, sf_dir)
    r1 = [(r["doc_id"], round(r["score"], 6))
          for r in rm3_topk(spark, idx, e.FLAGSHIP_QUERY, k=10).collect()]
    r2 = [(r["doc_id"], round(r["score"], 6))
          for r in rm3_topk(spark, idx, e.FLAGSHIP_QUERY, k=10).collect()]
    assert r1 == r2                      # selection boundary is exact
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_topk(spark, idx, e.FLAGSHIP_QUERY, orig_weight=2.0)


# ---------------------------------------------------------------- ltr log

def test_ltr_features_consistent_with_ltr_topk(spark, sf_dir):
    """The logged features must reproduce ltr_topk's model score:
    w·f == ltr_score for the docs in both windows."""
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.query import ltr_features, ltr_topk

    idx = e._index(spark, sf_dir)
    feats = {r["doc_id"]: r
             for r in ltr_features(spark, idx, e.FLAGSHIP_QUERY,
                                   rerank_docs=50).collect()}
    top = ltr_topk(spark, idx, e.FLAGSHIP_QUERY, k=10, rerank_docs=50).collect()
    w1, w2, w3 = 1.0, 0.5, -0.25
    for r in top:
        f = feats[r["doc_id"]]
        model = (w1 * f["f_bm25"] + w2 * f["f_match_frac"]
                 + w3 * f["f_dl_ratio"])
        assert abs(model - r["ltr_score"]) < 2e-6
    # fractions are valid and the window is full
    assert len(feats) == 50
    assert all(0 < f["f_match_frac"] <= 1.0 for f in feats.values())


# ---------------------------------------------------------------- overlap

def test_source_overlap_detects_copied_source(spark):
    from solr_ocr_processor_spark.operators.pipeline import source_overlap_matrix

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, "s1"),
        (2, base, "s2"),                      # s2 copies s1 entirely
        (3, "one two three four five six", "s3"),  # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap_matrix(docs, n=3).collect()}
    assert out[("s1", "s2")]["jaccard"] == 1.0
    assert out[("s1", "s3")]["n_shared"] == 0
    assert out[("s1", "s3")]["jaccard"] == 0.0
    assert out[("s2", "s3")]["n_shared"] == 0
    # 6 trigrams in an 8-token doc
    assert out[("s1", "s2")]["n_a"] == 6 and out[("s1", "s2")]["n_shared"] == 6


# ---------------------------------------------------------------- lmdir

def test_lmdir_hand_computed(spark, sf_dir):
    """Replay the Dirichlet formula in Python over the index frames
    for the top doc."""
    import math

    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.query import lmdir_topk

    idx = e._index(spark, sf_dir)
    top = lmdir_topk(spark, idx, e.FLAGSHIP_QUERY, k=3, mu=2000.0).collect()
    assert top and top[0]["score"] > 0
    d0 = top[0]["doc_id"]
    T = float(idx.corpus.first()["total_tokens"])
    cfs = {r["term"]: r["cf"] for r in idx.term_stats.where(
        F.col("term").isin(list(e.FLAGSHIP_TERMS))).collect()}
    rows = idx.postings.where(
        (F.col("doc_id") == d0) & F.col("term").isin(list(e.FLAGSHIP_TERMS))
    ).select("term", "tf", "dl").collect()
    exp = sum(
        max(0.0,
            math.log(1.0 + (r["tf"] * T) / (2000.0 * cfs[r["term"]]))
            + math.log(2000.0 / (r["dl"] + 2000.0)))
        for r in rows
    )
    assert abs(top[0]["score"] - round(exp, 6)) < 2e-6
    with pytest.raises(ValueError, match="mu"):
        lmdir_topk(spark, idx, e.FLAGSHIP_QUERY, mu=0)


# ---------------------------------------------------------------- vec prf

def test_prf_vector_beta_zero_is_plain_cosine(spark, sf_dir):
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann import (
        cosine_topk,
        prf_vector_topk,
    )

    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    a = prf_vector_topk(embs, qv, k=10, fb_k=5, alpha=1.0, beta=0.0).collect()
    b = cosine_topk(embs, qv, k=10).collect()
    assert [(r["id"], r["cos"]) for r in a] == [(r["id"], r["cos"]) for r in b]
    with pytest.raises(ValueError, match="fb_k"):
        prf_vector_topk(embs, qv, fb_k=0)


def test_prf_vector_moves_query_toward_feedback(spark, sf_dir):
    """With alpha=0, beta=1 the query IS the feedback centroid: every
    feedback vector's cosine to it should be high (the centroid sits
    inside the feedback cluster)."""
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann import (
        cosine_topk,
        prf_vector_topk,
    )

    embs = e._embs(spark, sf_dir)
    qv = e._qvec(spark, sf_dir)
    fb_ids = {r["id"] for r in cosine_topk(embs, qv, k=5).collect()}
    out = prf_vector_topk(embs, qv, k=10, fb_k=5, alpha=0.0, beta=1.0).collect()
    got = {r["id"] for r in out}
    assert fb_ids & got  # centroid retrieves its own cluster members


# ---------------------------------------------------------------- batch p

def test_ngram_diversity_hand_computed(spark):
    from solr_ocr_processor_spark.functions.textstats import ngram_diversity

    docs = spark.createDataFrame(
        [(1, "a b a b", "s1"), (2, "x y z", "s2")],
        "doc_id long, text string, source string",
    )
    out = {(r["source"], r["n"]): r for r in ngram_diversity(docs, 2).collect()}
    # s1 unigrams: a b a b -> 4 grams, 2 distinct
    assert (out[("s1", 1)]["n_grams"], out[("s1", 1)]["n_distinct"]) == (4, 2)
    # s1 bigrams: 'a b','b a','a b' -> 3 grams, 2 distinct
    r = out[("s1", 2)]
    assert (r["n_grams"], r["n_distinct"]) == (3, 2)
    assert r["diversity"] == pytest.approx(round(2 / 3, 6), abs=1e-6)
    # s2 fully diverse
    assert out[("s2", 2)]["diversity"] == 1.0
    with pytest.raises(ValueError):
        ngram_diversity(docs, 0)


def test_refusal_profile_hand_computed(spark):
    from solr_ocr_processor_spark.operators.conversation import refusal_profile

    rows = [
        ("a", 0, "user", "do a thing", None, None),
        ("a", 1, "assistant", "I cannot help with that.", None, None),
        ("a", 2, "assistant", "Here is the answer.", None, None),
        ("b", 0, "assistant", "As an AI, I must decline.", None, None),
        ("c", 0, "user", "no assistant turns", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in refusal_profile(t).collect()}
    assert (out["a"]["n_assistant_turns"], out["a"]["n_refusal_turns"]) == (2, 1)
    assert out["a"]["refusal_frac"] == 0.5
    assert out["b"]["refusal_frac"] == 1.0
    assert "c" not in out  # no assistant turns -> no row


def test_template_turns_normalization_and_threshold(spark):
    from solr_ocr_processor_spark.operators.conversation import template_turns

    rows = [
        ("a", 1, "assistant", "How can I   help you?", None, None),
        ("b", 1, "assistant", "how can i help you?", None, None),   # same norm
        ("c", 1, "assistant", "how can i help you?", None, None),
        ("a", 3, "assistant", "unique reply here", None, None),
        ("d", 1, "user", "how can i help you?", None, None),        # wrong role
        ("e", 1, "assistant", "   ", None, None),                   # empty
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = template_turns(t, min_convs=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_convs"] == 3 and r["n_occurrences"] == 3
    # deterministic representative: min raw text
    assert r["sample_text"] == "How can I   help you?"
    # threshold excludes the unique reply; min_convs validation
    assert not [x for x in out if "unique" in x["sample_text"]]
    with pytest.raises(ValueError):
        template_turns(t, min_convs=1)


# ---------------------------------------------------------------- cli modes

def test_cli_lmdir_rm3_pf2_modes(spark, tmp_path, capsys):
    """The new scorers ride the same CLI dispatch (A1/A2) and error
    taxonomy as every other mode."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "socr_cli_r3h", os.path.join(repo, "jobs", "cli.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store,
                     "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(ln) for ln in out.strip().splitlines()
                if ln.startswith("{")]
        return rc, rows

    for mode in ("lmdir", "rm3", "pf2"):
        rc, rows = run("--q", "spark index", "--mode", mode, "--k", "5")
        assert rc == 0, (mode, rows)
        assert rows and all("conv_id" in r for r in rows), mode

    # taxonomy: bad knobs are BadRequest (exit 2), not a stack trace
    assert cli.main(["query", "--store", store, "--q", "spark",
                     "--mode", "lmdir", "--mu", "0"]) == 2
    assert cli.main(["query", "--store", store, "--q", "spark",
                     "--mode", "rm3", "--orig-weight", "1.5"]) == 2


def test_prf_vector_empty_corpus_and_refusal_null_text(spark):
    from solr_ocr_processor_spark.operators.ann import prf_vector_topk
    from solr_ocr_processor_spark.operators.conversation import refusal_profile

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert prf_vector_topk(empty, [1.0, 0.0], k=5, fb_k=3).collect() == []
    t = spark.createDataFrame(
        [("a", 0, "assistant", None, None, None),
         ("a", 1, "assistant", "fine answer", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = refusal_profile(t).collect()[0]
    # NULL text counts as a non-refusal turn, not a NULL count
    assert (r["n_assistant_turns"], r["n_refusal_turns"]) == (2, 0)
    assert r["refusal_frac"] == 0.0


def test_source_overlap_includes_shingleless_source(spark):
    from solr_ocr_processor_spark.operators.pipeline import source_overlap_matrix

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "s1"),
         (2, "alpha beta gamma delta", "s2"),
         (3, "hi", "tiny")],           # < n tokens: no shingles
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap_matrix(docs, n=3).collect()}
    # the shingle-less source still appears in every pair row
    assert ("s1", "tiny") in out and ("s2", "tiny") in out
    r = out[("s1", "tiny")]
    assert (r["n_b"], r["n_shared"], r["jaccard"]) == (0, 0, 0.0)
    assert out[("s1", "s2")]["jaccard"] == 1.0
