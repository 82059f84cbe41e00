"""Round-3 continuation surfaces: cursorMark keyset paging,
significant terms, facet.query, JSON nested facets, {!graph} bounded
BFS, paragraph-level dedup, per-domain caps, /export sorted dumps.
Hand-computed expectations on purpose-built mini-corpora."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

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
        ("c00000004", 0, "user", "spark merge window sort", None, TS),
        ("c00000005", 0, "user", "join the plans again", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    idx = build_postings(t)
    idx.postings.persist().count()
    return idx


# ---------------------------------------------------------------------------
# cursorMark keyset paging
# ---------------------------------------------------------------------------


def test_cursor_pages_partition_the_ranking(spark, tiny):
    from solr_ocr_processor_spark.operators.score import bm25_cursor_page, bm25_topk

    full = bm25_topk(spark, tiny, "spark merge", k=10).collect()
    assert len(full) >= 4
    p1 = bm25_cursor_page(spark, tiny, "spark merge", k=2).collect()
    cur = (p1[-1]["score"], p1[-1]["doc_id"])
    p2 = bm25_cursor_page(spark, tiny, "spark merge", k=2, cursor=cur).collect()
    got = [(r["doc_id"], r["score"]) for r in p1 + p2]
    want = [(r["doc_id"], r["score"]) for r in full[:4]]
    assert got == want
    # no overlap between pages
    assert len({d for d, _ in got}) == 4


def test_cursor_exhausts_to_empty(spark, tiny):
    from solr_ocr_processor_spark.operators.score import bm25_cursor_page

    all_rows = bm25_cursor_page(spark, tiny, "spark", k=100).collect()
    cur = (all_rows[-1]["score"], all_rows[-1]["doc_id"])
    assert bm25_cursor_page(spark, tiny, "spark", k=5, cursor=cur).count() == 0


def test_cursor_tie_arm_advances_by_doc_id(spark, tiny):
    from solr_ocr_processor_spark.operators.score import bm25_cursor_page

    # docs c1/c3/c4 all contain 'window'; any equal scores must page
    # through the doc_id tiebreak without loss or repeat
    rows = bm25_cursor_page(spark, tiny, "window", k=100).collect()
    seen = []
    cur = None
    while True:
        page = bm25_cursor_page(spark, tiny, "window", k=1, cursor=cur).collect()
        if not page:
            break
        seen.append((page[0]["doc_id"], page[0]["score"]))
        cur = (page[0]["score"], page[0]["doc_id"])
    assert seen == [(r["doc_id"], r["score"]) for r in rows]


# ---------------------------------------------------------------------------
# significant terms
# ---------------------------------------------------------------------------


def test_significant_terms_lift_ranking(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import significant_terms

    # fg = docs with 'spark': c0, c1, c3, c4.
    # merge: fg_df 2 (c0,c4), bg_df 3 -> 666666
    # window: fg_df 3 (c1,c3,c4), bg_df 3 -> 1000000
    # sort: fg_df 2 (c3,c4), bg_df 3 -> 666666
    got = {
        r["term"]: (r["fg_df"], r["bg_df"], r["sig_scaled"])
        for r in significant_terms(spark, tiny, "spark", min_fg_df=2).collect()
    }
    assert got["window"] == (3, 3, 1_000_000)
    assert got["merge"] == (2, 3, 666_666)
    assert got["sort"] == (2, 3, 666_666)
    assert "spark" not in got  # seed excluded
    assert "shuffle" not in got  # fg_df 1 < min_fg_df


def test_significant_terms_order(spark, tiny):
    from solr_ocr_processor_spark.operators.terms import significant_terms

    terms = [r["term"] for r in significant_terms(spark, tiny, "spark").collect()]
    assert terms[0] == "window"  # highest lift
    assert terms.index("merge") < terms.index("sort")  # tie -> term asc


# ---------------------------------------------------------------------------
# facet.query
# ---------------------------------------------------------------------------


def test_facet_query_counts_hand_values(spark, tiny):
    from solr_ocr_processor_spark.operators.facet import facet_query_counts

    got = {
        r["facet"]: r["n_docs"]
        for r in facet_query_counts(
            spark, tiny, term_queries=("spark", "join"), dl_ranges=((0, 4), (4, 8))
        ).collect()
    }
    # c1 "spark window functions" has dl 3; the other five have dl 4
    assert got == {"q:spark": 4, "q:join": 2, "dl:[0 TO 4)": 1, "dl:[4 TO 8)": 5}


def test_facet_query_counts_tombstones(spark, tiny):
    from solr_ocr_processor_spark.operators.facet import facet_query_counts

    dead = spark.createDataFrame([(0,)], "doc_id long")
    got = {
        r["facet"]: r["n_docs"]
        for r in facet_query_counts(
            spark, tiny, term_queries=("spark",), dl_ranges=((0, 8),),
            exclude_docs=dead,
        ).collect()
    }
    assert got == {"q:spark": 3, "dl:[0 TO 8)": 5}


# ---------------------------------------------------------------------------
# JSON facet API — nested terms facet
# ---------------------------------------------------------------------------


def test_json_facet_nested_hand_values(spark):
    from solr_ocr_processor_spark.operators.facet import json_facet_nested

    rows = [
        ("en", "a", 10), ("en", "a", 20), ("en", "b", 30),
        ("fr", "a", 40), ("fr", "b", 50), ("fr", "b", 60), ("fr", "c", 70),
        ("de", "a", 80),
    ]
    d = spark.createDataFrame(rows, "lang string, source string, n_chars long")
    got = [
        (r["lang"], r["outer_docs"], r["source"], r["inner_docs"], r["sum_metric"])
        for r in json_facet_nested(spark, d, k_outer=2, k_inner=2).collect()
    ]
    # top langs: fr(4), en(3); de(1) cut. fr subs: b(2,110), a(1,40) over c tie->a
    assert got == [
        ("fr", 4, "b", 2, 110),
        ("fr", 4, "a", 1, 40),
        ("en", 3, "a", 2, 30),
        ("en", 3, "b", 1, 30),
    ]


# ---------------------------------------------------------------------------
# {!graph} bounded BFS
# ---------------------------------------------------------------------------


def test_graph_expand_layers_and_min_depth(spark):
    from solr_ocr_processor_spark.operators.graph import graph_expand

    # 0->1, 1->2, 2->3, 0->2 (diamond: 2 reachable at depth 1 AND 2)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = [(r["node"], r["depth"]) for r in graph_expand(spark, edges, seeds, 2).collect()]
    # node 2 appears ONCE at its minimal depth 1; node 3 at depth 2
    assert got == [(0, 0), (1, 1), (2, 1), (3, 2)]


def test_graph_expand_depth_zero_is_seeds(spark):
    from solr_ocr_processor_spark.operators.graph import graph_expand

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    got = [(r["node"], r["depth"]) for r in graph_expand(spark, edges, seeds, 0).collect()]
    assert got == [(0, 0), (5, 0)]


def test_synth_edges_deterministic_no_self_loops(spark):
    from solr_ocr_processor_spark.operators.graph import synth_edges

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    e1 = sorted((r["src"], r["dst"]) for r in synth_edges(docs).collect())
    e2 = sorted((r["src"], r["dst"]) for r in synth_edges(docs).collect())
    assert e1 == e2
    assert all(s != d for s, d in e1)
    assert all(0 <= d < 10 for _, d in e1)


# ---------------------------------------------------------------------------
# paragraph-level dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from solr_ocr_processor_spark.operators.dedup import paragraph_dedup_profile

    rows = [
        ("c0", 0, "user", "the same boilerplate line", None, TS),
        ("c0", 1, "user", "unique line zero", None, TS),
        ("c1", 0, "user", "the same boilerplate line", None, TS),
        ("c1", 1, "user", "unique line one", None, TS),
        ("c2", 0, "user", "the same boilerplate line", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {
        r["conv_id"]: (r["n_turns"], r["kept_turns"])
        for r in paragraph_dedup_profile(t.select("conv_id", "turn_idx", "text")).collect()
    }
    # first occurrence = smallest (conv_id, turn_idx) -> c0 keeps both,
    # c1/c2 lose the boilerplate copy
    assert got == {"c0": (2, 2), "c1": (2, 1), "c2": (1, 0)}


def test_paragraph_dedup_within_doc_duplicates_also_collapse(spark):
    from solr_ocr_processor_spark.operators.dedup import paragraph_dedup_profile

    rows = [
        ("c0", 0, "user", "repeat me", None, TS),
        ("c0", 1, "user", "repeat me", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = paragraph_dedup_profile(t.select("conv_id", "turn_idx", "text")).collect()
    assert (got[0]["n_turns"], got[0]["kept_turns"]) == (2, 1)


# ---------------------------------------------------------------------------
# per-domain cap
# ---------------------------------------------------------------------------


def test_domain_cap_profile(spark):
    from solr_ocr_processor_spark.operators.split import domain_cap

    rows = [(i, "hot") for i in range(7)] + [(100, "cold"), (101, "cold")]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["domain"]: (r["n_docs"], r["n_kept"])
        for r in domain_cap(d, cap=3).collect()
    }
    assert got == {"hot": (7, 3), "cold": (2, 2)}


def test_domain_cap_selection_is_hash_stable(spark):
    from solr_ocr_processor_spark.operators.split import domain_cap, unit_hash

    rows = [(i, "s") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    # recompute the expected kept set by the same unit-hash order
    hashes = (
        d.select("doc_id", unit_hash(F.col("doc_id")).alias("u"))
        .orderBy("u", "doc_id")
        .collect()
    )
    expect_kept = 4
    got = domain_cap(d, cap=expect_kept).collect()[0]
    assert (got["n_docs"], got["n_kept"]) == (10, 4)
    assert len({r["doc_id"] for r in hashes[:expect_kept]}) == expect_kept


# ---------------------------------------------------------------------------
# /export sorted dump
# ---------------------------------------------------------------------------


def test_export_sorted_full_match_set(spark, tiny):
    from solr_ocr_processor_spark.operators.query import export_sorted

    got = export_sorted(spark, tiny, "spark join", fq=None).collect()
    # OR semantics: spark in c0,c1,c3,c4; join in c2,c5 -> all six docs
    assert len(got) == 6
    # total order (dl desc, doc_id asc): the dl-4 docs in id order, the
    # lone dl-3 doc (c1 "spark window functions") last
    assert [r["doc_id"] for r in got] == [0, 2, 3, 4, 5, 1]


def test_export_sorted_fq_and_tombstones(spark, tiny):
    from solr_ocr_processor_spark.operators.query import export_sorted

    dead = spark.createDataFrame([(2,)], "doc_id long")
    got = export_sorted(
        spark, tiny, "join", fq="dl:[0 TO 100]", exclude_docs=dead
    ).collect()
    assert [r["doc_id"] for r in got] == [5]


def test_export_sorted_rejects_non_docvalues_fq(spark, tiny):
    from solr_ocr_processor_spark.operators.query import export_sorted

    with pytest.raises(ValueError):
        export_sorted(spark, tiny, "join", fq="text:[a TO b]")
