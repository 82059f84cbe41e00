"""Round-3 continuation surfaces (batch t): keep-best dedup,
percolation (reverse search), compositeId shard routing."""

from __future__ import annotations

import hashlib

import pytest

from solr_ocr_processor_spark.operators.dedup import dup_keep_best
from solr_ocr_processor_spark.operators.percolate import percolate_matches
from solr_ocr_processor_spark.operators.split import composite_id_route


# ----------------------------------------------------------- keep best

def test_dup_keep_best_longest_wins_ties_min_id(spark):
    nodes = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 2)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc1 long, doc2 long")
    got = {
        r["doc_id"]: (r["rep_id"], r["keep_id"], r["cluster_size"], r["is_kept"])
        for r in dup_keep_best(nodes, pairs).collect()
    }
    # cluster {1,2,3}: max n_chars 9 held by 2 and 3 -> min id 2 keeps
    assert got == {
        1: (1, 2, 3, 0),
        2: (1, 2, 3, 1),
        3: (1, 2, 3, 0),
        4: (4, 4, 1, 1),  # singleton keeps itself
    }


def test_dup_keep_best_differs_from_min_id_canonical(spark):
    nodes = spark.createDataFrame([(1, 1), (2, 100)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(1, 2)], "doc1 long, doc2 long")
    got = {r["doc_id"]: r for r in dup_keep_best(nodes, pairs).collect()}
    assert got[1]["rep_id"] == 1  # min-id label is still the cluster KEY
    assert got[1]["keep_id"] == 2  # but the longest member survives


# ----------------------------------------------------------- percolate

@pytest.fixture(scope="module")
def pdocs(spark):
    return spark.createDataFrame(
        [
            (1, "spark window merge"),
            (2, "spark only here"),
            (3, "the window merge combo"),
        ],
        "doc_id long, text string",
    )


def test_percolate_conjunctive_matches(spark, pdocs):
    qs = spark.createDataFrame(
        [("qa", "spark window"), ("qb", "merge"), ("qd", "zzzqx")],
        "query_id string, query_text string",
    )
    got = [
        (r["query_id"], r["doc_id"])
        for r in percolate_matches(spark, qs, pdocs).collect()
    ]
    assert got == [("qa", 1), ("qb", 1), ("qb", 3)]


def test_percolate_empty_query_matches_nothing(spark, pdocs):
    qs = spark.createDataFrame(
        [("q_empty", "  !!  ")], "query_id string, query_text string"
    )
    assert percolate_matches(spark, qs, pdocs).count() == 0


def test_percolate_duplicate_terms_in_query(spark, pdocs):
    # "merge merge" distinct-collapses to one required term
    qs = spark.createDataFrame(
        [("q", "merge merge")], "query_id string, query_text string"
    )
    got = [r["doc_id"] for r in percolate_matches(spark, qs, pdocs).collect()]
    assert got == [1, 3]


# ----------------------------------------------------------- routing

def test_composite_route_colocation_and_range(spark):
    docs = spark.createDataFrame(
        [(1, "srcA"), (2, "srcA"), (3, "srcB"), (4, "srcC")],
        "doc_id long, source string",
    )
    rows = composite_id_route(docs, n_shards=8).collect()
    by_doc = {r["doc_id"]: r["shard"] for r in rows}
    assert by_doc[1] == by_doc[2]  # same route key -> same shard
    assert all(0 <= s < 8 for s in by_doc.values())
    # bit-exact vs the md5 unit-hash definition
    h = int(hashlib.md5(b"srcA").hexdigest()[:15], 16)
    assert by_doc[1] == int(h / (1 << 60) * 8)


def test_composite_route_rejects_bad_shards(spark):
    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError):
        composite_id_route(docs, n_shards=0)
