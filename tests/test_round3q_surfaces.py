"""Round-3 continuation surfaces (batch dd): stream nodes() graph
walk, facet.range.include boundary semantics, terms.prefix."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.facet import range_facet_include
from solr_ocr_processor_spark.operators.stream_expr import (
    StreamExprError,
    compile_stream,
)
from solr_ocr_processor_spark.operators.terms import terms_enum
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ---------------------------------------------------------------------------
# nodes()
# ---------------------------------------------------------------------------


def _graph_tables(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (9, 0)], "src long, dst long"
    )
    roots = spark.createDataFrame([(0,), (1,), (7,)], "doc_id long")
    return {"edges": edges, "documents": roots}


def test_stream_nodes_one_hop_counts(spark):
    out = compile_stream(
        'nodes(edges, search(documents, q="*:*", fl="doc_id"), '
        'walk="doc_id->src", gather="dst")',
        _graph_tables(spark),
    ).collect()
    got = {r["node"]: (r["level"], r["count"]) for r in out}
    # roots {0,1,7}: edges from 0 -> {1,2}, from 1 -> {2}; 7 has none
    assert got == {1: (1, 1), 2: (1, 2)}


def test_stream_nodes_validates(spark):
    t = _graph_tables(spark)
    with pytest.raises(StreamExprError, match="walk"):
        compile_stream(
            'nodes(edges, search(documents, q="*:*"), gather="dst")', t
        )
    with pytest.raises(StreamExprError, match="must exist"):
        compile_stream(
            'nodes(edges, search(documents, q="*:*"), '
            'walk="doc_id->nope", gather="dst")',
            t,
        )
    with pytest.raises(StreamExprError, match="unknown collection"):
        compile_stream(
            'nodes(missing, search(documents, q="*:*"), '
            'walk="doc_id->src", gather="dst")',
            t,
        )


# ---------------------------------------------------------------------------
# facet.range.include
# ---------------------------------------------------------------------------


def _vals_df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v long")


def test_range_include_lower_default_matches_halfopen(spark):
    # values on every boundary of [0,10) gap 5: 0, 5, 10
    d = _vals_df(spark, [0, 5, 10, 3, 7])
    out = {r["bucket"]: r["n_docs"] for r in
           range_facet_include(d, "v", 0, 10, 5).collect()}
    assert out["0"] == 2   # 0, 3
    assert out["5"] == 2   # 5, 7
    assert out["before"] == 0
    assert out["after"] == 1   # 10 == end_eff, upper not included
    assert out["between"] == 4


def test_range_include_all_double_counts_boundaries(spark):
    d = _vals_df(spark, [0, 5, 10, 3, 7])
    out = {r["bucket"]: r["n_docs"] for r in
           range_facet_include(d, "v", 0, 10, 5, include=("all",)).collect()}
    # closed buckets [0,5] and [5,10]: the value 5 counts in BOTH
    assert out["0"] == 3   # 0, 3, 5
    assert out["5"] == 3   # 5, 7, 10
    # outer: before/after own their boundary too
    assert out["before"] == 1   # v <= 0
    assert out["after"] == 1    # v >= 10
    assert out["between"] == 5


def test_range_include_upper_and_edge(spark):
    d = _vals_df(spark, [0, 5, 10])
    up = {r["bucket"]: r["n_docs"] for r in
          range_facet_include(d, "v", 0, 10, 5, include=("upper",)).collect()}
    # (0,5] holds {5}, (5,10] holds {10}: 0 falls out of the buckets
    assert up["0"] == 1 and up["5"] == 1
    assert up["before"] == 1   # v == start owned by before (no lower/edge)
    ed = {r["bucket"]: r["n_docs"] for r in
          range_facet_include(d, "v", 0, 10, 5, include=("edge",)).collect()}
    # edge: first bucket [0,5) holds 0; last bucket (5,10] holds 10;
    # 5 sits on an INTERIOR boundary — open on both sides under
    # edge-only — so it lands in no gap bucket at all
    assert ed["0"] == 1 and ed["5"] == 1
    assert ed["between"] == 3  # edge includes both outer bounds
    with pytest.raises(ValueError):
        range_facet_include(d, "v", 0, 10, 5, include=("bogus",))


# ---------------------------------------------------------------------------
# terms.prefix
# ---------------------------------------------------------------------------


def test_terms_prefix_filters_and_composes(spark):
    rows = [
        ("c0", 0, "user", "spark spark stream stone apple", None, TS),
        ("c1", 0, "user", "spark stream apple", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = [r["term"] for r in terms_enum(spark, idx, prefix="st").collect()]
    assert got == ["stream", "stone"]  # df 2 then df 1
    got2 = [
        r["term"]
        for r in terms_enum(spark, idx, prefix="s", regex="s.*k", mincount=2).collect()
    ]
    assert got2 == ["spark"]
