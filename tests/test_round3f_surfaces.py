"""Round-3 late surfaces (batch k): timeseries() streaming verb,
facet.range other=all/hardend envelope, ^= constant-score boost,
vocabulary coverage curve. Hand-computed expectations on
purpose-built mini-collections."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.stream_expr import (
    StreamExprError,
    _gap_seconds,
    _iso_epoch,
    compile_stream,
)

T0 = 1704067200  # 2024-01-01T00:00:00Z


def _ev(spark):
    def ts(off_s):
        # aware UTC instant: unambiguous regardless of host TZ (the
        # session TZ is pinned UTC in session.py, this removes the
        # dependence entirely; utcfromtimestamp is deprecated in 3.12)
        return datetime.datetime.fromtimestamp(
            T0 + off_s, tz=datetime.timezone.utc
        )

    rows = [
        (0, ts(10), "click", 1.0),      # bucket 0
        (1, ts(70), "click", 2.0),      # bucket 1
        (2, ts(80), "click", 3.0),      # bucket 1
        (3, ts(185), "click", 4.0),     # bucket 3 (bucket 2 EMPTY)
        (4, ts(95), "view", 100.0),     # filtered out by q
        (5, ts(-5), "click", 50.0),     # before start: excluded
        (6, ts(240), "click", 60.0),    # at end: excluded
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_timeseries_buckets_zero_fill_and_range(spark):
    expr = (
        'timeseries(events, q="event_type:click", field="ts", '
        f'start="2024-01-01T00:00:00Z", end="2024-01-01T00:04:00Z", '
        'gap="+1MINUTES", count(*), sum(value))'
    )
    out = compile_stream(expr, {"events": _ev(spark)}).collect()
    assert [r.bucket_start for r in out] == [T0, T0 + 60, T0 + 120, T0 + 180]
    assert [r.count_all for r in out] == [1, 2, 0, 1]
    sums = [r.sum_value for r in out]
    assert sums[0] == 1.0 and sums[1] == 5.0 and sums[3] == 4.0
    assert sums[2] is None  # empty bucket: count 0, sum NULL


def test_timeseries_wants_all_kwargs_and_metric(spark):
    tables = {"events": _ev(spark)}
    with pytest.raises(StreamExprError, match="field=, start="):
        compile_stream('timeseries(events, count(*))', tables)
    with pytest.raises(StreamExprError, match="metric"):
        compile_stream(
            'timeseries(events, field="ts", start="2024-01-01T00:00:00Z", '
            'end="2024-01-01T01:00:00Z", gap="+1HOUR")',
            tables,
        )
    with pytest.raises(StreamExprError, match="end > start"):
        compile_stream(
            'timeseries(events, field="ts", start="2024-01-01T01:00:00Z", '
            'end="2024-01-01T01:00:00Z", gap="+1HOUR", count(*))',
            tables,
        )


def test_gap_and_iso_parsers():
    assert _gap_seconds("+1HOUR") == 3600
    assert _gap_seconds("+30MINUTES") == 1800
    assert _gap_seconds("+2DAYS") == 172800
    assert _gap_seconds("+45SECONDS") == 45
    with pytest.raises(StreamExprError):
        _gap_seconds("+1MONTH")  # calendar gaps excluded by design
    with pytest.raises(StreamExprError):
        _gap_seconds("1HOUR")
    assert _iso_epoch("2024-01-01T00:00:00Z") == T0
    assert _iso_epoch("2024-01-01T00:00:00+00:00") == T0
    assert _iso_epoch("2024-01-01T01:00:00") == T0 + 3600  # naive = UTC
    with pytest.raises(StreamExprError):
        _iso_epoch("not-a-date")


# ---------------------------------------------------------------------------
# facet.range other=all / hardend
# ---------------------------------------------------------------------------


def _docs_n(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "doc_id long, n_chars long"
    )


def test_range_facet_other_hardend_true(spark):
    from solr_ocr_processor_spark.operators.facet import range_facet_other

    # start=10 end=35 gap=10, hardend -> buckets [10,20) [20,30) [30,35)
    df = _docs_n(spark, [5, 10, 19, 20, 31, 34, 35, 40])
    out = range_facet_other(df, "n_chars", 10, 35, 10, hardend=True).collect()
    got = {r.bucket: (r.ord, r.n_docs) for r in out}
    assert got["10"] == (0, 2) and got["20"] == (1, 1) and got["30"] == (2, 2)
    assert got["before"] == (3, 1)          # 5
    assert got["between"] == (4, 5)
    assert got["after"] == (5, 2)           # 35 (== end) and 40


def test_range_facet_other_soft_end_extends_grid(spark):
    from solr_ocr_processor_spark.operators.facet import range_facet_other

    # hardend=false: grid runs to start + nb*gap = 40; 35 now lands in
    # the last bucket and 'after' starts at 40.
    df = _docs_n(spark, [5, 10, 19, 20, 31, 34, 35, 40])
    out = range_facet_other(df, "n_chars", 10, 35, 10, hardend=False).collect()
    got = {r.bucket: r.n_docs for r in out}
    assert got["30"] == 3                   # 31, 34, 35
    assert got["after"] == 1                # 40
    assert got["between"] == 6


def test_range_facet_other_zero_fill_and_validation(spark):
    from solr_ocr_processor_spark.operators.facet import range_facet_other

    df = _docs_n(spark, [10, 39])
    out = range_facet_other(df, "n_chars", 10, 40, 10).collect()
    assert [(r.ord, r.n_docs) for r in out[:3]] == [(0, 1), (1, 0), (2, 1)]
    with pytest.raises(ValueError, match="gap"):
        range_facet_other(df, "n_chars", 10, 40, 0)
    with pytest.raises(ValueError, match="start"):
        range_facet_other(df, "n_chars", 40, 10, 10)


# ---------------------------------------------------------------------------
# ^= constant score
# ---------------------------------------------------------------------------


@pytest.fixture()
def cs_idx(spark):
    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        ("cA", 0, "user", "spark spark spark", None, t0),   # best BM25
        ("cB", 0, "user", "spark fast", None, t0),          # matches cs term
        ("cC", 0, "user", "spark", None, t0),
        ("cD", 0, "user", "unrelated text", None, t0),
    ]
    return build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))


def test_constant_score_adds_exactly_the_constant(spark, cs_idx):
    from solr_ocr_processor_spark.operators.query import constant_score_topk

    out = constant_score_topk(
        spark, cs_idx, "spark", cs_term="fast", cs_score=5.0, k=10
    ).collect()
    by = {r.conv_id: r for r in out}
    assert set(by) == {"cA", "cB", "cC"}  # cD never matches the main q
    # the flagged doc gains EXACTLY the constant, others are unchanged
    assert by["cB"].boosted == pytest.approx(by["cB"].score + 5.0, abs=1e-12)
    assert by["cA"].boosted == by["cA"].score
    assert by["cC"].boosted == by["cC"].score
    # +5 reorders: cB overtakes the tf=3 doc
    assert [r.conv_id for r in out][0] == "cB"


def test_constant_score_clause_must_be_single_term(spark, cs_idx):
    from solr_ocr_processor_spark.operators.query import (
        FilterSyntaxError,
        constant_score_topk,
    )

    with pytest.raises(FilterSyntaxError, match="one term"):
        constant_score_topk(spark, cs_idx, "spark", cs_term="two words")
    # empty main query -> empty frame, stable schema
    empty = constant_score_topk(spark, cs_idx, "", cs_term="fast")
    assert empty.columns == ["doc_id", "conv_id", "score", "boosted"]
    assert empty.count() == 0


# ---------------------------------------------------------------------------
# vocabulary coverage curve
# ---------------------------------------------------------------------------


def test_vocab_coverage_hand_model(spark):
    from solr_ocr_processor_spark.operators.pipeline import vocab_coverage

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b zz")], "doc_id long, text string"
    )
    # cf: a=4, b=3, c=1, zz=1 (ties break term ASC); total=9
    out = vocab_coverage(docs, top_n=3).collect()
    assert [(r.rank, r.term, r.cf) for r in out] == [
        (1, "a", 4), (2, "b", 3), (3, "c", 1),
    ]
    assert out[0].coverage == pytest.approx(round(4 / 9, 6))
    assert out[1].coverage == pytest.approx(round(7 / 9, 6))
    assert out[2].coverage == pytest.approx(round(8 / 9, 6))


def test_vocab_coverage_full_curve_reaches_one(spark):
    from solr_ocr_processor_spark.operators.pipeline import vocab_coverage

    docs = spark.createDataFrame(
        [(0, "x y"), (1, "Y! z")], "doc_id long, text string"
    )
    out = vocab_coverage(docs, top_n=100).collect()
    assert len(out) == 3  # fewer terms than top_n: curve just ends
    assert out[-1].coverage == pytest.approx(1.0)
    with pytest.raises(ValueError, match="top_n"):
        vocab_coverage(docs, top_n=0)
