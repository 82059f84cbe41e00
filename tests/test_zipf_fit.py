"""Zipf OLS fit (round 4, operators/terms.zipf_fit)."""

from __future__ import annotations

import math

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.terms import zipf_fit
from solr_ocr_processor_spark.sources.transcripts import synth_transcripts


def test_zipf_matches_python_ols(spark):
    idx = build_postings(synth_transcripts(spark, n_convs=25, max_turns=6, seed=2))
    stats = sorted(
        ((r["cf"], r["term"]) for r in idx.term_stats.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [math.log(i + 1) for i in range(len(stats))]
    ys = [math.log(cf) for cf, _ in stats]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    cov = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    r = zipf_fit(idx, top_n=5000).first()
    assert r["n_terms"] == n
    assert abs(r["alpha"] - (-(cov / varx))) < 2e-6
    assert abs(r["r2"] - (cov * cov / (varx * vary))) < 2e-6
    assert abs(r["ln_cf_at_rank1"] - (sy / n - (cov / varx) * sx / n)) < 2e-6


def test_zipf_perfect_power_law(spark):
    """A corpus built so cf(rank) = K // rank must fit alpha ~ 1 with
    near-perfect r2."""
    words = []
    for rank in range(1, 21):
        words += [f"t{rank:02d}"] * (600 // rank)
    text = " ".join(words)
    docs = spark.createDataFrame(
        [("c0", 0, "user", text, None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    idx = build_postings(docs)
    r = zipf_fit(idx).first()
    assert 0.9 < r["alpha"] < 1.1
    assert r["r2"] > 0.999


def test_zipf_top_n_cut(spark):
    idx = build_postings(synth_transcripts(spark, n_convs=10, max_turns=4, seed=9))
    r = zipf_fit(idx, top_n=5).first()
    assert r["n_terms"] == 5
