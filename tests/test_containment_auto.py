"""Containment plan dispatcher (round-5, operators/dedup.
containment_pairs_auto): the df-moment rule picks the exact spine on
uniform data and the prefix-filtered banded plan under hot-shingle
skew; both answer identically."""

from __future__ import annotations

import pytest

from solr_ocr_processor_spark.operators.dedup import (
    _containment_df_moments,
    _containment_hot_estimate,
    containment_pairs,
    containment_pairs_auto,
    containment_pairs_banded,
)

HOT = "the same boilerplate footer appears on every single page here"


@pytest.fixture(scope="module")
def uniform(spark):
    rows = [
        (i, f"unique words alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def skewed(spark):
    # every doc shares the boilerplate (hot shingles, df = n_docs);
    # a few docs additionally contain another doc's unique body
    rows = []
    for i in range(150):
        body = f"body{i} content{i} words{i} only{i} here{i} now{i}"
        rows.append((i, f"{HOT} {body}"))
    rows.append((500, f"{HOT} body7 content7 words7 only7 here7 now7 extra tail"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_moments_separate_the_regimes(uniform, skewed):
    s1u, s2u = _containment_df_moments(uniform)
    s1s, s2s = _containment_df_moments(skewed)
    assert s2u / s1u < 2  # uniform: almost all shingles unique
    assert s2s / s1s > 10  # hot boilerplate dominates the square


def test_dispatch_uniform_picks_exact_spine(uniform):
    got = containment_pairs_auto(uniform)
    want = containment_pairs(uniform)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the (sampled) probe itself chose the spine
    assert _containment_hot_estimate(uniform) <= 64


def test_dispatch_skewed_picks_banded_and_matches_spine(skewed):
    assert _containment_hot_estimate(skewed) > 64  # dispatcher goes banded
    s1, s2 = _containment_df_moments(skewed)
    assert s2 > 64 * s1  # ...and the exact moments agree
    auto = sorted(map(tuple, containment_pairs_auto(skewed).collect()))
    banded = sorted(map(tuple, containment_pairs_banded(skewed).collect()))
    exact = sorted(map(tuple, containment_pairs(skewed).collect()))
    assert auto == banded == exact
    # the regime is meaningful: the embedded-copy pair is found
    assert any(r[0] == 7 and r[1] == 500 for r in exact)
