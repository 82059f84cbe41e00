"""Filtered kNN ({!knn} + fq, Solr 9): pre-filter semantics — top-k is
taken over the filter survivors, every hit satisfies every filter, and
the result equals brute-force cosine over the manually-filtered set."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.ann import cosine_topk, knn_filtered_topk

# 12 deterministic 4-d vectors, two metadata columns
VECS = [
    (i, [math.sin(i * 1.7 + d) for d in range(4)], i % 3, "en" if i % 2 == 0 else "de")
    for i in range(12)
]
Q = [1.0, 0.5, -0.25, 0.0]


@pytest.fixture(scope="module")
def embs(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int, lang string"
    )


def test_prefilter_equals_bruteforce_over_survivors(spark, embs):
    got = knn_filtered_topk(
        embs, Q, k=5, predicate=F.col("label") == 1
    ).collect()
    want = cosine_topk(embs.where("label = 1"), Q, k=5).collect()
    assert [(r.id, r.cos) for r in got] == [(r.id, r.cos) for r in want]
    assert len(got) == min(5, sum(1 for v in VECS if v[2] == 1))


def test_allowed_ids_semi_join(spark, embs):
    allowed = spark.createDataFrame([(i,) for i in (0, 2, 4, 6)], "doc_id long")
    got = knn_filtered_topk(embs, Q, k=10, allowed_ids=allowed).collect()
    assert {r.id for r in got} <= {0, 2, 4, 6}
    want = cosine_topk(embs.where("vec_id in (0,2,4,6)"), Q, k=10).collect()
    assert [(r.id, r.cos) for r in got] == [(r.id, r.cos) for r in want]


def test_composed_filters_underfill_rather_than_leak(spark, embs):
    # only even ids with label==0 qualify: ids 0 and 6 → k=5 returns 2
    allowed = spark.createDataFrame([(i,) for i in range(0, 12, 2)], "doc_id long")
    got = knn_filtered_topk(
        embs, Q, k=5, predicate=F.col("label") == 0, allowed_ids=allowed
    ).collect()
    assert sorted(r.id for r in got) == [0, 6]


def test_no_filters_is_plain_knn(spark, embs):
    got = knn_filtered_topk(embs, Q, k=3).collect()
    want = cosine_topk(embs, Q, k=3).collect()
    assert [(r.id, r.cos) for r in got] == [(r.id, r.cos) for r in want]
