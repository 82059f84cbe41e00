"""Per-segment HNSW (round-4, operators/hnsw.py): deterministic
build, exhaustive-ef exactness, approximate-ef recall, segment
layout."""

from __future__ import annotations

import pytest

from solr_ocr_processor_spark.operators.ann import cosine_topk
from solr_ocr_processor_spark.operators.hnsw import (
    build_hnsw_store,
    hnsw_topk_stored,
    load_hnsw_store,
)


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    import __spark_entry__ as e

    return e._embs(spark, sf_dir)


@pytest.fixture(scope="module")
def store(spark, embs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hnsw"))
    return build_hnsw_store(spark, embs, root, dim=64, seg_size=64)


def test_exhaustive_ef_equals_brute(spark, embs, store):
    import __spark_entry__ as e

    qv = list(embs.where("vec_id = 0").first()["embedding"])
    exact = cosine_topk(embs, qv, 10).collect()
    full = hnsw_topk_stored(spark, store, qv, k=10, ef=store.seg_size).collect()
    assert [(r["id"], r["cos"]) for r in full] == [
        (r["id"], r["cos"]) for r in exact
    ]


def test_exhaustive_from_several_query_points(spark, embs, store):
    for qid in (3, 111, 222):
        qv = list(embs.where(f"vec_id = {qid}").first()["embedding"])
        exact = cosine_topk(embs, qv, 5).collect()
        full = hnsw_topk_stored(spark, store, qv, k=5, ef=store.seg_size).collect()
        assert [(r["id"], r["cos"]) for r in full] == [
            (r["id"], r["cos"]) for r in exact
        ], qid
        assert full[0]["id"] == qid and full[0]["cos"] == 1.0  # self-retrieval


def test_approximate_ef_recall_and_determinism(spark, embs, store):
    qv = list(embs.where("vec_id = 7").first()["embedding"])
    exact_ids = {r["id"] for r in cosine_topk(embs, qv, 10).collect()}
    a = hnsw_topk_stored(spark, store, qv, k=10, ef=16).collect()
    b = hnsw_topk_stored(spark, store, qv, k=10, ef=16).collect()
    assert [(r["id"], r["cos"]) for r in a] == [(r["id"], r["cos"]) for r in b]
    got = {r["id"] for r in a}
    assert len(got & exact_ids) >= 6  # graph recall, not a brute scan


def test_build_is_partition_independent(spark, embs, tmp_path):
    r1, r2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    s1 = build_hnsw_store(spark, embs, r1, dim=64, seg_size=64)
    s2 = build_hnsw_store(spark, embs.repartition(7), r2, dim=64, seg_size=64)
    e1 = spark.read.parquet(s1.path("edges")).orderBy(
        "seg", "level", "src", "dst"
    ).collect()
    e2 = spark.read.parquet(s2.path("edges")).orderBy(
        "seg", "level", "src", "dst"
    ).collect()
    assert e1 == e2 and len(e1) > 0


def test_append_new_segments_equals_fresh_build(spark, embs, tmp_path):
    """Lucene flush model: appending a disjoint id range as new
    segments must answer identically to a fresh build over the union
    (segments are id-range keyed, graphs content-addressed)."""
    from solr_ocr_processor_spark.operators.hnsw import append_hnsw_store

    lo = embs.where("vec_id < 192")
    hi = embs.where("vec_id >= 192")
    r1, r2 = str(tmp_path / "inc"), str(tmp_path / "fresh")
    s_inc = build_hnsw_store(spark, lo, r1, dim=64, seg_size=64)
    n = append_hnsw_store(spark, s_inc, hi)
    assert n == hi.count()
    # idempotent re-send
    assert append_hnsw_store(spark, s_inc, hi) == 0
    s_fresh = build_hnsw_store(spark, embs, r2, dim=64, seg_size=64)
    qv = list(embs.where("vec_id = 5").first()["embedding"])
    a = hnsw_topk_stored(spark, s_inc, qv, k=10, ef=64).collect()
    b = hnsw_topk_stored(spark, s_fresh, qv, k=10, ef=64).collect()
    assert [(r["id"], r["cos"]) for r in a] == [(r["id"], r["cos"]) for r in b]
    # and edges are identical table-wise
    e1 = spark.read.parquet(s_inc.path("edges")).orderBy(
        "seg", "level", "src", "dst"
    ).collect()
    e2 = spark.read.parquet(s_fresh.path("edges")).orderBy(
        "seg", "level", "src", "dst"
    ).collect()
    assert e1 == e2


def test_merge_shrinks_segment_count_exact_results_hold(spark, embs, tmp_path):
    from solr_ocr_processor_spark.operators.hnsw import merge_hnsw_segments

    root = str(tmp_path / "m")
    s = build_hnsw_store(spark, embs, root, dim=64, seg_size=64)
    qv = list(embs.where("vec_id = 0").first()["embedding"])
    before = hnsw_topk_stored(spark, s, qv, k=10, ef=s.seg_size).collect()
    s2 = merge_hnsw_segments(spark, s, factor=4)
    assert s2.seg_size == 256
    segs = {
        r["seg"]
        for r in spark.read.parquet(s2.path("nodes")).select("seg").distinct().collect()
    }
    assert len(segs) <= 2
    after = hnsw_topk_stored(spark, s2, qv, k=10, ef=s2.seg_size).collect()
    assert [(r["id"], r["cos"]) for r in after] == [
        (r["id"], r["cos"]) for r in before
    ]


def test_store_roundtrip_and_segment_layout(spark, embs, store):
    s = load_hnsw_store(store.root)
    assert (s.m, s.seg_size, s.seed) == (store.m, store.seg_size, store.seed)
    segs = {
        r["seg"]
        for r in spark.read.parquet(store.path("nodes")).select("seg").distinct().collect()
    }
    n = embs.count()
    assert len(segs) == (n + store.seg_size - 1) // store.seg_size
