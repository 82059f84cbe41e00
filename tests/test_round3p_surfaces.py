"""Round-3 continuation surfaces (batch aa): rank evaluation
(trec_eval analog), /admin/segments report, deterministic
training-order shuffle."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.eval import rank_eval
from solr_ocr_processor_spark.operators.split import training_order
from solr_ocr_processor_spark.operators.terms import segments_report
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


# ---------------------------------------------------------------------------
# rank_eval
# ---------------------------------------------------------------------------


def _eval_rows(spark, results, qrels, k):
    r = spark.createDataFrame(results, "query_id string, rank int, doc_id long")
    q = spark.createDataFrame(qrels, "query_id string, doc_id long")
    return {row["query_id"]: row.asDict() for row in rank_eval(r, q, k).collect()}


def test_rank_eval_hand_computed(spark):
    # qA: relevant at ranks 2 and 4 of 5; n_rel=3 (one never retrieved)
    results = [("qA", i, 100 + i) for i in range(1, 6)]
    qrels = [("qA", 102), ("qA", 104), ("qA", 999)]
    got = _eval_rows(spark, results, qrels, 5)["qA"]
    assert got["n_rel"] == 3
    assert got["n_rel_ret"] == 2
    assert got["first_rel_rank"] == 2
    assert got["rr_scaled"] == 500_000
    assert got["p_at_k_scaled"] == 400_000  # 2/5
    # AP terms: rank2 -> 1e6*1//2 = 500000; rank4 -> 1e6*2//4 = 500000
    # ap = (500000+500000)//min(3,5) = 333333
    assert got["ap_scaled"] == 333_333


def test_rank_eval_perfect_and_empty(spark):
    results = [("qP", 1, 1), ("qP", 2, 2), ("qN", 1, 9)]
    qrels = [("qP", 1), ("qP", 2)]  # qN has NO judged relevant docs
    got = _eval_rows(spark, results, qrels, 2)
    p = got["qP"]
    assert (p["rr_scaled"], p["p_at_k_scaled"], p["ap_scaled"]) == (
        1_000_000,
        1_000_000,
        1_000_000,
    )
    n = got["qN"]
    assert (n["n_rel"], n["n_rel_ret"], n["first_rel_rank"]) == (0, 0, 0)
    assert (n["rr_scaled"], n["p_at_k_scaled"], n["ap_scaled"]) == (0, 0, 0)


def test_rank_eval_dedupes_qrels_and_validates_k(spark):
    results = [("q", 1, 7)]
    qrels = [("q", 7), ("q", 7)]  # duplicate judgment rows
    got = _eval_rows(spark, results, qrels, 1)["q"]
    assert got["n_rel"] == 1 and got["ap_scaled"] == 1_000_000
    with pytest.raises(ValueError):
        rank_eval(
            spark.createDataFrame(results, "query_id string, rank int, doc_id long"),
            spark.createDataFrame(qrels, "query_id string, doc_id long"),
            0,
        )


# ---------------------------------------------------------------------------
# segments_report
# ---------------------------------------------------------------------------


def test_segments_report_hand_computed(spark):
    rows = [
        ("c0", 0, "user", "a a b", None, TS),       # doc 0: dl=3, 2 terms
        ("c0", 1, "assistant", "c", None, TS),      # same doc, turn 2
        ("c1", 0, "user", "a", None, TS),           # doc 1: dl=1
        ("c2", 0, "user", "b b b b", None, TS),     # doc 2: dl=4
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = {r["shard"]: r.asDict() for r in segments_report(idx, 2).collect()}
    assert set(got) == {0, 1}
    s0, s1 = got[0], got[1]
    # shard 0 = docs {0, 1}: postings (a,b,c @doc0) + (a @doc1) = 4
    assert (s0["n_docs"], s0["min_doc_id"], s0["max_doc_id"]) == (2, 0, 1)
    assert (s0["n_postings"], s0["n_terms"], s0["n_tokens"]) == (4, 3, 5)
    assert s0["n_turns"] == 3
    # shard 1 = doc {2}: one posting (b, tf=4)
    assert (s1["n_docs"], s1["n_postings"], s1["n_terms"], s1["n_tokens"]) == (
        1,
        1,
        1,
        4,
    )
    with pytest.raises(ValueError):
        segments_report(idx, 0)


# ---------------------------------------------------------------------------
# training_order
# ---------------------------------------------------------------------------


def _ids_df(spark, n, parts=1):
    return spark.range(n).repartition(parts).selectExpr("id AS doc_id")


def test_training_order_is_permutation_with_balanced_shards(spark):
    out = training_order(_ids_df(spark, 23), seed="s", n_shards=4).collect()
    positions = sorted(r["position"] for r in out)
    assert positions == list(range(23))
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # shard is monotone in position (contiguous slices)
    by_pos = sorted(out, key=lambda r: r["position"])
    shards = [r["shard"] for r in by_pos]
    assert shards == sorted(shards)


def test_training_order_deterministic_and_seed_sensitive(spark):
    a = {
        r["doc_id"]: r["position"]
        for r in training_order(_ids_df(spark, 50, parts=1), seed="s1").collect()
    }
    b = {
        r["doc_id"]: r["position"]
        for r in training_order(_ids_df(spark, 50, parts=7), seed="s1").collect()
    }
    assert a == b  # partition-layout independent
    c = {
        r["doc_id"]: r["position"]
        for r in training_order(_ids_df(spark, 50), seed="s2").collect()
    }
    assert c != a  # a different seed is a different permutation
    with pytest.raises(ValueError):
        training_order(_ids_df(spark, 5), n_shards=0)


# ---------------------------------------------------------------------------
# epoch_schedule
# ---------------------------------------------------------------------------


def _src_df(spark, n, sources):
    rows = [(i, sources[i % len(sources)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_epoch_schedule_integer_epochs_exact(spark):
    from solr_ocr_processor_spark.operators.split import epoch_schedule

    d = _src_df(spark, 12, ["a", "b", "c"])
    out = epoch_schedule(d, {"a": 2.0, "b": 1.0}).collect()
    per = {}
    for r in out:
        per.setdefault((r["doc_id"], r["source"]), []).append(r["epoch"])
    for (_, src), eps in per.items():
        assert sorted(eps) == list(range(2 if src == "a" else 1))
    # c (absent from the map) contributes nothing
    assert all(src != "c" for _, src in per)
    # every a/b doc present
    assert len(per) == 8


def test_epoch_schedule_fraction_monotone_and_bounds(spark):
    from solr_ocr_processor_spark.operators.split import epoch_schedule

    d = _src_df(spark, 200, ["a"])
    lo = {r["doc_id"] for r in epoch_schedule(d, {"a": 0.25}).collect()}
    hi = {r["doc_id"] for r in epoch_schedule(d, {"a": 0.75}).collect()}
    assert lo <= hi  # same seed: fractional keeps nest (monotone)
    assert 0 < len(lo) < len(hi) < 200
    full = epoch_schedule(d, {"a": 2.5}).groupBy("doc_id").count().collect()
    assert all(r["count"] in (2, 3) for r in full)
    import pytest as _pt

    with _pt.raises(ValueError):
        epoch_schedule(d, {"a": -1.0})
    with _pt.raises(ValueError):
        epoch_schedule(d, {})


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------


def test_curriculum_order_buckets_are_contiguous_blocks(spark):
    from solr_ocr_processor_spark.operators.split import curriculum_order

    rows = [(i, (i * 37) % 100) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = sorted(
        curriculum_order(d, n_buckets=4).collect(), key=lambda r: r["position"]
    )
    assert sorted(r["position"] for r in out) == list(range(40))
    buckets = [r["bucket"] for r in out]
    assert buckets == sorted(buckets)  # bucket-major curriculum
    assert {b: buckets.count(b) for b in set(buckets)} == {1: 10, 2: 10, 3: 10, 4: 10}
    # within a bucket, order is the md5 shuffle, not the score order
    b1 = [r["doc_id"] for r in out if r["bucket"] == 1]
    scores = dict(rows)
    assert [scores[i] for i in b1] != sorted(scores[i] for i in b1)


def test_curriculum_order_partition_independent(spark):
    from solr_ocr_processor_spark.operators.split import curriculum_order

    rows = [(i, (i * 13) % 50) for i in range(60)]
    a = {
        r["doc_id"]: (r["bucket"], r["position"])
        for r in curriculum_order(
            spark.createDataFrame(rows, "doc_id long, n_chars long").repartition(1)
        ).collect()
    }
    b = {
        r["doc_id"]: (r["bucket"], r["position"])
        for r in curriculum_order(
            spark.createDataFrame(rows, "doc_id long, n_chars long").repartition(9)
        ).collect()
    }
    assert a == b
