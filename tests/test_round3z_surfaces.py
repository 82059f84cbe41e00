"""Round-3 continuation surfaces (batch oo): cluster-then-split,
SFT loss-mask accounting."""

from __future__ import annotations

import datetime

from solr_ocr_processor_spark.operators.conversation import loss_mask_stats
from solr_ocr_processor_spark.operators.split import (
    cluster_split,
    hash_split,
    split_leakage,
)
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"d{i}", "en", "s", 2) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_cluster_split_census_consistent(spark):
    docs = _docs(spark, 40)
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.9), (10, 11, 0.9)],
        "doc1 long, doc2 long, jaccard double",
    )
    out = cluster_split(docs, pairs).collect()
    assert sum(r["n_docs"] for r in out) == 40
    # 40 docs, two clusters absorb 3: 40 - 3 components total
    assert sum(r["n_clusters"] for r in out) == 37


def test_cluster_split_coassigns_members(spark):
    """Every near-dup pair member lands in its rep's split — replay
    the assignment doc-level and assert zero leakage."""
    from solr_ocr_processor_spark.operators.dedup import dup_clusters
    from pyspark.sql import functions as F

    docs = _docs(spark, 30)
    pairs = spark.createDataFrame(
        [(0, 5, 0.9), (5, 9, 0.8), (20, 21, 0.95)],
        "doc1 long, doc2 long, jaccard double",
    )
    labels = dup_clusters(docs.select("doc_id"), pairs).select(
        "doc_id", "rep_id"
    )
    reps = hash_split(
        labels.select(F.col("rep_id").alias("doc_id")).distinct()
    ).select(F.col("doc_id").alias("rep_id"), "split")
    doc_split = {
        r["doc_id"]: r["split"]
        for r in labels.join(reps, "rep_id").collect()
    }
    for a, b in [(0, 5), (5, 9), (0, 9), (20, 21)]:
        assert doc_split[a] == doc_split[b]


def test_cluster_split_singletons_match_plain_hash_split(spark):
    docs = _docs(spark, 25)
    pairs = spark.createDataFrame(
        [], "doc1 long, doc2 long, jaccard double"
    )
    out = {r["split"]: r for r in cluster_split(docs, pairs).collect()}
    plain = hash_split(docs.select("doc_id")).groupBy("split").count()
    for r in plain.collect():
        assert out[r["split"]]["n_docs"] == r["count"]
        assert out[r["split"]]["n_clusters"] == r["count"]


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, t, r, x, None, TS) for (c, t, r, x) in rows], TRANSCRIPT_SCHEMA
    )


def test_loss_mask_counts(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "user", "please sort this list"),  # 4 tokens, masked
            ("a", 1, "assistant", "use the sort function"),  # 4 trainable
            ("a", 2, "user", "thanks"),  # 1 masked
            ("a", 3, "assistant", "welcome"),  # 1 trainable
        ],
    )
    r = loss_mask_stats(t).collect()[0]
    assert r["n_turns"] == 4
    assert r["n_tokens"] == 10 and r["n_trainable"] == 5
    assert r["trainable_frac"] == 0.5


def test_loss_mask_drops_empty_turns_and_handles_no_assistant(spark):
    t = _tr(
        spark,
        [
            ("a", 0, "user", "hello there"),
            ("a", 1, "assistant", "   "),  # empty -> dropped
            ("b", 0, "user", "only user content here"),
        ],
    )
    got = {r["conv_id"]: r for r in loss_mask_stats(t).collect()}
    assert got["a"]["n_turns"] == 1 and got["a"]["n_trainable"] == 0
    assert got["b"]["trainable_frac"] == 0.0


# ---------------------------------------------------------------------------
# mutual_knn
# ---------------------------------------------------------------------------

from solr_ocr_processor_spark.operators.ann import mutual_knn  # noqa: E402


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_mutual_knn_requires_reciprocity(spark):
    # 0 and 1 are each other's nearest; hub 2 is near everyone but
    # with k=1 nobody reciprocates the hub unless it's their nearest
    rows = [
        [1.0, 0.0],
        [0.99, 0.1],
        [0.7, 0.7],
        [0.0, 1.0],
        [-1.0, 0.0],
    ]
    out = mutual_knn(_vecs(spark, rows), k=1).collect()
    assert [(r["id1"], r["id2"]) for r in out] == [(0, 1)]


def test_mutual_knn_pairs_symmetric_and_bounded(spark):
    rows = [[float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)]
            for i in range(9)]
    out = mutual_knn(_vecs(spark, rows), k=3, max_id=6).collect()
    for r in out:
        assert r["id1"] < r["id2"] < 6
    # identical one-hot vectors are mutually nearest: cos 1.0 pairs exist
    assert any(r["cos"] == 1.0 for r in out)


def test_mutual_knn_excludes_self(spark):
    rows = [[1.0, 0.0], [1.0, 0.0]]
    out = mutual_knn(_vecs(spark, rows), k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id1"], r["id2"], r["cos"]) == (0, 1, 1.0)
