"""Round-3 continuation surfaces (batch w): normalized dedup,
snapshot diff, role analytics, NTILE length buckets."""

from __future__ import annotations

import datetime

from solr_ocr_processor_spark.operators.conversation import role_stats
from solr_ocr_processor_spark.operators.dedup import normalized_dup_groups
from solr_ocr_processor_spark.operators.pipeline import corpus_diff
from solr_ocr_processor_spark.operators.split import length_buckets
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def test_normalized_dedup_catches_variants(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello World 2024!"),
            (2, "hello   world 1999"),
            (3, "different entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["group_size"], r["is_canonical"])
        for r in normalized_dup_groups(docs).collect()
    }
    # both normalize to "hello world 0" (digits -> 0, punct stripped)
    assert got == {1: (2, 1), 2: (2, 0), 3: (1, 1)}


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "bX"), (4, "d")], "doc_id long, text string"
    )
    got = {r["status"]: r["n_docs"] for r in corpus_diff(old, new).collect()}
    assert got == {"added": 1, "changed": 1, "removed": 1, "unchanged": 1}


def test_role_stats_hand_computed(spark):
    rows = [
        ("c0", 0, "user", "one two", None, TS),
        ("c0", 1, "assistant", "three", None, TS),
        ("c1", 0, "user", "four five six", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = {
        r["role"]: (
            r["n_turns"], r["n_convs"], r["n_tokens"], r["avg_tokens_scaled"]
        )
        for r in role_stats(t).collect()
    }
    assert got == {
        "user": (2, 2, 5, 2_500_000),
        "assistant": (1, 1, 1, 1_000_000),
    }


def test_length_buckets_ntile(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in length_buckets(docs, n_buckets=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}


def test_length_buckets_remainder_to_first(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in length_buckets(docs, n_buckets=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}  # ANSI NTILE: first bucket gets the extra
