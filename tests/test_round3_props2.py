"""Law tests for the round-3 continuation operators: algebraic
invariants checked over seeded randomized corpora (one Spark session,
deterministic seeds — the hypothesis discipline without per-example
JVM round-trips)."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from solr_ocr_processor_spark.functions.textstats import bpe_merge_candidates
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.dedup import containment_pairs
from solr_ocr_processor_spark.operators.query import proximity_topk, span_near_topk
from solr_ocr_processor_spark.operators.split import composite_id_route
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)
VOCAB = ["table", "value", "spark", "merge", "scan", "row"]


def _rand_corpus(seed: int, n: int = 12):
    rng = random.Random(seed)
    return [
        (
            f"c{i:02d}", 0, "user",
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 14))),
            None, TS,
        )
        for i in range(n)
    ]


def test_span_near_superset_of_ordered_law(spark):
    """Unordered spans admit every ordered match: for any corpus and
    slop, proximity_topk's doc set ⊆ span_near_topk's (window
    symmetric ⊇ one-sided)."""
    for seed in (3, 17, 42):
        idx = build_postings(
            spark.createDataFrame(_rand_corpus(seed), TRANSCRIPT_SCHEMA)
        )
        for slop in (0, 2):
            ordered = {
                r["doc_id"]
                for r in proximity_topk(
                    spark, idx, "table value", slop=slop, k=50
                ).collect()
            }
            unordered = {
                r["doc_id"]
                for r in span_near_topk(
                    spark, idx, "table value", slop=slop, k=50
                ).collect()
            }
            assert ordered <= unordered, (seed, slop)


def test_containment_substring_is_total(spark):
    """A's shingle set inside B's (A a contiguous sub-span of B, both
    long enough) forces C(A→B) = 1.0 exactly."""
    a = "one two three four five"
    b = "zero " + a + " six seven"
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {
        (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
        for r in containment_pairs(docs, n=3, tau_num=1, tau_den=100).collect()
    }
    assert got[(1, 2)] == 1_000_000
    # and the reverse direction is |S(A)∩S(B)| / |S(B)| scaled exactly
    n_a, n_b = 3, 6  # 5-token doc -> 3 trigrams; 8-token -> 6
    assert got[(2, 1)] == n_a * 1_000_000 // n_b


def test_composite_route_total_and_stable(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(50)], "doc_id long, source string"
    )
    a = composite_id_route(docs, n_shards=4).collect()
    b = composite_id_route(docs, n_shards=4).collect()
    assert len(a) == 50  # total: every doc routed exactly once
    assert {(r["doc_id"], r["shard"]) for r in a} == {
        (r["doc_id"], r["shard"]) for r in b
    }  # stable across invocations
    by_key = {}
    for r in a:
        by_key.setdefault(r["route_key"], set()).add(r["shard"])
    assert all(len(s) == 1 for s in by_key.values())  # co-location
    assert all(0 <= r["shard"] < 4 for r in a)


def test_bpe_pair_mass_law(spark):
    """Σ pair counts == Σ_w wc(w)·(len(w)−1): every adjacent char pair
    of every word occurrence is counted exactly once."""
    rng = random.Random(11)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    docs = spark.createDataFrame(
        [(1, " ".join(words[:15])), (2, " ".join(words[15:]))],
        "doc_id long, text string",
    )
    got = bpe_merge_candidates(docs, k=1000).collect()
    from collections import Counter

    wc = Counter(words)
    want_mass = sum(c * (len(w) - 1) for w, c in wc.items())
    assert sum(r["n"] for r in got) == want_mass
