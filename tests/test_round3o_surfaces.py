"""Round-3 continuation surfaces (batch y): frequency spectrum,
template exchanges, streaming percolation replay identity."""

from __future__ import annotations

import datetime

import pytest

from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.conversation import template_exchanges
from solr_ocr_processor_spark.operators.percolate import (
    percolate_matches,
    percolate_stream,
)
from solr_ocr_processor_spark.operators.terms import freq_spectrum
from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

TS = datetime.datetime(2026, 1, 1)


def test_freq_spectrum_power_of_two_buckets(spark):
    rows = [("c0", 0, "user", "a a a b b c", None, TS)]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    got = {
        r["bucket"]: (r["n_terms"], r["token_mass"])
        for r in freq_spectrum(idx).collect()
    }
    # cf: a=3 (bitlen 2), b=2 (bitlen 2), c=1 (bitlen 1)
    assert got == {1: (1, 1), 2: (2, 5)}


def test_template_exchanges_normalized_cross_conv(spark):
    rows = [
        ("c0", 0, "user", "hi there", None, TS),
        ("c0", 1, "assistant", "hello world", None, TS),
        ("c1", 0, "user", "Hi  THERE", None, TS),  # same after normalize
        ("c1", 1, "assistant", "hello world", None, TS),
        ("c2", 0, "user", "different", None, TS),
        ("c2", 1, "assistant", "stuff", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    got = template_exchanges(t, min_convs=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_convs"], r["n_occurrences"]) == (2, 2)
    assert r["sample_first"] == "Hi  THERE"  # min() representative


def test_template_exchanges_skips_empty_halves(spark):
    rows = [
        ("c0", 0, "user", "hi", None, TS),
        ("c0", 1, "assistant", "   ", None, TS),  # empty next half
        ("c1", 0, "user", "hi", None, TS),
        ("c1", 1, "assistant", "   ", None, TS),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    assert template_exchanges(t, min_convs=2).count() == 0


@pytest.fixture(scope="module")
def rule_rows():
    return [("qa", "spark window"), ("qb", "merge"), ("qe", "  ")]


def test_percolate_stream_replay_equals_batch(spark, tmp_path, rule_rows):
    schema = "doc_id long, text string"
    doc_rows = [
        (1, "spark window merge"),
        (2, "spark only"),
        (3, "window merge spark combo"),
        (4, "nothing relevant"),
    ]
    qs = spark.createDataFrame(rule_rows, "query_id string, query_text string")
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(doc_rows, schema).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    q = (
        percolate_stream(stream, qs)
        .writeStream.format("memory")
        .queryName("perc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["query_id"], r["doc_id"])
        for r in spark.sql("SELECT * FROM perc").collect()
    }
    want = {
        (r["query_id"], r["doc_id"])
        for r in percolate_matches(
            spark, qs, spark.createDataFrame(doc_rows, schema)
        ).collect()
    }
    assert got == want
    assert ("qa", 1) in got and ("qa", 3) in got and ("qa", 2) not in got
    assert not any(qid == "qe" for qid, _ in got)  # empty rule matches nothing


# ------------------------------------------------------ Solr knobs

def test_facet_mincount_and_exclude(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",), (None,)],
        "lang string",
    )
    from solr_ocr_processor_spark.operators.facet import field_facet_counts

    got = [
        (r["value"], r["n"])
        for r in field_facet_counts(
            df, "lang", missing=True, sort="count", mincount=2,
            exclude_terms=("a",),
        ).collect()
    ]
    # 'a' excluded as a TERM; 'c' (1) and the missing bucket (1) fall
    # to mincount=2; 'b' survives
    assert got == [("b", 2)]


def test_facet_mincount_zero_keeps_all(spark):
    df = spark.createDataFrame([("a",), ("b",)], "lang string")
    from solr_ocr_processor_spark.operators.facet import field_facet_counts

    assert field_facet_counts(df, "lang", missing=False).count() == 2


def test_spellcheck_only_more_popular(spark):
    import pytest as _pt

    rows = [
        # 'cat' in 1 doc; 'cats' in 3 docs; 'car' in 1 doc
        ("c0", 0, "user", "cat car", None, TS),
        ("c1", 0, "user", "cats", None, TS),
        ("c2", 0, "user", "cats", None, TS),
        ("c3", 0, "user", "cats", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    from solr_ocr_processor_spark.operators.expand import spellcheck_terms

    plain = {r["term"] for r in spellcheck_terms(spark, idx, "cat").collect()}
    assert {"cat", "cats", "car"} <= plain
    pop = [
        (r["term"], r["df"])
        for r in spellcheck_terms(
            spark, idx, "cat", only_more_popular=True
        ).collect()
    ]
    # only 'cats' (df 3 > 1); the word itself and equal-df 'car' drop
    assert pop == [("cats", 3)]


def test_mlt_word_length_gates(spark):
    rows = [
        ("c0", 0, "user", "ab abc abcd abcde", None, TS),
        ("c1", 0, "user", "filler text", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    from solr_ocr_processor_spark.operators.expand import mlt_interesting_terms

    got = {
        r["term"]
        for r in mlt_interesting_terms(
            spark, idx, 0, min_wl=3, max_wl=4
        ).collect()
    }
    assert got == {"abc", "abcd"}


def test_shard_df_skew_conservation(spark):
    """Σ_shard df_shard == df_global per term; skew 1e6 iff even."""
    rows = [("c%02d" % i, 0, "user", "alpha beta" if i % 2 == 0 else "alpha",
             None, TS) for i in range(8)]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    from solr_ocr_processor_spark.operators.terms import shard_df_skew

    got = shard_df_skew(idx, ["alpha", "beta"], n_shards=4).collect()
    by_term = {}
    for r in got:
        by_term.setdefault(r["term"], []).append(r)
    for term, rs in by_term.items():
        assert sum(r["df_shard"] for r in rs) == rs[0]["df_global"]
    # alpha: every doc -> 2 per shard of 4, perfectly even
    alpha = [r for r in got if r["term"] == "alpha"]
    assert all(r["skew_scaled"] == 1_000_000 for r in alpha)


def test_dup_rate_by_source_charges_the_copy_holder(spark):
    docs = spark.createDataFrame(
        [
            (1, "same text", "srcA"),   # canonical (min id)
            (2, "same text", "srcB"),   # the copy -> charged to srcB
            (3, "unique here", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    from solr_ocr_processor_spark.operators.dedup import dup_rate_by_source

    got = {
        r["source"]: (r["n_docs"], r["n_dupes"], r["dup_rate_scaled"])
        for r in dup_rate_by_source(docs).collect()
    }
    assert got == {"srcA": (1, 0, 0), "srcB": (2, 1, 500_000)}


def test_json_props_stats_null_and_missing_keys(spark):
    from solr_ocr_processor_spark.operators.stream_expr import json_props_stats

    events = spark.createDataFrame(
        [
            (1, "a", '{"k": 10}'),
            (2, "a", '{"k": 20}'),
            (3, "a", '{"other": 5}'),   # no k -> counted, not summed
            (4, "b", None),             # null props
            (5, "b", "not json"),       # unparseable -> NULL k
        ],
        "event_id long, event_type string, props string",
    )
    got = {
        r["event_type"]: (
            r["n_events"], r["n_with_k"], r["k_min"], r["k_max"],
            r["k_sum"], r["k_avg_scaled"],
        )
        for r in json_props_stats(events).collect()
    }
    assert got == {
        "a": (3, 2, 10, 20, 30, 15_000_000),
        "b": (2, 0, None, None, None, 0),
    }


def test_result_clusters_labels_and_other_topics(spark):
    from solr_ocr_processor_spark.operators.cluster import result_clusters

    rows = [
        # two docs whose rarest term is 'shuffle' -> one cluster;
        # one doc about 'codec' alone -> Other Topics (NULL)
        ("c0", 0, "user", "common common shuffle", None, TS),
        ("c1", 0, "user", "common shuffle shuffle", None, TS),
        ("c2", 0, "user", "common codec", None, TS),
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    page = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = [
        (r["label"], r["doc_id"])
        for r in result_clusters(spark, idx, page, min_docs=2).collect()
    ]
    # 'common' df=3 (idf lowest); shuffle/codec df<=2 dominate tf*idf
    assert got == [("shuffle", 0), ("shuffle", 1), (None, 2)]
