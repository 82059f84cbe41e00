"""Materialization semantics: dense ordinals, char offsets, doc ids,
per-turn text equality round-trip (the BASELINE.json per-row invariant)."""

import pyspark.sql.functions as F

from solr_ocr_processor_spark.plans.materialize import (
    assign_doc_ids,
    materialize_docs,
    ordered_turns,
)
from solr_ocr_processor_spark.sources.transcripts import (
    derive_transcripts,
    synth_transcripts,
)


def test_dense_ordinal_skips_empty_turns(spark):
    """Empty/whitespace turns are skipped BEFORE numbering — the
    reference's page-position rule (indexer.go:98-148)."""
    t = synth_transcripts(spark, n_convs=8, seed=3, empty_turn_every=3)
    turns = ordered_turns(t).orderBy("conv_id", "ordinal").collect()
    by_conv = {}
    for r in turns:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert by_conv
    for rows in by_conv.values():
        # ordinals dense 0..n-1 even though turn_idx has gaps
        assert [r.ordinal for r in rows] == list(range(len(rows)))
        assert all(r.text.strip() for r in rows)
        # turn_idx strictly increasing (stable order), with gaps allowed
        idxs = [r.turn_idx for r in rows]
        assert idxs == sorted(idxs)


def test_char_offsets_match_joined_doc(spark):
    t = synth_transcripts(spark, n_convs=6, seed=11)
    mat = materialize_docs(t, with_text=True)
    docs = {r.conv_id: r.doc_text for r in mat.docs.collect()}
    for r in mat.turns.collect():
        assert docs[r.conv_id][r.char_start : r.char_end] == r.text


def test_doc_ids_dense_and_deterministic(spark):
    t = synth_transcripts(spark, n_convs=10, seed=5)
    ids1 = {r.conv_id: r.doc_id for r in assign_doc_ids(ordered_turns(t)).collect()}
    # repartition the input differently; ids must not change
    ids2 = {
        r.conv_id: r.doc_id
        for r in assign_doc_ids(ordered_turns(t.repartition(7))).collect()
    }
    assert ids1 == ids2
    assert sorted(ids1.values()) == list(range(len(ids1)))
    # sorted conv_id order
    assert [c for c, _ in sorted(ids1.items())] == [
        c for c, _ in sorted(ids1.items(), key=lambda kv: kv[1])
    ]


def test_roundtrip_per_turn_text_equality(spark, sf_dir):
    """Derived transcripts rejoined == original document text
    (per-row invariant vs the reference extractor)."""
    t = derive_transcripts(spark, sf_dir)
    mat = materialize_docs(t, with_text=True)
    orig = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("c"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        F.col("text").alias("orig_text"),
    )
    joined = mat.docs.join(orig, "conv_id")
    bad = joined.where(F.col("doc_text") != F.col("orig_text")).count()
    assert bad == 0
    assert joined.count() == orig.count()


def test_shuffled_doc_id_join_fallback_parity(spark, monkeypatch):
    """Past BROADCAST_DOC_IDS_MAX the doc-id join shuffles, the
    co-location guarantee is void (AQE skew splits divide partitions
    by map ranges, not keys), and the tokenizer must fall back to its
    own repartition. Force the fallback and assert the posting table
    is IDENTICAL to the broadcast/co-located build — same (doc, term)
    rows, same tf/dl, same packed position and location payloads."""
    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.plans import materialize as M

    t = synth_transcripts(spark, n_convs=12, seed=21)

    def snapshot(idx):
        return sorted(
            (r.doc_id, r.term, r.tf, r.dl, bytes(r.pos_bytes), bytes(r.loc_bytes))
            for r in idx.postings.collect()
        )

    fast = build_postings(t)
    assert fast.mat.doc_co_located
    want = snapshot(fast)
    fast.postings.unpersist()
    fast.mat.unpersist()

    monkeypatch.setattr(M, "BROADCAST_DOC_IDS_MAX", 0)
    slow = build_postings(t.repartition(5))
    assert not slow.mat.doc_co_located
    assert snapshot(slow) == want
    slow.postings.unpersist()
    slow.mat.unpersist()
