"""Streaming near-duplicate gate (round 4, streaming/dedup.
near_dedup_doc_stream): foreachBatch incremental MinHash vs the
persisted admitted-corpus store."""

from __future__ import annotations

import os

import pytest

from solr_ocr_processor_spark.operators.dedup import incremental_minhash_dedup
from solr_ocr_processor_spark.streaming.dedup import near_dedup_doc_stream

SCHEMA = "doc_id long, text string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_available_now(spark, src, store, out, tmp):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        near_dedup_doc_stream(stream, store, out)
        .option("checkpointLocation", str(tmp / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_single_batch_replay_equals_batch_incremental(spark, tmp_path):
    """availableNow over a static source with a PRE-SEEDED store must
    flag exactly what the batch incremental operator flags."""
    store, out, src = (str(tmp_path / d) for d in ("store", "out", "src"))
    seed = [(0, BASE), (1, "totally unrelated seed document content here")]
    _write(spark, store, seed)
    batch = [
        (10, BASE + " tail"),          # near-dup of stored 0
        (11, "fresh novel content nobody has seen before at all"),
    ]
    _write(spark, src, batch)
    _run_available_now(spark, src, store, out, tmp_path)

    got = {
        (r["doc_id"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["dup_of"])
        for r in incremental_minhash_dedup(
            spark.createDataFrame(batch, SCHEMA),
            spark.createDataFrame(seed, SCHEMA),
        ).collect()
    }
    assert got == want and (10, 0) in got
    # survivors folded in, dups not admitted
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert 11 in ids and 10 not in ids and {0, 1} <= ids


def test_cross_batch_suppression_and_original_retention(spark, tmp_path):
    """A batch-2 near-copy of a batch-1-ADMITTED doc is flagged
    against it; a batch-2 copy of a batch-1 REJECTED doc still matches
    the original (rejected docs leave no trace in the store). ONE
    query instance, ONE checkpoint — the second availableNow run picks
    up only the files added since (the rolling-ingest shape the report
    table's batch_id partitioning assumes)."""
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    seed = [(0, BASE)]
    _write(spark, store, seed)

    src = str(tmp_path / "src")
    _write(spark, src, [(10, BASE + " tail"), (20, "novel one of a kind body text")])
    _run_available_now(spark, src, store, out, tmp_path)

    _write(
        spark,
        src,
        [(30, "novel one of a kind body text plus suffix"),  # dups 20
         (31, BASE + " tail")],                               # dups 0 (10 was rejected)
    )
    _run_available_now(spark, src, store, out, tmp_path)

    pairs = {
        (r["doc_id"], r["dup_of"])
        for r in spark.read.parquet(out).collect()
    }
    assert (10, 0) in pairs          # batch 1
    assert (30, 20) in pairs         # batch 2 vs batch-1 admission
    assert (31, 0) in pairs          # matches the ORIGINAL, not the reject
    assert not any(d == 10 for _, d in pairs)
    ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert ids == {0, 20}


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch retry semantics: re-executing the SAME batch after
    both writes committed (worst-case crash point — simulated by
    wiping the checkpoint so the same files replay as batch 0) must
    leave the report and the store bit-identical: the report partition
    is overwritten, not appended, and already-stored ids are never
    re-admitted or self-matched."""
    store, out, src = (str(tmp_path / d) for d in ("store", "out", "src"))
    _write(spark, store, [(0, BASE)])
    _write(spark, src, [(10, BASE + " tail"), (11, "fresh unseen material")])

    _run_available_now(spark, src, store, out, tmp_path / "ck1")
    first_pairs = sorted(
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in spark.read.parquet(out).collect()
    )
    first_store = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    # fresh checkpoint => the identical files re-run as batch 0 against
    # the post-fold store: exactly a replayed batch
    _run_available_now(spark, src, store, out, tmp_path / "ck2")
    again_pairs = sorted(
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in spark.read.parquet(out).collect()
    )
    again_store = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    assert again_pairs == first_pairs == [(10, 0, first_pairs[0][2])]
    assert again_store == first_store == [0, 11]


def test_empty_store_admits_everything(spark, tmp_path):
    store, out, src = (str(tmp_path / d) for d in ("store", "out", "src"))
    os.makedirs(store, exist_ok=True)
    _write(spark, src, [(1, "one document only here"), (2, "another unrelated one")])
    _run_available_now(spark, src, store, out, tmp_path)
    assert not os.path.exists(os.path.join(out, "_SUCCESS")) or (
        spark.read.parquet(out).count() == 0
    )
    assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {1, 2}
