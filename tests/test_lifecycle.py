"""M4 lifecycle: resumable shard build, membership, tombstone delete,
compaction equivalence (delete(X) ranking == fresh build without X)."""

from __future__ import annotations

import pytest

from solr_ocr_processor_spark.config import IndexConfig
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.lifecycle import (
    IndexStore,
    build_metrics,
    build_store,
    check,
    compact,
    delete_conv,
    load_block_index,
    tombstoned_doc_ids,
)
from solr_ocr_processor_spark.operators.wand import wand_topk
from solr_ocr_processor_spark.oracle import oracle_bm25_topk, oracle_materialize
from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

CFG = IndexConfig(block_size=4, range_size=8)
QUERY = "spark window merge"


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_transcripts(spark, n_convs=30, max_turns=8, seed=3)


def test_resume_after_injected_failure(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store_resume"))
    with pytest.raises(RuntimeError, match="injected failure"):
        build_store(spark, corpus, root, CFG, n_shards=3, fail_after_shard=1)
    store = IndexStore(root, CFG)
    m1 = build_metrics(spark, store).collect()
    assert len(m1) == 1 and m1[0]["status"] == "done"

    # resume: finishes remaining shards, does NOT rebuild the done one
    build_store(spark, corpus, root, CFG, n_shards=3)
    m2 = build_metrics(spark, store).collect()
    assert len(m2) == 3
    assert {r["shard"] for r in m2} == {0, 1, 2}
    # the shard built pre-crash kept its original build_id (not redone)
    assert m1[0]["build_id"] in {r["build_id"] for r in m2}
    assert all(r["turns_per_sec"] > 0 for r in m2)

    # queries over the resumed store are rank-identical to the oracle
    bidx = load_block_index(spark, store)
    docs_pd = oracle_materialize(corpus.toPandas())
    assert bidx.n_docs == len(docs_pd)
    got = wand_topk(spark, bidx, QUERY, k=10, cfg=CFG).collect()
    want = oracle_bm25_topk(docs_pd, QUERY, k=10, cfg=CFG)
    assert [r["doc_id"] for r in got] == list(want["doc_id"])
    assert all(abs(r["score"] - s) < 1e-9 for r, s in zip(got, want["score"]))


def test_sharded_wand_bounds_survive_skewed_shard_avgdl(spark, tmp_path_factory):
    """Regression: shard-local avgdl must not poison block-max bounds.

    Shard 0 holds 1-token docs (shard avgdl 1, global ~20): bounds
    encoded against the shard's own avgdl would under-estimate those
    docs' true scores, and theta from the long-doc shard would prune
    shard 0's ranges even though its docs are the true top-k. The fix
    (global-stats prepass + stored per-block avgdl with ratio-scaled
    bounds) must make the 2-shard store rank-identical to the oracle.
    """
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = []
    filler = " ".join(["pad"] * 35)
    for i in range(300):
        rows.append((f"a{i:04d}", 0, "user", "zebra", None, base))
        rows.append(
            (f"b{i:04d}", 0, "user", f"{'zebra ' * 5}{filler}", None, base)
        )
    corpus = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    root = str(tmp_path_factory.mktemp("store_skew"))
    store = build_store(spark, corpus, root, CFG, n_shards=2)
    bidx = load_block_index(spark, store)
    got = wand_topk(spark, bidx, "zebra", k=10, cfg=CFG).collect()
    want = oracle_bm25_topk(
        oracle_materialize(corpus.toPandas()), "zebra", k=10, cfg=CFG
    )
    assert [r["doc_id"] for r in got] == list(want["doc_id"])
    assert all(abs(r["score"] - s) < 1e-9 for r, s in zip(got, want["score"]))
    # sanity: the winners are the short docs (high tfnorm), which live
    # entirely in the under-avgdl shard the old bounds pruned
    assert all(r["conv_id"].startswith("a") for r in got)


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store_main"))
    return build_store(spark, corpus, root, CFG, n_shards=2)


def test_membership_check(spark, store, corpus):
    some_conv = corpus.select("conv_id").first()["conv_id"]
    assert check(spark, store, some_conv) is True
    assert check(spark, store, "does-not-exist") is False


def test_delete_then_query_excludes(spark, store, corpus):
    docs_pd = oracle_materialize(corpus.toPandas())
    bidx = load_block_index(spark, store)
    before = wand_topk(spark, bidx, QUERY, k=5, cfg=CFG).collect()
    victim = before[0]["conv_id"]

    delete_conv(spark, store, victim)
    assert check(spark, store, victim) is False
    dead = tombstoned_doc_ids(spark, store)
    assert before[0]["doc_id"] in dead

    after = wand_topk(
        spark, bidx, QUERY, k=5, cfg=CFG, exclude_doc_ids=dead
    ).collect()
    assert victim not in {r["conv_id"] for r in after}
    # tombstone mode keeps corpus stats: scores of survivors unchanged
    before_rest = [(r["doc_id"], r["score"]) for r in before if r["conv_id"] != victim]
    assert [(r["doc_id"], r["score"]) for r in after[: len(before_rest)]] == before_rest

    # compaction: physical removal; ranking == fresh build without victim
    compact(spark, store)
    assert not tombstoned_doc_ids(spark, store)
    bidx2 = load_block_index(spark, store)
    assert bidx2.n_docs == len(docs_pd) - 1
    got = wand_topk(spark, bidx2, QUERY, k=5, cfg=CFG).collect()
    fresh_pd = oracle_materialize(
        corpus.where(f"conv_id != '{victim}'").toPandas()
    )
    # doc ids shift on fresh build; compare by conv_id + score
    want = oracle_bm25_topk(fresh_pd, QUERY, k=5, cfg=CFG)
    assert [r["conv_id"] for r in got] == list(want["conv_id"])
    assert all(abs(r["score"] - s) < 1e-9 for r, s in zip(got, want["score"]))
