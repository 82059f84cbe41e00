"""In-plan WAND tombstones (round-4: the exclude_docs DataFrame path
groups dead ids by range inside the plan — no driver-side id list)."""

from __future__ import annotations

from solr_ocr_processor_spark.config import IndexConfig
from solr_ocr_processor_spark.operators.blocks import build_block_index
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.wand import wand_topk
from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

CFG = IndexConfig(block_size=4, range_size=8)
QUERY = "spark window merge"


def _bidx(spark, n_convs=40, seed=5):
    t = synth_transcripts(spark, n_convs=n_convs, max_turns=8, seed=seed)
    return build_block_index(build_postings(t, CFG), CFG)


def test_plan_path_equals_scalar_path_many_tombstones(spark):
    bidx = _bidx(spark)
    base = wand_topk(spark, bidx, QUERY, k=30, cfg=CFG).collect()
    # tombstone every third doc of the full id space — a "many
    # tombstones between compactions" store
    all_ids = [r["doc_id"] for r in bidx.doc_meta.select("doc_id").collect()]
    dead = [d for d in all_ids if d % 3 == 0]
    assert len(dead) > 8
    scalar = wand_topk(
        spark, bidx, QUERY, k=10, cfg=CFG, exclude_doc_ids=dead
    ).collect()
    dead_df = spark.createDataFrame([(d,) for d in dead], "doc_id long")
    plan = wand_topk(
        spark, bidx, QUERY, k=10, cfg=CFG, exclude_docs=dead_df
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in plan] == [
        (r["doc_id"], r["score"]) for r in scalar
    ]
    assert all(r["doc_id"] % 3 != 0 for r in plan)
    # survivors keep their tombstone-mode scores (corpus stats frozen)
    base_scores = {r["doc_id"]: r["score"] for r in base}
    assert all(base_scores[r["doc_id"]] == r["score"] for r in plan)


def test_plan_path_empty_tombstones_is_identity(spark):
    bidx = _bidx(spark, n_convs=20, seed=9)
    empty = spark.createDataFrame([], "doc_id long")
    a = wand_topk(spark, bidx, QUERY, k=10, cfg=CFG).collect()
    b = wand_topk(spark, bidx, QUERY, k=10, cfg=CFG, exclude_docs=empty).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_both_exclude_forms_compose(spark):
    bidx = _bidx(spark, n_convs=20, seed=9)
    top = wand_topk(spark, bidx, QUERY, k=4, cfg=CFG).collect()
    d0, d1 = top[0]["doc_id"], top[1]["doc_id"]
    df = spark.createDataFrame([(d0,)], "doc_id long")
    out = wand_topk(
        spark, bidx, QUERY, k=4, cfg=CFG, exclude_doc_ids=[d1], exclude_docs=df
    ).collect()
    got = {r["doc_id"] for r in out}
    assert d0 not in got and d1 not in got
