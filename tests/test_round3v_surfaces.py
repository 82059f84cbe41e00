"""Round-3 continuation surfaces (batch ii): graded nDCG@k,
cell-pruned geofilt losslessness."""

from __future__ import annotations

import math

from solr_ocr_processor_spark.operators.eval import ndcg_at_k
from solr_ocr_processor_spark.operators.spatial import (
    cell_geofilt_topk,
    geofilt_topk,
    synth_coords,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id string, rank int, doc_id long")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, grade int")


def test_ndcg_perfect_ranking_is_one(spark):
    res = _results(spark, [("q", 1, 10), ("q", 2, 11), ("q", 3, 12)])
    rel = _qrels(spark, [("q", 10, 3), ("q", 11, 2), ("q", 12, 1)])
    out = ndcg_at_k(res, rel, k=3).collect()
    assert out[0]["ndcg"] == 1.0


def test_ndcg_hand_computed(spark):
    # ranking puts grade-1 first, grade-3 second
    res = _results(spark, [("q", 1, 20), ("q", 2, 10)])
    rel = _qrels(spark, [("q", 10, 3), ("q", 20, 1)])
    out = ndcg_at_k(res, rel, k=5).collect()
    dcg = (2**1 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3)
    idcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    r = out[0]
    assert r["dcg"] == round(dcg, 6)
    assert r["idcg"] == round(idcg, 6)
    assert r["ndcg"] == round(dcg / idcg, 6)


def test_ndcg_unjudged_query_zero(spark):
    res = _results(spark, [("q", 1, 10), ("z", 1, 9)])
    rel = _qrels(spark, [("q", 10, 2)])
    out = {r["query_id"]: r for r in ndcg_at_k(res, rel, k=3).collect()}
    assert out["q"]["ndcg"] == 1.0
    assert out["z"]["ndcg"] == 0.0 and out["z"]["idcg"] == 0.0


def test_ndcg_ideal_cut_at_k(spark):
    # 3 judged docs but k=2: IDCG uses only the best two grades
    res = _results(spark, [("q", 1, 1), ("q", 2, 2)])
    rel = _qrels(spark, [("q", 1, 3), ("q", 2, 3), ("q", 3, 3)])
    out = ndcg_at_k(res, rel, k=2).collect()
    assert out[0]["ndcg"] == 1.0


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_cell_pruning_is_lossless(spark):
    coords = synth_coords(_docs(spark, 400))
    for pt_lat, pt_lon, d in [
        (12.5, 45.0, 3000.0),
        (0.0, 0.0, 500.0),
        (80.0, 170.0, 2500.0),  # near-pole: lon pruning disabled
        (-45.0, -179.0, 1000.0),  # antimeridian box: lon disabled
        # circle ENCLOSES the pole while dlon stays < 180: the pole
        # is 222 km from (88, 0), so points at every longitude near
        # the pole are in range — pruning must shut off (ADVICE r3)
        (88.0, 0.0, 250.0),
        (-88.5, 120.0, 300.0),
    ]:
        brute = geofilt_topk(coords, pt_lat, pt_lon, d, k=50).collect()
        cell = cell_geofilt_topk(coords, pt_lat, pt_lon, d, k=50).collect()
        assert [tuple(r) for r in cell] == [tuple(r) for r in brute], (
            pt_lat,
            pt_lon,
            d,
        )


def test_cell_pruning_actually_prunes(spark):
    # small radius: the candidate set after the cell filter must be a
    # strict subset of the corpus
    coords = synth_coords(_docs(spark, 400))
    import math as m

    from pyspark.sql import functions as F

    d = 500.0
    dlat = d / 111.0 * 1.02
    c = 5.0
    cells = coords.withColumn(
        "cell_lat", F.floor(F.col("lat") / F.lit(c)).cast("int")
    )
    kept = cells.where(
        (F.col("cell_lat") >= m.floor((12.5 - dlat) / c))
        & (F.col("cell_lat") <= m.floor((12.5 + dlat) / c))
    ).count()
    assert kept < 400 * 0.3
