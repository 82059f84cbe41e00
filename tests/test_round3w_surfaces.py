"""Round-3 continuation surfaces (batch jj): ColBERT MaxSim late
interaction, T5 span-corruption budget plan."""

from __future__ import annotations

import math

from solr_ocr_processor_spark.operators.ann import maxsim_topk
from solr_ocr_processor_spark.operators.pipeline import span_corruption_plan


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_maxsim_sums_per_query_maxima(spark):
    # groups (n_groups=2): even ids group 0 (query), odd ids group 1.
    # query bag: [1,0] and [0,1]; doc bag 1: [1,0] and [-1,0].
    rows = [
        [1.0, 0.0],  # id 0 -> group 0 (query)
        [1.0, 0.0],  # id 1 -> group 1
        [0.0, 1.0],  # id 2 -> group 0 (query)
        [-1.0, 0.0],  # id 3 -> group 1
    ]
    out = maxsim_topk(_vecs(spark, rows), query_group=0, n_groups=2, k=10)
    got = {r["group_id"]: r for r in out.collect()}
    # group 1: q[1,0] best match cos=1 (id1); q[0,1] best match cos=0
    assert got[1]["score"] == 1.0
    assert got[1]["n_query_vecs"] == 2
    # group 0 matches itself perfectly on both query vectors
    assert got[0]["score"] == 2.0


def test_maxsim_rewards_covering_all_aspects(spark):
    # doc A (group 1) matches only aspect one strongly twice; doc B
    # (group 2) matches both aspects moderately -> B wins under MaxSim
    c, s = math.cos(math.pi / 6), math.sin(math.pi / 6)
    rows = [
        [1.0, 0.0],  # id 0 -> q aspect 1
        [1.0, 0.0],  # id 1 -> A
        [c, s],      # id 2 -> B (30 deg from both axes-ish)
        [0.0, 1.0],  # id 3 -> q aspect 2
        [1.0, 0.0],  # id 4 -> A again
        [s, c],      # id 5 -> B
    ]
    out = maxsim_topk(_vecs(spark, rows), query_group=0, n_groups=3, k=10)
    got = {r["group_id"]: r["score"] for r in out.collect()}
    assert got[2] > got[1]  # covering both aspects beats one aspect


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_span_plan_t5_arithmetic(spark):
    texts = [" ".join(f"w{j}" for j in range(20))]  # 20 tokens
    r = span_corruption_plan(_docs(spark, texts)).collect()[0]
    assert r["n_tok"] == 20
    assert r["n_corrupt"] == 3  # round(20*0.15)
    assert r["n_spans"] == 1  # round(3/3)
    assert r["inputs_len"] == 20 - 3 + 1 + 1
    assert r["targets_len"] == 3 + 1 + 1


def test_span_plan_short_docs_skipped(spark):
    r = {
        x["doc_id"]: x
        for x in span_corruption_plan(_docs(spark, ["solo", ""])).collect()
    }
    assert r[0]["n_tok"] == 1 and r[0]["n_corrupt"] == 0
    assert r[0]["n_spans"] == 0 and r[0]["targets_len"] == 0
    assert r[0]["inputs_len"] == 2  # untouched + EOS
    assert r[1]["n_tok"] == 0 and r[1]["inputs_len"] == 1


def test_span_plan_corrupt_bounds(spark):
    # 2-token doc: round(2*0.15)=0 -> clamped up to 1, capped at n-1
    r = span_corruption_plan(_docs(spark, ["two tokens"])).collect()[0]
    assert r["n_corrupt"] == 1 and r["n_spans"] == 1
    # density cap: n_corrupt never reaches n_tok
    big = span_corruption_plan(
        _docs(spark, ["a b"]), noise_density=0.99
    ).collect()[0]
    assert big["n_corrupt"] == 1
