"""Round-4 property sweeps: prefix-filter losslessness, HNSW
exhaustive-probe exactness, poly-winnow hash identity — driven over
seeded random corpora (Spark-side ops keep hypothesis for the pure
kernels; the cluster ops use seeded sweeps like test_properties)."""

from __future__ import annotations

import math
import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_ocr_processor_spark.operators.dedup import (
    WINNOW_POLY_MOD,
    containment_pairs,
    containment_pairs_banded,
    winnow_fingerprints,
    winnow_poly_powers,
)


def _rand_docs(spark, seed, n_docs=25, vocab=18, lo=4, hi=20):
    rng = random.Random(seed)
    words = [f"v{i}" for i in range(vocab)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(lo, hi))))
        for i in range(n_docs)
    ]
    # inject guaranteed containment structure: doc 100 = doc 0 + tail,
    # doc 101 = exact copy of doc 1
    rows.append((100, rows[0][1] + " tail0 tail1 tail2"))
    rows.append((101, rows[1][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_lossless_across_seeds_and_taus(spark):
    """The pigeonhole candidate bound is exact for ANY corpus and
    threshold: banded result == exact spine, including corpora with
    tiny vocabularies (maximally hot shingles)."""
    for seed in (1, 7, 23):
        docs = _rand_docs(spark, seed)
        for num, den in ((1, 2), (2, 3), (1, 5)):
            exact = {
                (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
                for r in containment_pairs(
                    docs, n=2, tau_num=num, tau_den=den
                ).collect()
            }
            banded = {
                (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
                for r in containment_pairs_banded(
                    docs, n=2, tau_num=num, tau_den=den
                ).collect()
            }
            assert banded == exact, (seed, num, den)
        # the planted copies must surface at tau=1/2
        got = {
            (r["doc_src"], r["doc_dst"])
            for r in containment_pairs_banded(docs, n=2).collect()
        }
        assert (0, 100) in got and (1, 101) in got and (101, 1) in got


def test_hnsw_exhaustive_equals_brute_across_seeds(spark, tmp_path):
    """ef >= seg_size ⇒ per-segment beam visits every node (connected
    graph) ⇒ global result == brute scan, for random vector sets and
    several query points."""
    from solr_ocr_processor_spark.operators.ann import cosine_topk
    from solr_ocr_processor_spark.operators.hnsw import (
        build_hnsw_store,
        hnsw_topk_stored,
    )

    rng = np.random.default_rng(5)
    n, dim = 150, 16
    vecs = rng.normal(size=(n, dim))
    embs = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    store = build_hnsw_store(
        spark, embs, str(tmp_path / "h"), dim=dim, seg_size=48
    )
    for qid in (0, 77, 149):
        qv = [float(x) for x in vecs[qid]]
        brute = cosine_topk(embs, qv, 8).collect()
        graph = hnsw_topk_stored(spark, store, qv, k=8, ef=48).collect()
        assert [(r["id"], r["cos"]) for r in graph] == [
            (r["id"], r["cos"]) for r in brute
        ], qid


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=11,
        max_size=120,
    )
)
def test_poly_hash_kernel_matches_integer_reference(s):
    """The numpy sliding-window polynomial (utf-32 reinterpret + dot)
    equals the pure-integer definition for arbitrary unicode text —
    the exactness seam the DuckDB oracle relies on."""
    from numpy.lib.stride_tricks import sliding_window_view

    k = 8
    s = s.lower()
    cs = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if len(cs) < k:
        return
    pows = np.array(winnow_poly_powers(k), dtype=np.int64)
    kernel = (sliding_window_view(cs, k) @ pows) % WINNOW_POLY_MOD
    plist = winnow_poly_powers(k)
    ref = [
        sum(ord(s[i + j]) * plist[j] for j in range(k)) % WINNOW_POLY_MOD
        for i in range(len(s) - k + 1)
    ]
    assert kernel.tolist() == ref


def test_poly_and_md5_fingerprint_counts_close(spark):
    """Hash families select different minima but the SELECTION DENSITY
    obeys the same winnowing expectation (~2/(w+1) of grams); sanity
    that the poly path is a real winnow, not a degenerate one."""
    rng = random.Random(3)
    texts = [
        "".join(rng.choice("abcdefgh ") for _ in range(300)) for _ in range(10)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n_md5 = winnow_fingerprints(docs, hasher="md5").count()
    n_poly = winnow_fingerprints(docs, hasher="poly").count()
    assert abs(n_md5 - n_poly) / max(n_md5, n_poly) < 0.25
    expected = sum(len(t) - 8 + 1 for t in texts) * 2 / (4 + 1)
    assert 0.4 * expected < n_poly < 1.6 * expected


def test_mutual_knn_stored_pairs_are_symmetric_members(spark, tmp_path):
    """Every reported pair must be reciprocal: each endpoint lies in
    the other's top-k over the probed candidate sets — re-derived
    independently from the store tables."""
    import __spark_entry__ as e
    from solr_ocr_processor_spark.operators.ann_store import (
        build_ann_store,
        mutual_knn_stored,
    )

    embs = e._embs(spark, "/root/testdata/sf0.001").where("vec_id < 120")
    store = build_ann_store(spark, embs, str(tmp_path / "a"), dim=64)
    out = mutual_knn_stored(spark, store, k=4, max_id=120, nprobe=16).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embs.collect()
    }

    def topk(q, k=4):
        sims = []
        qv = vecs[q]
        for i, v in vecs.items():
            if i == q:
                continue
            d = np.linalg.norm(qv) * np.linalg.norm(v)
            sims.append((float(qv @ v / d) if d > 0 else 0.0, -i))
        sims.sort(reverse=True)
        return {-i for _, i in sims[:k]}

    assert out, "no mutual pairs found on the panel"
    for r in out:
        a, b = r["id1"], r["id2"]
        assert b in topk(a) and a in topk(b), (a, b)
        d = np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])
        assert r["cos"] == round(float(vecs[a] @ vecs[b] / d), 6) or math.isclose(
            r["cos"], float(vecs[a] @ vecs[b] / d), abs_tol=1e-6
        )
