"""Round-3 continuation surfaces (batch ff): MOSS winnowing
fingerprints / shared spans / near-dup pairs, token-budget mixture
plan."""

from __future__ import annotations

import hashlib
import math

from solr_ocr_processor_spark.operators.dedup import (
    winnow_common_spans,
    winnow_fingerprints,
    winnow_pairs,
)
from solr_ocr_processor_spark.operators.pipeline import token_budget_plan


def _docs(spark, texts, sources=None):
    rows = [
        (i, t, "en", (sources[i] if sources else "src0"), len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _ref_winnow(text, k=8, w=4):
    """Reference winnowing in pure Python."""
    s = text.lower()
    if len(s) < k + w - 1:
        return set()
    hashes = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(s) - k + 1)
    ]
    return {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}


def test_winnow_matches_reference_impl(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ]
    out = winnow_fingerprints(_docs(spark, texts)).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got[0] == _ref_winnow(texts[0])
    assert got[1] == _ref_winnow(texts[1])


def test_winnow_shared_substring_guarantee(spark):
    """Any shared substring of length >= k + w - 1 must yield at least
    one shared fingerprint, at ANY offset (the winnowing theorem)."""
    core = "distinctive shared span xyz"  # len 27 >= 8 + 4 - 1
    texts = [
        f"aaaa {core} bbbb",
        f"completely different prefix material {core}",
        "no overlap at all in this one, nothing shared here",
    ]
    out = winnow_fingerprints(_docs(spark, texts)).collect()
    sets = {}
    for r in out:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets[0] & sets[1], "offset copy lost the shared fingerprint"
    assert not (sets[0] & sets[1] & sets[2])


def test_winnow_short_text_dropped(spark):
    out = winnow_fingerprints(_docs(spark, ["tiny", "x" * 10])).collect()
    assert out == []  # both below k + w - 1 = 11 chars


def test_winnow_common_spans_counts(spark):
    texts = [
        "shared boilerplate header line one",
        "shared boilerplate header line two",
        "totally unrelated document body qqq",
    ]
    out = winnow_common_spans(_docs(spark, texts), min_docs=2).collect()
    assert out, "shared header must produce shared fingerprints"
    assert all(r["n_docs"] == 2 for r in out)
    # ordered n_docs desc then fp asc
    fps = [r["fp"] for r in out]
    assert fps == sorted(fps)


def test_winnow_pairs_exact_dup_sim_one(spark):
    texts = [
        "identical document text for the pair check",
        "identical document text for the pair check",
        "something else entirely unrelated to both",
    ]
    out = winnow_pairs(_docs(spark, texts), tau=0.5).collect()
    assert [(r["doc1"], r["doc2"]) for r in out] == [(0, 1)]
    assert out[0]["sim"] == 1.0


def test_winnow_pairs_containment(spark):
    small = "the contained payload sentence appears verbatim"
    texts = [small, f"prefix padding words {small} suffix padding words"]
    out = winnow_pairs(_docs(spark, texts), tau=0.5).collect()
    assert len(out) == 1
    # every fingerprint of the small doc should appear in the big one
    assert out[0]["sim"] >= 0.9


def test_winnow_pairs_ubiquity_cull(spark):
    # 5 docs all sharing one boilerplate span; max_df=2 culls those
    # fps from candidate generation, so no pair survives tau=0.5
    texts = [f"common boilerplate span here tail{i}" for i in range(5)]
    out = winnow_pairs(_docs(spark, texts), tau=0.9, max_df=2).collect()
    assert out == []


def test_token_budget_plan_arithmetic(spark):
    texts = ["alpha beta gamma delta", "one two", "x y z w v u"]
    srcs = {0: "a", 1: "b", 2: "b"}
    out = token_budget_plan(
        _docs(spark, texts, sources=srcs), budget_frac=0.6
    ).collect()
    got = {r["source"]: r for r in out}
    assert got["a"]["tokens"] == 4 and got["b"]["tokens"] == 8
    total, z = 12.0, math.sqrt(4) + math.sqrt(8)
    assert got["a"]["share"] == round(4 / total, 6)
    assert got["a"]["weight"] == round(math.sqrt(4) / z, 6)
    assert got["b"]["target_tokens"] == round(0.6 * total * math.sqrt(8) / z)
    assert got["a"]["epochs"] == round(0.6 * total * math.sqrt(4) / z / 4, 6)
    # sqrt-weighting upsamples the smaller source first
    assert got["a"]["epochs"] > got["b"]["epochs"]


def test_token_budget_plan_flags_upsampling(spark):
    # tiny source next to a huge one: temperature weighting pushes the
    # tiny source's epochs above 1
    texts = ["solo"] + ["many words in this document " * 20] * 10
    srcs = {0: "tiny", **{i: "big" for i in range(1, 11)}}
    out = token_budget_plan(
        _docs(spark, texts, sources=srcs), budget_frac=0.6
    ).collect()
    got = {r["source"]: r for r in out}
    assert got["tiny"]["upsampled"] == 1
    assert got["big"]["upsampled"] == 0
