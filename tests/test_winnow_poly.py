"""Round-4 winnowing production hash path (hasher="poly"): integer
Rabin-Karp gram polynomial in a vectorized Arrow kernel — no md5, no
localCheckpoint fence; same selection semantics."""

from __future__ import annotations

import pytest

from solr_ocr_processor_spark.operators.dedup import (
    WINNOW_POLY_MOD,
    winnow_fingerprints,
    winnow_pairs,
    winnow_poly_powers,
)


def _docs(spark, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _ref_poly(text, k=8, w=4):
    s = text.lower()
    if len(s) < k + w - 1:
        return set()
    pows = winnow_poly_powers(k)
    hs = [
        sum(ord(s[i + j]) * pows[j] for j in range(k)) % WINNOW_POLY_MOD
        for i in range(len(s) - k + 1)
    ]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_poly_matches_reference_impl(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "unicode check: héllo wörld exposition étude",
    ]
    out = winnow_fingerprints(_docs(spark, texts), hasher="poly").collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == _ref_poly(t), i


def test_poly_shared_substring_guarantee(spark):
    """The winnowing theorem is hash-family independent: any shared
    substring of length >= k + w - 1 yields a shared fingerprint
    under the polynomial hash too."""
    core = "distinctive shared span xyz"
    texts = [
        f"aaaa {core} bbbb",
        f"completely different prefix material {core}",
        "no overlap at all in this one, nothing shared here",
    ]
    out = winnow_fingerprints(_docs(spark, texts), hasher="poly").collect()
    sets = {}
    for r in out:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[1] & sets[2])


def test_poly_pairs_agree_with_md5_pairs(spark):
    """Different hash families select (slightly) different fingerprint
    sets, but on clear near-dups the PAIR decisions coincide."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [a, a + " extra tail", "totally different content entirely here"]
    md5_pairs = {
        (r["doc1"], r["doc2"])
        for r in winnow_pairs(_docs(spark, texts), hasher="md5").collect()
    }
    poly_pairs = {
        (r["doc1"], r["doc2"])
        for r in winnow_pairs(_docs(spark, texts), hasher="poly").collect()
    }
    assert (0, 1) in md5_pairs and (0, 1) in poly_pairs
    assert md5_pairs == poly_pairs


def test_poly_deterministic_under_repartition(spark):
    texts = [f"document number {i} with some repeated filler text body" for i in range(20)]
    d = _docs(spark, texts)
    a = sorted(
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(d, hasher="poly").collect()
    )
    b = sorted(
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(d.repartition(7), hasher="poly").collect()
    )
    assert a == b and a


def test_unknown_hasher_rejected(spark):
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, ["some text long enough"]), hasher="sha")
