"""Property tests for the round-3 late analysis-chain and chunking
surfaces: the S-stemmer's algebraic contracts and chunk_overlap's
coverage law, driven by hypothesis over adversarial inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from solr_ocr_processor_spark.operators.bm25f import _py_s_stem

WORD = st.from_regex(r"[a-z0-9]{1,12}", fullmatch=True)


@given(WORD)
@settings(max_examples=300, deadline=None)
def test_s_stem_idempotent(w):
    """Stemming a stemmed word changes nothing: every rule's output
    ends in y/e/non-s (or is exception-protected), so no rule fires
    twice."""
    once = _py_s_stem(w)
    assert _py_s_stem(once) == once


@given(WORD)
@settings(max_examples=300, deadline=None)
def test_s_stem_shrinks_by_at_most_two(w):
    """ies->y drops 2 chars, es/s->drop-s drops 1; nothing else moves.
    The stem is a prefix-preserving truncation (plus the ies->y swap):
    len in [len-2, len], and the first len-3 chars never change."""
    s = _py_s_stem(w)
    assert len(w) - 2 <= len(s) <= len(w)
    keep = max(0, len(w) - 3)
    assert s[:keep] == w[:keep]


@given(WORD)
@settings(max_examples=300, deadline=None)
def test_s_stem_exceptions_are_fixed_points(w):
    """Words ending in a rule's exception suffix pass through
    unchanged (no fall-through to a shorter-suffix rule)."""
    if len(w) > 2 and w.endswith(("eies", "aies", "aes", "ees", "oes", "us", "ss")):
        assert _py_s_stem(w) == w


@given(st.lists(WORD, min_size=1, max_size=60),
       st.integers(1, 12), st.integers(1, 12))
@settings(max_examples=120, deadline=None)
def test_chunk_layout_law(tokens, size, stride):
    """Pure-python replay of chunk_overlap's layout contract: starts
    are 0, stride, ... <= n-1; every token covered; chunk lengths
    min(size, n - start); overlap = size - stride when stride < size.

    (The Spark implementation is asserted equal to the DuckDB oracle
    by the driver and to hand layouts in test_round3h; this checks the
    LAW itself over the parameter space so those fixtures can't be
    accidentally consistent.)"""
    n = len(tokens)
    starts = list(range(0, n, stride))
    # the operator's spine: sequence(0, ((n-1)//stride)*stride, stride)
    assert starts == list(range(0, ((n - 1) // stride) * stride + 1, stride))
    covered = set()
    for s in starts:
        ln = min(size, n - s)
        assert 1 <= ln <= size
        covered.update(range(s, s + ln))
    if size >= stride:
        assert covered == set(range(n))  # no gaps when windows overlap/abut
    else:
        # stride > size legitimately leaves gaps — document the law
        assert {i for s in starts for i in range(s, min(s + size, n))} == covered


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_quality_classifier_weight_range(text):
    """The md5-derived integer weights stay inside [-1e6, 1e6] for any
    bucket id derivable from any text's tokens (the sigmoid input is
    then bounded by |bias|+1)."""
    import hashlib

    for tok in re.findall(r"[a-z0-9]+", text.lower())[:20]:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 4096
        w = int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:15], 16) % 2_000_001 - 1_000_000
        assert -1_000_000 <= w <= 1_000_000
