"""span_trim (exact substring dedup, remove step): hand-computed
expectations on a mini corpus — duplicated >= k-token spans vanish
from every doc, unique text survives verbatim, short docs untouched."""

from __future__ import annotations

import pytest

from solr_ocr_processor_spark.operators.dedup import span_trim

BOILER = "all rights reserved this page is served by the example engine"  # 11 toks
DOCS = [
    (0, f"alpha beta gamma {BOILER} delta epsilon"),
    (1, f"one two three four five {BOILER}"),
    (2, "totally unique text with no repeated spans at all here now"),
    (3, "tiny doc"),  # < k tokens: never trimmed
    (4, ""),  # empty
]


@pytest.fixture(scope="module")
def trimmed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r.doc_id: r for r in span_trim(docs, k=8).collect()}


def test_every_doc_reported(trimmed):
    assert sorted(trimmed) == [0, 1, 2, 3, 4]


def test_duplicated_span_removed_from_all_docs(trimmed):
    # the k=8 windows of BOILER occur in docs 0 and 1 -> every BOILER
    # token is covered in both docs; surrounding unique text survives
    assert trimmed[0].kept_text == "alpha beta gamma delta epsilon"
    assert trimmed[1].kept_text == "one two three four five"
    assert trimmed[0].n_removed == 11
    assert trimmed[1].n_removed == 11


def test_unique_and_short_docs_untouched(trimmed):
    assert trimmed[2].n_removed == 0
    assert trimmed[2].kept_text == DOCS[2][1]
    assert trimmed[3].n_removed == 0
    assert trimmed[3].kept_text == "tiny doc"
    assert trimmed[4] .n_tokens == 0
    assert trimmed[4].kept_text == ""


def test_token_accounting(trimmed):
    for r in trimmed.values():
        n_kept = len(r.kept_text.split()) if r.kept_text else 0
        assert r.n_tokens - r.n_removed == n_kept


def test_within_doc_repeat_alone_is_not_trimmed(spark):
    # a span repeated INSIDE one doc but in no other doc stays: the
    # dup test is cross-document support (>= 2 distinct docs)
    rep = "spark shuffle join scan filter agg sort limit"
    docs = spark.createDataFrame(
        [(0, f"{rep} middle words {rep}"), (1, "other text entirely")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_trim(docs, k=8).collect()}
    assert out[0].n_removed == 0
