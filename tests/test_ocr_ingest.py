"""End-to-end ALTO/hOCR ingestion + MiniOCR render hand-checks
(operators/ocr_ingest — SURVEY Missing #1/#2 closure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_ocr_processor_spark.functions.ocr_compat import sniff_format
from solr_ocr_processor_spark.operators.ocr_ingest import (
    alto_e2e_topk,
    hocr_e2e_topk,
    miniocr_render,
    parse_alto,
    parse_hocr,
    synth_alto,
    synth_hocr,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_synth_formats_sniff_correctly(spark):
    docs = _docs(spark, [(0, "alpha beta gamma delta epsilon")])
    a = synth_alto(docs, n_docs=1, n_tokens=5)
    h = synth_hocr(docs, n_docs=1, n_tokens=5)
    assert a.select(sniff_format(F.col("xml")).alias("f")).first()["f"] == "alto"
    assert h.select(sniff_format(F.col("xml")).alias("f")).first()["f"] == "hocr"


def test_parse_alto_unit_conversion_per_doc(spark):
    # doc 0: mm10 (trunc 3.7795275591*v); doc 1: inch1200 with NO xdpi
    # -> 300 fallback -> px = (v*300)/1200 = v/4; doc 2: pixel identity
    docs = _docs(spark, [(0, "a b"), (1, "c d"), (2, "e f")])
    out = {
        (r["doc_id"], r["token_pos"]): r
    for r in parse_alto(synth_alto(docs, n_docs=3, n_tokens=2)).collect()}
    # word 0 raw coords: h=100, v=50, w=40, ht=20
    r0 = out[(0, 0)]
    assert (r0["hpos"], r0["vpos"], r0["width"], r0["height"]) == (
        int(3.7795275591 * 100), int(3.7795275591 * 50),
        int(3.7795275591 * 40), int(3.7795275591 * 20),
    )
    r1 = out[(1, 0)]
    assert (r1["hpos"], r1["vpos"], r1["width"], r1["height"]) == (
        100 * 300 // 1200, 50 * 300 // 1200, 40 * 300 // 1200, 20 * 300 // 1200
    )
    r2 = out[(2, 0)]
    assert (r2["hpos"], r2["vpos"], r2["width"], r2["height"]) == (100, 50, 40, 20)
    # page dims follow the same conversion (alto.go:113-124)
    assert r1["page_w"] == (4000 + 3) * 300 // 1200
    assert r2["page_w"] == 4000 + 2 * 3


def test_parse_alto_xdpi_extraction(spark):
    # doc 2 is even -> settings carry xdpi:250 ((2%4)*50+150) and the
    # unit is 'pixel' so dpi must NOT affect coords; doc 4 is even with
    # xdpi:150 and unit mm10 — dpi ignored for mm10 too. inch1200 docs
    # are the odd ones (doc_id%3==1): doc 1 odd -> no xdpi -> 300.
    # doc 4: even AND doc_id%3==1 would be dpi-bearing inch1200 — use
    # doc 10 (10%3==1, 10%2==0 -> xdpi = (10%4)*50+150 = 250).
    docs = _docs(spark, [(i, "w x y z") for i in range(11)])
    out = parse_alto(synth_alto(docs, n_docs=11, n_tokens=4))
    r = out.where("doc_id = 10 and token_pos = 0").first()
    assert r["hpos"] == 100 * 250 // 1200
    assert r["page_w"] == (4000 + 30) * 250 // 1200


def test_parse_skips_empty_content_before_numbering(spark):
    # doc 0 line 0 gains an empty String ((line+doc_id)%3==0); token
    # positions must stay dense over REAL words only (B8 semantics)
    docs = _docs(spark, [(0, "a b c d e f g h")])
    rows = parse_alto(synth_alto(docs, n_docs=1, n_tokens=8)).collect()
    assert [r["token_pos"] for r in sorted(rows, key=lambda r: r["token_pos"])] == list(
        range(8)
    )
    assert all(r["term"] != "" for r in rows)
    # and the raw XML really does contain the empty piece
    xml = synth_alto(docs, n_docs=1, n_tokens=8).first()["xml"]
    assert '<String CONTENT="" HPOS="0"' in xml
    assert "<ComposedBlock>" in xml  # container present, words parsed


def test_parse_hocr_corner_to_extent(spark):
    docs = _docs(spark, [(0, "a b c d e")])
    rows = {r["token_pos"]: r for r in parse_hocr(synth_hocr(docs, 1, 5)).collect()}
    # word i: x0=90+13i, y0=40+19*line, x1-x0 = 30+(i%6)*4, y1-y0 = 18+(i%4)*3
    r3 = rows[3]
    assert (r3["hpos"], r3["vpos"], r3["width"], r3["height"]) == (
        90 + 39, 40, 30 + 12, 18 + 9
    )
    assert (r3["page_w"], r3["page_h"]) == (3000, 4500)


def test_e2e_topk_scores_and_first_hit(spark):
    # doc 0 has 'table' twice, doc 1 once, doc 2 none -> doc 0 ranks
    # first and its hit is the FIRST occurrence (pos 1)
    docs = _docs(
        spark,
        [(0, "a table table b"), (1, "c d table e"), (2, "f g h i")],
    )
    out = alto_e2e_topk(docs, n_docs=3, n_tokens=4, terms=("table",)).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    assert out[0]["hit_pos"] == 1 and out[0]["hit_term"] == "table"
    assert out[0]["score"] > out[1]["score"]
    h = hocr_e2e_topk(docs, n_docs=3, n_tokens=4, terms=("table",)).collect()
    assert [r["doc_id"] for r in h] == [0, 1]
    assert h[0]["hit_pos"] == 1


def test_miniocr_render_exact_artifact(spark):
    docs = _docs(spark, [(1, "alpha beta")])
    out = miniocr_render(docs, n_docs=2, n_tokens=2).first()
    # doc 1: no empty injection on line 0 ((0+1)%3 != 0); full mode
    # swaps ALL double quotes for single quotes (alto.go:376-379);
    # trailing space after each word (alto.go:358)
    assert out["miniocr"] == (
        "<ocr><p xml:id='Page.0' wh='2481 3509'>"
        "<b><l>"
        "<w x='100 50 40 20'>alpha </w>"
        "<w x='117 50 43 22'>beta </w>"
        "</l></b></p></ocr>"
    )


def test_miniocr_lazy_keeps_double_quotes(spark):
    docs = _docs(spark, [(1, "alpha")])
    out = miniocr_render(docs, n_docs=2, n_tokens=1, index_type="lazy").first()
    assert out["miniocr"].startswith('<ocr><p xml:id="Page.0" wh="2481 3509">')


def test_multipage_dense_ordinals_skip_then_number(spark):
    """The indexer.go:98-148 invariant: empty file bodies (designated
    holes AND exhausted chunks) are skipped WITHOUT incrementing the
    page position — ordinals stay dense across slot gaps."""
    from solr_ocr_processor_spark.operators.ocr_ingest import alto_multipage_e2e

    # doc 0: 23 tokens -> chunks of 8,8,7; designated-empty slots are
    # s%3==1 (1, 4); slot 5 is designated but exhausted
    docs = _docs(spark, [(0, " ".join(f"w{i}" for i in range(23)))])
    out = alto_multipage_e2e(docs, n_docs=1).collect()
    assert [(r["slot"], r["page_id"], r["n_page_tokens"]) for r in out] == [
        (0, "Page.0", 8), (2, "Page.1", 8), (3, "Page.2", 7)
    ]
    assert out[0]["first_term"] == "w0"
    assert out[1]["first_term"] == "w8"
    # doc 0 unit mm10: first word raw HPOS 100 -> floor(377.95) px
    assert out[0]["first_hpos"] == 377


def test_multipage_unit_conversion_per_item(spark):
    from solr_ocr_processor_spark.operators.ocr_ingest import alto_multipage_e2e

    docs = _docs(
        spark,
        [(1, " ".join(f"a{i}" for i in range(10))),
         (2, " ".join(f"b{i}" for i in range(10)))],
    )
    out = {r["doc_id"]: r for r in alto_multipage_e2e(docs, n_docs=3).collect()
           if r["page_id"] == "Page.0"}
    # doc 1: inch1200, odd -> 300 dpi fallback -> 100*300//1200 = 25
    assert out[1]["first_hpos"] == 25
    # doc 2: pixel identity
    assert out[2]["first_hpos"] == 100


def test_miniocr_render_skips_injected_empty(spark):
    # doc 0 line 0 gets an injected empty word; the artifact must not
    # contain an empty <w> element
    docs = _docs(spark, [(0, "alpha beta gamma delta")])
    out = miniocr_render(docs, n_docs=1, n_tokens=4).first()["miniocr"]
    assert "> </w>" not in out  # no empty-content word rendered
    assert out.count("<w ") == 4
