"""End-to-end ALTO / hOCR document ingestion and MiniOCR rendering.

The reference's core dataflow is a streaming XML transducer over real
OCR documents: sniff the format (app/handler/indexer.go:113-121),
update the page (dense ``Page.{position}`` id rewrite, measurement-unit
conversion with the extracted dpi, escape — app/process/alto.go:43-180,
app/process/hocr.go:186-260), convert the hierarchy
Page→TextBlock→TextLine→String into positioned words
(app/process/alto.go:275-385, app/process/hocr.go:47-183), and emit
the compact MiniOCR artifact (app/model/minocr.go:5-37). Round 3
covered every individual transform as an oracle-green column function
(functions/ocr_compat.py) but never composed them over an actual XML
corpus — these operators close that gap:

- :func:`synth_alto` / :func:`synth_hocr` — deterministic ALTO / hOCR
  *documents* (real XML strings) derived from the ``documents`` table:
  the first ``n_tokens`` words laid out as lines of 4 / blocks of 2
  lines with integer coordinate formulas, measurement unit cycling
  mm10 → inch1200 → pixel by doc_id, per-doc ``xdpi:`` settings on
  even ids (odd ids exercise the 300-dpi config fallback,
  app/assets/build/config.yml:44-51), an empty-CONTENT String at the
  end of every third line (the skip-empty quirk, alto.go:356), and a
  ``ComposedBlock`` wrapper around block 0 (transparent container,
  alto.go:314-316).
- :func:`parse_alto` / :func:`parse_hocr` — the ingest pass as PURE
  column expressions (regexp_extract_all over the XML, zero Python):
  sniff → unit + dpi extraction → per-word coordinate conversion to
  pixels (inch1200: integer (v·dpi)/1200; mm10: trunc(3.7795275591·v);
  alto.go:182-272) / hOCR corner→extent rewrite (hocr.go:148-168) →
  skip-then-number token positions (the B8 dense-ordinal semantics:
  empty words are dropped BEFORE numbering, indexer.go:98-148).
- :func:`ocr_e2e_topk` — the full composition: parsed positioned
  words → corpus stats → BM25 (k1=1.2, b=0.75) top-k with the FIRST
  query-term hit's pixel bbox per winner — the engine's analog of the
  reference's index-then-highlight flow (IIIF snippet coordinates,
  README.md:3-8).
- :func:`miniocr_render` — the ``convertToMiniOcr`` artifact:
  ``<ocr><p xml:id wh><b><l><w x="h v w h">word </w>…`` with the
  trailing-space (alto.go:358), skip-empty (alto.go:356) and
  full-index quote-swap (alto.go:376-379) quirks reproduced exactly.

Scale shape: everything is whole-stage-codegen string/regex work plus
one groupBy per nesting level with sorted-struct array folds — the
same per-doc map-side pattern as the tokenizer, no UDFs, no driver
state; at 10^12 docs the synth columns are replaced by the real XML
payload column and the parse/convert plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from solr_ocr_processor_spark.functions.ocr_compat import (
    extract_dpi,
    inch1200_to_px,
    mm10_to_px,
    sniff_format,
)

WORDS_PER_LINE = 4
LINES_PER_BLOCK = 2

#: query used by the e2e top-k legs (present in the sandbox vocabulary)
E2E_TERMS = ("table", "value")

# piece patterns shared by synth and parse (and replayed by the oracle)
_ALTO_WORD_RE = (
    r'<String CONTENT="([a-z0-9]*)" HPOS="(\d+)" VPOS="(\d+)"'
    r' WIDTH="(\d+)" HEIGHT="(\d+)"/>'
)
_HOCR_WORD_RE = (
    r"<span class='ocrx_word' title='bbox (\d+) (\d+) (\d+) (\d+)'>"
    r"([a-z0-9]*)</span>"
)
_HOCR_PAGE_RE = r"bbox 0 0 (\d+) (\d+)"  # app/process/hocr.go:16


def _word_grid(docs: DataFrame, n_docs: int, n_tokens: int) -> DataFrame:
    """(doc_id, i, line, block, term) — the deterministic word layout
    both synthesizers share: first ``n_tokens`` whitespace tokens of
    each of the first ``n_docs`` documents, 4 words per line, 2 lines
    per block. ``i`` is the 0-based word index; every coordinate
    formula keys off (i, line) so the relational oracle replays it
    with integer arithmetic alone."""
    toks = F.slice(F.split(F.col("text"), " "), 1, int(n_tokens))
    return (
        docs.where(F.col("doc_id") < F.lit(int(n_docs)))
        .select("doc_id", F.posexplode(toks).alias("i", "term"))
        .withColumn("line", F.floor(F.col("i") / WORDS_PER_LINE).cast("int"))
        .withColumn(
            "block",
            F.floor(F.col("i") / (WORDS_PER_LINE * LINES_PER_BLOCK)).cast("int"),
        )
    )


def _doc_meta(doc_id: Column) -> tuple[Column, Column, Column, Column]:
    """(unit, dpi, page_w_raw, page_h_raw) synth parameters per doc:
    unit cycles mm10/inch1200/pixel, even docs carry an explicit xdpi
    (150 or 250), odd docs rely on the 300 fallback."""
    unit = (
        F.when(doc_id % 3 == 0, F.lit("mm10"))
        .when(doc_id % 3 == 1, F.lit("inch1200"))
        .otherwise(F.lit("pixel"))
    )
    dpi = F.when(doc_id % 2 == 0, (doc_id % 4) * 50 + 150).otherwise(
        F.lit(300)
    ).cast("int")
    return unit, dpi, (4000 + doc_id * 3).cast("long"), (6000 + doc_id * 5).cast("long")


def _alto_coords(i: Column, line: Column) -> tuple[Column, ...]:
    """Raw-unit String coordinates for word index ``i``."""
    return (
        (100 + i * 17).cast("long"),
        (50 + line * 23).cast("long"),
        (40 + (i % 7) * 3).cast("long"),
        (20 + (i % 5) * 2).cast("long"),
    )


def _hocr_corners(i: Column, line: Column) -> tuple[Column, ...]:
    """hOCR bbox corners (x0, y0, x1, y1) for word index ``i`` — the
    parse must recover extents x1−x0 / y1−y0."""
    x0 = (90 + i * 13).cast("long")
    y0 = (40 + line * 19).cast("long")
    return x0, y0, x0 + 30 + (i % 6) * 4, y0 + 18 + (i % 4) * 3


def _fold_lines(words: DataFrame, piece: Column, empty_piece: str) -> DataFrame:
    """words → one row per (doc_id, block, line) with the line's pieces
    concatenated in word order; every third line (keyed by
    line + doc_id) gains a trailing empty-content piece so the parse
    side must exercise the skip-empty path."""
    lines = (
        words.withColumn("piece", piece)
        .groupBy("doc_id", "block", "line")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("body")
        )
    )
    return lines.withColumn(
        "body",
        F.when(
            (F.col("line") + F.col("doc_id")) % 3 == 0,
            F.concat(F.col("body"), F.lit(empty_piece)),
        ).otherwise(F.col("body")),
    )


def _fold_up(lines: DataFrame, line_fmt: str, block_fmt: str) -> DataFrame:
    """(doc_id, block, line, body) → (doc_id, body) with line and block
    wrappers applied — two ordered-struct folds, one per level."""
    blocks = (
        lines.withColumn("lx", F.format_string(line_fmt, F.col("body")))
        .groupBy("doc_id", "block")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line", "lx"))),
                    lambda s: s["lx"],
                ),
                "",
            ).alias("body")
        )
    )
    return (
        blocks.withColumn("bx", F.format_string(block_fmt, F.col("body")))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block", "bx"))),
                    lambda s: s["bx"],
                ),
                "",
            ).alias("body")
        )
    )


def synth_alto(docs: DataFrame, n_docs: int = 60, n_tokens: int = 24) -> DataFrame:
    """(doc_id, xml) — a real ALTO document per input doc. Block 0 is
    wrapped in the transparent ``ComposedBlock`` container; the
    Description carries the measurement unit and (for even docs) an
    ``xdpi:`` processing-step setting."""
    w = _word_grid(docs, n_docs, n_tokens)
    h, v, wd, ht = _alto_coords(F.col("i"), F.col("line"))
    piece = F.format_string(
        '<String CONTENT="%s" HPOS="%d" VPOS="%d" WIDTH="%d" HEIGHT="%d"/>',
        F.col("term"), h, v, wd, ht,
    )
    lines = _fold_lines(
        w,
        piece,
        '<String CONTENT="" HPOS="0" VPOS="0" WIDTH="0" HEIGHT="0"/>',
    )
    # ComposedBlock around block 0 only — the converter skips the
    # container but still walks its children (alto.go:314-316)
    blocks = (
        lines.withColumn(
            "lx", F.format_string("<TextLine>%s</TextLine>", F.col("body"))
        )
        .groupBy("doc_id", "block")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line", "lx"))),
                    lambda s: s["lx"],
                ),
                "",
            ).alias("body")
        )
        .withColumn(
            "bx",
            F.when(
                F.col("block") == 0,
                F.format_string(
                    "<ComposedBlock><TextBlock>%s</TextBlock></ComposedBlock>",
                    F.col("body"),
                ),
            ).otherwise(
                F.format_string("<TextBlock>%s</TextBlock>", F.col("body"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block", "bx"))),
                    lambda s: s["bx"],
                ),
                "",
            ).alias("body")
        )
    )
    unit, dpi, pw, ph = _doc_meta(F.col("doc_id"))
    settings = F.when(
        F.col("doc_id") % 2 == 0,
        F.format_string("deskew:0.5; xdpi:%d; ydpi:300", dpi),
    ).otherwise(F.lit("deskew:0.5"))
    xml = F.format_string(
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<alto><Description><MeasurementUnit>%s</MeasurementUnit>"
        "<OCRProcessing ID=\"OCR1\"><ocrProcessingStep>"
        "<processingStepSettings>%s</processingStepSettings>"
        "</ocrProcessingStep></OCRProcessing></Description>"
        '<Layout><Page ID="P0" WIDTH="%d" HEIGHT="%d"><PrintSpace>'
        "%s</PrintSpace></Page></Layout></alto>",
        unit, settings, pw, ph, F.col("body"),
    )
    return blocks.select("doc_id", xml.alias("xml"))


def synth_hocr(docs: DataFrame, n_docs: int = 60, n_tokens: int = 24) -> DataFrame:
    """(doc_id, xml) — an hOCR (XHTML) document per input doc, bbox
    corners in the title attributes, single-quoted attrs (both quote
    styles are legal hOCR; the reference's regexes are quote-agnostic,
    hocr.go:16-17)."""
    w = _word_grid(docs, n_docs, n_tokens)
    x0, y0, x1, y1 = _hocr_corners(F.col("i"), F.col("line"))
    piece = F.format_string(
        "<span class='ocrx_word' title='bbox %d %d %d %d'>%s</span>",
        x0, y0, x1, y1, F.col("term"),
    )
    lines = _fold_lines(
        w, piece, "<span class='ocrx_word' title='bbox 0 0 0 0'></span>"
    )
    folded = _fold_up(
        lines,
        "<span class='ocr_line' title='bbox 0 0 1 1'>%s</span>",
        "<div class='ocr_carea'>%s</div>",
    )
    pw = (3000 + F.col("doc_id") * 2).cast("long")
    ph = (4500 + F.col("doc_id") * 3).cast("long")
    xml = F.format_string(
        "<html><body><div class='ocr_page' id='page_%d' "
        "title='image x; bbox 0 0 %d %d'>%s</div></body></html>",
        F.col("doc_id"), pw, ph, F.col("body"),
    )
    return folded.select("doc_id", xml.alias("xml"))


def _extract_words(xmldf: DataFrame, pattern: str, n_groups: int) -> DataFrame:
    """Explode every word-piece regex match of ``pattern`` in document
    order: (doc_id, p, piece) with ``p`` the 0-based piece ordinal.
    One regexp_extract_all for the full pieces, then per-group
    extraction on the (short) piece strings — all codegen."""
    pieces = F.regexp_extract_all(F.col("xml"), F.lit(pattern), F.lit(0))
    return xmldf.select(
        "doc_id", "xml", F.posexplode(pieces).alias("p", "piece")
    )


def parse_alto(xmldf: DataFrame, fallback_dpi: int = 300) -> DataFrame:
    """The ALTO ingest pass over (doc_id, xml) rows: returns positioned
    pixel-space words
    ``(doc_id, page_id, page_w, page_h, token_pos, term, hpos, vpos,
    width, height)``.

    Semantics reproduced from the reference update+convert passes:
    format gate via the 1,200-char sniff; measurement unit from the
    Description; dpi from ``xdpi:(\\d+)`` with the config fallback;
    inch1200 = integer (v·dpi)/1200, mm10 = trunc(3.7795275591·v),
    pixel = identity, applied to Page dims AND String coords
    (alto.go:109-152,182-272); empty-CONTENT words dropped BEFORE
    token numbering (alto.go:356 + the B8 skip-then-number rule);
    page id rewritten to the dense ``Page.{position}`` — one page per
    doc here, so position 0 (alto.go:109-129)."""
    base = xmldf.where(sniff_format(F.col("xml")) == "alto")
    words = _extract_words(base, _ALTO_WORD_RE, 5)
    g = lambda n: F.regexp_extract(F.col("piece"), _ALTO_WORD_RE, n)  # noqa: E731
    unit = F.regexp_extract(
        F.col("xml"), r"<MeasurementUnit>([^<]*)</MeasurementUnit>", 1
    )
    dpi = extract_dpi(
        F.regexp_extract(
            F.col("xml"),
            r"<processingStepSettings>([^<]*)</processingStepSettings>",
            1,
        ),
        fallback=fallback_dpi,
    )

    def px(col: Column) -> Column:
        return (
            F.when(F.col("unit") == "inch1200", inch1200_to_px(col, F.col("dpi")))
            .when(F.col("unit") == "mm10", mm10_to_px(col))
            .otherwise(col.cast("long"))
        )

    parsed = (
        words.withColumn("unit", unit)
        .withColumn("dpi", dpi)
        .withColumn("term", g(1))
        .withColumn("h_raw", g(2).cast("long"))
        .withColumn("v_raw", g(3).cast("long"))
        .withColumn("w_raw", g(4).cast("long"))
        .withColumn("ht_raw", g(5).cast("long"))
        .withColumn(
            "pw_raw",
            F.regexp_extract(F.col("xml"), r'<Page ID="[^"]*" WIDTH="(\d+)"', 1).cast(
                "long"
            ),
        )
        .withColumn(
            "ph_raw",
            F.regexp_extract(F.col("xml"), r'HEIGHT="(\d+)"><PrintSpace>', 1).cast(
                "long"
            ),
        )
        .where(F.col("term") != "")
        .withColumn(
            "token_pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("p")
            )
            - 1,
        )
    )
    return parsed.select(
        "doc_id",
        F.lit("Page.0").alias("page_id"),
        px(F.col("pw_raw")).alias("page_w"),
        px(F.col("ph_raw")).alias("page_h"),
        "token_pos",
        "term",
        px(F.col("h_raw")).alias("hpos"),
        px(F.col("v_raw")).alias("vpos"),
        px(F.col("w_raw")).alias("width"),
        px(F.col("ht_raw")).alias("height"),
    )


def parse_hocr(xmldf: DataFrame) -> DataFrame:
    """The hOCR ingest pass — same output shape as :func:`parse_alto`.
    hOCR coordinates are already pixels; word bboxes are CORNERS and
    become extents (hpos=x0, vpos=y0, width=x1−x0, height=y1−y0,
    hocr.go:148-168); page dims come from the reference's page regex
    ``bbox 0 0 (w) (h)`` (hocr.go:16)."""
    base = xmldf.where(sniff_format(F.col("xml")) == "hocr")
    words = _extract_words(base, _HOCR_WORD_RE, 5)
    g = lambda n: F.regexp_extract(F.col("piece"), _HOCR_WORD_RE, n)  # noqa: E731
    parsed = (
        words.withColumn("term", g(5))
        .withColumn("x0", g(1).cast("long"))
        .withColumn("y0", g(2).cast("long"))
        .withColumn("x1", g(3).cast("long"))
        .withColumn("y1", g(4).cast("long"))
        .withColumn(
            "page_w",
            F.regexp_extract(F.col("xml"), _HOCR_PAGE_RE, 1).cast("long"),
        )
        .withColumn(
            "page_h",
            F.regexp_extract(F.col("xml"), _HOCR_PAGE_RE, 2).cast("long"),
        )
        .where(F.col("term") != "")
        .withColumn(
            "token_pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("p")) - 1,
        )
    )
    return parsed.select(
        "doc_id",
        F.lit("Page.0").alias("page_id"),
        "page_w",
        "page_h",
        "token_pos",
        "term",
        F.col("x0").alias("hpos"),
        F.col("y0").alias("vpos"),
        (F.col("x1") - F.col("x0")).alias("width"),
        (F.col("y1") - F.col("y0")).alias("height"),
    )


def ocr_e2e_topk(
    words: DataFrame, terms: tuple[str, ...] = E2E_TERMS, k: int = 10
) -> DataFrame:
    """Index-and-query over a parsed positioned-word corpus: BM25
    (k1=1.2, b=0.75, Lucene idf) top-``k`` for ``terms``, each winner
    decorated with its FIRST query-term hit's pixel bbox — the
    highlight-coordinate flow the reference delegates to
    solr-ocrhighlighting (README.md:3-8), here one declarative plan
    over the parse output.

    Returns (doc_id, page_id, page_w, page_h, dl, score, hit_pos,
    hit_term, hpos, vpos, width, height) ordered score DESC, doc_id
    ASC; score rounded 6dp."""
    dl = words.groupBy("doc_id", "page_id", "page_w", "page_h").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = words.where(F.col("term").isin(*terms))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            ).alias("raw")
        )
    )
    first = (
        hits.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    "token_pos", "term", "hpos", "vpos", "width", "height"
                )
            ).alias("h")
        )
        .select(
            "doc_id",
            F.col("h.token_pos").alias("hit_pos"),
            F.col("h.term").alias("hit_term"),
            F.col("h.hpos").alias("hpos"),
            F.col("h.vpos").alias("vpos"),
            F.col("h.width").alias("width"),
            F.col("h.height").alias("height"),
        )
    )
    return (
        scored.join(dl, "doc_id")
        .join(first, "doc_id")
        .orderBy(F.desc("raw"), F.asc("doc_id"))
        .limit(int(k))
        .select(
            "doc_id",
            "page_id",
            "page_w",
            "page_h",
            "dl",
            F.round("raw", 6).alias("score"),
            "hit_pos",
            "hit_term",
            "hpos",
            "vpos",
            "width",
            "height",
        )
    )


def alto_e2e_topk(
    docs: DataFrame,
    n_docs: int = 60,
    n_tokens: int = 24,
    terms: tuple[str, ...] = E2E_TERMS,
    k: int = 10,
) -> DataFrame:
    """synth → sniff → parse → convert → index → BM25+highlight, ALTO."""
    return ocr_e2e_topk(parse_alto(synth_alto(docs, n_docs, n_tokens)), terms, k)


def hocr_e2e_topk(
    docs: DataFrame,
    n_docs: int = 60,
    n_tokens: int = 24,
    terms: tuple[str, ...] = E2E_TERMS,
    k: int = 10,
) -> DataFrame:
    """synth → sniff → parse → corner rewrite → index → BM25+highlight."""
    return ocr_e2e_topk(parse_hocr(synth_hocr(docs, n_docs, n_tokens)), terms, k)


def synth_alto_files(
    docs: DataFrame,
    n_docs: int = 20,
    tokens_per_page: int = 8,
    n_slots: int = 6,
) -> DataFrame:
    """(doc_id, slot, xml) — the reference's MULTI-FILE item shape:
    one item (doc) has an ORDERED list of OCR files (slots), each file
    one page (app/handler/indexer.go:81-148). Deterministic structure:

    - slot ``s`` of doc ``d`` is DESIGNATED EMPTY when
      ``(s + d) % 3 == 1`` — the empty-body files the reference skips
      without incrementing its position counter (indexer.go:98-148);
    - the remaining slots consume the doc's tokens in slot order,
      ``tokens_per_page`` per file (2 lines of 4); a designated slot
      whose chunk is exhausted (short doc) also yields an empty body —
      so which files are "processed" is a CONTENT property the parse
      side must discover, exactly as in the reference;
    - every file carries the doc's measurement unit + xdpi header
      (one processor configuration per item)."""
    toks = F.slice(F.split(F.col("text"), " "), 1, 10_000)
    base = (
        docs.where(F.col("doc_id") < F.lit(int(n_docs)))
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_slots) - 1))).alias("slot"),
        )
        .withColumn("designated", (F.col("slot") + F.col("doc_id")) % 3 != 1)
    )
    k = (
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("slot")
        )
        - 1
    )
    des = base.where(F.col("designated")).withColumn("k", k)
    chunk = F.slice(
        F.col("toks"),
        F.col("k") * tokens_per_page + 1,
        int(tokens_per_page),
    )
    des = des.withColumn("chunk", chunk)
    words = des.select(
        "doc_id", "slot", F.posexplode("chunk").alias("i", "term")
    ).withColumn("line", F.floor(F.col("i") / WORDS_PER_LINE).cast("int"))
    h, v, wd, ht = _alto_coords(F.col("i"), F.col("line"))
    piece = F.format_string(
        '<String CONTENT="%s" HPOS="%d" VPOS="%d" WIDTH="%d" HEIGHT="%d"/>',
        F.col("term"), h, v, wd, ht,
    )
    lines = (
        words.withColumn("piece", piece)
        .groupBy("doc_id", "slot", "line")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("body")
        )
        .withColumn("lx", F.format_string("<TextLine>%s</TextLine>", F.col("body")))
        .groupBy("doc_id", "slot")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line", "lx"))),
                    lambda s: s["lx"],
                ),
                "",
            ).alias("body")
        )
    )
    unit, dpi, pw, ph = _doc_meta(F.col("doc_id"))
    settings = F.when(
        F.col("doc_id") % 2 == 0,
        F.format_string("deskew:0.5; xdpi:%d; ydpi:300", dpi),
    ).otherwise(F.lit("deskew:0.5"))
    xml = F.format_string(
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<alto><Description><MeasurementUnit>%s</MeasurementUnit>"
        "<OCRProcessing ID=\"OCR1\"><ocrProcessingStep>"
        "<processingStepSettings>%s</processingStepSettings>"
        "</ocrProcessingStep></OCRProcessing></Description>"
        '<Layout><Page ID="P0" WIDTH="%d" HEIGHT="%d"><PrintSpace>'
        "%s</PrintSpace></Page></Layout></alto>",
        unit, settings, pw, ph, F.col("body"),
    )
    # non-designated slots AND designated-but-exhausted slots emit the
    # empty body the reference's skip path sees
    return (
        base.select("doc_id", "slot")
        .distinct()
        .join(lines, ["doc_id", "slot"], "left")
        .withColumn(
            "xml", F.when(F.col("body").isNotNull(), xml).otherwise(F.lit(""))
        )
        .select("doc_id", "slot", "xml")
    )


def alto_multipage_e2e(
    docs: DataFrame,
    n_docs: int = 20,
    tokens_per_page: int = 8,
    n_slots: int = 6,
) -> DataFrame:
    """The reference's WHOLE per-item loop over an ordered multi-file
    item (app/handler/indexer.go:100-148): skip empty file bodies
    WITHOUT incrementing the position counter, sniff + parse the
    processed files, rewrite each page id to the dense
    ``Page.{position}`` ordinal, convert coordinates per the item's
    unit/dpi header. Returns one row per PROCESSED file:

    (doc_id, slot, page_id, n_page_tokens, first_term, first_hpos)

    — page_id is the dense ordinal (``Page.0``, ``Page.1``, … with no
    gaps even though the slot list has holes), first_hpos is the first
    word's pixel HPOS after unit conversion. Ordered doc_id, slot."""
    files = synth_alto_files(docs, n_docs, tokens_per_page, n_slots)
    processed = files.where(F.length(F.col("xml")) > 0)
    ordinal = (
        F.row_number().over(Window.partitionBy("doc_id").orderBy("slot")) - 1
    )
    p = processed.withColumn("ordinal", ordinal)
    unit = F.regexp_extract(
        F.col("xml"), r"<MeasurementUnit>([^<]*)</MeasurementUnit>", 1
    )
    dpi = extract_dpi(
        F.regexp_extract(
            F.col("xml"),
            r"<processingStepSettings>([^<]*)</processingStepSettings>",
            1,
        )
    )
    first_h = F.regexp_extract(F.col("xml"), r'HPOS="(\d+)"', 1).cast("long")
    n_words = F.size(
        F.regexp_extract_all(F.col("xml"), F.lit(_ALTO_WORD_RE), F.lit(0))
    )
    first_term = F.regexp_extract(
        F.col("xml"), r'<String CONTENT="([a-z0-9]+)"', 1
    )
    px = (
        F.when(unit == "inch1200", inch1200_to_px(first_h, dpi))
        .when(unit == "mm10", mm10_to_px(first_h))
        .otherwise(first_h)
    )
    return (
        p.where(sniff_format(F.col("xml")) == "alto")
        .select(
            "doc_id",
            "slot",
            F.format_string("Page.%d", F.col("ordinal")).alias("page_id"),
            n_words.cast("long").alias("n_page_tokens"),
            first_term.alias("first_term"),
            px.alias("first_hpos"),
        )
        .orderBy("doc_id", "slot")
    )


def miniocr_render(
    docs: DataFrame,
    n_docs: int = 40,
    n_tokens: int = 24,
    index_type: str = "full",
) -> DataFrame:
    """Emit the MiniOCR artifact per document — the output side of
    ``convertToMiniOcr`` (alto.go:275-385) over an already-positioned
    word table, reproducing Go's ``xml.Marshal`` of the OcrEl tree
    (app/model/minocr.go:5-37) quirk-for-quirk:

    - word content carries a TRAILING SPACE (``content + " "``,
      alto.go:358);
    - empty-content words are SKIPPED entirely (alto.go:356) — the
      word grid injects one per third line to prove it;
    - page id is the dense ``Page.{position}`` (one page per doc →
      ``Page.0``) and ``wh`` is ``"width height"`` (alto.go:306-310);
    - ``index_type="full"`` swaps every double quote for a single
      quote across the whole artifact AFTER marshalling
      (alto.go:376-379) so it posts cleanly inside a JSON body;
      ``"lazy"`` keeps double quotes.

    Returns (doc_id, miniocr). Plan: three ordered-struct folds
    (line → block → page), map-side after one word-grid shuffle."""
    w = _word_grid(docs, n_docs, n_tokens)
    h, v, wd, ht = _alto_coords(F.col("i"), F.col("line"))
    # inject the empty word the same way the synths do, then let the
    # render DROP it — the alto.go:356 skip path, exercised for real
    empties = (
        w.groupBy("doc_id", "block", "line")
        .agg(F.max("i").alias("i"))
        .where((F.col("line") + F.col("doc_id")) % 3 == 0)
        .select(
            "doc_id",
            "block",
            "line",
            (F.col("i") + F.lit(0)).alias("i"),
            F.lit("").alias("term"),
            F.lit(True).alias("is_empty"),
        )
    )
    full = w.withColumn("is_empty", F.lit(False)).unionByName(empties)
    kept = full.where(F.col("term") != "")  # alto.go:356
    word_xml = F.format_string(
        '<w x="%d %d %d %d">%s </w>', h, v, wd, ht, F.col("term")
    )
    lines = (
        kept.withColumn("piece", word_xml)
        .groupBy("doc_id", "block", "line")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "piece"))),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("body")
        )
    )
    pages = _fold_up(lines, "<l>%s</l>", "<b>%s</b>")
    pw = (2480 + F.col("doc_id")).cast("long")
    ph = (3508 + F.col("doc_id")).cast("long")
    out = F.format_string(
        '<ocr><p xml:id="Page.0" wh="%d %d">%s</p></ocr>', pw, ph, F.col("body")
    )
    if index_type == "full":
        out = F.translate(out, '"', "'")
    return pages.select("doc_id", out.alias("miniocr"))
