"""Reference-parity document-transform functions (SURVEY §2.3-B9,
§2.4-T2/T3/T8) as pure column expressions.

These reproduce, bit-for-bit, the small deterministic transforms the
reference applies to every OCR page, re-expressed over columns so a
100 TB table of payloads gets them in whole-stage codegen:

- :func:`sniff_format`      — the 1,200-char prefix format sniff
  (app/handler/indexer.go:114-119) against the reference's matcher
  substring tables with its ALTO > hOCR > MiniOCR priority
  (app/process/formats.go:7-10,34-52).
- :func:`inch1200_to_px`    — inch1200 units: truncate any decimal
  part, then INTEGER (v*dpi)/1200 (app/process/alto.go:186-225).
- :func:`mm10_to_px`        — mm10 units: trunc(3.7795275591 * v)
  (app/process/alto.go:228-272; truncation, not rounding).
- :func:`xml_codepoint_escape` — runes > 127 become ``&#N;`` decimal
  character references (app/process/encoding.go:10-32). The
  reference drops invalid runes; over typed string columns invalid
  sequences can't occur, so that branch has no analog.
- :func:`extract_dpi`        — per-row dpi from ``xdpi:(\\d+)`` inside
  processingStepSettings content, falling back to the configured
  input_image_resolution (app/process/alto.go:56,93-100; default 300,
  app/assets/build/config.yml:44-51). Feeds :func:`inch1200_to_px`.
- :func:`hocr_bbox_to_pos`   — the hOCR word-bbox transform: parse
  ``bbox x0 y0 x1 y1`` from the title attribute and emit
  (hpos=x0, vpos=y0, width=x1-x0, height=y1-y0)
  (app/process/hocr.go:16-17,148-168).
- :func:`fix_response`       — full-index response fixup: strip
  newlines and swap double quotes for single quotes
  (app/process/utils.go:32-39; the ALTO converter applies the same
  quote swap at app/process/alto.go:376-379).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# matcher tables, verbatim behavior of app/process/formats.go:7-10
ALTO_MATCHERS = ("<alto", ":alto", "<Description>", "<Layout>", "<Page")
HOCR_MATCHERS = (
    "ocr_document", "ocr_page", "ocr_carea", "ocrx_block", "ocr_chapter",
    "ocr_section", "ocr_subsection", "ocr_par", "ocr_line", "ocrx_line",
    "ocrx_word",
)
MINIOCR_MATCHERS = ("<ocr>",)

SNIFF_CHARS = 1200  # app/handler/indexer.go:114-119


def _contains_any(col: Column, needles: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | F.contains(col, F.lit(n))
    return out


def sniff_format(text: Column) -> Column:
    """'alto' | 'hocr' | 'minocr' | 'unknown' from the first 1,200
    chars, with the reference's match priority."""
    chunk = F.substring(text, 1, SNIFF_CHARS)
    return (
        F.when(_contains_any(chunk, ALTO_MATCHERS), F.lit("alto"))
        .when(_contains_any(chunk, HOCR_MATCHERS), F.lit("hocr"))
        .when(_contains_any(chunk, MINIOCR_MATCHERS), F.lit("minocr"))
        .otherwise(F.lit("unknown"))
    )


def inch1200_to_px(value: Column, dpi: Column | int) -> Column:
    """inch1200 -> px: Go semantics are Atoi(pre-'.' part) then
    integer (v*dpi)/1200 — i.e. truncate toward zero twice."""
    dpi_col = F.lit(dpi) if isinstance(dpi, int) else dpi
    v = value.cast("long")
    prod = v * dpi_col.cast("long")
    # Go integer division truncates toward zero; Spark's `div` on
    # positives matches, negatives need explicit sign handling
    return (
        F.when(prod >= 0, F.floor(prod / 1200))
        .otherwise(-F.floor(-prod / 1200))
        .cast("long")
    )


MM10_FACTOR = 3.7795275591  # app/process/alto.go:257-263


def mm10_to_px(value: Column) -> Column:
    """mm10 -> px: int(3.7795275591 * v) — float multiply then
    truncation toward zero (Go int() conversion)."""
    prod = value.cast("long") * F.lit(MM10_FACTOR)
    return (
        F.when(prod >= 0, F.floor(prod)).otherwise(-F.floor(-prod)).cast("long")
    )


DEFAULT_DPI = 300  # input_image_resolution, app/assets/build/config.yml:44-51


def extract_dpi(settings: Column, fallback: int = DEFAULT_DPI) -> Column:
    """dpi per row: first ``xdpi:(\\d+)`` match in the settings text,
    else ``fallback`` — the reference reads this from the ALTO
    processingStepSettings element and keeps a config default
    (app/process/alto.go:56,93-100)."""
    return (
        F.coalesce(
            F.nullif(F.regexp_extract(settings, r"xdpi:(\d+)", 1), F.lit("")),
            F.lit(str(fallback)),
        )
        .cast("int")
    )


HOCR_WORD_BBOX = r"bbox (\d+) (\d+) (\d+) (\d+)"  # app/process/hocr.go:17


def hocr_bbox_to_pos(title: Column) -> Column:
    """struct(hpos, vpos, width, height) from an hOCR title attribute.

    The reference regexes ``bbox x0 y0 x1 y1`` out of every ocrx_word
    title and rewrites corners to extents: hpos=x0, vpos=y0,
    width=x1-x0, height=y1-y0 (app/process/hocr.go:148-168). Rows
    without a bbox yield a null struct (the reference emits empty
    strings into its dims payload; a typed column makes that null)."""
    x0 = F.regexp_extract(title, HOCR_WORD_BBOX, 1)
    y0 = F.regexp_extract(title, HOCR_WORD_BBOX, 2)
    x1 = F.regexp_extract(title, HOCR_WORD_BBOX, 3)
    y1 = F.regexp_extract(title, HOCR_WORD_BBOX, 4)
    parsed = F.struct(
        x0.cast("long").alias("hpos"),
        y0.cast("long").alias("vpos"),
        (x1.cast("long") - x0.cast("long")).alias("width"),
        (y1.cast("long") - y0.cast("long")).alias("height"),
    )
    return F.when(x0 != "", parsed)


def fix_response(text: Column) -> Column:
    """Full-index response fixup: drop every newline, then swap double
    quotes for single quotes (single-quoted XML posts cleanly to the
    downstream store — app/process/utils.go:32-39)."""
    return F.regexp_replace(F.regexp_replace(text, "\n", ""), '"', "'")


def xml_codepoint_escape(text: Column) -> Column:
    """UTF-8 -> XML decimal character references for codepoints > 127,
    as a fold over the string's characters (pure built-ins: split to
    chars, transform, concat). Pure-ASCII rows — the overwhelming
    majority in an escape-at-build pass — short-circuit on one rlike
    and never pay the per-char array allocation."""
    chars = F.split(text, "")
    escaped = F.array_join(
        F.transform(
            chars,
            lambda c: F.when(
                F.ascii(c) > 127,
                F.concat(F.lit("&#"), F.ascii(c).cast("string"), F.lit(";")),
            ).otherwise(c),
        ),
        "",
    )
    return F.when(text.rlike(r"[^\x00-\x7F]"), escaped).otherwise(text)
