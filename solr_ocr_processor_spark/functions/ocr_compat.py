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


def xml_codepoint_escape(text: Column) -> Column:
    """UTF-8 -> XML decimal character references for codepoints > 127,
    as a fold over the string's characters (pure built-ins: split to
    chars, transform, concat)."""
    chars = F.split(text, "")
    return F.array_join(
        F.transform(
            chars,
            lambda c: F.when(
                F.ascii(c) > 127,
                F.concat(F.lit("&#"), F.ascii(c).cast("string"), F.lit(";")),
            ).otherwise(c),
        ),
        "",
    )
