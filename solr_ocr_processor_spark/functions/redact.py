"""PII redaction — a training-data pipeline's compliance map stage.

Pure column expressions (regexp_replace / regexp_extract_all chains,
whole-stage codegen, zero UDFs) with an exact DuckDB twin. Pattern
dialect is kept to the Java-regex ∩ RE2 common subset (no lookarounds,
no backreferences; ``\\b`` and bounded quantifiers are in both), and
both engines use leftmost-first matching, so counts and replacements
agree bit-for-bit.

Patterns run in a FIXED order, each over the previous pattern's
output (emails are consumed before the phone pattern can chew on
their digits; SSNs before the looser phone shape), and the per-type
counts are taken from the same intermediate the replace sees — the
oracle replays the identical chain, so order-sensitivity can never
cause drift.

Scale: map-only — redacting 100 TB costs the scan plus the regex CPU;
no shuffle, no join, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER MATTERS (see module docstring)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_ssn, n_phone): replace each
    PII class with its placeholder token and count the hits. Counts
    are measured on the text state each pattern actually saw (the
    chained intermediate), exactly as the SQL twin does."""
    cur: Column = F.col(text_col)
    outs: list[Column] = []
    for name, pat, repl in PII_PATTERNS:
        outs.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(id_col, cur.alias("redacted"), *outs)
