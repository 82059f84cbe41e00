"""Document materialization — the ingest analog.

The reference turns an ordered list of OCR page files into Solr docs
with a dense positional ordinal ``Page.{position}`` that increments
only for non-empty, processed files (app/handler/indexer.go:98-148) —
the comment at indexer.go:71-80 warns that unstable ordering corrupts
word-highlight positions. Our analog:

- a *document* is a conversation, materialized in stable
  (conv_id, turn_idx, ts) order;
- empty/whitespace-only turns are filtered BEFORE the ordinal is
  assigned (dense ordinal semantics);
- each surviving turn gets doc-global character offsets
  [char_start, char_end) under a single-space joiner — the payload
  analog of the reference's per-word "HPOS VPOS WIDTH HEIGHT" string
  (app/process/alto.go:357-358);
- doc ids are DENSE and DETERMINISTIC: row_number over globally
  sorted conv_id, never monotonically_increasing_id (which is
  partition-layout-dependent and breaks resume identity — SURVEY §4.2).

Everything is plain DataFrame ops: one window per conv (narrow after a
hash partition on conv_id) and one global range-sort for doc ids.
At 10^12 turns the conv window shuffles once on conv_id; the doc-id
sort is over distinct conv_ids only (~3 orders of magnitude smaller).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

JOINER = " "  # single-space joiner between turn texts


@dataclass
class Materialized:
    turns: DataFrame  # conv_id, turn_idx, ordinal, role, tool, ts, text, char_start, char_end
    docs: DataFrame   # doc_id, conv_id, doc_text, n_turns, n_chars


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Filter empty turns, then assign the dense ordinal + char offsets.

    Order: (turn_idx, ts) within conv — turn_idx is authoritative, ts
    breaks duplicate turn_idx deterministically (reference bundle-order
    fallback, app/handler/indexer.go:178-184).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    nonempty = transcripts.where(F.length(F.trim(F.col("text"))) > 0)
    turns = nonempty.withColumn("ordinal", F.row_number().over(w) - F.lit(1))
    tlen = F.length("text")
    # char_start = sum of (len+joiner) over preceding turns of the conv
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    turns = turns.withColumn(
        "char_start",
        F.coalesce(F.sum(tlen + F.lit(len(JOINER))).over(prev), F.lit(0)).cast("long"),
    ).withColumn("char_end", (F.col("char_start") + tlen).cast("long"))
    return turns


def assign_doc_ids(turns: DataFrame) -> DataFrame:
    """Dense deterministic doc_id per conv_id: row_number over the
    globally sorted distinct conv_id set. Returns (doc_id, conv_id)."""
    w = Window.orderBy("conv_id")
    return (
        turns.select("conv_id")
        .distinct()
        .withColumn("doc_id", F.row_number().over(w).cast("long") - F.lit(1))
        .select("doc_id", "conv_id")
    )


def materialize_docs(
    transcripts: DataFrame, doc_map: DataFrame | None = None
) -> Materialized:
    """Full materialization: ordered turns + per-conversation doc text.

    doc_text is rebuilt order-safely via array_sort over (ordinal, text)
    structs — no reliance on collect_list shuffle order.

    ``doc_map`` (doc_id, conv_id), when given, overrides the local
    doc-id assignment with a checkpointed global one — how resumable
    shard builds keep ids stable across runs (SURVEY §4.2-5).
    """
    turns = ordered_turns(transcripts)
    doc_ids = (
        doc_map.select("doc_id", "conv_id") if doc_map is not None
        else assign_doc_ids(turns)
    )
    docs = (
        turns.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ordinal", "text"))),
                    lambda s: s["text"],
                ),
                JOINER,
            ).alias("doc_text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .join(doc_ids, "conv_id")
        .withColumn("n_chars", F.length("doc_text").cast("long"))
        .select("doc_id", "conv_id", "doc_text", "n_turns", "n_chars")
    )
    turns = turns.join(doc_ids, "conv_id").select(
        "doc_id",
        "conv_id",
        "turn_idx",
        "ordinal",
        "role",
        "tool",
        "ts",
        "text",
        "char_start",
        "char_end",
    )
    return Materialized(turns=turns, docs=docs)
