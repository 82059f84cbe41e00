"""Percolation — reverse search over STORED queries (alerting).

The forward engine matches one query against many stored documents;
alerting inverts it: many stored queries (subscriptions, safety
blocklists, saved searches) are matched against each incoming
document. Elasticsearch ships this as the percolator; on the Solr side
it is the Luwak/monitor pattern sitting next to the streaming topic()
verb (operators/query.topic_pull pulls history; percolation tags the
live stream). The reference's analog capability is its re-crawl loop
re-checking every item against the configured core
(app/handler/indexer.go:100-148) — percolation is that check run
data-side, per arriving document.

Semantics: a stored query is a conjunctive bag of terms (the engine's
AND verb, operators/query.conjunctive_topk); a document matches iff it
contains EVERY term. Queries with no tokens match nothing (the empty
conjunction is a malformed subscription, not match-all — same guard as
the CLI's empty-query 422).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def percolate_matches(
    spark: SparkSession,
    stored_queries: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Match every stored conjunctive query against every document.

    ``stored_queries``: (query_id string, query_text string);
    ``docs``: (doc_id, <text_col>). Returns (query_id, doc_id) ordered
    query_id ASC, doc_id ASC — one row per (query, matching doc).

    Plan shape (the scale asymmetry is the whole point): the query-term
    table is tiny (alert rule sets are 10³-10⁶ rows) and BROADCASTS
    twice (terms, then per-query term counts); documents stream through
    a map-side distinct-term explode and the only exchange is the
    (doc_id, query_id) count-match aggregate — map-side combinable,
    bounded by matches, never a corpus-keyed shuffle. Per document the
    cost is |distinct doc terms ∩ any query term| rows, so a 10^12-turn
    stream percolates at scan cost."""
    tok = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"
    qt = stored_queries.select(
        "query_id",
        F.explode(
            F.array_distinct(F.expr(tok.format(col="query_text")))
        ).alias("term"),
    )
    qn = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    dt = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(tok.format(col=text_col)))
        ).alias("term"),
    )
    hits = (
        dt.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hits.join(F.broadcast(qn), "query_id")
        .where(F.col("n_hit") == F.col("n_terms"))
        .select("query_id", "doc_id")
        .orderBy("query_id", "doc_id")
    )


def percolate_stream(
    stream: DataFrame,
    stored_queries: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Streaming percolation — :func:`percolate_matches` over a
    Structured Streaming document source: tag every arriving document
    with the stored queries it satisfies, continuously. This is the
    alerting half of the streaming story (streaming/ingest folds
    documents IN; this fans matches OUT to subscribers).

    Percolation is stateless per document (a match depends only on the
    doc and the rule set), so NO state store and NO streaming
    aggregation: the batch operator's explode+count plan would be a
    stateful aggregation under Structured Streaming (append mode would
    demand a watermark the semantics don't have), so the stream form
    instead evaluates the conjunction per row — a broadcast
    nested-loop join of each document against the tiny rule table with
    a ``forall(q_toks, t -> array_contains(d_toks, t))`` predicate.
    Map-side only, append-mode clean, per-doc cost |rules|·|terms|.
    Emits (query_id, doc_id) rows; a single-batch replay over a static
    source equals :func:`percolate_matches` minus its presentation
    sort (asserted in tests — the same replay-identity gate
    dedup_doc_stream uses).

    Rule-set updates: the static side re-resolves per microbatch only
    if the source re-plans; production redeploys the query (Solr
    reloads its monitor the same way)."""
    tok = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"
    qtok = stored_queries.select(
        "query_id",
        F.array_distinct(F.expr(tok.format(col="query_text"))).alias("q_toks"),
    ).where(F.size("q_toks") > 0)  # empty conjunction matches nothing
    d = stream.select(
        "doc_id",
        F.array_distinct(F.expr(tok.format(col=text_col))).alias("d_toks"),
    )
    return (
        d.crossJoin(F.broadcast(qtok))
        .where(
            F.forall(
                F.col("q_toks"),
                lambda t: F.array_contains(F.col("d_toks"), t),
            )
        )
        .select("query_id", "doc_id")
    )
