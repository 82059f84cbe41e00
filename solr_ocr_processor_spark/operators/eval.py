"""Offline retrieval evaluation — the trec_eval analog.

Reference context: the reference delegates ranking quality entirely to
Solr (/root/reference/app/process/solr.go:48-49) and ships no
evaluation harness at all (app/test/main_test.go:5-7 is an empty
test). Any production search deployment — and any retrieval-training
data pipeline — grades its ranker against judgments (qrels) before
trusting it. This module is that grader as a Spark plan: the lexical
twin of ``operators/ann.recall_at_k`` (which grades the ANN index
against the exact scan).

Scale discipline (100 TB):

- metrics are computed over the SYSTEM RESULTS — ``|Q| x k`` rows
  that already passed top-k — never over the corpus. The only
  potentially large input is the qrels side; it contributes one
  map-side-combinable count per query plus a join keyed on
  (query_id, doc_id) against the k-row results (the results side is
  broadcast when |Q|*k is small, which it always is post-top-k).
- every metric is integer-scaled (parts-per-million) via integer
  division (Spark ``div`` == DuckDB ``//``), so the DuckDB oracle
  recomputes bit-identical values — no IEEE division-order drift.
  ``ap_scaled`` is therefore the *integer-scaled* average precision
  (each P@i term floors to ppm before the mean), documented rather
  than hidden: both engines spell the identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000  # ppm — large enough that floor loss is 1e-6


def rank_eval(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Grade a per-query ranking against binary relevance judgments.

    ``results``: (query_id string, rank int starting at 1, doc_id) —
    the system's top-k page per query (e.g. ``score.bm25_batch_topk``
    output). ``qrels``: (query_id, doc_id) — the relevant set per
    query; duplicates tolerated (deduped here).

    Returns one row per query_id present in ``results``::

        query_id, n_rel, n_rel_ret, first_rel_rank,
        rr_scaled, p_at_k_scaled, ap_scaled

    - ``n_rel`` — total relevant docs (0 if the query has no qrels);
    - ``n_rel_ret`` — relevant docs inside the top-k page;
    - ``first_rel_rank`` — rank of the first relevant hit (0 = none);
    - ``rr_scaled`` — reciprocal rank, ppm (``SCALE div rank``);
    - ``p_at_k_scaled`` — precision@k, ppm (denominator is k even
      when fewer than k docs matched — the trec_eval convention);
    - ``ap_scaled`` — integer-scaled AP@k: mean over relevant ranks i
      of ``SCALE*C_i div i`` (C_i = relevant count in the top i),
      divided by ``min(n_rel, k)``; 0 when n_rel = 0.

    Plan shape: one left join of the k-row page against qrels, one
    cumulative window per query over <= k rows, one |Q|-row aggregate,
    and a |Q|-row broadcast join for n_rel. Nothing here scales with
    the corpus — only with |Q|*k.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    rel = qrels.select("query_id", "doc_id").distinct()
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    hits = (
        results.select("query_id", "rank", "doc_id")
        .join(rel.withColumn("is_rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .withColumn("is_rel", F.coalesce(F.col("is_rel"), F.lit(0)))
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hits.withColumn("c_i", F.sum("is_rel").over(w).cast("long"))
    per = cum.groupBy("query_id").agg(
        F.sum("is_rel").cast("long").alias("n_rel_ret"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias("_frr"),
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.expr(f"div({SCALE} * c_i, rank)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_ap_num"),
    )
    out = per.join(F.broadcast(n_rel), "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "n_rel_ret",
        F.coalesce(F.col("_frr"), F.lit(0)).cast("int").alias("first_rel_rank"),
        F.when(F.col("_frr").isNull(), F.lit(0))
        .otherwise(F.expr(f"div({SCALE}, _frr)"))
        .cast("long")
        .alias("rr_scaled"),
        F.expr(f"div({SCALE} * n_rel_ret, {k})")
        .cast("long")
        .alias("p_at_k_scaled"),
        F.when(F.coalesce(F.col("n_rel"), F.lit(0)) == 0, F.lit(0))
        .otherwise(F.expr(f"div(_ap_num, least(n_rel, {k}))"))
        .cast("long")
        .alias("ap_scaled"),
    )
    return out.orderBy("query_id")


def ndcg_at_k(results: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Graded-relevance nDCG@k — the metric trec_eval adds beyond the
    binary RR/P@k/AP family of :func:`rank_eval` when judgments carry
    GRADES (here: how many of the query's terms the doc matches).

    ``results``: (query_id, rank starting at 1, doc_id);
    ``qrels``: (query_id, doc_id, grade int >= 1) — unjudged docs
    grade 0. Gain is the standard exponential ``2^grade − 1`` with a
    ``log2(rank+1)`` discount; IDCG re-ranks the judged set by
    (grade DESC, doc_id ASC) — the deterministic ideal page — cut at
    k. Returns (query_id, dcg, idcg, ndcg) rounded 6dp, ordered by
    query_id; ndcg = 0 when a query has no judged docs.

    Plan shape: one |Q·k|-row left join + aggregate for DCG, one
    qrels-keyed window for the ideal ranking — nothing scales with
    the corpus."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    rel = qrels.select("query_id", "doc_id", F.col("grade").cast("long").alias("grade"))
    j = (
        results.where(F.col("rank") <= F.lit(int(k)))
        .join(rel, ["query_id", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    gain = F.pow(F.lit(2.0), F.col("grade")) - F.lit(1.0)
    dcg = j.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("_dcg")
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = rel.withColumn("irank", F.row_number().over(wi)).where(
        F.col("irank") <= F.lit(int(k))
    )
    idcg = ideal.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("irank") + F.lit(1.0))).alias("_idcg")
    )
    return (
        dcg.join(idcg, "query_id", "left")
        .select(
            "query_id",
            F.round("_dcg", 6).alias("dcg"),
            F.round(F.coalesce(F.col("_idcg"), F.lit(0.0)), 6).alias("idcg"),
            F.round(
                F.when(
                    F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0,
                    F.col("_dcg") / F.col("_idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )
