"""Unigram language-model scoring: the perplexity-filter stage of a
training-data pipeline (CCNet / Gopher style — score every document
by a language model and drop the high-perplexity tail).

A production pipeline scores with KenLM or a small transformer; the
*operator shape* is what must scale, and it is exactly this one:

  1. TRAIN: token -> corpus frequency (one wordcount shuffle, map-side
     combinable — the canonical Spark aggregation),
  2. a |vocab|-row log-probability table (Heaps' law: vocab grows
     ~O(corpus^0.5), so this side is always the broadcastable dim),
  3. SCORE: stream the corpus tokens past the broadcast table and sum
     per-document log-probabilities (partial agg by doc_id is local —
     a document's tokens are emitted contiguously by the tokenizer).

Zero UDFs — tokenize, join, and aggregate are all whole-stage codegen.

Exactness discipline: per-term log-probabilities are integer-scaled
(round(ln(cf/total) * 1e6) as BIGINT) *before* the per-document sum,
so the document aggregate is an exact integer — order-independent
across Spark's partial aggregation and bit-identical to the DuckDB
twin (same trick as textstats.fingerprint's integer term-hash sum).
The only cross-engine float op left is one ln() per *distinct term*;
a 1-ulp libm disagreement flips the scaled rounding only within
~1e-10 of a boundary (documented tolerance, same class as
operators/ann.py's plane-sign note).

The reported score is the mean negative log-probability per token
(avg_nll — monotone in perplexity: ppl = exp(avg_nll)), derived from
the two exact integers (nll_scaled, n_tokens) with one final IEEE
division + round that both engines execute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_RE

LOGP_SCALE = 1_000_000


def unigram_logprob_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """TRAIN: (term, cf, logp_scaled) — maximum-likelihood unigram
    log-probabilities over the corpus, integer-scaled. One explode +
    one wordcount shuffle; output is |vocab| rows."""
    toks = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("term")
    )
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))
    return cf.crossJoin(F.broadcast(total)).select(
        "term",
        "cf",
        F.round(F.log(F.col("cf") / F.col("total")) * LOGP_SCALE)
        .cast("long")
        .alias("logp_scaled"),
    )


def doc_nll(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SCORE: per-document negative log-likelihood under the corpus
    unigram LM — (doc_id, n_tokens, nll_scaled, avg_nll).

    Documents with zero tokens are reported with n_tokens=0 and NULL
    avg_nll (a pipeline drops or routes them explicitly rather than
    silently losing rows). The LM here is trained on the scored corpus
    itself (self-perplexity — the CCNet in-domain shape); training on
    a separate reference table is the same plan with a different
    ``docs`` argument to :func:`unigram_logprob_table`.
    """
    lm = unigram_logprob_table(docs, text_col)
    toks = docs.select(
        "doc_id",
        F.explode_outer(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("term"),
    )
    # left join: every corpus term is in the self-trained vocab, but
    # explode_outer's NULL rows (empty docs) must survive to the agg.
    scored = toks.join(F.broadcast(lm.select("term", "logp_scaled")), "term", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("term").cast("long").alias("n_tokens"),
            (-F.coalesce(F.sum("logp_scaled"), F.lit(0))).cast("long").alias(
                "nll_scaled"
            ),
            F.when(
                F.count("term") > 0,
                F.round(
                    -F.sum("logp_scaled")
                    / F.count("term")
                    / F.lit(float(LOGP_SCALE)),
                    4,
                ),
            ).alias("avg_nll"),
        )
    )
