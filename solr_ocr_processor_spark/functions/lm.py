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


def bigram_logprob_table(
    train_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """TRAIN (bigram): (w1, w2, c12, logp_scaled) — conditional MLE
    log-probabilities ln(c(w1,w2) / c(w1)), integer-scaled.

    The history mass is the unigram count of w1 (the doc-final-token
    correction is dropped — the standard stupid-backoff
    simplification; both engines apply the same rule, so parity
    holds). Bigram pairs are formed JVM-side inside the token array
    (transform with index — no window, no shuffle to build pairs);
    the only exchange is the (w1, w2) wordcount. Unlike the unigram
    table, |bigram vocab| is NOT broadcast-safe at corpus scale —
    consumers join it on (w1, w2) and let AQE pick the strategy.
    """
    d = train_docs.select(
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias(
            "toks"
        )
    )
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(toks, (x, i) -> "
                "struct(IF(i = 0, CAST(NULL AS STRING), element_at(toks, i)) AS w1, "
                "x AS w2))"
            )
        ).alias("e")
    ).where(F.col("e.w1").isNotNull()).select("e.w1", "e.w2")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (
        unigram_logprob_table(train_docs, text_col)
        .select(F.col("term").alias("w1"), F.col("cf").alias("c1"))
    )
    return c12.join(c1, "w1").select(
        "w1",
        "w2",
        "c12",
        F.round(F.log(F.col("c12") / F.col("c1")) * LOGP_SCALE)
        .cast("long")
        .alias("logp_scaled"),
    )


def doc_bigram_nll(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """SCORE (bigram, stupid backoff): per-document NLL under a
    bigram LM — (doc_id, n_tokens, nll_scaled, avg_nll), the KenLM
    operator shape one order up from :func:`doc_nll`.

    Every token is one scoring event (w1 = previous token, NULL at
    doc start): the first token scores by unigram, later tokens by
    the conditional bigram, and an unseen bigram backs off to
    ``ln(alpha) + unigram(w2)`` (Brants et al. 2007 stupid backoff —
    score, not a normalized probability; with ``train_docs=None``
    the LM is self-trained and the backoff path never fires).
    Integer-scaled per-event logs keep the doc sum exact and
    order-independent; ln(alpha) is scaled once as its own constant
    (compositional — both engines add the same two integers).

    Scale shape: events are built inside the token array (transform
    with index — zero pair-forming shuffles); the unigram dim
    broadcasts (Heaps' law) while the bigram join runs as a shuffle
    hash join on (w1, w2) — the one deliberately non-broadcast join
    in the LM family, sized by |bigram vocab|, with AQE free to
    demote it to broadcast at small scale.
    """
    src = train_docs if train_docs is not None else docs
    uni_tab = unigram_logprob_table(src, text_col)
    total = uni_tab.agg(F.sum("cf").alias("total"))
    uni = uni_tab.select(
        F.col("term").alias("w2"), F.col("logp_scaled").alias("uni_lps")
    )
    bg = bigram_logprob_table(src, text_col).select(
        "w1", "w2", F.col("logp_scaled").alias("bg_lps")
    )
    ln_alpha = int(round(__import__("math").log(alpha) * LOGP_SCALE))
    ev = (
        docs.select(
            "doc_id",
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)").alias(
                "toks"
            ),
        )
        .select(
            "doc_id",
            F.explode(
                # the array is bound to one column first so the lambda
                # indexes it, not a re-evaluated regex per element
                F.expr(
                    "transform(toks, (x, i) -> "
                    "struct(IF(i = 0, CAST(NULL AS STRING), element_at(toks, i)) "
                    "AS w1, x AS w2))"
                )
            ).alias("e"),
        )
        .select("doc_id", "e.w1", "e.w2")
    )
    # OOV floor: with a separate train corpus, a scored token outside
    # the train vocab has no unigram mass — it scores at one count's
    # worth, ln(1/total) (never fires when the LM is self-trained).
    floor = F.round(F.log(F.lit(1.0) / F.col("total")) * LOGP_SCALE).cast("long")
    u = F.coalesce(F.col("uni_lps"), floor)
    scored = (
        ev.join(F.broadcast(uni), "w2", "left")
        .join(bg, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.when(F.col("w1").isNull(), u)
            .otherwise(F.coalesce(F.col("bg_lps"), F.lit(ln_alpha) + u))
            .alias("lps"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (-F.sum("lps")).cast("long").alias("nll_scaled"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("nll_scaled", F.lit(0)).cast("long").alias("nll_scaled"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("nll_scaled") / F.col("n_tokens") / F.lit(float(LOGP_SCALE)),
                4,
            ),
        ).alias("avg_nll"),
    )
