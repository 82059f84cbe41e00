"""BM25F — field-weighted BM25 over transcript role fields.

The reference delegates its whole query surface to a stored Solr core
(/root/reference/app/process/solr.go:48-49,100-124); Solr's edismax
``qf=field^w`` searches several weighted fields at once and Lucene's
per-field norms make that BM25F (Robertson/Zaragoza 2004, "simple
BM25F"). A conversation's natural fields are its turn roles — ranking
with ``assistant^2 user^1`` finds convs where the match is in what
the model SAID, not what the user asked.

Semantics (the SQL twin mirrors every choice):

- per-field weighted tf:  ``wtf(d,t) = Σ_f w_f · tf_{d,f,t} / B_f``
  with ``B_f = (1 - b) + b · dl_{d,f} / avgdl_f`` — saturation is
  applied ONCE to the weighted sum, not per field (the defining BM25F
  property: two fields with tf 1 ≠ one field with tf 2),
- ``avgdl_f`` averages over documents that HAVE the field,
- ``df(t)`` counts documents where t occurs in any weighted field;
  idf is the engine's BM25 idf ``ln(1 + (N - df + ½)/(df + ½))`` with
  N = all conversations,
- ``score = Σ_t idf · wtf·(k1+1)/(wtf + k1)``, rounded to 6 dp BEFORE
  the cut so the k-boundary is deterministic across engines,
  ties by conv_id ascending.

Scale shape: tokens of weighted fields only (role filter pushes to
the scan); ``dl_f`` is one (conv_id, role)-keyed aggregate with
map-side combine; query-term tf filters term∈Q BEFORE its shuffle;
``avgdl_f`` (|roles| rows) and idf (|Q| rows) broadcast; the final
cut lowers to TakeOrderedAndProject. The indexed variant of this
operator adds a field column to the posting rows at build time —
this is the query-time spine and the oracle twin.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import TOKEN_RE


def bm25f_topk(
    turns: DataFrame,
    terms: list[str] | tuple[str, ...],
    field_weights: dict[str, float] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k conversations by BM25F over role fields.

    Returns (conv_id, score) ordered by (score desc, conv_id asc).
    Roles absent from ``field_weights`` are excluded entirely (weight
    0 fields contribute neither tf nor length mass — Lucene's
    unsearched-field behavior).
    """
    if not terms:
        raise ValueError("bm25f_topk wants at least one query term")
    if field_weights is None:
        field_weights = {"assistant": 2.0, "user": 1.0}
    roles = sorted(field_weights)
    wmap = F.create_map(
        *[x for r in roles for x in (F.lit(r), F.lit(float(field_weights[r])))]
    )
    toks = turns.where(F.col("role").isin(roles)).select(
        "conv_id",
        "role",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("term"),
    )
    # dl_f feeds BOTH the contrib join and the avgdl aggregate —
    # pinned so Catalyst doesn't duplicate the full tokenize lineage
    # under each consumer (the frame is |convs|·|roles| rows of 3
    # columns; one corpus scan saved per query)
    dlf = toks.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("dl_f")
    ).persist()
    avgdlf = dlf.groupBy("role").agg(F.avg("dl_f").alias("avgdl_f"))
    ndocs = turns.agg(F.countDistinct("conv_id").alias("n_docs"))
    tf = (
        toks.where(F.col("term").isin(list(terms)))
        .groupBy("conv_id", "role", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = (
        tf.select("conv_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = dft.crossJoin(F.broadcast(ndocs)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = (
        tf.join(dlf, ["conv_id", "role"])
        .join(F.broadcast(avgdlf), "role")
        .select(
            "conv_id",
            "term",
            (
                wmap[F.col("role")]
                * F.col("tf")
                / (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl_f") / F.col("avgdl_f")
                )
            ).alias("c"),
        )
    )
    wtf = contrib.groupBy("conv_id", "term").agg(F.sum("c").alias("wtf"))
    scored = (
        wtf.join(F.broadcast(idf), "term")
        .groupBy("conv_id")
        .agg(
            F.round(
                F.sum(
                    F.col("idf")
                    * F.col("wtf")
                    * F.lit(k1 + 1.0)
                    / (F.col("wtf") + F.lit(k1))
                ),
                6,
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("conv_id")).limit(k)


def dismax_tie_topk(
    turns: DataFrame,
    terms: list[str] | tuple[str, ...],
    field_weights: dict[str, float] | None = None,
    tie: float = 0.3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(e)dismax ``tie=`` — DisjunctionMaxQuery over role fields: per
    query term the doc's score is the BEST single field's clause score
    plus ``tie`` times the other fields' scores
    (``max + tie * (sum - max)``, Lucene DisjunctionMaxQuery exactly).
    ``tie=0`` is pure dismax (best field wins outright), ``tie=1``
    degrades to a plain per-field sum. The reference forwards edismax
    params verbatim to Solr (app/process/solr.go:48-49), where ``tie``
    is the standard lever against the "long doc matched twice beats
    short doc matched well" artifact of summing fields.

    Unlike :func:`bm25f_topk` (shared saturation, any-field df), each
    field here is its OWN scorer with per-field df/idf and per-field
    length norms — Lucene computes field statistics independently and
    the dismax combiner sees finished per-field scores.

    Returns (conv_id, score) ordered by (score desc, conv_id asc),
    score rounded to 6 dp BEFORE the cut.

    Scale shape: one tokenize pass feeds dl_f and tf (term filter
    BEFORE the tf shuffle); avgdl_f (|roles| rows), per-field df
    (|Q|·|roles| rows) and n_docs broadcast; the max/sum combine is a
    (conv, term)-keyed aggregate over at most |roles| rows per key;
    the cut lowers to TakeOrderedAndProject. No corpus-sized side ever
    shuffles more than (conv, role|term) keyed aggregates."""
    if not terms:
        raise ValueError("dismax_tie_topk wants at least one query term")
    if not 0.0 <= tie <= 1.0:
        raise ValueError(f"tie must be in [0, 1], got {tie}")
    if field_weights is None:
        field_weights = {"assistant": 2.0, "user": 1.0}
    roles = sorted(field_weights)
    wmap = F.create_map(
        *[x for r in roles for x in (F.lit(r), F.lit(float(field_weights[r])))]
    )
    toks = turns.where(F.col("role").isin(roles)).select(
        "conv_id",
        "role",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("term"),
    )
    # pinned: feeds the contrib join AND the avgdl aggregate (one
    # corpus tokenize, same discipline as bm25f_topk)
    dlf = toks.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("dl_f")
    ).persist()
    avgdlf = dlf.groupBy("role").agg(F.avg("dl_f").alias("avgdl_f"))
    ndocs = turns.agg(F.countDistinct("conv_id").alias("n_docs"))
    tf = (
        toks.where(F.col("term").isin(list(terms)))
        .groupBy("conv_id", "role", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # per-FIELD document frequency: each field is an independent
    # Lucene scorer, so df counts docs where t occurs in THAT role
    dff = (
        tf.select("conv_id", "role", "term")
        .groupBy("role", "term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idff = dff.crossJoin(F.broadcast(ndocs)).select(
        "role",
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    clause = (
        tf.join(dlf, ["conv_id", "role"])
        .join(F.broadcast(avgdlf), "role")
        .join(F.broadcast(idff), ["role", "term"])
        .select(
            "conv_id",
            "term",
            (
                wmap[F.col("role")]
                * F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl_f") / F.col("avgdl_f")
                    )
                )
            ).alias("s"),
        )
    )
    dismax = clause.groupBy("conv_id", "term").agg(
        # <=2 field values per key: the two-term sum is IEEE-
        # commutative, so this combine is partition-order-free
        (
            F.max("s") + F.lit(float(tie)) * (F.sum("s") - F.max("s"))
        ).alias("dm")
    )
    # per-term dismax scores fold in sorted term order (the
    # sorted_term_fold contract): bit-identical across partitionings
    scored = dismax.groupBy("conv_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "dm"))),
                F.lit(0.0),
                lambda acc, s: acc + s["dm"],
            ),
            6,
        ).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("conv_id")).limit(k)


def stopstem_topk(
    turns: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k under a Lucene-style ANALYSIS CHAIN — lowercase →
    [a-z0-9]+ → English stop-word removal (Lucene's 33-word default
    set) → Harman S-stemmer — applied identically to documents and to
    the query (the build==query==oracle analyzer discipline of
    Q5/SURVEY §2). This is the operator a Solr user gets from
    ``text_en``-style field types: "searches" matches "search", "the"
    matches nothing, and document length is the POST-filter token
    count (stopwords contribute no length mass — exactly how Lucene's
    norms see them).

    Returns (conv_id, score) ordered (score desc, conv_id asc), score
    rounded to 6 dp before the cut.

    Plan: the stem is a nested-CASE codegen expression inside the
    tokenize projection (functions/tokenizer.s_stem — no Python); the
    stop filter prunes BEFORE dl/tf aggregate so stopword mass never
    shuffles; df/idf (|Q| rows) and corpus scalars broadcast; the cut
    is TakeOrderedAndProject."""
    from ..functions.tokenizer import STOPWORDS_EN, s_stem

    qterms = sorted(
        {
            s
            for s in (
                _py_s_stem(t)
                for t in re.findall(r"[a-z0-9]+", query.lower())
                if t not in STOPWORDS_EN
            )
        }
    )
    if not qterms:
        raise ValueError(f"query {query!r} is all stopwords/empty after analysis")
    toks = turns.select(
        "conv_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("raw"),
    )
    analyzed = toks.where(~F.col("raw").isin(list(STOPWORDS_EN))).select(
        "conv_id", s_stem("raw").alias("term")
    )
    dl = analyzed.groupBy("conv_id").agg(F.count(F.lit(1)).alias("dl")).persist()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        analyzed.where(F.col("term").isin(qterms))
        .groupBy("conv_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dft.crossJoin(F.broadcast(stats)).select(
        "term",
        "avgdl",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # sorted term fold -> bit-identical scores on every partitioning
    scored = (
        tf.join(dl, "conv_id")
        .join(F.broadcast(idf), "term")
        .select("conv_id", "term", contrib.alias("c"))
        .groupBy("conv_id")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["c"],
                ),
                6,
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("conv_id")).limit(k)


def _py_s_stem(t: str) -> str:
    """Driver-side twin of functions/tokenizer.s_stem for query-term
    analysis (same three ordered Harman rules; an exception blocks
    stemming outright — no fall-through to a shorter suffix)."""
    if len(t) <= 2:
        return t
    if t.endswith("ies"):
        return t if t.endswith(("eies", "aies")) else t[:-3] + "y"
    if t.endswith("es"):
        return t if t.endswith(("aes", "ees", "oes")) else t[:-1]
    if t.endswith("s"):
        return t if t.endswith(("us", "ss")) else t[:-1]
    return t
