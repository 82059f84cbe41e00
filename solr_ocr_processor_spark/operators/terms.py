"""Dictionary and per-document term introspection: the Solr *terms
component* (``/terms``) and *TermVectors component* (``/tvrh``)
analogs.

Lucene-surface parity: the reference's Solr core exposes both
components on any stored index (queries are forwarded verbatim,
app/process/solr.go:48-49,102-103); a user debugging analysis or
building a spell/autocomplete layer hits them constantly. The engine
already has the *suggester* shape (expand.suggest_terms: prefix +
df-ranked); this module adds the rest of the /terms parameter surface
— regex filtering and mincount — and the per-document view.

Spark-first shapes:

- :func:`terms_enum` scans the **dictionary** (term_stats, |vocab|
  rows — Heaps' law keeps it orders of magnitude under the corpus at
  any scale), never the postings. ``rlike`` runs in whole-stage
  codegen over the narrow (term, df, cf) projection; ``mincount``
  compiles to a pushable ``df >= n`` range predicate on the stored
  dictionary. Output ordering (df DESC, term ASC) is a total order
  => deterministic under reruns and the DuckDB oracle; the cap
  lowers to TakeOrderedAndProject.

- :func:`term_vectors` reads ONE document's posting rows: an equality
  filter on doc_id (after the conv_id -> doc_id map lookup) prunes
  the doc-bucketed posting files, then a broadcast join decorates
  each term with its corpus df — the tv.df/tv.tf_idf response
  fields. Cost is O(|doc terms|) regardless of corpus size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from .build import Index

MAX_TERMS = 1000  # /terms terms.limit default ceiling


def is_valid_terms_regex(pattern: str) -> bool:
    """Reject regexes that differ between engines or fail to compile.

    The pattern executes under BOTH Java regex (Spark ``rlike``) and
    RE2 (DuckDB ``regexp_matches``), whose dialects diverge outside a
    common core — e.g. Java accepts backreferences RE2 rejects, and a
    bare ``a{`` is a literal in Python/RE2 but a PatternSyntaxException
    in Java. Allow only the conservative intersection: lowercase/digit
    literals, character classes, anchors, ., *, +, ?, |, () — no
    braces, no backslash escapes — and require it to compile. Within
    this subset Java, RE2, and Python agree."""
    if not pattern or len(pattern) > 200:
        return False
    if not re.fullmatch(r"[a-z0-9\[\]\-^$.*+?|()]*", pattern):
        return False
    try:
        re.compile(pattern)
    except re.error:
        return False
    return True


def terms_enum(
    spark: SparkSession,
    index: Index,
    regex: str | None = None,
    mincount: int = 1,
    limit: int = 50,
    prefix: str | None = None,
) -> DataFrame:
    """Solr /terms: enumerate dictionary terms with their document and
    collection frequencies, optionally filtered by ``terms.regex``,
    ``terms.mincount`` and ``terms.prefix`` (literal prefix filter —
    composes with regex exactly as Solr applies both), ranked
    (df DESC, term ASC), top ``limit``.

    Returns (term, df, cf). The prefix lowers to StartsWith, which a
    term-sorted dictionary serves via row-group min/max pruning.
    """
    out = index.term_stats.select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )
    if prefix:
        out = out.where(F.col("term").startswith(prefix))
    if mincount > 1:
        out = out.where(F.col("df") >= F.lit(int(mincount)))
    if regex is not None:
        if not is_valid_terms_regex(regex):
            return spark.createDataFrame([], "term string, df long, cf long")
        # rlike is unanchored in Spark, regexp_matches is unanchored in
        # DuckDB — anchor explicitly so both sides see full-term match
        # semantics (Solr's terms.regex is full-match).
        out = out.where(F.col("term").rlike(f"^(?:{regex})$"))
    return out.orderBy(F.desc("df"), F.asc("term")).limit(min(limit, MAX_TERMS))


def significant_terms(
    spark: SparkSession,
    index: Index,
    seed_term: str,
    min_fg_df: int = 2,
    limit: int = 20,
) -> DataFrame:
    """Solr ``{!significantTerms}`` (SignificantTermsQParserPlugin):
    terms over-represented in a *foreground* doc set (docs matching
    ``seed_term``) relative to the whole-corpus *background*.

    Returns (term, fg_df, bg_df, sig_scaled) ranked by significance
    DESC, term ASC, top ``limit``. Significance here is the foreground
    /background document-frequency lift, integer-scaled so the ranking
    is exact arithmetic on both engines::

        sig_scaled = floor(fg_df * 1_000_000 / bg_df)

    (fg_N is constant across terms, so dividing by it cannot change
    the order; dropping it keeps the score integral.)

    Spark-first shape: ONE semi-join of the postings against the seed
    term's doc list (broadcast when the seed is selective — df rows,
    not corpus rows), then a term-keyed count aggregated map-side, and
    a broadcast join of the |vocab|-sized dictionary for bg_df. No
    corpus-wide shuffle: the foreground postings subset is the only
    thing that moves, and it is bounded by the seed's cf. The seed's
    own term is excluded (it is trivially 100% of the foreground).
    """
    # postings hold ONE row per (term, doc_id) (build.py invariant), so
    # document frequency is a plain count — no distinct aggregate.
    fg_docs = index.postings.where(F.col("term") == seed_term).select("doc_id")
    fg = (
        index.postings.join(F.broadcast(fg_docs), "doc_id")
        .where(F.col("term") != seed_term)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
        .where(F.col("fg_df") >= F.lit(int(min_fg_df)))
    )
    bg = index.term_stats.select("term", F.col("df").cast("long").alias("bg_df"))
    return (
        fg.join(bg, "term")
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.floor(F.col("fg_df") * F.lit(1_000_000) / F.col("bg_df"))
            .cast("long")
            .alias("sig_scaled"),
        )
        .orderBy(F.desc("sig_scaled"), F.asc("term"))
        .limit(limit)
    )


def term_vectors(
    spark: SparkSession,
    index: Index,
    conv_id: str,
) -> DataFrame:
    """Solr /tvrh (TermVectors component): the per-document term
    vector — every indexed term of one document with its in-doc tf
    and corpus df, plus the classic tf·idf weight the component
    reports. Returns (term, tf, df, tf_idf) ordered by term.

    tf_idf uses the component's raw formula tf * ln(n_docs / df)
    (Lucene classic similarity, natural log), integer-scaled by 1e6 at
    the TERM level so the value is an exact integer on both engines
    (same discipline as textstats.fingerprint; 1-ulp ln() drift could
    flip a boundary rounding with probability ~1e-10 per term —
    documented tolerance, same class as ann.py's sign note).
    """
    doc = index.doc_meta.where(F.col("conv_id") == conv_id).select("doc_id")
    n_docs = index.corpus.select("n_docs").first()["n_docs"]
    vec = (
        index.postings.join(F.broadcast(doc), "doc_id")
        .select("term", F.col("tf").cast("long").alias("tf"))
    )
    df_map = index.term_stats.select("term", F.col("df").cast("long").alias("df"))
    return (
        vec.join(F.broadcast(df_map), "term")
        .select(
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")) * 1e6
            )
            .cast("long")
            .alias("tf_idf_scaled"),
        )
        .orderBy("term")
    )


def luke_report(spark: SparkSession, index: Index) -> DataFrame:
    """Index introspection summary — the Solr ``/admin/luke`` analog
    (numDocs / numTerms / per-field stats on a stored core; the
    reference's Solr admin surface exposes it for every collection it
    manages). One row:

    (n_docs, n_terms, n_postings, total_tokens, avgdl 6dp,
     max_df, max_dl, min_dl)

    - ``n_postings`` = sum(df) — the posting-list row count, Luke's
      "term instance" denominator for index-size accounting;
    - ``total_tokens`` = sum(cf) == corpus.total_tokens (asserted
      equal by construction: build.py computes both from tf);
    - ``max_df`` — the hottest dictionary entry (stopword ceiling);
    - dl extremes come from doc_meta (0 for token-less docs).

    Plan: three single-row aggregates — dictionary (|vocab| rows),
    doc_meta (|docs| rows, narrow dl column), corpus (already 1 row)
    — cross-joined; every input is metadata-scale next to postings,
    and nothing touches posting rows at all.
    """
    dict_agg = index.term_stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(F.max("df"), F.lit(0)).cast("long").alias("max_df"),
    )
    dl_agg = index.doc_meta.agg(
        F.coalesce(F.max("dl"), F.lit(0)).cast("long").alias("max_dl"),
        F.coalesce(F.min("dl"), F.lit(0)).cast("long").alias("min_dl"),
    )
    return (
        index.corpus.select(
            "n_docs", "total_tokens", F.round("avgdl", 6).alias("avgdl")
        )
        .crossJoin(dict_agg)
        .crossJoin(dl_agg)
        .select(
            "n_docs",
            "n_terms",
            "n_postings",
            "total_tokens",
            "avgdl",
            "max_df",
            "max_dl",
            "min_dl",
        )
    )


def function_fields(
    spark: SparkSession,
    index: Index,
    query: str,
    term: str,
    k: int = 10,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Solr fl= pseudo-fields — ``fl=*,score,termfreq(text,'t'),
    docfreq(text,'t'),norm(text)``: decorate the BM25 top-k page with
    per-doc function-query values (Lucene FunctionValues over
    doc-values / postings).

    Returns (doc_id, conv_id, score, tf_term, df_term, dl): tf_term =
    termfreq of ``term`` in the doc (0 when absent), df_term = its
    corpus docfreq (constant column), dl the length norm source.

    Plan shape: the page is the k-row bm25_topk output; termfreq is a
    point read of the postings dictionary-filtered to ONE term and
    broadcast-joined against the page (k rows moving, never the
    postings), docfreq is a 1-row dim broadcast, dl rides doc_meta's
    k-row resolve. Everything after the top-k is O(k)."""
    from .score import bm25_topk

    page = bm25_topk(spark, index, query, k=k, cfg=cfg, exclude_docs=exclude_docs)
    tf1 = (
        index.postings.where(F.col("term") == term)
        .select("doc_id", F.col("tf").cast("long").alias("tf_term"))
    )
    # docfreq joins on a constant key (0/1-row dim, coalesced to 0 so
    # an out-of-vocab term reports docfreq()=0, as Solr does) — no
    # plan-time action, no row-killing cross join with an empty dim.
    dfreq = index.term_stats.where(F.col("term") == term).select(
        F.lit(1).alias("__k"), F.col("df").cast("long").alias("df_term")
    )
    dl = index.doc_meta.select("doc_id", F.col("dl").cast("long").alias("dl"))
    # the page is the k-row build side of every join (BuildLeft BHJ
    # streams the big relations once; the page plan runs once)
    return (
        F.broadcast(page)
        .join(tf1, "doc_id", "left")
        .join(dl, "doc_id")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(dfreq), "__k", "left")
        .select(
            "doc_id",
            "conv_id",
            "score",
            F.coalesce("tf_term", F.lit(0)).cast("long").alias("tf_term"),
            F.coalesce("df_term", F.lit(0)).cast("long").alias("df_term"),
            "dl",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def freq_spectrum(index: Index) -> DataFrame:
    """Frequency spectrum (the Zipf curve every vocabulary / tokenizer
    decision reads first): dictionary terms bucketed by collection
    frequency in POWERS OF TWO — bucket b holds terms with
    cf in [2^(b-1), 2^b). The hapax/rare tail (low buckets) decides
    vocabulary truncation, OOV handling, and df-cutoff tuning (the
    suggest/spellcheck mincount knobs upstream of this module); the
    top buckets are the stopword mass.

    Returns (bucket, n_terms, token_mass) ordered bucket ASC, with
    ``bucket = bitlength(cf) = ⌊log2 cf⌋ + 1`` — an EXACT integer on
    both engines (``length(bin(cf))``; a float log2 could round to
    either side of a power-of-two boundary) — and exact BIGINT
    counts/mass.

    Plan: ONE |vocab|-row aggregate over the dictionary — never
    touches postings; the exchange moves ~64 rows."""
    b = F.length(F.expr("bin(cf)")).cast("int")
    return (
        index.term_stats.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("cf").cast("long").alias("token_mass"),
        )
        .orderBy("bucket")
    )


def zipf_fit(index: Index, top_n: int = 5000) -> DataFrame:
    """Zipf-law exponent fit over the dictionary — the one-number
    companion to :func:`freq_spectrum` (Zipf 1949: cf(rank) ∝
    rank^(−α), α ≈ 1 for natural language; a synthetic or
    template-heavy corpus drifts visibly — the tripwire mixture
    dashboards read next to n-gram diversity). Ordinary least squares
    of ln(cf) on ln(rank) over the ``top_n`` most frequent terms
    (rank by cf DESC, term ASC — the deterministic total order):

        alpha = −slope,   r2 = corr(x, y)²

    Returns ONE row (n_terms, alpha, r2, ln_cf_at_rank1) rounded 6dp
    — ``ln_cf_at_rank1`` is the fit's intercept, the log-scale height
    of the curve.

    Plan: one rank window over the |vocab|-row dictionary (never the
    postings), a five-sum aggregate, closed-form OLS in the final
    1-row projection — the exchange moves |vocab| skinny rows once.
    Float seam: the ln() sums are order-dependent at ~1e-12; the 6dp
    round is the repo's standard tolerance class for float
    aggregates."""
    from pyspark.sql.window import Window

    ranked = (
        index.term_stats.select("term", "cf")
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cf"), F.asc("term"))),
        )
        .where(F.col("rank") <= F.lit(int(top_n)))
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cf").cast("double")).alias("y"),
        )
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(-slope, 6).alias("alpha"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
        F.round(
            F.col("sy") / n - slope * F.col("sx") / n, 6
        ).alias("ln_cf_at_rank1"),
    )


def shard_df_skew(index: Index, terms: list[str], n_shards: int = 8) -> DataFrame:
    """Shard-local document-frequency skew — the diagnostic behind the
    build's GLOBAL-stats prepass (lifecycle A8: score with shard-local
    df/avgdl and every shard ranks differently; the r2 WAND shard-avgdl
    bound bug was exactly this class). For each query term and each
    doc_id-hash shard: the shard's local df next to the global df and
    the integer-scaled skew ratio

        skew_scaled = floor(1e6 · df_shard · n_shards / df_global)

    (1e6 == perfectly even; spread across shards == how wrong a
    shard-local idf would be).

    Returns (term, shard, df_shard, df_global, skew_scaled) ordered
    term ASC, shard ASC. Plan: ONE dictionary-filtered postings scan
    (row-group pruned to the probe terms), one (term, shard) aggregate
    with map-side combine, a broadcast join of the |terms|-row global
    dictionary slice."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    probe = [t for t in terms if t]
    sh = (
        index.postings.where(F.col("term").isin(probe))
        .select("term", F.pmod(F.col("doc_id"), F.lit(int(n_shards))).cast("int").alias("shard"))
        .groupBy("term", "shard")
        .agg(F.count(F.lit(1)).cast("long").alias("df_shard"))
    )
    g = index.term_stats.where(F.col("term").isin(probe)).select(
        "term", F.col("df").cast("long").alias("df_global")
    )
    return (
        sh.join(F.broadcast(g), "term")
        .select(
            "term",
            "shard",
            "df_shard",
            "df_global",
            F.floor(
                F.col("df_shard") * F.lit(1_000_000) * F.lit(int(n_shards))
                / F.col("df_global")
            )
            .cast("long")
            .alias("skew_scaled"),
        )
        .orderBy("term", "shard")
    )


def segments_report(index: Index, shard_width: int) -> DataFrame:
    """Per-segment index introspection — the Solr ``/admin/segments``
    analog (per-Lucene-segment doc/term/size accounting on the stored
    core the reference manages; the whole-core roll-up is
    :func:`luke_report`). Segments here are the store's doc-id range
    shards (``shard = doc_id // shard_width`` — the exact layout rule
    of ``lifecycle.build_store``, lifecycle.py:146), so the report
    rows correspond 1:1 to on-disk ``shard=K`` directories.

    One row per shard::

        shard, n_docs, min_doc_id, max_doc_id, n_postings, n_terms,
        n_tokens, n_turns

    Plan shape: doc_meta contributes a narrow groupBy (|docs| rows,
    map-side combinable); postings contribute one groupBy(shard) for
    counts/sums plus a partial-distinct on (shard, term) for the
    per-segment vocabulary — each one shuffle of narrow rows, no
    payload bytes move. Both sides then meet in a |shards|-row join
    (broadcast). Nothing is collected; at 10^12 docs the report is
    still |shards| rows.
    """
    if shard_width <= 0:
        raise ValueError(f"shard_width must be positive: {shard_width}")
    shard = lambda c: F.expr(f"div({c}, {int(shard_width)})").cast("int")  # noqa: E731
    dm = index.doc_meta.groupBy(shard("doc_id").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.sum("n_turns").cast("long").alias("n_turns"),
    )
    p = index.postings.select(shard("doc_id").alias("shard"), "term", "tf")
    pg = p.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.sum("tf").cast("long").alias("n_tokens"),
    )
    tg = (
        p.select("shard", "term")
        .distinct()
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    )
    return (
        dm.join(F.broadcast(pg), "shard", "left")
        .join(F.broadcast(tg), "shard", "left")
        .select(
            "shard",
            "n_docs",
            "min_doc_id",
            "max_doc_id",
            F.coalesce("n_postings", F.lit(0)).cast("long").alias("n_postings"),
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "n_turns",
        )
        .orderBy("shard")
    )
