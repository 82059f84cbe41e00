"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Every operator here is pure column expressions (whole-stage codegen,
zero UDFs) with an exact ANSI-SQL twin the DuckDB oracle runs — the
definitions are deliberately engine-neutral:

- token_count:  |regexp_extract_all(lower(text), '[a-z0-9]+')|
- quality:      length/alpha-ratio/stopword-ratio/mean-token-length
  combined into one bounded score (formula below, same in SQL).
- lang_id:      marker-stopword voting — per language, count tokens in
  its marker set; argmax with fixed tie order. (A real pipeline swaps
  in fastText et al; the *operator shape* — vote, argmax, confidence —
  is what scales.)
- fingerprint:  order-independent 40-bit-term-hash sum — md5-derived
  so Spark and DuckDB agree bit-for-bit; pair-collision-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# marker sets: small, disjoint, ASCII — the voting shape matters, not
# the linguistics (corpus text is synthetic; see oracle parity tests)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "que", "una"),
    "de": ("der", "die", "und", "das", "ein"),
}
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def _toks(text_col: str):
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars): whitespace/alnum token count."""
    return docs.select(
        "doc_id",
        F.size(_toks(text_col)).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def _ratio_cols(text_col: str, toks) -> list:
    """The three rounded quality ratios as named Columns, from an
    ALREADY-BUILT toks expression (so fused callers tokenize once)."""
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""))
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return [
        F.round(alpha / F.greatest(F.length(text_col), F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
        F.round(stops / F.greatest(n_tok, F.lit(1)), 6).alias("stop_ratio"),
        F.round(tok_chars / F.greatest(n_tok, F.lit(1)), 6).alias("mean_tok_len"),
    ]


def _quality_col():
    """quality over the ROUNDED named ratio columns (the oracle does
    the same) — composes after any projection that produced them.
    Built lazily: Column construction needs an active SparkContext,
    so a module-level constant would break plain imports."""
    return F.round(
        F.lit(0.4) * F.col("alpha_ratio")
        + F.lit(0.3) * F.least(F.col("stop_ratio") * 4, F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("mean_tok_len") / 8, F.lit(1.0)),
        6,
    )


def _vote_cols(toks) -> list:
    """Per-language marker-vote counts as named Columns (v_<lang>)."""
    return [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"v_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]


def _lang_pred():
    """argmax over the v_<lang> columns with fixed tie order (vote
    desc, then language code asc; 'und' = no votes)."""
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"v_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lg in langs:  # asc code order -> deterministic ties
        pred = pred.when(F.col(f"v_{lg}") == best, F.lit(lg))
    return pred, best


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, alpha_ratio, stop_ratio, mean_tok_len, quality).

    quality = 0.4·alpha_ratio + 0.3·min(stop_ratio·4, 1)
            + 0.3·min(mean_tok_len/8, 1)
    — rewards alphabetic text, natural stopword density, and healthy
    word lengths; bounded to [0,1]. (The reference's analog is its
    empty/garbage-page skipping, app/handler/indexer.go:102,123.)
    """
    d = docs.select("doc_id", *_ratio_cols(text_col, _toks(text_col)))
    return d.withColumn("quality", _quality_col())


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_votes): marker-stopword argmax with
    deterministic tie order (vote desc, then language code asc;
    'und' = no votes)."""
    d = docs.select("doc_id", *_vote_cols(_toks(text_col)))
    pred, best = _lang_pred()
    return d.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_votes"),
    )


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality, lang_pred): the fused corpus-gating map stage
    — quality and language from ONE projection over ONE materialized
    toks column. Two separate operators joined on doc_id would run the
    regex tokenization (the dominant per-doc map cost) twice AND pay a
    join; here the toks attribute is referenced by every derived
    column, and Catalyst keeps non-cheap multiply-referenced aliases
    un-inlined (CollapseProject cost gate), so the extraction runs
    once per row. Values are identical to quality_score / lang_id
    (parity-tested)."""
    d = docs.select(
        "doc_id",
        F.col(text_col).alias("_text"),
        _toks(text_col).alias("toks"),
    )
    d = d.select(
        "doc_id",
        *_ratio_cols("_text", F.col("toks")),
        *_vote_cols(F.col("toks")),
    )
    pred, _ = _lang_pred()
    return d.select(
        "doc_id", _quality_col().alias("quality"), pred.alias("lang_pred")
    )


def _gram_expr(toks_col: str, n: int):
    """n-gram array over an ALREADY-projected toks column, as a column
    expression (0-based Spark array indexing). Guarded: fewer than n
    tokens -> empty array (``sequence(0, negative)`` would descend)."""
    if n == 1:
        return F.col(toks_col)
    parts = ", ".join(f"{toks_col}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {n} THEN "
        f"transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def repetition_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, distinct_frac, top2gram_frac, top3gram_frac): Gopher-
    style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models", table A1 — the "fraction in most common n-gram"
    family), token-count flavored:

    - distinct_frac   = |distinct tokens| / |tokens|  (low => loopy)
    - top{n}gram_frac = occurrences of the single most frequent n-gram
                        / total n-gram occurrences, n in {2, 3}

    Plan shape (scale audit): one projection builds 1/2/3-gram arrays
    from ONE tokenization, a narrow union of three explodes feeds ONE
    (doc_id, n, gram) hash aggregation (map-side combinable — the same
    shape as the posting build's tf aggregation), then a second tiny
    (doc_id) aggregation folds the three metrics with conditional
    aggregates. No UDFs, no joins; docs with zero tokens produce no
    rows (same in the SQL twin).
    """
    d = docs.select("doc_id", _toks(text_col).alias("toks"))
    frames = [
        d.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(_gram_expr("toks", n)).alias("gram"),
        )
        for n in (1, 2, 3)
    ]
    u = frames[0].unionAll(frames[1]).unionAll(frames[2])
    cnt = u.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c")).otherwise(0)).alias("tot1"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("d1"),
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("m2"),
        F.sum(F.when(F.col("n") == 2, F.col("c")).otherwise(0)).alias("tot2"),
        F.max(F.when(F.col("n") == 3, F.col("c"))).alias("m3"),
        F.sum(F.when(F.col("n") == 3, F.col("c")).otherwise(0)).alias("tot3"),
    )
    return per.select(
        "doc_id",
        F.round(F.col("d1") / F.greatest(F.col("tot1"), F.lit(1)), 6).alias(
            "distinct_frac"
        ),
        F.round(
            F.coalesce(F.col("m2"), F.lit(0)) / F.greatest(F.col("tot2"), F.lit(1)),
            6,
        ).alias("top2gram_frac"),
        F.round(
            F.coalesce(F.col("m3"), F.lit(0)) / F.greatest(F.col("tot3"), F.lit(1)),
            6,
        ).alias("top3gram_frac"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): order-independent content fingerprint — sum over
    token occurrences of the 40-bit md5 prefix of ``term:position``.
    Collision-resistant enough to detect content drift; bit-equal
    across engines (md5 discipline)."""
    toks = _toks(text_col)
    d = docs.select("doc_id", F.posexplode(toks).alias("pos", "term"))
    th = F.conv(
        F.substring(F.md5(F.concat_ws(":", "term", "pos").cast("binary")), 1, 10),
        16,
        10,
    ).cast("long")
    return d.groupBy("doc_id").agg(F.sum(th).cast("long").alias("fp"))


# GPT-2-style pre-tokenizer split, ASCII form: contractions, letter
# runs, 1-3 digit groups (the cl100k digit rule), punctuation runs,
# residual whitespace. Uses only the Java-RE2 dialect intersection
# (non-capturing groups, classes, bounded repeats on classes) so Spark
# rlike/regexp_extract_all and DuckDB regexp_extract_all tokenize
# identically; both engines use Perl leftmost-first alternation.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s']+|\s+|'"


def token_count_bpe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_pieces, n_tokens, pieces_per_token): BPE-ish subword
    piece count next to the word count — the number a training
    pipeline actually budgets by (sequence packing, mixture weights,
    per-token pricing are all in TOKENIZER pieces, not words). A real
    pipeline asks its BPE vocab; the *operator shape* — one regex
    split per doc, map-only, corpus-scan cost — is identical, and the
    GPT-2 pre-tokenizer split rule used here is the standard public
    approximation (pieces >= words; punctuation and digit groups split
    out; contractions split).

    Engine-portable: the same ``BPE_RE`` runs under Spark (Java regex)
    and the DuckDB oracle (RE2); whitespace-only matches are dropped
    on both sides (GPT-2 folds the leading space into the following
    piece, so residual \\s+ runs are separators, not pieces)."""
    # column-native construction (no F.expr): the pattern contains a
    # quote and backslash class, which SQL-string parsing would mangle
    pieces = F.filter(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), F.lit(0)),
        lambda p: F.trim(p) != "",
    )
    toks = _toks(text_col)
    return docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_pieces"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(
            F.size(toks) > 0,
            F.round(F.size(pieces) / F.size(toks), 6),
        ).alias("pieces_per_token"),
    )


def ngram_diversity(docs, n_max: int = 3, text_col: str = "text"):
    """Per-source n-gram diversity profile — distinct-n (Li et al.
    2016's distinct-1/2, the standard template/mode-collapse tripwire
    for generated corpora): for n = 1..n_max, the fraction of the
    source's n-gram OCCURRENCES that are distinct. A source of
    templated text shows high volume but low distinct-2/3; dedup
    misses it when the boilerplate varies a slot.

    Returns (source, n, n_grams, n_distinct, diversity) ordered
    (source, n); diversity = round(n_distinct / n_grams, 6), exact
    BIGINT counts, one divide; sources with no n-grams at order n are
    omitted (no 0/0 row).

    Plan: ONE corpus scan and ONE tokenize feed all orders — the
    per-row projection builds an array of (n, grams) structs from the
    same ``toks`` column and a double explode flattens it, so the
    regexp runs once per row, not once per order; counts are
    (source, n)-keyed aggregates with map-side combine and the
    exchange moves |sources|·n_max rows (plus the countDistinct's
    per-key combine)."""
    from pyspark.sql import functions as F

    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    toks = docs.select(
        "source",
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("toks"),
    )

    def grams_of(n: int):
        idx_seq = F.when(
            F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx_seq, lambda i: F.array_join(F.slice("toks", i + 1, n), " ")
        )

    per_order = F.array(
        *[
            F.struct(F.lit(n).alias("n"), grams_of(n).alias("gs"))
            for n in range(1, n_max + 1)
        ]
    )
    out = (
        toks.select("source", F.explode(per_order).alias("ng"))
        .select("source", F.col("ng.n").alias("n"), F.explode("ng.gs").alias("g"))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.countDistinct("g").cast("long").alias("n_distinct"),
        )
    )
    return out.select(
        "source",
        "n",
        "n_grams",
        "n_distinct",
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"),
            6,
        ).alias("diversity"),
    ).orderBy("source", "n")


def tokenizer_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source tokenizer fertility profile — the compression-rate
    dashboard a training pipeline reads before fixing its data
    mixture: fertility (pieces per word) and bytes-per-piece tell you
    which sources tokenize efficiently under the vocab and which
    sources burn sequence budget (high-fertility sources are usually
    code, tables, or the wrong language for the vocab).

    Returns one row per source:
      (source, n_docs, n_words, n_pieces, n_bytes,
       fertility_scaled, bytes_per_piece_scaled)
    ordered source ASC, with fertility_scaled =
    floor(1e6 * n_pieces / n_words) and bytes_per_piece_scaled =
    floor(1e6 * n_bytes / n_pieces) — exact BIGINT arithmetic on
    exact BIGINT sums (0 when the denominator is 0). Words are the
    build tokenizer's [a-z0-9]+ runs; pieces the GPT-2-style
    ``BPE_RE`` split (token_count_bpe); bytes ``octet_length(text)``.

    Plan: map-only per-doc counting (two regexp_extract_all in one
    projection, whole-stage codegen) then ONE |sources|-row aggregate
    with map-side combine — corpus-scan cost, zero joins, the scan
    reads only (source, text)."""
    pieces = F.filter(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), F.lit(0)),
        lambda p: F.trim(p) != "",
    )
    per_doc = docs.select(
        "source",
        F.size(_toks(text_col)).cast("long").alias("w"),
        F.size(pieces).cast("long").alias("p"),
        F.coalesce(F.octet_length(text_col).cast("long"), F.lit(0)).alias("b"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("p").cast("long").alias("n_pieces"),
        F.sum("b").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_pieces",
        "n_bytes",
        F.when(
            F.col("n_words") > 0,
            F.floor(F.col("n_pieces") * F.lit(1_000_000) / F.col("n_words")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fertility_scaled"),
        F.when(
            F.col("n_pieces") > 0,
            F.floor(F.col("n_bytes") * F.lit(1_000_000) / F.col("n_pieces")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_per_piece_scaled"),
    ).orderBy("source")


CODE_KEYWORDS = (
    "def", "return", "import", "class", "function", "var", "const",
    "void", "lambda", "struct",
)
_CODE_KW_RE = r"\b(" + "|".join(CODE_KEYWORDS) + r")\b"
CODE_SYMBOL_RE = r"[{}()\[\];=<>]"
CODE_SYMBOL_THRESHOLD_SCALED = 20_000  # 2% of chars
CODE_KW_THRESHOLD = 3


def code_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc code-likeness profile — the code-vs-prose router every
    mixed web corpus needs before choosing a tokenizer/filter stack
    (StarCoder/The-Stack pipelines gate on exactly these surface
    signals when no path/extension metadata survives).

    Signals (all engine-portable regex counts, whole-stage codegen):
      n_symbols     — occurrences of ``[{}()[];=<>]``
      n_kw          — word-boundary hits of a 10-keyword code list
                      (lowered text)
      n_camel       — lower→upper transitions in the RAW text
                      (camelCase identifiers; casefolding would
                      destroy the signal, so this one reads raw)
    plus ``symbol_ratio_scaled = floor(1e6 * n_symbols / n_chars)``
    and the routing flag
    ``is_code = symbol_ratio_scaled >= 20_000 OR n_kw >= 3`` — both
    selection boundaries are integer comparisons.

    Returns (doc_id, n_chars, n_symbols, n_kw, n_camel,
    symbol_ratio_scaled, is_code) — map-only, one scan, zero joins."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(raw)
    n_chars = F.length(raw).cast("long")
    n_symbols = F.size(
        F.regexp_extract_all(low, F.lit(CODE_SYMBOL_RE), F.lit(0))
    ).cast("long")
    n_kw = F.size(
        F.regexp_extract_all(low, F.lit(_CODE_KW_RE), F.lit(0))
    ).cast("long")
    n_camel = F.size(
        F.regexp_extract_all(raw, F.lit(r"[a-z][A-Z]"), F.lit(0))
    ).cast("long")
    ratio = (
        F.when(n_chars > 0, F.floor(n_symbols * F.lit(1_000_000) / n_chars))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_symbols.alias("n_symbols"),
        n_kw.alias("n_kw"),
        n_camel.alias("n_camel"),
        ratio.alias("symbol_ratio_scaled"),
        (
            (ratio >= F.lit(CODE_SYMBOL_THRESHOLD_SCALED))
            | (n_kw >= F.lit(CODE_KW_THRESHOLD))
        )
        .cast("int")
        .alias("is_code"),
    )


def collocations(
    docs: DataFrame, min_count: int = 5, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI — the corpus-analysis
    view behind phrase mining / vocab extension (which two-word units
    deserve a merged token). PMI = ln(p(ab) / (p(a)p(b))); with the
    bigram total constant across candidates the RANKING reduces to
    the integer rational ``c_ab * N_uni² / (c_a * c_b)`` — computed
    as exact BIGINT integer division (Spark ``div`` == DuckDB ``//``)
    so the selection/order boundary never touches a float. Bigrams do
    not cross document boundaries.

    Returns (t1, t2, c_ab, pmi_scaled) ordered pmi_scaled DESC,
    t1 ASC, t2 ASC, top k, over bigrams with ``c_ab >= min_count``.

    Plan: ONE tokenize feeds both aggregates (unigram counts and
    shifted-zip bigram counts — map-side combinable); the |vocab|-row
    unigram dictionary broadcasts onto the bigram table twice; the
    corpus total is a 1-row cross join. No corpus-sized shuffle: the
    exchanges move |vocab| and |distinct bigram| rows."""
    toked = docs.select(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("toks")
    ).persist()
    tok = toked.select(F.explode("toks").alias("term"))
    uni = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_uni = tok.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # guard docs with < 2 tokens: sequence(1, 0) would DESCEND, not
    # empty (the shingles() lesson)
    pair_idx = F.when(
        F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = (
        toked.select(
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at(F.col("toks"), i).alias("t1"),
                        F.element_at(F.col("toks"), i + 1).alias("t2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= F.lit(int(min_count)))
    )
    u1 = uni.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("t2"), F.col("c").alias("c2"))
    return (
        bi.join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(n_uni))
        .select(
            "t1",
            "t2",
            "c_ab",
            F.expr("(c_ab * n * n) div (c1 * c2)").alias("pmi_scaled"),
        )
        .orderBy(F.desc("pmi_scaled"), F.asc("t1"), F.asc("t2"))
        .limit(k)
    )


def bpe_merge_candidates(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """The first round of BPE vocabulary induction (Sennrich et al.
    2016): the corpus's most frequent ADJACENT CHARACTER pairs,
    weighted by word frequency — exactly the statistic the merge loop
    greedily consumes. One round is the operator shape; the full train
    loop is this op re-run over re-segmented text.

    Returns (c1, c2, n) ordered n DESC, c1 ASC, c2 ASC, top ``k``,
    with exact BIGINT counts.

    Plan: tokenize → ONE |vocab|-row word-frequency aggregate (the
    classic BPE trick: pair counts explode over DISTINCT words
    weighted by count, not over every token occurrence — at 10^12
    tokens the distinct-word dim is millions, not trillions) → per-word
    char-pair explode (map-side over vocab-sized input) → ONE pair
    aggregate → TakeOrderedAndProject(k)."""
    words = (
        docs.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    chars = words.select(
        "wc", F.expr("regexp_extract_all(w, '.', 0)").alias("cs")
    )
    pair_idx = F.when(
        F.size("cs") >= 2, F.sequence(F.lit(1), F.size("cs") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = chars.select(
        "wc",
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.struct(
                    F.element_at(F.col("cs"), i).alias("c1"),
                    F.element_at(F.col("cs"), i + 1).alias("c2"),
                ),
            )
        ).alias("p"),
    ).select("p.c1", "p.c2", "wc")
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("c1"), F.asc("c2"))
        .limit(k)
    )


def term_drift(
    docs: DataFrame,
    source_a: str,
    source_b: str,
    k: int = 15,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus drift / register comparison — smoothed log-odds term
    association (the "Fightin' Words" family, Monroe et al. 2008,
    simplified to the odds-ratio point estimate): the terms most
    over-represented in ``source_a`` relative to ``source_b``. The
    dashboard a data-mixture owner reads when two snapshots or two
    providers "feel different": which vocabulary moved.

    The RANKING is the integer rational

        drift_scaled = ((c_a+1)·(N_b+V)·1e6) div ((c_b+1)·(N_a+V))

    — the +1/(N+V) Laplace-smoothed odds ratio with ln dropped
    (monotone), computed as exact BIGINT products and integer
    division on both engines. Returns (term, c_a, c_b, drift_scaled)
    ordered drift DESC, term ASC, top ``k``.

    Plan: ONE scan of the two sources' rows (pushed isin filter), ONE
    term-keyed conditional aggregate (map-side combinable), two 1-row
    total aggregates cross-joined — no corpus-wide shuffle beyond the
    |vocab| exchange."""
    tok = docs.where(F.col(source_col).isin(source_a, source_b)).select(
        F.col(source_col).alias("src"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    counts = tok.groupBy("term").agg(
        F.sum((F.col("src") == source_a).cast("long")).alias("c_a"),
        F.sum((F.col("src") == source_b).cast("long")).alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count(F.lit(1)).alias("v"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "c_a",
            "c_b",
            F.expr(
                "((c_a + 1) * (n_b + v) * 1000000) div ((c_b + 1) * (n_a + v))"
            ).alias("drift_scaled"),
        )
        .orderBy(F.desc("drift_scaled"), F.asc("term"))
        .limit(k)
    )


def vocab_growth(docs: DataFrame, n_steps: int = 10) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-term count and
    token count after each 1/``n_steps`` prefix of the corpus in
    doc_id order — the table that calibrates V ≈ K·Nᵝ and tells a
    tokenizer-training pipeline how much corpus buys how much
    vocabulary.

    The cumulative-distinct trick keeps this ONE aggregate instead of
    ``n_steps`` corpus scans: a term's contribution to every prefix is
    fully determined by its FIRST occurrence doc (min doc_id per
    term), so vocab@c = |{terms: first_doc < c}| — a histogram over
    first-occurrence docs — and tokens@c is the same conditional sum
    over per-doc token counts. Both sides of the oracle compute the
    checkpoint cuts with the same integer ceil ((n·j + s−1) div s).

    Returns (step, pct, n_docs_prefix, n_tokens, vocab_size) ordered
    step. Plan: one term aggregate (min first doc) + one doc
    aggregate, folded into a single spine of n_steps conditional
    sums — request-scale after the two aggregates."""
    n = docs.count()
    s = int(n_steps)
    cuts = [(j, (n * j + s - 1) // s) for j in range(1, s + 1)]
    toks = _toks("text")
    tok = docs.select("doc_id", F.explode(toks).alias("term"))
    first = tok.groupBy("term").agg(F.min("doc_id").alias("fd"))
    vocab = first.agg(
        *[
            F.sum((F.col("fd") < F.lit(c)).cast("long")).alias(f"v{j}")
            for j, c in cuts
        ]
    )
    ntok = docs.select("doc_id", F.size(toks).cast("long").alias("nt")).agg(
        *[
            F.sum(F.when(F.col("doc_id") < F.lit(c), F.col("nt"))).alias(
                f"t{j}"
            )
            for j, c in cuts
        ]
    )
    spark = docs.sparkSession
    spine = spark.createDataFrame(
        [(j, j * 100 // s, c) for j, c in cuts],
        "step int, pct int, n_docs_prefix long",
    )
    wide = spine.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(ntok))
    tcol = F.when(F.col("step") == 1, F.col("t1"))
    vcol = F.when(F.col("step") == 1, F.col("v1"))
    for j, _ in cuts[1:]:
        tcol = tcol.when(F.col("step") == j, F.col(f"t{j}"))
        vcol = vcol.when(F.col("step") == j, F.col(f"v{j}"))
    return wide.select(
        "step",
        "pct",
        "n_docs_prefix",
        F.coalesce(tcol, F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(vcol, F.lit(0)).cast("long").alias("vocab_size"),
    ).orderBy("step")
