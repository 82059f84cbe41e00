"""End-to-end training-corpus export: the pipeline the pipeline ops
exist for.

A pretraining data pipeline is not a bag of operators — it is one
composition applied corpus-wide: drop duplicate families down to a
canonical survivor, gate on quality and language, then carve the
survivors into train/val/test. :func:`corpus_export` is that
composition over the engine's own tested operators (dedup.dup_clusters,
textstats.quality_score / lang_id, split.hash_split), kept as a single
declarative plan so Catalyst sees the whole thing:

- the keep-one gate is a LEFT SEMI join against the canonical set
  (never materializes the non-survivors);
- quality and language come from ONE fused projection over ONE
  tokenization pass (textstats.text_profile) and gate as plain
  filters — no join between them, and the volume shrinks before the
  semi-join;
- split assignment is the last map-only pass over what's left.

Every stage is engine-portable md5 arithmetic or plain column algebra,
so a DuckDB oracle replays the full composition bit-for-bit — the
whole export, not just its pieces, is correctness-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import text_profile
from .dedup import dup_clusters, shingles
from .split import hash_split


def corpus_export(
    docs: DataFrame,
    pairs: DataFrame,
    min_quality: float = 0.5,
    lang: str = "en",
    weights: dict[str, float] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Export-ready corpus rows: (doc_id, quality, lang_pred, split)
    for every document that (a) is its duplicate family's canonical
    representative under the ``pairs`` near-dup graph, (b) scores at
    least ``min_quality``, and (c) is identified as ``lang``. ``split``
    follows :func:`~.split.hash_split` (default 90/5/5).

    Deterministic end to end: components pick min doc_id, quality and
    lang are pure column algebra with fixed tie orders, and the split
    is content-addressed — reruns, resumes, and engine swaps reproduce
    the identical export."""
    if not 0.0 <= min_quality <= 1.0:
        raise ValueError(f"min_quality must be in [0, 1], got {min_quality}")
    reps = (
        dup_clusters(docs.select("doc_id"), pairs)
        .where(F.col("is_canonical"))
        .select("doc_id")
    )
    # ONE fused projection computes quality and language from a single
    # tokenization pass (functions/textstats.text_profile) — the gates
    # are filters on it, not separate operators joined back together.
    gated = text_profile(docs, text_col).where(
        (F.col("quality") >= F.lit(float(min_quality)))
        & (F.col("lang_pred") == lang)
    )
    kept = gated.join(reps, "doc_id", "left_semi")
    return hash_split(kept, weights).select(
        "doc_id", "quality", "lang_pred", "split"
    )


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Eval-set decontamination — the n-gram overlap check every
    serious pretraining pipeline runs before training: a candidate
    document is CONTAMINATED if it shares at least one word n-gram
    with any held-out evaluation document (the GPT-3/PaLM-style
    13-gram rule; ``n`` is a knob because the right value tracks
    document length). Returns (doc_id, n_hits, contaminated) for every
    candidate doc — n_hits = how many DISTINCT eval n-grams it
    contains, 0 rows lost (clean docs report 0/false), so the output
    is a joinable audit column, not just a filter.

    Plan shape (the asymmetry IS the design): the eval side is small
    by definition — its distinct shingles build ONE broadcast set, and
    the corpus side is a map-only shingle explode semi-joined against
    that broadcast (a broadcast join, zero corpus shuffles). The
    per-doc hit count is the only aggregation and it is map-side
    combinable on doc_id. At 100 TB the cost is the corpus scan —
    exactly the floor — while an eval set of even millions of n-grams
    broadcasts in MBs.

    Shingling reuses :func:`~.dedup.shingles` (distinct word n-grams,
    the oracle-checked definition the dedup family uses)."""
    if n < 1:
        raise ValueError(f"n-gram order must be >= 1, got {n}")
    ev = (
        shingles(eval_docs, n, text_col)
        .select("shingle")
        .distinct()
    )
    hits = (
        shingles(docs, n, text_col)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


BLOOM_M = 1 << 16  # bits in the filter (1024 64-bit words)
BLOOM_H = 4        # hash functions per key


def _bloom_positions(col, h: int = BLOOM_H, m: int = BLOOM_M):
    """The h md5-derived bit positions of a key — engine-portable
    (Spark conv/md5 == DuckDB '0x'||substr(md5)): position_i =
    int(md5(f"{i}:{key}")[:15 hex], 16) mod m."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(h - 1)),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(i.cast("string"), F.lit(":"), col)), 1, 15
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ),
    )


def bloom_contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    m: int = BLOOM_M,
    h: int = BLOOM_H,
) -> DataFrame:
    """:func:`contamination_flags` with the eval side digested into a
    **Bloom bitmap** instead of a broadcast shingle set — the variant a
    pipeline needs when the reference key set is too big to broadcast
    raw (dedup against a 10^10-document registry, seen-URL filtering):
    driver and broadcast traffic are bounded by ``m`` BITS by
    construction, independent of the eval corpus size, at the price of
    a quantified false-positive rate (~(1-e^{-h·k/m})^h).

    Build: eval shingles -> h md5-derived bit positions each ->
    DISTINCT (at most m values cross the wire) -> an m-bit bitmap
    packed into m/64 longs. Probe: map-only whole-stage codegen — each
    corpus shingle recomputes its h positions and tests the bitmap
    with element_at + bitwiseAND; a shingle is bloom-positive iff all
    h bits are set. No join at all on the corpus side (the broadcast
    n-gram variant still pays a broadcast-hash probe per shingle).

    Fully oracle-replayable INCLUDING false positives: the bitmap's
    set-bit set is pure md5 arithmetic, so the DuckDB twin recomputes
    it relationally (position ∈ set-bits for all h) and must flag the
    exact same docs — the FP behavior is part of the checked contract,
    not noise. Returns (doc_id, n_bloom_hits, flagged) with
    n_bloom_hits = DISTINCT bloom-positive shingles (>= the exact
    variant's n_hits: Bloom has no false negatives).

    At this sandbox's scale the bitmap embeds as a literal array
    (m/64 = 1024 longs) inside the codegen probe; for a multi-GB
    filter the same plan swaps the literal for a Spark broadcast
    variable probed in an Arrow-batched kernel — the build side and
    the contract are unchanged.
    """
    if n < 1:
        raise ValueError(f"n-gram order must be >= 1, got {n}")
    if m % 64 or m < 64:
        raise ValueError(f"bloom bits m={m} must be a positive multiple of 64")
    ev_pos = (
        shingles(eval_docs, n, text_col)
        .select(F.explode(_bloom_positions(F.col("shingle"), h, m)).alias("pos"))
        .distinct()
    )
    # bounded by m values (<= 0.5 MB at the default m), NOT by |eval|
    words = [0] * (m // 64)
    for r in ev_pos.collect():
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # Spark LongType is signed; reinterpret the top bit
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bmap = F.array(*[F.lit(w) for w in words])
    # per-bit masks as a 64-long literal (shiftleft needs a literal
    # shift amount; an element_at lookup keeps the probe codegen)
    pow2 = F.array(
        *[
            F.lit(b - (1 << 64) if (b := 1 << i) >= (1 << 63) else b)
            for i in range(64)
        ]
    )
    member = F.forall(
        _bloom_positions(F.col("shingle"), h, m),
        lambda p: (
            F.element_at(bmap, (p / 64).cast("int") + 1).bitwiseAND(
                F.element_at(pow2, (p % 64).cast("int") + 1)
            )
        )
        != 0,
    )
    hits = (
        shingles(docs, n, text_col)
        .where(member)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bloom_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0).alias("flagged"),
        )
    )


def blocklist_profile(docs: DataFrame, blocklist: tuple[str, ...]) -> DataFrame:
    """C4-style token-blocklist gate ("bad words" filtering), as a
    per-source audit profile.

    C4 drops any page containing a blocklisted word; RefinedWeb and
    FineWeb keep the same gate with curated lists. Here: a doc is
    dropped when ANY of its tokens (the engine's standard [a-z0-9]+
    tokenization of lower(text)) appears in the list. Returns
    (source, n_docs, n_dropped, n_kept) ordered by source — the audit
    view; the pipeline filter is the same ``hit`` predicate inline
    (the domain_cap pattern for gates).

    Scale shape: the list is editorial (10^2-10^4 entries) — it lives
    in the plan as a literal array (or a broadcast join above ~10^4),
    so the gate is ONE narrow projection over the corpus scan:
    arrays_overlap(tokens, lit(list)) per doc, then a partial+final
    count per source. No shuffle wider than the (tiny) source-keyed
    aggregation; nothing row-at-a-time in Python.
    """
    toks = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    hit = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in blocklist]))
    return (
        docs.select("source", hit.alias("hit"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("hit").cast("long")).cast("long").alias("n_dropped"),
            (F.count(F.lit(1)) - F.sum(F.col("hit").cast("long")))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


def length_histogram(docs: DataFrame) -> DataFrame:
    """Token-length distribution per source, log2-bucketed — the
    curation dashboard every corpus build starts from (length cutoffs
    are the first Gopher/C4 gate, and the histogram is how their
    thresholds get picked). Returns (source, bucket, n_docs) with
    ``bucket = floor(log2(max(n_tokens, 1)))`` — bucket b covers
    [2^b, 2^(b+1)) tokens; empty docs land in bucket 0 with the
    1-token docs.

    Plan: ONE narrow projection (tokenize + size + log2 — all codegen)
    and one (source, bucket)-keyed partial+final count; output is
    sources x ~20 buckets, metadata-sized. log2 on integers is exact
    at bucket boundaries (powers of two are IEEE-exact), so the
    bucketing is engine-portable.
    """
    n = F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    bucket = F.floor(F.log2(F.greatest(n, F.lit(1)))).cast("int")
    return (
        docs.select("source", bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "bucket")
    )


def gopher_rules_profile(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    mean_len_lo: float = 3.0,
    mean_len_hi: float = 10.0,
    min_alpha_frac: float = 0.80,
    max_dup_line_frac: float = 0.30,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, table A1 — the filter
    set RefinedWeb/FineWeb inherit), as a per-source audit profile.

    Per doc, over the engine's standard [a-z0-9]+ tokens:
      word count in [min_words, max_words]; mean token length in
      [mean_len_lo, mean_len_hi]; fraction of tokens containing an
      alphabetic char >= min_alpha_frac; duplicate-line fraction
      (1 - distinct/total newline-split lines) <= max_dup_line_frac.
    ``keep`` = all rules pass. Returns (source, n_docs, n_kept,
    n_fail_word_count, n_fail_mean_len, n_fail_alpha, n_fail_dup_lines)
    ordered by source; fail counts are per-rule (a doc can fail
    several).

    Plan: ONE narrow projection computes every rule with array
    expressions (size / aggregate / filter / array_distinct — all
    JVM-side, no explode, no Python), then a source-keyed
    partial+final count. All ratios are exact-integer divisions, so
    rule booleans are engine-portable bit-for-bit.
    """
    toks = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n1
    )
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n1
    lines = F.split(F.col("text"), "\n")
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines)
    f_wc = ~n.between(min_words, max_words)
    f_ml = ~mean_len.between(mean_len_lo, mean_len_hi)
    f_al = alpha_frac < min_alpha_frac
    f_dl = dup_frac > max_dup_line_frac
    flagged = docs.select(
        "source",
        f_wc.alias("f_wc"),
        f_ml.alias("f_ml"),
        f_al.alias("f_al"),
        f_dl.alias("f_dl"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long")).cast("long")  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (~F.col("f_wc") & ~F.col("f_ml") & ~F.col("f_al") & ~F.col("f_dl"))
                .cast("long")
            )
            .cast("long")
            .alias("n_kept"),
            cnt("f_wc").alias("n_fail_word_count"),
            cnt("f_ml").alias("n_fail_mean_len"),
            cnt("f_al").alias("n_fail_alpha"),
            cnt("f_dl").alias("n_fail_dup_lines"),
        )
        .orderBy("source")
    )


def sft_pairs(turns: DataFrame, context_turns: int = 3) -> DataFrame:
    """Supervised-fine-tuning pair assembly over conversation turns —
    the op a transcripts corpus exists to feed: for every assistant
    turn, ``completion`` is that turn's text and ``prompt`` is the
    previous up-to-``context_turns`` turns rendered as ``role: text``
    lines joined with newlines.

    Input needs (conv_id, ordinal, role, text). Returns (conv_id,
    ordinal, prompt, completion) ordered by (conv_id, ordinal); an
    assistant turn with NO prior context (ordinal 0) yields an empty
    prompt (kept — dropping it is a downstream gate's choice).

    Scale shape: ONE hash partition by conv_id feeds a bounded
    ``rowsBetween(-K, -1)`` window — the prompt is assembled from at
    most K rows, so there is NO quadratic running-prefix concat (the
    naive unbounded-preceding formulation re-materializes the whole
    conversation per turn; at 10^4-turn convs that's the difference
    between O(n·K) and O(n²) bytes). The window's collect preserves
    frame order under the ordinal sort, so prompts are deterministic.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ordinal")
        .rowsBetween(-context_turns, -1)
    )
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    return (
        turns.withColumn(
            "prompt", F.array_join(F.collect_list(line).over(w), "\n")
        )
        .where(F.col("role") == "assistant")
        .select("conv_id", "ordinal", "prompt", F.col("text").alias("completion"))
        .orderBy("conv_id", "ordinal")
    )


def dsir_importance(
    docs: DataFrame,
    target_source: str = "src1",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by how much more
    likely its hashed n-gram features are under a TARGET (in-domain)
    unigram bag model than under the RAW corpus model. Selection is
    then top-k / Gumbel resampling by this weight; the deterministic
    log-importance-weight is the engine-portable core, so that is what
    this operator emits for every doc.

    Features: unigrams + bigrams of the standard ``[a-z0-9]+`` token
    stream, hashed into ``n_buckets`` buckets (md5 -> 60-bit int ->
    ``% n_buckets``). Models: add-``alpha`` smoothed bucket frequency
    models; the target sample is the docs with ``source ==
    target_source`` (a deterministic in-domain seed — in production a
    curated sample table plugs in here unchanged).

        weight(d) = sum_f  c_d(f) * [ log p_tgt(bucket(f))
                                      - log p_raw(bucket(f)) ]

    Output: (doc_id, dsir_logratio double rounded 6dp, n_feats long)
    for EVERY doc; feature-less docs report (0.0, 0).

    Scale shape (the reason DSIR is THE importance-sampling method
    that runs at web scale): both models are ``n_buckets``-row count
    vectors — the two aggregations are map-side partial combines whose
    outputs are metadata-sized regardless of corpus size; their
    log-ratio table broadcast-joins into the per-doc feature stream
    (hash computed JVM-side in whole-stage codegen, no Python), and
    the only corpus-scale exchange is the final doc_id-keyed sum.
    Nothing is ever collected to the driver.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    toks = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    tokenized = docs.select("doc_id", "source", toks.alias("toks"))
    grams = F.concat(
        F.col("toks"),
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN"
            " transform(sequence(1, size(toks) - 1),"
            "           i -> concat(toks[i - 1], ' ', toks[i]))"
            " ELSE array() END"
        ),
    )
    # feats feeds FOUR consumers (raw model, target model, the two
    # scalar totals' actions, and the per-doc scoring join) — pinned,
    # or the tokenize+md5 lineage re-runs for each (measured ~4
    # corpus passes). The pinned frame is (doc_id, source, bucket) per
    # feature — token-scale but narrow, and MEMORY_AND_DISK spills;
    # at 10^12 turns this is the one corpus-scale cache the operator
    # keeps, still cheaper than four tokenize passes.
    feats = tokenized.select(
        "doc_id",
        "source",
        F.explode(grams).alias("f"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 15), 16, 10)
            .cast("long")
            % n_buckets
        ).alias("bucket"),
    ).persist()
    raw = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("rc")
    )
    tgt = (
        feats.where(F.col("source") == target_source)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
    )
    # two scalars (exact ints, metadata-scale)
    tr = raw.agg(F.sum("rc")).first()[0] or 0
    tt = (
        tgt.agg(F.sum("tc")).first()[0] or 0
        if tr
        else 0
    )
    denom_t = float(tt) + alpha * n_buckets
    denom_r = float(tr) + alpha * n_buckets
    lr_tbl = raw.join(tgt, "bucket", "left").select(
        "bucket",
        (
            F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha)) / F.lit(denom_t))
            - F.log((F.col("rc") + F.lit(alpha)) / F.lit(denom_r))
        ).alias("lr"),
    )
    scored = (
        feats.join(F.broadcast(lr_tbl), "bucket")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("lr"), 6).alias("dsir_logratio"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dsir_logratio", F.lit(0.0)).alias("dsir_logratio"),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        )
    )


def ccnet_lm_buckets(docs: DataFrame) -> DataFrame:
    """CCNet's LM-quality routing stage: split the corpus into
    head / middle / tail terciles by per-token language-model
    negative log-likelihood (CCNet trains KenLM on Wikipedia and
    keeps the "head" third as highest-quality; the operator shape is
    the same with the engine's unigram LM, functions/lm.py).

    Bucketing is by VALUE threshold, not by global rank: the integer
    per-mille NLL key ``avg_key = floor(nll_scaled * 1000 /
    n_tokens)`` (exact integer arithmetic on both engines — no float
    ordering seam) gets discrete tercile cut values

        t1 = min key with 3 * cum_count >= n
        t2 = min key with 3 * cum_count >= 2n

    and every doc is routed by comparison: head (most fluent,
    key <= t1), middle (<= t2), tail, or empty (no tokens). Ties at a
    cut value share its bucket — quantile_disc semantics, so buckets
    are only approximately n/3 under heavy ties, exactly like
    thresholding on a trained corpus's quantiles in CCNet itself.

    Output: (doc_id, n_tokens, avg_key, bucket) for every doc.

    Scale shape: per-doc scores come from :func:`~..functions.lm.
    doc_nll` (broadcast LM, one doc-keyed agg); the threshold pass
    aggregates to |distinct keys| rows (thousands — per-mille NLL
    values, NOT docs) before its one metadata-scale ordered window,
    and the 1-row (t1, t2) frame broadcast-joins back for a map-only
    assignment. No corpus-wide window, no driver collect. The scores
    frame is persisted because BOTH the cut derivation and the final
    assignment consume it — without the pin Catalyst re-plans the
    full tokenize + LM lineage (two more corpus scans) under the
    cuts side of the join; the pinned frame is 3 numeric columns per
    doc, the cheapest of the two-pass options at corpus scale.
    """
    from pyspark.sql.window import Window

    from ..functions.lm import doc_nll

    scores = doc_nll(docs).select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("nll_scaled") * 1000 / F.col("n_tokens")),
        ).cast("long").alias("avg_key"),
    ).persist()
    keys = (
        scores.where(F.col("avg_key").isNotNull())
        .groupBy("avg_key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = keys.withColumn(
        "cum", F.sum("c").over(Window.orderBy("avg_key"))
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    cuts = cum.agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("avg_key"))).alias("t1"),
        F.min(F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("avg_key"))).alias(
            "t2"
        ),
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        F.coalesce("avg_key", F.lit(0)).cast("long").alias("avg_key"),
        F.when(F.col("avg_key").isNull(), F.lit("empty"))
        .when(F.col("avg_key") <= F.col("t1"), F.lit("head"))
        .when(F.col("avg_key") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def dsir_resample(
    docs: DataFrame,
    target_source: str = "src1",
    n: int = 50,
    seed: int = 41,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR's RESAMPLE step (Xie et al. 2023, §2.3): draw ``n`` docs
    without replacement with probability proportional to
    exp(importance weight) via the Gumbel-top-k trick — perturb each
    weight with an independent Gumbel(0,1) and take the top n:

        key = w + g,   g = -ln(-ln(u)),   u ~ Uniform(0,1)

    Determinism discipline: u = (md5-int60(seed:doc_id) + 1) /
    (2^60 + 1) — the md5-uniform both engines recompute bit-for-bit
    (the repo's standard seedless sampling trick); the one float seam
    is ln(), rounded away at 6 dp with doc_id breaking exact ties.

    Output (doc_id, key) ordered (key DESC, doc_id ASC) — the kept
    sample. Plan shape: the weights pass is :func:`dsir_importance`
    (bucket-dim broadcast, one doc-keyed sum); the perturb-and-take
    is a map-only expression + TakeOrderedAndProject(n) — selection
    never shuffles the corpus.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = dsir_importance(docs, target_source, n_buckets, alpha).select(
        "doc_id", "dsir_logratio"
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**60) + 1.0)
    key = F.round(F.col("dsir_logratio") + -F.log(-F.log(u)), 6)
    return (
        w.select("doc_id", key.alias("key"))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(n)
    )


def vocab_coverage(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design op a training
    pipeline runs before fixing a vocab size: rank terms by collection
    frequency and report, for each prefix of the ranking, the fraction
    of ALL token occurrences the top terms cover (OOV rate of a
    size-N vocab = 1 - coverage at N). The analysis tokenizer is the
    index's own ([a-z0-9]+ over lower(), functions/tokenizer.py) so
    the curve speaks for what the engine would actually index.

    Returns (rank, term, cf, coverage) for ranks 1..top_n, ordered by
    rank; coverage = round(cum_cf / total_tokens, 6), ties broken
    term ASC (deterministic on both engines — cum sums of exact
    BIGINTs, one final float divide).

    Plan shape at 100 TB: tokenize is map-side (explode + regexp —
    whole-stage codegen); ONE |vocab|-row hash aggregate with map-side
    combine; total is a scalar partial-agg reduction (broadcast back
    via crossJoin of a 1-row frame); the head is
    TakeOrderedAndProject(top_n) — the cumulative window then runs
    over top_n rows, never the vocab (cumsum at rank r only needs the
    rows ABOVE r, which the head already holds)."""
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    from pyspark.sql.window import Window

    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    total = cf.agg(F.sum("cf").alias("__total"))
    head = cf.orderBy(F.desc("cf"), F.asc("term")).limit(top_n)
    order = Window.orderBy(F.desc("cf"), F.asc("term"))
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    return (
        head.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(order).alias("rank"),
            "term",
            "cf",
            F.round(
                F.sum("cf").over(cum).cast("double") / F.col("__total"), 6
            ).alias("coverage"),
        )
        .orderBy("rank")
    )


def c4_rules_profile(
    docs: DataFrame,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning rules (Raffel et al. 2020 §2.2 — the
    other canonical web-corpus filter set next to Gopher's
    :func:`gopher_rules_profile`), as a per-source audit profile.

    C4 works at LINE granularity where Gopher works at token
    granularity: a line is retained iff it ends in a terminal
    punctuation mark (``. ! ? "``), contains at least
    ``min_line_words`` whitespace words, and does not contain the
    word "javascript" (case-insensitive). A document is kept iff it
    retains at least ``min_kept_lines`` lines, does not contain the
    phrase "lorem ipsum" (case-insensitive), and does not contain a
    curly brace ``{`` (the paper's code-leak tripwire).

    Returns (source, n_docs, n_kept, n_fail_few_lines, n_fail_lorem,
    n_fail_brace, kept_line_frac) ordered by source; fail counts are
    per-rule (a doc can fail several); ``kept_line_frac`` is the
    corpus-level retained-line ratio rounded to 6 dp (what fraction of
    the source's lines survive the line filter — exact BIGINT counts,
    one final divide, engine-portable).

    Plan: ONE narrow projection evaluates every rule with array
    lambda expressions (split / filter / size — JVM-side codegen, no
    explode, no Python), then a source-keyed partial+final count. At
    100 TB the exchange moves |sources| rows."""
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )
    n_lines = F.size(lines)
    n_kept_lines = F.size(kept)
    f_few = n_kept_lines < min_kept_lines
    f_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    f_brace = F.col("text").contains("{")
    flagged = docs.select(
        "source",
        n_lines.cast("long").alias("nl"),
        n_kept_lines.cast("long").alias("nk"),
        f_few.alias("f_few"),
        f_lorem.alias("f_lorem"),
        f_brace.alias("f_brace"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long")).cast("long")  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (~F.col("f_few") & ~F.col("f_lorem") & ~F.col("f_brace"))
                .cast("long")
            )
            .cast("long")
            .alias("n_kept"),
            cnt("f_few").alias("n_fail_few_lines"),
            cnt("f_lorem").alias("n_fail_lorem"),
            cnt("f_brace").alias("n_fail_brace"),
            F.round(
                F.sum("nk").cast("double") / F.sum("nl").cast("double"), 6
            ).alias("kept_line_frac"),
        )
        .orderBy("source")
    )


def quality_classifier(
    docs: DataFrame,
    n_buckets: int = 4096,
    bias: float = 0.0,
    seed: str = "qw",
) -> DataFrame:
    """Hashed-linear quality-classifier INFERENCE — the fastText /
    logistic-regression shape every production pipeline runs to score
    web documents (CCNet, FineWeb-Edu, Llama's wiki-reference
    classifier): a bag of hashed token features, a dense weight
    vector, one dot product, a sigmoid. The engine-portable core is
    the distributed inference pass; the weight VECTOR is a plug-in —
    here derived deterministically from md5 so tests and the DuckDB
    oracle replay bit-for-bit (a trained vector drops in as any
    |buckets|-row (bucket, w_int) table without touching the plan).

    Features: unigrams of the standard ``[a-z0-9]+`` stream, hashed
    to ``bucket = md5_60bit(term) % n_buckets`` (the
    :func:`dsir_importance` discipline). Weights: ``w_int(b) =
    md5_60bit("{seed}:{b}") % 2_000_001 - 1_000_000`` — an exact
    integer in [-1e6, 1e6] standing for a float in [-1, 1] at 1e-6
    resolution. The doc logit is

        z(d) = bias + (Σ_f w_int(bucket(f))) / (1e6 · n_feats(d))

    i.e. the MEAN feature weight (fastText averages input vectors) —
    the Σ is an exact BIGINT sum, so z is identical regardless of
    aggregation order on any engine. The logit is emitted
    INTEGER-SCALED (``logit_ppm = round_half_away(z * 1e6)``, computed
    in pure integer arithmetic — the ``functions/lm.py`` discipline:
    Spark's decimal HALF_UP round of a double and DuckDB's float
    round disagree exactly at 6-dp half boundaries, and an exact mean
    of integer weights LIVES on those boundaries). Returns (doc_id,
    n_feats, logit_ppm, prob) for EVERY doc — feature-less docs score
    (0, sigmoid(bias)); prob rounded to 6 dp.

    Scale shape: the weight table is ``n_buckets`` rows built from
    ``spark.range`` (metadata-sized, broadcast); hashing is JVM-side
    codegen; the only corpus-scale exchange is the doc_id-keyed
    integer sum. Nothing collects to the driver."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    spark = docs.sparkSession
    h60 = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    )
    weights = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (
            h60(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
            % 2_000_001
            - 1_000_000
        ).alias("w_int"),
    )
    toks = F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    feats = (
        docs.select("doc_id", F.explode(toks).alias("f"))
        .select("doc_id", (h60(F.col("f")) % n_buckets).alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("w_int").cast("long").alias("dot_int"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
        )
    )
    bias_ppm = int(round(float(bias) * 1_000_000))
    # round-half-away-from-zero of dot_int / n_feats in EXACT integer
    # arithmetic: sign * ((2|dot| + n) div (2n)) — both engines'
    # integer division agrees for the positive operands this builds
    ppm = F.lit(bias_ppm) + F.coalesce(
        F.when(F.col("dot_int") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
        * F.expr("(2 * abs(dot_int) + n_feats) div (2 * n_feats)"),
        F.lit(0).cast("long"),
    )
    z = ppm.cast("double") / F.lit(1_000_000.0)
    return (
        docs.select("doc_id")
        .join(feats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            ppm.cast("long").alias("logit_ppm"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("prob"),
        )
        .orderBy("doc_id")
    )


def source_overlap_matrix(docs: DataFrame, n: int = 3) -> DataFrame:
    """Cross-source n-gram overlap matrix — the corpus-level
    generalization of eval decontamination
    (:func:`contamination_flags`): for every unordered source pair,
    how many DISTINCT word n-grams the two sources share, and the
    Jaccard of their shingle sets. The audit a pipeline runs before
    treating sources as independent mixture components (near-copied
    sources inflate effective epochs exactly like within-source
    duplicates).

    Returns (src_a, src_b, n_a, n_b, n_shared, jaccard) for every
    pair src_a < src_b — zero-overlap pairs included with 0/0.0 —
    ordered (src_a, src_b). jaccard = n_shared / (n_a + n_b −
    n_shared): exact BIGINT counts, one final divide.

    Plan shape: shingling reuses the dedup family's oracle-checked
    definition; the distinct (source, shingle-hash) set is ONE
    aggregate (map-side combinable — the md5 hash keeps rows narrow);
    the pair join shuffles by hash, and a shingle shared by s sources
    expands to s(s−1)/2 pair rows — bounded by |sources|², never by
    corpus size; per-source set sizes (|sources| rows) broadcast onto
    the |sources|²-row result spine."""
    if n < 1:
        raise ValueError(f"n-gram order must be >= 1, got {n}")
    from .dedup import shingles

    src = docs.select("doc_id", "source")
    ss = (
        shingles(docs, n)
        .join(src, "doc_id")
        .select("source", F.md5("shingle").alias("h"))
        .distinct()
    )
    # every source rides the spine, INCLUDING shingle-less ones
    # (all-short docs): a source silently missing from the matrix
    # would read as "audited, independent" when it was never compared
    sizes = (
        docs.select("source")
        .distinct()
        .join(
            ss.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("n_sh")
            ),
            "source",
            "left",
        )
        .select("source", F.coalesce("n_sh", F.lit(0)).cast("long").alias("n_sh"))
    )
    a, b = ss.alias("a"), ss.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    spine = (
        sa.join(sb, F.col("sa.source") < F.col("sb.source"))
        .select(
            F.col("sa.source").alias("src_a"),
            F.col("sb.source").alias("src_b"),
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
        )
    )
    return (
        spine.join(shared, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            # two empty shingle sets: Jaccard is 0/0 — report 0.0
            F.when(
                (F.col("n_a") + F.col("n_b")) > F.coalesce("n_shared", F.lit(0)),
                F.round(
                    F.coalesce("n_shared", F.lit(0)).cast("double")
                    / (F.col("n_a") + F.col("n_b")
                       - F.coalesce("n_shared", F.lit(0))).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Snapshot diff between two corpus versions — the ingest-ops
    answer to "what actually changed before I pay for a rebuild":
    every doc_id is classified ``added`` / ``removed`` / ``changed``
    (present in both, content hash differs) / ``unchanged``. The
    reference's re-crawl loop implicitly recomputes this by re-posting
    every item (app/handler/indexer.go); diffing first is how the
    engine's incremental paths (merge_stream, append_ann_store) decide
    what to touch.

    Returns the 4-row summary (status, n_docs) ordered by status —
    content comparison is md5-hash equality, never text equality.

    Plan: ONE full outer join on doc_id of two (doc_id, md5) map-only
    projections, then a |4|-row aggregate with map-side combine. The
    join shuffles both hash tables once — at 100 TB both sides bucket
    by doc_id at rest (the lifecycle store layout), making this a
    co-located zipper, not an exchange."""
    oh = old.select(
        F.col("doc_id").alias("o_id"),
        F.md5(F.col(text_col).cast("binary")).alias("o_hash"),
    )
    nh = new.select(
        F.col("doc_id").alias("n_id"),
        F.md5(F.col(text_col).cast("binary")).alias("n_hash"),
    )
    j = oh.join(nh, F.col("o_id") == F.col("n_id"), "full_outer")
    status = (
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(F.col("o_hash") != F.col("n_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("status")
    )


def token_budget_plan(
    docs: DataFrame, budget_frac: float = 0.6, text_col: str = "text"
) -> DataFrame:
    """Token-budget mixture plan: given per-source token mass, a total
    training budget of ``budget_frac * corpus_tokens``, and
    temperature-0.5 source weights (w_d ∝ sqrt(tokens_d) — the
    multilingual-sampling p^α rule, α = 1/2, that upweights small
    sources without letting any dominate), emit the per-source plan a
    data loader executes: target token count, epochs over the source
    (epochs > 1 = upsampling), and the raw vs reweighted share.

    This is the planning half of the mixture pipeline (the execution
    half is mixture_sample / dsir_resample / epoch_schedule): a 100 TB
    run materializes exactly this table once per training config and
    drives every downstream sampler from it.

    Returns (source, n_docs, tokens, share, weight, target_tokens,
    epochs, upsampled) ordered by source; floats rounded 6dp.

    Plan: one source-keyed aggregate over token counts (the analyzer's
    [a-z0-9]+ rule — token_count's column expression), then a
    broadcast of the single-row corpus totals; everything after the
    aggregate is request-scale (|sources| rows). sqrt (not pow) on
    both engines: sqrt is IEEE correctly-rounded, so the oracle's
    doubles are bit-identical."""
    per_doc = docs.select(
        "source",
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
            )
        )
        .cast("long")
        .alias("n_tok"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )
    totals = per_src.agg(
        F.sum("tokens").cast("double").alias("total"),
        F.sum(F.sqrt(F.col("tokens").cast("double"))).alias("z"),
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(F.col("tokens") / F.col("total"), 6).alias("share"),
            F.round(
                F.sqrt(F.col("tokens").cast("double")) / F.col("z"), 6
            ).alias("weight"),
            F.round(
                F.lit(float(budget_frac))
                * F.col("total")
                * F.sqrt(F.col("tokens").cast("double"))
                / F.col("z")
            )
            .cast("long")
            .alias("target_tokens"),
            F.round(
                F.lit(float(budget_frac))
                * F.col("total")
                * F.sqrt(F.col("tokens").cast("double"))
                / F.col("z")
                / F.col("tokens"),
                6,
            ).alias("epochs"),
        )
        .withColumn(
            "upsampled", (F.col("epochs") > F.lit(1.0)).cast("int")
        )
        .orderBy("source")
    )


def span_corruption_plan(
    docs: DataFrame,
    noise_density: float = 0.15,
    mean_span_len: float = 3.0,
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption BUDGET plan: for each document, the
    sequence-length accounting the denoising data loader needs BEFORE
    it materializes masked examples — how many tokens will be
    corrupted, how many noise spans (and thus sentinel tokens) that
    makes at ``mean_span_len``, and the resulting encoder/decoder
    sequence lengths. These are T5's own formulas
    (t5.data.preprocessors.random_spans_helper): with n tokens,
    ``n_corrupt = clamp(round(n * density), 1, n - 1)`` and
    ``n_spans = max(1, round(n_corrupt / mean_span))``;
    inputs_len = n − n_corrupt + n_spans (+1 EOS),
    targets_len = n_corrupt + n_spans + 1. Batch packers
    (:func:`pack_sequences` upstream) size their bins from exactly
    this table; at 100 TB it is materialized once per (density, span)
    config.

    Documents shorter than 2 tokens cannot be corrupted (T5's helper
    skips them) — emitted with n_spans = 0 and untouched lengths.

    Pure integer/double column arithmetic over ONE token-count
    aggregate per row; round() is half-away-from-zero on both engines
    for positives, so the plan replays bit-identically in SQL.

    Returns (doc_id, n_tok, n_corrupt, n_spans, inputs_len,
    targets_len) ordered doc_id."""
    d, m = float(noise_density), float(mean_span_len)
    n = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
        )
    ).cast("long")
    base = docs.select("doc_id", n.alias("n_tok"))
    nc = F.least(
        F.greatest(F.round(F.col("n_tok") * F.lit(d)).cast("long"), F.lit(1)),
        F.col("n_tok") - F.lit(1),
    )
    corruptible = F.col("n_tok") >= 2
    plan = base.select(
        "doc_id",
        "n_tok",
        F.when(corruptible, nc).otherwise(F.lit(0)).cast("long").alias(
            "n_corrupt"
        ),
    ).select(
        "doc_id",
        "n_tok",
        "n_corrupt",
        F.when(
            F.col("n_corrupt") > 0,
            F.greatest(
                F.round(F.col("n_corrupt") / F.lit(m)).cast("long"), F.lit(1)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_spans"),
    )
    return plan.select(
        "doc_id",
        "n_tok",
        "n_corrupt",
        "n_spans",
        (F.col("n_tok") - F.col("n_corrupt") + F.col("n_spans") + F.lit(1))
        .cast("long")
        .alias("inputs_len"),
        F.when(
            F.col("n_spans") > 0,
            F.col("n_corrupt") + F.col("n_spans") + F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("targets_len"),
    ).orderBy("doc_id")
