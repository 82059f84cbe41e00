"""Deterministic dataset splitting and sampling.

A training-data pipeline's last step before the trainer: carve the
corpus into train/val/test and draw reproducible subsamples. Both are
content-addressed — the assignment is a pure function of the row's id,
never of partitioning, row order, cluster size, or a wall-clock seed:

- rerunning the pipeline (or resuming a failed run) re-derives the
  SAME split, so eval rows can never leak into train between runs;
- adding documents later never reshuffles existing assignments
  (each doc's fate depends only on its own id);
- the DuckDB oracle replays assignments bit-for-bit.

Hash discipline (same as operators/dedup.py): md5 of the id's utf-8
string, first 15 hex digits as a 60-bit integer — Spark ``F.md5`` ==
DuckDB ``md5`` on the same bytes, and 60 bits stays exact in a BIGINT
on both engines. The unit uniform is ``h / 16^15``; both engines
compute the identical IEEE double, so threshold comparisons can never
disagree.

Everything is whole-stage-codegen column expressions — no UDF, no
shuffle: split assignment is a map-only pass at any scale, and the
per-split counts are one map-side-combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 15          # 60 bits: exact in BIGINT and in double's 53+ window
_DENOM = float(16 ** _HEX_DIGITS)


def unit_hash(id_col: Column) -> Column:
    """Uniform-in-[0,1) hash of an id column: md5 of the utf-8 string,
    first 15 hex digits / 16^15. Pure codegen, engine-portable."""
    h = F.conv(F.substring(F.md5(id_col.cast("string").cast("binary")), 1, _HEX_DIGITS), 16, 10)
    return h.cast("long") / F.lit(_DENOM)


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a split label by its id hash: ``weights`` maps
    label -> fraction (must sum to ~1; insertion order defines the
    threshold ladder, so spell it the same way in the oracle). Adds a
    ``split`` column.

    The default 90/5/5 train/val/test mirrors the common pretraining
    carve. No shuffle: the CASE ladder is a map-only projection.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = unit_hash(F.col(id_col))
    labels = list(weights)
    expr = F.lit(labels[-1])  # the last bucket absorbs the open end
    # Accumulate thresholds in DECIMAL (Fraction of the repr string),
    # not binary floats: 0.9 + 0.05 in doubles is 0.9500000000000001,
    # one ulp above the literal 0.95 an oracle SQL spells — enough for
    # a hairline hash to land on different sides of the fence. The
    # Fraction sum then rounds to the SAME double as the SQL literal.
    from fractions import Fraction

    acc = Fraction(0)
    ladder = []
    for name in labels[:-1]:
        acc += Fraction(repr(weights[name]))
        ladder.append((name, float(acc)))
    for name, hi in reversed(ladder):
        expr = F.when(u < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def deterministic_sample(
    docs: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Reproducible ``fraction`` subsample by id hash — unlike
    ``DataFrame.sample`` (partition-dependent RNG), membership is a
    pure function of the id: stable across reruns, cluster sizes, and
    engines, and monotone (a 1% sample is a subset of the 10% sample,
    so scaling-law subsets nest)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # identity, guaranteed: a 60-bit hash within 63 ulps of 2^60
        # rounds to exactly 1.0 in double, which `u < 1.0` would drop
        return docs
    return docs.where(unit_hash(F.col(id_col)) < F.lit(float(fraction)))


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    domain_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted domain-mixture sampling — the pretraining 'data
    mixture' knob: keep each row with its domain's rate, content-
    addressed (keep iff ``unit_hash(id) < rates[domain]``), so the
    drawn mixture is reproducible, monotone in the rates, and
    replayable by the oracle. Domains absent from ``rates`` drop
    (rate 0); rate >= 1.0 keeps unconditionally (dodging the
    ``u < 1.0`` double-rounding hazard, see deterministic_sample).

    Map-only: a CASE ladder over the domain column plus one md5 — no
    shuffle, no UDF; sampling 100 TB costs the scan."""
    if not rates:
        raise ValueError("rates must be non-empty")
    for dom, r in rates.items():
        if r < 0:
            raise ValueError(f"negative rate for {dom!r}: {r}")
    rate = F.lit(0.0)
    for dom, r in rates.items():
        rate = F.when(F.col(domain_col) == dom, F.lit(float(r))).otherwise(rate)
    u = unit_hash(F.col(id_col))
    return docs.where((rate >= 1.0) | (u < rate))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the trainer-facing layout
    step: documents concatenate in id order (each contributing
    ``n_tokens + 1`` slots, the +1 an EOS separator) and the token
    stream chunks into fixed ``budget``-token sequences; emits one row
    per (document, sequence) overlap with the doc-local token span
    that lands in that sequence. This is the standard GPT-style
    packing (documents may straddle pack boundaries), not bin-packing
    — no placement decisions, hence fully declarative and exactly
    SQL-replayable.

    Scale shape: a single GLOBAL running sum would serialize on one
    partition, so the stream is sharded into ``n_buckets``
    content-addressed buckets (md5 of the id — deterministic, not
    partitioning-dependent); each bucket packs independently
    (sequences never cross buckets — at 100 TB each bucket is still
    billions of tokens, and trainers shard anyway). The plan is ONE
    hash exchange on bucket + a window cumulative sum + an explode;
    no UDFs, no driver state.

    Output: (doc_id, pack_id, tok_start, tok_end) — the [tok_start,
    tok_end) slice of the doc's own tokens (EOS slot excluded from
    spans) that fills pack ``pack_id``; pack_id = bucket * 2^40 +
    seq-within-bucket.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    d = docs.select(
        id_col,
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
        (F.col(n_tokens_col) + 1).cast("long").alias("_n"),  # +1 EOS
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    d = d.withColumn(
        "_start",
        F.coalesce(
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("_end", F.col("_start") + F.col("_n"))
    b = F.lit(int(budget))
    d = d.select(
        id_col,
        "bucket",
        "_start",
        "_n",
        F.floor(F.col("_start") / b).alias("_s0"),
        F.floor((F.col("_end") - 1) / b).alias("_s1"),
    )
    e = d.select(
        id_col,
        "bucket",
        "_start",
        "_n",
        F.explode(F.sequence("_s0", "_s1")).alias("_seq"),
    )
    tok_start = F.greatest(e["_seq"] * b - F.col("_start"), F.lit(0))
    # span within the doc's own tokens: the final +1 EOS slot is not a
    # token, so cap at _n - 1
    tok_end = F.least((e["_seq"] + 1) * b - F.col("_start"), F.col("_n") - 1)
    return (
        e.select(
            id_col,
            (F.col("bucket").cast("long") * F.lit(1 << 40) + F.col("_seq")).alias(
                "pack_id"
            ),
            tok_start.cast("long").alias("tok_start"),
            tok_end.cast("long").alias("tok_end"),
        )
        # a doc whose only slot in this pack is its EOS separator
        # contributes no token span — drop the empty row (same in SQL)
        .where(F.col("tok_end") > F.col("tok_start"))
    )


def domain_cap(
    docs: DataFrame,
    cap: int = 20,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap — the web-pipeline rule "keep at most
    ``cap`` documents from any one domain" (C4/RefinedWeb-style
    source balancing, which prevents a single crawled host from
    dominating the training mixture).

    Selection WITHIN a domain is by :func:`unit_hash` of the doc id
    (content-addressed uniform order — an unbiased reproducible sample
    of the domain, not "first N by crawl order"), ties broken by id.
    Returns the per-domain profile (domain, n_docs, n_kept) ordered by
    domain; a caller that needs the kept ROWS composes the same window
    inline and filters ``rnk <= cap`` (the corpus_export pattern for
    gates — the profile is the audit view, the filter is the pipeline
    stage).

    Scale shape: ONE window over the domain key. A hot domain (the
    skew case — one host with 10^8 pages) makes that domain's
    partition the straggler; the mitigation is the standard two-phase
    cap: pre-filter ``unit_hash < (cap * safety) / est_domain_count``
    using the map-side count sketch, then rank only the survivors.
    The pre-filter is an optimization, not a semantic change, so the
    single-window form stays the reference implementation here.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        unit_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    ranked = docs.select(domain_col, id_col).withColumn(
        "rnk", F.row_number().over(w)
    )
    return (
        ranked.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rnk") <= cap, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("domain")
    )


def chunk_overlap(
    docs: DataFrame,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking with overlap — the RAG /
    long-context prep step that pairs with :func:`pack_sequences`:
    each document's token stream is cut into windows of ``size``
    tokens starting every ``stride`` tokens (``stride < size`` ⇒
    consecutive chunks overlap by ``size - stride``, the usual recipe
    so no passage is split mid-context without a copy that isn't).

    Window starts are 0, stride, 2·stride, …; the LAST window starts
    at the largest multiple of stride < n_tokens (a trailing short
    window is emitted — every token appears in ≥1 chunk; windows
    starting at or past n_tokens are not). Empty docs emit nothing.
    Tokens are the engine's standard [a-z0-9]+ analysis, so chunk text
    is the normalized token stream (retrieval-side text, not the raw
    bytes — the raw doc is one lazy join away by doc_id).

    Returns (doc_id, chunk_idx, tok_start, n_tokens, chunk_text):
    chunk_idx dense from 0 per doc, tok_start the doc-local token
    offset, n_tokens the chunk's own length, chunk_text the
    space-joined tokens. Ordered (doc_id, chunk_idx).

    Plan shape: tokenize + window enumeration are ONE map-side
    projection (regexp_extract_all → sequence() over starts → explode
    → slice) — whole-stage codegen, no shuffle at all until a consumer
    asks for one; at 100 TB this is a pure scan→write pass whose
    output rows ≈ input tokens / stride."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive ({size}, {stride})")
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks")).where(
        F.size("_toks") > 0
    )
    starts = F.sequence(
        F.lit(0),
        ((F.size("_toks") - 1) / stride).cast("int") * stride,
        F.lit(stride),
    )
    chunk = F.slice(F.col("_toks"), F.col("tok_start") + 1, size)
    return (
        d.select(
            "doc_id",
            "_toks",
            F.posexplode(starts).alias("chunk_idx", "tok_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("tok_start").cast("int").alias("tok_start"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def composite_id_route(
    docs: DataFrame,
    n_shards: int,
    route_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Solr compositeId routing: a document routes to a shard by the
    hash of its ROUTE KEY (the ``key!id`` prefix — here the source/
    domain column), so all docs sharing the key land on one shard and
    a route-key query fans out to exactly one shard instead of all.
    Solr hashes with murmur3; the engine keeps its one md5 discipline
    (unit_hash) so the DuckDB oracle replays assignments bit-for-bit —
    the routing PROPERTY (co-location + uniform spread) is what is
    being reproduced, not murmur's bit pattern.

    Returns (doc_id, route_key, shard) with
    ``shard = floor(unit_hash(route_key) * n_shards)`` — map-only, no
    shuffle; the shard column is the write-side partition key (the
    same role list_id plays in the ANN store)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    u = unit_hash(F.col(route_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(route_col).alias("route_key"),
        F.floor(u * F.lit(int(n_shards))).cast("int").alias("shard"),
    )


def length_buckets(
    docs: DataFrame, n_buckets: int = 8, text_col: str = "text"
) -> DataFrame:
    """Length-bucketed batching assignment — dynamic-batching prep
    (pad waste is quadratic in within-batch length spread, so
    trainers bucket by length first): NTILE(n) over the corpus
    ordered by (token count, doc_id). Returns (doc_id, n_tokens,
    bucket 1..n) — equal-height buckets, remainder to the first
    buckets (ANSI NTILE, identical on both engines under the total
    order).

    Scale note: NTILE semantics WITHOUT ``Window.orderBy`` over the
    whole table (a partitionless window funnels every row through ONE
    task — the round-4 verdict's last "first plan that worked"):
    bucket is a closed-form function of the exact global rank from
    :func:`_two_pass_rank` (range exchange + per-partition offsets,
    fully parallel) and the driver-known row count — identical to
    ANSI NTILE under the same total order, with no single-partition
    stage anywhere in the plan."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    per = docs.select(
        "doc_id",
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_tokens"),
    )
    return _exact_ntile(per, ["n_tokens", "doc_id"], n_buckets).select(
        "doc_id", "n_tokens", "bucket"
    )


def _exact_ntile(
    keyed: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ANSI NTILE(n) under ``order_cols`` with no partitionless
    window: NTILE's bucket is a pure function of the row's global rank
    and the total count — first ``N mod n`` buckets hold
    ``N div n + 1`` rows, the rest ``N div n`` — so the parallel
    :func:`_two_pass_rank` plus two driver-side literals reproduce it
    closed-form. Adds ``bucket`` (1..n), drops the rank column."""
    ranked, total = _two_pass_rank(keyed, order_cols, num_partitions)
    base, rem = divmod(int(total), int(n_buckets))
    cut = rem * (base + 1)
    p = F.col("position")
    if base == 0:
        bucket = (p + F.lit(1)).cast("int")
    else:
        bucket = (
            F.when(
                p < F.lit(cut), F.floor(p / F.lit(base + 1)) + F.lit(1)
            ).otherwise(
                F.lit(rem) + F.floor((p - F.lit(cut)) / F.lit(base)) + F.lit(1)
            )
        ).cast("int")
    return ranked.withColumn("bucket", bucket).drop("position")


def _two_pass_rank(
    keyed: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Exact dense 0-based global rank under ``order_cols`` without a
    partitionless window (which funnels everything through ONE task) —
    the parallel-rank shape of ``plans/materialize
    ._assign_doc_ids_deferred``: range-partition by the order columns,
    collect only the |partitions|-row count vector, and add each
    partition's offset to its local row_number. The result is a pure
    function of the data (independent of where the sampled range
    boundaries fall). Returns ``(df + position column, total rows)``;
    the range-shuffled parent stays persisted for the returned plan.
    """
    from pyspark.sql.window import Window

    spark = keyed.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = keyed.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Persisted: the count pass below and the returned rank plan both
    # read the range shuffle; without the cache it runs twice.
    parts = parts.persist()
    counts = {
        r["_pid"]: r["n"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        parts.withColumn("_rn", F.row_number().over(w).cast("long") - F.lit(1))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("position", F.col("_rn") + F.col("_off"))
        .drop("_pid", "_rn", "_off")
    )
    return ranked, acc


def training_order(
    docs: DataFrame,
    seed: str = "seed0",
    n_shards: int = 8,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch's data
    loader wants the corpus in a reproducible pseudo-random order,
    sliced into contiguous equal shards (one per data-parallel
    reader). Order key = ``md5(seed || ':' || id)`` — change the seed,
    get an independent permutation; rerun the job, get the identical
    one (content-addressed like :func:`hash_split`).

    Returns ``(doc_id, position, shard)`` where ``position`` is the
    dense 0-based global rank under the key order and
    ``shard = position * n_shards div N`` (contiguous, sizes differ by
    at most 1 — each reader gets a balanced slice).

    Scale: a partitionless ``row_number`` window would funnel the
    whole corpus through ONE task. This uses the two-pass parallel
    rank of ``plans/materialize._assign_doc_ids_deferred`` instead:
    range-partition by the hash key (the sort the shuffle pays is the
    point — it IS the permutation), collect only the |partitions|-row
    count vector, and add per-partition offsets to the local
    row_number. Exact global rank, no single-task stage, determinism
    independent of where the sampled range boundaries fall.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))).alias(
            "_key"
        ),
    )
    ranked, n_total = _two_pass_rank(keyed, ["_key", "doc_id"], num_partitions)
    return ranked.select(
        "doc_id",
        "position",
        F.expr(f"div(({int(n_shards)}) * position, {max(n_total, 1)})")
        .cast("int")
        .alias("shard"),
    )


def epoch_schedule(
    docs: DataFrame,
    epochs: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Per-source epoch replication plan — the UP-sampling dual of
    :func:`mixture_sample` (which only thins). Pretraining mixtures
    assign each source a fractional epoch count (wiki 2.5 epochs, web
    0.25, ...): every doc gets ``floor(e)`` guaranteed copies plus one
    more iff ``unit_hash(seed:id) < frac(e)`` — content-addressed, so
    the drawn schedule is rerun-stable, monotone in the epoch counts,
    and exactly oracle-replayable. Sources absent from ``epochs``
    contribute nothing (0 epochs).

    Returns (doc_id, domain_col, epoch) with ``epoch`` in
    ``[0, n_copies)`` — one output row per scheduled copy.

    Map-only: a CASE ladder + one md5 + ``explode(sequence(...))`` —
    the explode is a Generate (no shuffle), so scheduling 100 TB
    costs the scan plus the output write. Fractional thresholds go
    through the Fraction(repr) discipline of :func:`hash_split` so
    the Spark literal and the oracle's decimal literal round to the
    identical double.
    """
    if not epochs:
        raise ValueError("epochs must be non-empty")
    from fractions import Fraction
    from math import floor

    base = F.lit(0)
    frac = F.lit(0.0)
    for dom, e in epochs.items():
        if e < 0:
            raise ValueError(f"negative epochs for {dom!r}: {e}")
        b = floor(e)
        fr = Fraction(repr(e)) - b
        base = F.when(F.col(domain_col) == dom, F.lit(int(b))).otherwise(base)
        frac = F.when(F.col(domain_col) == dom, F.lit(float(fr))).otherwise(frac)
    u = unit_hash(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    n = (base + F.when((frac > 0.0) & (u < frac), F.lit(1)).otherwise(F.lit(0))).cast(
        "int"
    )
    return (
        docs.select(id_col, domain_col)
        .withColumn("_n", n)
        .where(F.col("_n") > 0)
        .select(
            id_col,
            domain_col,
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("epoch"),
        )
        .withColumn("epoch", F.col("epoch").cast("int"))
    )


def curriculum_order(
    docs: DataFrame,
    score_col: str = "n_chars",
    n_buckets: int = 4,
    seed: str = "cur0",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Curriculum data ordering: easy-to-hard bucket progression with
    a reproducible shuffle INSIDE each difficulty bucket (pure
    sort-by-score ordering correlates adjacent batches; trainers want
    the curriculum coarse and the within-stage order random). Buckets
    are equal-height NTILE(n) under the total order (score, id) —
    the :func:`length_buckets` discipline — and the within-bucket
    permutation is the seeded md5 key of :func:`training_order`.

    Returns (doc_id, bucket 1..n, position) where ``position`` is the
    dense 0-based rank under (bucket, md5(seed:id), id) — i.e. the
    global curriculum order: all of bucket 1 (shuffled), then bucket
    2, ...

    Scale: BOTH passes are parallel — bucketing is the closed-form
    NTILE of :func:`_exact_ntile` (two-pass rank + driver literals, no
    partitionless window), and the final rank reuses the same
    two-pass parallel rank.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    bucketed = _exact_ntile(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(score_col).alias("_score")
        ),
        ["_score", "doc_id"],
        n_buckets,
        num_partitions,
    ).withColumn(
        "_key",
        F.md5(F.concat_ws(":", F.lit(seed), F.col("doc_id").cast("string"))),
    )
    ranked, _n = _two_pass_rank(
        bucketed, ["bucket", "_key", "doc_id"], num_partitions
    )
    return ranked.select("doc_id", "bucket", "position")


def split_leakage(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Train/test LEAKAGE audit — the split-hygiene check every
    training pipeline needs after :func:`hash_split`: a near-dup pair
    whose members land in DIFFERENT splits leaks training content
    into evaluation (the contamination mode document-level
    decontamination misses, because both docs are legitimately in the
    corpus — they're just siblings straddling the split).

    ``pairs``: (doc1, doc2, jaccard) from any near-dup detector
    (minhash_lsh_pairs is the scale path). Pairs are bucketed by
    similarity band; per band: total pairs, pairs crossing splits,
    and the leak rate. Random hash splitting makes the EXPECTED leak
    rate 1 − Σ w² (≈ 0.185 for 90/5/5) regardless of band — the audit
    exists precisely to surface that near-dups must be co-assigned
    (cluster-then-split) rather than independently hashed.

    Returns (band, n_pairs, n_leaked, leak_rate) rounded 6dp, ordered
    band. Plan: two broadcast-or-shuffle joins of the pair list
    against the split labels (pairs ≪ corpus after LSH), one
    request-scale aggregate."""
    sp = hash_split(docs.select("doc_id")).select("doc_id", "split")
    j = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("doc1"), F.col("split").alias("s1")
            ),
            "doc1",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("doc2"), F.col("split").alias("s2")
            ),
            "doc2",
        )
    )
    band = (
        F.when(F.col("jaccard") < 0.5, F.lit("0.30-0.50"))
        .when(F.col("jaccard") < 0.7, F.lit("0.50-0.70"))
        .when(F.col("jaccard") < 0.9, F.lit("0.70-0.90"))
        .otherwise(F.lit("0.90-1.00"))
    )
    return (
        j.select(
            band.alias("band"),
            (F.col("s1") != F.col("s2")).cast("int").alias("leaked"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("leaked").cast("long").alias("n_leaked"),
        )
        .select(
            "band",
            "n_pairs",
            "n_leaked",
            F.round(
                F.col("n_leaked") / F.col("n_pairs").cast("double"), 6
            ).alias("leak_rate"),
        )
        .orderBy("band")
    )


def cluster_split(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster-then-split — the FIX :func:`split_leakage` motivates:
    near-dup connected components are assigned to train/val/test AS
    UNITS (every member inherits its component representative's hash
    split), so no near-dup pair can straddle a split boundary by
    construction. Singleton docs are their own representative, which
    makes their assignment IDENTICAL to plain :func:`hash_split` —
    co-assignment only bends the split where duplicates exist.

    Returns the split census: (split, n_docs, n_clusters) ordered by
    split — the table that shows the 90/5/5 weights still hold after
    co-assignment (cluster-size skew is the price of zero leakage).

    Plan: label propagation (:func:`~solr_ocr_processor_spark.operators
    .dedup.dup_clusters`) over the pair graph, the split hash on the
    DISTINCT representative set (|clusters| rows), one broadcast join
    back, one request-scale aggregate."""
    from solr_ocr_processor_spark.operators.dedup import dup_clusters

    labels = dup_clusters(docs.select("doc_id"), pairs).select(
        "doc_id", "rep_id"
    )
    reps = hash_split(
        labels.select(F.col("rep_id").alias("doc_id")).distinct()
    ).select(F.col("doc_id").alias("rep_id"), "split")
    return (
        labels.join(F.broadcast(reps), "rep_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("rep_id").cast("long").alias("n_clusters"),
        )
        .orderBy("split")
    )
