"""Facet counts over query matches — the Solr ``facet=true`` analog.

Solr returns, next to the hit list, a histogram of the MATCHING
documents bucketed by a field (field facets / range facets). The
reference's delegated Solr surface carries that capability for every
query it forwards (app/process/solr.go:100-124 queries a stored core
whose full response surface includes faceting). Here: a range facet
over document length (``dl`` — tokens per doc), the doc attribute the
posting rows already carry.

Plan shape (scale-first):

1. dictionary pre-filter the postings to the query terms (``isin`` →
   parquet row-group pruning) — only matching posting rows are read;
2. ONE hash aggregation per doc_id dedupes multi-term matches
   (map-side partial combine; dl is constant per doc so ``max`` is
   exact);
3. bucket + count — the second aggregation's input is one row per
   matching doc and its output is |buckets| rows, so the final
   shuffle moves a histogram, not a corpus.

No doc_meta join: ``dl`` rides on the posting rows precisely so query
operators never touch the doc table before top-k/aggregation
(late-materialization discipline, operators/score.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..functions.tokenizer import query_terms
from .build import Index
from .score import _suppress


def facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Range-facet histogram of the docs matching ANY query term
    (Solr's default OR semantics for ``q``): (bucket, n_docs) with
    ``bucket = floor(dl / width)``, ordered by bucket ASC.
    ``exclude_docs`` (tombstones) anti-joins before the bucket count —
    Solr facets likewise never count deleted docs."""
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([], "bucket long, n_docs long")
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    return (
        matched.select(
            F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("bucket")
    )


def date_facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    gap_minutes: int = 10,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Date-range facet — Solr's ``facet.range`` over a date field
    (``facet.range=last_ts&facet.range.gap=+10MINUTES``): histogram of
    the docs matching ANY query term, bucketed by the doc's
    last-activity timestamp. Returns (bucket_start epoch-seconds,
    n_docs) ordered by bucket.

    ``last_ts`` is a doc-values column captured at BUILD time
    (plans/materialize.py — max(ts) rides the doc aggregation), so the
    facet never touches the turn table: match doc_ids from postings
    (dictionary ``isin`` pre-filter → parquet row-group pruning), ONE
    doc_id equi-join to doc_meta for the date column, then a
    |buckets|-row aggregation. At rest postings and doc_meta shards
    are written by the same doc-id ranges, so the join co-locates.

    Buckets are epoch-aligned (``floor(epoch / gap)``), matching
    DuckDB's ``epoch(ts) // gap`` — integer seconds, no float or
    timezone dependence in the oracle comparison.
    """
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    if "last_ts" not in index.doc_meta.columns:
        # Stores built from a ts-less source have no date doc-values —
        # an explicit error beats a silently-empty histogram.
        raise ValueError("store has no last_ts doc-values column")
    gap_s = int(gap_minutes) * 60
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([], "bucket_start long, n_docs long")
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms)).select("doc_id").distinct(),
        exclude_docs,
    )
    dated = matched.join(
        index.doc_meta.select("doc_id", "last_ts"), "doc_id"
    ).where(F.col("last_ts").isNotNull())
    return (
        dated.select(
            (
                F.floor(F.unix_timestamp("last_ts") / F.lit(gap_s)) * F.lit(gap_s)
            ).cast("long").alias("bucket_start")
        )
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("bucket_start")
    )


def stats_field(
    spark: SparkSession,
    index: Index,
    query: str,
    field: str = "dl",
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Stats component — Solr's ``stats=true&stats.field=...``: one row
    of (n, min, max, sum, mean, stddev) over a numeric doc field for
    the docs matching ANY query term.

    ``dl`` needs no join (posting rows carry it); ``n_turns`` /
    ``n_chars`` join doc_meta on the matched doc_ids (same co-located
    equi-join as :func:`date_facet_counts`). The output is ONE row —
    the whole reduction is a map-side-combinable aggregation, nothing
    corpus-sized moves. mean/stddev round to 6dp for oracle comparison
    (stddev is the SAMPLE stddev on both engines).
    """
    allowed = ("dl", "n_turns", "n_chars")
    if field not in allowed:
        raise ValueError(f"stats field {field!r} not in {allowed}")
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame(
            [], "n long, min long, max long, sum long, mean double, stddev double"
        )
    if field == "dl":
        matched = (
            index.postings.where(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.max("dl").cast("long").alias("v"))
        )
    else:
        matched = (
            index.postings.where(F.col("term").isin(terms))
            .select("doc_id")
            .distinct()
            .join(index.doc_meta.select("doc_id", field), "doc_id")
            .withColumn("v", F.col(field).cast("long"))
        )
    matched = _suppress(matched, exclude_docs)
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").cast("long").alias("min"),
        F.max("v").cast("long").alias("max"),
        F.sum("v").cast("long").alias("sum"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_samp("v"), 6).alias("stddev"),
    )


def stats_cardinality(
    spark: SparkSession,
    index: Index,
    query: str,
    field: str = "dl",
    approx: bool = False,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Stats-component cardinality — Solr's ``stats.cardinality``
    param: distinct values of a numeric doc field over the docs
    matching ANY query term, one row (n_docs, cardinality).

    Solr computes this with HyperLogLog. Spark's HLL++ is
    ``approx_count_distinct`` (``approx=True``) — the path to use at
    10^12 docs, where it is a fixed-size sketch with map-side
    combine. The default is the EXACT distinct (two-phase hash
    aggregate), which is the engine's oracle spine: HLL estimates
    differ per implementation, so exact is what the DuckDB twin
    checks, and pytest bounds the sketch's relative error against it
    (Solr exposes the same accuracy/memory dial).
    """
    allowed = ("dl", "n_turns", "n_chars")
    if field not in allowed:
        raise ValueError(f"cardinality field {field!r} not in {allowed}")
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([], "n_docs long, cardinality long")
    if field == "dl":
        matched = (
            index.postings.where(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.max("dl").cast("long").alias("v"))
        )
    else:
        matched = (
            index.postings.where(F.col("term").isin(terms))
            .select("doc_id")
            .distinct()
            .join(index.doc_meta.select("doc_id", field), "doc_id")
            .withColumn("v", F.col(field).cast("long"))
        )
    matched = _suppress(matched, exclude_docs)
    card = (
        F.approx_count_distinct("v") if approx else F.count_distinct(F.col("v"))
    )
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        card.cast("long").alias("cardinality"),
    )


def pivot_facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    gap_minutes: int = 10,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Pivot facet — Solr's ``facet.pivot=f1,f2``: the two-level
    decision tree of counts over the matching docs, here dl-bucket x
    date-bucket (the same keys the flat range facets use). Returns
    (dl_bucket, ts_bucket epoch-seconds, n_docs) ordered by both keys.

    Plan: the dl key rides the per-doc dedup aggregation itself
    (max(dl) — posting rows carry dl), so the ONLY join is the same
    co-located doc_id equi-join to doc_meta the date facet pays for
    its date column; the pivot then aggregates to |bucket-pairs| rows.
    A deeper pivot (f1,f2,f3…) is the same plan with more group keys —
    Spark's hash aggregate doesn't care about pivot depth, only
    cardinality.
    """
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    if "last_ts" not in index.doc_meta.columns:
        raise ValueError("store has no last_ts doc-values column")
    gap_s = int(gap_minutes) * 60
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame(
            [], "dl_bucket long, ts_bucket long, n_docs long"
        )
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    dated = matched.join(
        index.doc_meta.select("doc_id", "last_ts"), "doc_id"
    ).where(F.col("last_ts").isNotNull())
    return (
        dated.select(
            F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("dl_bucket"),
            (
                F.floor(F.unix_timestamp("last_ts") / F.lit(gap_s)) * F.lit(gap_s)
            ).cast("long").alias("ts_bucket"),
        )
        .groupBy("dl_bucket", "ts_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("dl_bucket", "ts_bucket")
    )


def group_facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    gap_minutes: int = 10,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Grouped faceting — Solr's ``group=true&group.facet=true``: the
    facet histogram counts GROUPS, not documents. For each facet
    bucket (the date bucket the range facet uses), report how many
    result GROUPS (the dl-bucket key :func:`~..operators.collapse.
    group_topk` groups by) contain at least one matching doc in that
    bucket. Returns (ts_bucket epoch-seconds, n_groups) ordered by
    bucket — Solr's "facet counts as seen through the grouped result
    set".

    Plan: identical match set + doc_meta date join as
    :func:`pivot_facet_counts`, then ``countDistinct(group)`` per
    facet value — Spark plans that as a two-phase aggregate (partial
    distinct map-side on (ts_bucket, dl_bucket), final count), so the
    exchange carries at most |bucket-pairs| rows, never the match set.
    """
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    if "last_ts" not in index.doc_meta.columns:
        raise ValueError("store has no last_ts doc-values column")
    gap_s = int(gap_minutes) * 60
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([], "ts_bucket long, n_groups long")
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    dated = matched.join(
        index.doc_meta.select("doc_id", "last_ts"), "doc_id"
    ).where(F.col("last_ts").isNotNull())
    return (
        dated.select(
            (
                F.floor(F.unix_timestamp("last_ts") / F.lit(gap_s)) * F.lit(gap_s)
            ).cast("long").alias("ts_bucket"),
            F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("grp"),
        )
        .groupBy("ts_bucket")
        .agg(F.count_distinct(F.col("grp")).cast("long").alias("n_groups"))
        .orderBy("ts_bucket")
    )


def group_stats(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-bucket stats — Solr's ``stats.field=n_chars&stats.facet=…``:
    the :func:`stats_field` summary computed PER dl-bucket of the
    matching docs instead of once globally. Returns (bucket, n, min,
    max, sum, mean, stddev) over n_chars, ordered by bucket.

    Plan: same match aggregation as the flat facet (dl rides the
    posting rows — max(dl) per doc), ONE co-located doc_id join to
    doc_meta for the stats field, then a |buckets|-row grouped
    aggregation (map-side combinable). Adding the group key to the
    stats reduction changes output cardinality, not plan shape —
    stats.facet at 100 TB costs what stats.field costs."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame(
            [],
            "bucket long, n long, min long, max long, sum long, "
            "mean double, stddev double",
        )
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    joined = matched.join(
        index.doc_meta.select("doc_id", "n_chars"), "doc_id"
    ).select(
        F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("bucket"),
        F.col("n_chars").cast("long").alias("v"),
    )
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").cast("long").alias("min"),
            F.max("v").cast("long").alias("max"),
            F.sum("v").cast("long").alias("sum"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_samp("v"), 6).alias("stddev"),
        )
        .orderBy("bucket")
    )


def stats_percentiles(
    spark: SparkSession,
    index: Index,
    query: str,
    field: str = "dl",
    percentiles: tuple = (0.25, 0.5, 0.9, 0.99),
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Stats-component percentiles — Solr's ``stats.percentiles``
    param: exact interpolated quantiles of a numeric doc field over
    the docs matching ANY query term. One row, columns p25/p50/...

    Exactness: Spark's ``percentile`` (the exact aggregate, NOT
    approx_percentile) and DuckDB's ``quantile_cont`` share the same
    definition — sort, index (n-1)*p, linear interpolation — so the
    oracle replays bit-for-bit modulo the usual 6dp rounding. Solr
    itself computes percentiles with t-digest (approximate); we give
    the exact answer because Spark's sort-based aggregate is cheap at
    a match set's size, and an exact value is strictly better where
    both are affordable. The reduction is a single aggregation over
    the matched (doc, field) rows — same scan shape as
    :func:`stats_field`, nothing corpus-sized moves.
    """
    allowed = ("dl", "n_turns", "n_chars")
    if field not in allowed:
        raise ValueError(f"stats field {field!r} not in {allowed}")
    ps = list(percentiles)
    if not ps or any(not 0.0 <= p <= 1.0 for p in ps):
        raise ValueError(f"percentiles {ps} outside [0, 1]")
    terms = sorted(set(query_terms(query, cfg)))
    cols = ", ".join(f"p{int(p * 100)} double" for p in ps)
    if not terms:
        return spark.createDataFrame([], f"n long, {cols}")
    matched = (
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").cast("long").alias("v"))
    )
    if field != "dl":
        matched = (
            matched.select("doc_id")
            .join(index.doc_meta.select("doc_id", field), "doc_id")
            .withColumn("v", F.col(field).cast("long"))
        )
    if exclude_docs is not None:
        matched = matched.join(
            exclude_docs.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    arr = ", ".join(f"{p}D" for p in ps)
    agg = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"percentile(v, array({arr}))").alias("q"),
    )
    return agg.select(
        "n",
        *[
            F.round(F.col("q").getItem(i), 6).alias(f"p{int(p * 100)}")
            for i, p in enumerate(ps)
        ],
    )


def facet_query_counts(
    spark: SparkSession,
    index: Index,
    term_queries: tuple = ("spark", "window", "merge"),
    dl_ranges: tuple = ((0, 64), (64, 192)),
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Solr ``facet.query`` — a count per ARBITRARY sub-query, returned
    next to the main response. Facets here are term queries (doc count
    containing the term) and dl range queries ([lo, hi) token-length
    buckets). Returns (facet, n_docs) ordered by facet ASC.

    Plan shape: term facets are |terms| rows read straight off the
    DICTIONARY (term_stats.df is by construction the count of matching
    docs — zero posting I/O when no tombstones exist); range facets are
    ONE conditional aggregation over doc lengths (every ``sum(when)``
    computed in the same scan, map-side partial combine → a 1-row
    exchange), unpivoted driver-free with ``stack``. With tombstones,
    term facets fall back to an anti-joined postings count — df rows
    per term, still dictionary-pruned.
    """
    if exclude_docs is None:
        term_cnt = (
            index.term_stats.where(F.col("term").isin(list(term_queries)))
            .select(
                F.concat(F.lit("q:"), F.col("term")).alias("facet"),
                F.col("df").cast("long").alias("n_docs"),
            )
        )
    else:
        term_cnt = (
            index.postings.where(F.col("term").isin(list(term_queries)))
            .join(exclude_docs.select("doc_id").distinct(), "doc_id", "left_anti")
            .groupBy(F.concat(F.lit("q:"), F.col("term")).alias("facet"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        )
    dl = index.doc_meta.select(F.col("dl").cast("long").alias("dl"))
    if exclude_docs is not None:
        dl = index.doc_meta.join(
            exclude_docs.select("doc_id").distinct(), "doc_id", "left_anti"
        ).select(F.col("dl").cast("long").alias("dl"))
    range_aggs = [
        F.sum(
            F.when((F.col("dl") >= lo) & (F.col("dl") < hi), 1).otherwise(0)
        ).cast("long").alias(f"r{i}")
        for i, (lo, hi) in enumerate(dl_ranges)
    ]
    stack_args = ", ".join(
        f"'dl:[{lo} TO {hi})', r{i}" for i, (lo, hi) in enumerate(dl_ranges)
    )
    range_cnt = dl.agg(*range_aggs).select(
        F.expr(
            f"stack({len(dl_ranges)}, {stack_args}) AS (facet, n_docs)"
        )
    )
    return term_cnt.unionByName(range_cnt).orderBy("facet")


def json_facet_nested(
    spark: SparkSession,
    doc_attrs: DataFrame,
    outer: str = "lang",
    inner: str = "source",
    metric: str = "n_chars",
    k_outer: int = 3,
    k_inner: int = 2,
) -> DataFrame:
    """Solr JSON Facet API — a nested ``terms`` facet: top ``k_outer``
    buckets of ``outer`` (by doc count, ties value ASC), each carrying
    its top ``k_inner`` sub-buckets of ``inner`` with per-sub-bucket
    count and the metric's exact integer sum (sum+count in place of
    ``avg`` keeps the contract exact on both engines; avg = sum/cnt is
    client arithmetic).

    Returns (outer, outer_docs, inner, inner_docs, sum_metric) ordered
    by the bucket ranks.

    Plan shape (scale-first): ONE hash aggregation at (outer, inner)
    granularity — the finest the response needs — then outer totals by
    RE-AGGREGATING those |outer|x|inner| rows (never rescanning the
    corpus), rank both levels with window functions over the tiny agg
    result. Cardinality-bounded end to end: after the first partial
    combine nothing bigger than the bucket lattice moves. This is the
    classic rollup-from-finest-grain shape — at 100 TB the single
    corpus-wide shuffle at (outer, inner) keys is the whole cost, and
    AQE skew-split handles a hot language bucket because the partial
    aggregation has already collapsed rows to one per (outer, inner,
    map-partition).
    """
    fine = doc_attrs.groupBy(
        F.col(outer).alias("outer"), F.col(inner).alias("inner")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("inner_docs"),
        F.sum(F.col(metric).cast("long")).cast("long").alias("sum_metric"),
    )
    outer_tot = fine.groupBy("outer").agg(
        F.sum("inner_docs").cast("long").alias("outer_docs")
    )
    from pyspark.sql import Window

    w_out = Window.orderBy(F.desc("outer_docs"), F.asc("outer"))
    top_outer = (
        outer_tot.withColumn("orank", F.row_number().over(w_out))
        .where(F.col("orank") <= k_outer)
    )
    w_in = Window.partitionBy("outer").orderBy(
        F.desc("inner_docs"), F.asc("inner")
    )
    return (
        fine.join(F.broadcast(top_outer), "outer")
        .withColumn("irank", F.row_number().over(w_in))
        .where(F.col("irank") <= k_inner)
        .select(
            F.col("outer").alias(outer),
            "outer_docs",
            F.col("inner").alias(inner),
            "inner_docs",
            "sum_metric",
        )
        .orderBy(F.desc("outer_docs"), F.asc(outer), F.desc("inner_docs"), F.asc(inner))
    )


def interval_facet_counts(
    spark: SparkSession,
    index: Index,
    query: str,
    intervals: tuple[tuple[int, int], ...] = ((0, 39), (32, 63), (60, 10_000)),
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Solr ``facet.interval``: counts of the matched docs falling in
    each ARBITRARY (possibly overlapping) closed dl interval — the
    component that facet.range (fixed gap, disjoint) and facet.query
    (arbitrary predicates, one count each) bracket. A doc inside two
    overlapping intervals counts in both, exactly Solr's contract.
    Returns (ival, lo, hi, n_docs) ordered by the interval's position
    in the request.

    Plan: the matched set is the usual dictionary-pruned posting scan
    + per-doc dedup; then ONE aggregation computes every interval as a
    conditional sum (no explode, no per-interval scan — N intervals
    are N codegen'd sum(when) columns over one pass), unpivoted to
    rows with a literal stack. Interval count is a request property
    (tens), so the stack is plan-size, not data-size.
    """
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame(
            [], "ival int, lo long, hi long, n_docs long"
        )
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    aggs = [
        F.sum(
            F.when((F.col("dl") >= lo) & (F.col("dl") <= hi), 1).otherwise(0)
        )
        .cast("long")
        .alias(f"_c{i}")
        for i, (lo, hi) in enumerate(intervals)
    ]
    wide = matched.agg(*aggs)
    stack = ", ".join(
        f"{i}, CAST({lo} AS BIGINT), CAST({hi} AS BIGINT), _c{i}"
        for i, (lo, hi) in enumerate(intervals)
    )
    return wide.selectExpr(
        f"stack({len(intervals)}, {stack}) AS (ival, lo, hi, n_docs)"
    ).orderBy("ival")


def group_ngroups(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Solr ``group=true&group.ngroups=true``: the total number of
    GROUPS the match set spans (the paging denominator the group page
    alone can't give). Same dictionary-filtered match spine as
    :func:`facet_counts`; the answer is one count-distinct over the
    group keys — Spark plans partial-distinct map-side, so the final
    exchange carries at most |buckets| rows and the output is 1 row."""
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame([(0,)], "ngroups long")
    matched = _suppress(
        index.postings.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.max("dl").alias("dl")),
        exclude_docs,
    )
    return matched.select(
        F.floor(F.col("dl") / F.lit(float(width))).cast("long").alias("g")
    ).agg(F.count_distinct(F.col("g")).cast("long").alias("ngroups"))


def field_facet_counts(
    df: DataFrame,
    field: str,
    missing: bool = True,
    sort: str = "count",
    limit: int | None = None,
    offset: int = 0,
    prefix: str | None = None,
    contains: str | None = None,
    mincount: int = 0,
    exclude_terms: tuple[str, ...] = (),
) -> DataFrame:
    """Solr ``facet.field=<f>`` with the full response knobs:
    ``facet.missing=true`` (one NULL-valued row counting rows with no
    value), ``facet.sort=count|index`` (count DESC value ASC, or pure
    value order), ``facet.limit``/``facet.offset`` paging over the
    value list, ``facet.prefix`` and ``facet.contains`` (only values
    starting with / containing the needle reach the term list — Solr
    evaluates both before sort/paging, while the ``facet.missing``
    bucket stays INDEPENDENT of them: SimpleFacets appends the
    no-value count whether or not a needle restricted the terms). ONE
    groupBy with map-side combine; the prefix/contains filters push
    below the aggregate (startswith/contains OR isNull reaches the
    scan); the exchange moves |distinct values| rows, and a limit
    lowers the final order to TakeOrderedAndProject(offset+limit)."""
    if sort not in ("count", "index"):
        raise ValueError(f"facet.sort must be count|index, got {sort!r}")
    if offset < 0:
        raise ValueError(f"facet.offset must be >= 0, got {offset}")
    if mincount < 0:
        raise ValueError(f"facet.mincount must be >= 0, got {mincount}")
    for needle_col in (
        [F.col(field).startswith(prefix)] if prefix is not None else []
    ) + ([F.col(field).contains(contains)] if contains is not None else []):
        keep = needle_col
        if missing:
            keep = keep | F.col(field).isNull()
        df = df.where(keep)
    if exclude_terms:
        # facet.excludeTerms removes named TERMS from the value list;
        # NULL is not a term, so the missing bucket is untouched.
        df = df.where(
            ~F.col(field).isin(*exclude_terms) | F.col(field).isNull()
        )
    out = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    if not missing:
        out = out.where(F.col("value").isNotNull())
    if mincount > 0:
        # Solr applies facet.mincount to every bucket, the missing
        # bucket included, AFTER counting and BEFORE sort/paging.
        out = out.where(F.col("n") >= F.lit(int(mincount)))
    # Solr appends the missing bucket AFTER the value list -> NULLS LAST
    order = (
        [F.desc("n"), F.asc_nulls_last("value")]
        if sort == "count"
        else [F.asc_nulls_last("value")]
    )
    out = out.orderBy(*order)
    if limit is not None:
        if limit < 0:
            raise ValueError(f"facet.limit must be >= 0, got {limit}")
        out = out.offset(offset).limit(limit) if offset else out.limit(limit)
    elif offset:
        out = out.offset(offset)
    return out


def range_facet_other(
    df: DataFrame,
    field: str,
    start: int,
    end: int,
    gap: int,
    hardend: bool = False,
) -> DataFrame:
    """Solr numeric ``facet.range`` with the FULL response envelope:
    the gap buckets plus ``facet.range.other=all``'s three summary
    counts (``before``/``between``/``after``) and the ``hardend``
    knob (org.apache.solr.request.SimpleFacets range semantics,
    include=lower default — a bucket covers [lo, lo+gap)).

    - buckets: [start + i*gap, start + (i+1)*gap) for i in 0..nb-1,
      nb = ceil((end-start)/gap). With ``hardend=true`` the LAST
      bucket is clipped at ``end``; with ``hardend=false`` the bucket
      grid runs past ``end`` to start + nb*gap (Solr's documented
      default) and the effective end moves with it.
    - before  = value <  start
    - after   = value >= effective end
    - between = start <= value < effective end
    - EMPTY buckets are emitted with count 0 (Solr's contract).

    Returns (ord int, bucket string, n_docs long) ordered by ord:
    ord 0..nb-1 are the gap buckets (labelled by their start value,
    as Solr labels them), then before/between/after. One corpus scan
    feeds BOTH legs: a conditional single-row aggregate for the
    ``other`` counts (no shuffle of row data — partial agg all the
    way) and a |buckets|-row groupBy for the histogram; the zero-fill
    spine is a |buckets|-row spark.range LEFT join (broadcast). At
    100 TB the exchange moves |buckets|+1 rows, never docs."""
    if gap <= 0:
        raise ValueError(f"facet.range.gap must be positive, got {gap}")
    if end <= start:
        raise ValueError(f"facet.range end must be > start ({start}..{end})")
    nb = -((start - end) // gap)  # ceil((end-start)/gap) in int math
    end_eff = end if hardend else start + nb * gap
    v = F.col(field).cast("long")
    spark = df.sparkSession
    others = df.agg(
        F.count(F.when(v < start, 1)).cast("long").alias("before"),
        F.count(F.when((v >= start) & (v < end_eff), 1)).cast("long").alias("between"),
        F.count(F.when(v >= end_eff, 1)).cast("long").alias("after"),
    ).select(
        F.expr(
            f"stack(3, {nb}, 'before', before, {nb + 1}, 'between', between,"
            f" {nb + 2}, 'after', after) AS (ord, bucket, n_docs)"
        )
    )
    hist = (
        df.where((v >= start) & (v < end_eff))
        .select(F.floor((v - F.lit(start)) / F.lit(gap)).cast("int").alias("ord"))
        .groupBy("ord")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spine = spark.range(nb).select(F.col("id").cast("int").alias("ord"))
    buckets = spine.join(hist, "ord", "left").select(
        "ord",
        (F.lit(start) + F.col("ord") * F.lit(gap)).cast("string").alias("bucket"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_docs"),
    )
    return buckets.unionByName(others).orderBy("ord")


def range_facet_include(
    df: DataFrame,
    field: str,
    start: int,
    end: int,
    gap: int,
    include: tuple[str, ...] = ("lower",),
    hardend: bool = False,
) -> DataFrame:
    """Solr ``facet.range.include`` — the boundary-membership knob
    that completes the range-facet envelope next to
    :func:`range_facet_other`'s other/hardend. ``include`` is a SET of
    flags (FacetRangeInclude): ``lower`` / ``upper`` / ``edge`` /
    ``outer`` / ``all`` (= the other four). Bucket i over
    [lo_i, hi_i]:

    - lower bound included iff ``lower`` in the set, or ``edge`` and
      i == 0;
    - upper bound included iff ``upper`` in the set, or ``edge`` and
      i == nb-1;
    - with BOTH lower and upper (or ``all``) a boundary value counts
      in TWO adjacent buckets — Solr's documented double-count;
    - ``before`` additionally owns v == start iff the set has neither
      lower nor edge, OR has outer; symmetrically ``after`` for the
      effective end; ``between``'s bounds follow lower/edge and
      upper/edge.

    Returns (ord, bucket, n_docs) like range_facet_other: gap buckets
    first (labelled by their start), then before/between/after.

    Plan: buckets may overlap, so the floor-division histogram is out;
    instead every bucket is one codegen'd conditional sum over ONE
    scan (the interval_facet_counts shape — nb is a request property,
    so the stack is plan-size), unpivoted with a literal stack. One
    single-row aggregate, zero shuffles of doc rows at any corpus
    size.
    """
    flags = set(include)
    if "all" in flags:
        flags |= {"lower", "upper", "edge", "outer"}
    bad = flags - {"lower", "upper", "edge", "outer", "all"}
    if bad:
        raise ValueError(f"unknown facet.range.include flags: {sorted(bad)}")
    if gap <= 0:
        raise ValueError(f"facet.range.gap must be positive, got {gap}")
    if end <= start:
        raise ValueError(f"facet.range end must be > start ({start}..{end})")
    nb = -((start - end) // gap)
    end_eff = end if hardend else start + nb * gap
    v = F.col(field).cast("long")

    def bucket_pred(i: int):
        lo = start + i * gap
        hi = min(start + (i + 1) * gap, end_eff) if hardend else start + (i + 1) * gap
        low_inc = "lower" in flags or ("edge" in flags and i == 0)
        high_inc = "upper" in flags or ("edge" in flags and i == nb - 1)
        p_lo = (v >= lo) if low_inc else (v > lo)
        p_hi = (v <= hi) if high_inc else (v < hi)
        return p_lo & p_hi

    before_eq = ("lower" not in flags and "edge" not in flags) or "outer" in flags
    after_eq = ("upper" not in flags and "edge" not in flags) or "outer" in flags
    btw_lo_inc = "lower" in flags or "edge" in flags
    btw_hi_inc = "upper" in flags or "edge" in flags
    p_before = (v <= start) if before_eq else (v < start)
    p_after = (v >= end_eff) if after_eq else (v > end_eff)
    p_btw_lo = (v >= start) if btw_lo_inc else (v > start)
    p_btw_hi = (v <= end_eff) if btw_hi_inc else (v < end_eff)

    aggs = [
        F.sum(F.when(bucket_pred(i), 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i in range(nb)
    ] + [
        F.sum(F.when(p_before, 1).otherwise(0)).cast("long").alias("_before"),
        F.sum(F.when(p_btw_lo & p_btw_hi, 1).otherwise(0)).cast("long").alias("_between"),
        F.sum(F.when(p_after, 1).otherwise(0)).cast("long").alias("_after"),
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"{i}, '{start + i * gap}', _c{i}" for i in range(nb)
    ) + (
        f", {nb}, 'before', _before, {nb + 1}, 'between', _between,"
        f" {nb + 2}, 'after', _after"
    )
    return wide.select(
        F.expr(f"stack({nb + 3}, {stack}) AS (ord, bucket, n_docs)")
    ).orderBy("ord")
