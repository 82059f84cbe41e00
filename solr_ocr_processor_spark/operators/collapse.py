"""Field collapse — Solr's ``{!collapse field=...}`` query parser.

Solr's CollapsingQParser keeps only the highest-scoring document per
group value and lets the survivors compete for the page — result
diversification over a doc-values field. The reference's delegated
Solr surface carries this for every query it forwards
(app/process/solr.go:100-124 queries a stored core whose query-parser
plugins include collapse). Here the group key is the same doc-values
bucket the range facet uses (``floor(dl / width)`` — the doc attribute
posting rows already carry), so collapse needs NO doc_meta join before
ranking.

Plan shape (scale-first):

1. exhaustive BM25 scores with ``with_dl=True`` — dl rides the scoring
   aggregation itself (operators/score.bm25_scores_terms), zero extra
   shuffle or join;
2. ONE window (partitionBy group, orderBy score desc / doc_id asc,
   row_number = 1) picks each group's champion — the shuffle moves
   only the MATCHING docs, hash-partitioned by group key, and the
   per-group sort is tiny;
3. global top-k over the champions lowers to TakeOrderedAndProject
   (per-partition heaps, no global sort);
4. conv_id resolves AFTER the top-k (k-row broadcast join — late
   materialization, same discipline as operators/score.bm25_topk).

Ties inside a group break by doc_id ASC (Lucene convention), so the
champion set — and therefore the page — is deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import DEFAULT, IndexConfig
from ..functions.tokenizer import query_terms
from .build import Index
from .score import _suppress, bm25_scores_terms


_GROUP_SORT_FIELDS = ("score", "dl", "doc_id")


def _group_sort_cols(spec: str) -> list:
    """Parse Solr's ``group.sort`` subset over fields the scoring rows
    already carry (score, dl, doc_id): "field asc|desc", comma
    separated. Raises ValueError (caller's 400) otherwise."""
    cols = []
    for part in spec.split(","):
        bits = part.split()
        if len(bits) != 2 or bits[0] not in _GROUP_SORT_FIELDS or bits[1] not in (
            "asc",
            "desc",
        ):
            fields = "|".join(_GROUP_SORT_FIELDS)
            raise ValueError(
                f"bad group.sort {part.strip()!r}: want "
                f"'{fields} asc|desc'"
            )
        c = F.col(bits[0])
        cols.append(c.asc() if bits[1] == "asc" else c.desc())
    return cols


def collapse_topk(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    k: int = 10,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 with at most ONE doc per dl-bucket (``floor(dl /
    width)``): (group, doc_id, conv_id, score), score DESC. Disjunctive
    (OR) match semantics like ``bm25_topk``; ``exclude_docs``
    (tombstones) anti-joins BEFORE champions are picked — a deleted
    champion must not shadow its group's runner-up."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    terms = sorted(set(query_terms(query, cfg)))
    if not terms:
        return spark.createDataFrame(
            [], "group long, doc_id long, conv_id string, score double"
        )
    scored = _suppress(
        bm25_scores_terms(spark, index, terms, cfg, with_dl=True), exclude_docs
    ).withColumn(
        "group", F.floor(F.col("dl") / F.lit(float(width))).cast("long")
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), F.asc("doc_id"))
    champions = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("group", "doc_id", "score")
    )
    top = champions.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    out = top.join(index.doc_meta.select("doc_id", "conv_id"), "doc_id")
    return out.select("group", "doc_id", "conv_id", "score").orderBy(
        F.desc("score"), F.asc("doc_id")
    )


def group_topk(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    k: int = 5,
    group_limit: int = 2,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
    group_sort: str = "score desc",
) -> DataFrame:
    """Result grouping — Solr's ``group=true&group.field=…&
    group.limit=g``: the top ``k`` GROUPS (ranked by each group's best
    doc, Solr's default group order), each carrying its own top
    ``group_limit`` docs. Where :func:`collapse_topk` keeps one
    survivor per group competing in a flat page, grouping returns the
    per-group result lists themselves. Group key: the same dl bucket
    (``floor(dl / width)``) collapse and the range facet use — a
    doc-values key the posting rows already carry, so no doc_meta join
    before ranking.

    Output: (group, doc_id, conv_id, score, rn) — ``rn`` is the doc's
    1-based rank within its group (score DESC, doc_id ASC); groups
    orderable by their rn=1 row's score.

    Plan shape: ONE hash shuffle on the group key ranks docs within
    groups; each group's best doc IS its rn=1 row, so the group page
    is a k-row TakeOrderedAndProject over the champions (no second
    window, no second shuffle), broadcast back against the
    <= group_limit-deep ranked rows; conv_id resolves after, when only
    k*group_limit rows remain."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if group_limit <= 0:
        raise ValueError(f"group_limit must be positive, got {group_limit}")
    terms = sorted(set(query_terms(query, cfg)))
    empty = "group long, doc_id long, conv_id string, score double, rn int"
    if not terms:
        return spark.createDataFrame([], empty)
    scored = _suppress(
        bm25_scores_terms(spark, index, terms, cfg, with_dl=True), exclude_docs
    ).withColumn(
        "group", F.floor(F.col("dl") / F.lit(float(width))).cast("long")
    )
    # Solr's group.sort: the WITHIN-group order may differ from the
    # group ranking (which stays by each group's best SCORE — the
    # main sort). doc_id asc appends as the deterministic tiebreak.
    w = Window.partitionBy("group").orderBy(
        *_group_sort_cols(group_sort), F.asc("doc_id")
    )
    ranked = (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= group_limit)
        .select("group", "doc_id", "score", "rn")
    )
    # group ranking is ALWAYS by best score (decoupled from
    # group.sort: under a non-score group.sort the rn=1 row is not
    # the group's best-scoring doc)
    top_groups = (
        scored.groupBy("group")
        .agg(F.max("score").alias("_best"))
        .orderBy(F.desc("_best"), F.asc("group"))
        .limit(k)
    )
    out = ranked.join(F.broadcast(top_groups.select("group")), "group").join(
        index.doc_meta.select("doc_id", "conv_id"), "doc_id"
    )
    return out.select("group", "doc_id", "conv_id", "score", "rn").orderBy(
        F.asc("group"), F.asc("rn")
    )


def collapse_expand(
    spark: SparkSession,
    index: Index,
    query: str,
    width: int = 64,
    k: int = 10,
    expand_rows: int = 2,
    cfg: IndexConfig = DEFAULT,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Solr's ExpandComponent (``expand=true&expand.rows=N``): the
    collapsed page PLUS, for each group that made the page, up to
    ``expand_rows`` of the docs the collapse hid — the
    champion-with-runners-up response shape.

    Output: (group, doc_id, conv_id, score, expanded) — expanded=false
    rows are the collapsed page (exactly :func:`collapse_topk`'s k
    rows), expanded=true rows are each page group's next
    ``expand_rows`` docs by (score DESC, doc_id ASC). Groups outside
    the page never expand (Solr's contract: expand is scoped to the
    main result's groups).

    Plan shape: ONE scoring pass and ONE group-keyed rank window
    serve both halves (rn == 1 -> champions, 2..expand_rows+1 ->
    expansion candidates); the page cut is a k-row
    TakeOrderedAndProject over champions, broadcast back to admit
    only page groups' expansion rows; conv_id resolves once on the
    <= k*(1+expand_rows)-row union."""
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if expand_rows < 1:
        raise ValueError(f"expand_rows must be >= 1, got {expand_rows}")
    terms = sorted(set(query_terms(query, cfg)))
    empty = "group long, doc_id long, conv_id string, score double, expanded boolean"
    if not terms:
        return spark.createDataFrame([], empty)
    scored = _suppress(
        bm25_scores_terms(spark, index, terms, cfg, with_dl=True), exclude_docs
    ).withColumn(
        "group", F.floor(F.col("dl") / F.lit(float(width))).cast("long")
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= expand_rows + 1)
        .select("group", "doc_id", "score", "_rn")
    )
    page = (
        ranked.where(F.col("_rn") == 1)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("group", "doc_id", "score")
    )
    page_groups = F.broadcast(page.select("group"))
    expansion = ranked.where(F.col("_rn") > 1).join(page_groups, "group")
    union = page.select(
        "group", "doc_id", "score", F.lit(False).alias("expanded")
    ).unionByName(
        expansion.select(
            "group", "doc_id", "score", F.lit(True).alias("expanded")
        )
    )
    out = F.broadcast(union).join(
        index.doc_meta.select("doc_id", "conv_id"), "doc_id"
    )
    return out.select("group", "doc_id", "conv_id", "score", "expanded").orderBy(
        "group", "expanded", F.desc("score"), F.asc("doc_id")
    )
