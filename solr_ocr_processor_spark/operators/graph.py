"""Graph traversal over an edge relation — the Solr ``{!graph}``
query parser analog (GraphQueryParserPlugin: ``{!graph from=f to=t
maxDepth=d}seed_query``).

Lucene-surface parity: the reference forwards query strings verbatim
to a stored Solr core (app/process/solr.go:48-49), and GraphQuery is
part of that core's parser registry — "find every doc reachable from
the seed set by following from-field -> to-field links, up to
maxDepth hops" (collection lineage, reply chains, citation hops).

Spark-first shape — bounded-depth BFS as ITERATIVE HASH JOINS, the
Pregel-lite pattern every distributed graph engine lowers to when the
depth is a small constant:

- the frontier starts as the seed set and each hop is
  ``frontier JOIN edges ON frontier.id = edges.src -> edges.dst``,
  unioned into the visited set with a dedup;
- each hop is one shuffle keyed on the join key. ``maxDepth`` hops =
  ``maxDepth`` shuffles, NOT an unbounded fixpoint loop — Solr's own
  GraphQuery bounds depth the same way (and its default,
  maxDepth=-1 full closure, is the connected-components op the engine
  already has: operators/dedup.py dup_clusters);
- the visited set is deduped per hop so a diamond (two paths to one
  node) costs one row, keeping frontier growth bounded by reachable
  |V|, never by path count (which is exponential);
- edges are re-used across hops: persist them once; a frontier that
  stays small (the common seed-expansion regime) broadcasts, so hops
  become shuffle-FREE map-side joins against the bucketed edge table.

The driver-facing query pairs this with a deterministic synthetic
edge relation over doc ids (:func:`synth_edges` — same discipline as
operators/multimodal.synth_media: the sandbox's tables carry no FK
edges, so the graph is derived reproducibly from ids and the oracle
replays the identical derivation relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_edges(docs: DataFrame, fanout: int = 2, stride: int = 7) -> DataFrame:
    """Deterministic edge relation over a doc-id table: node i links to
    ``(i * 31 + j * stride + 1) % n`` for j in [0, fanout) — a sparse
    pseudo-random digraph that is pure column arithmetic (exactly
    replayable in SQL). Returns (src, dst), self-loops dropped.

    ``docs`` must expose ``doc_id``; n is taken as ``max(doc_id) + 1``
    (dense ids are a build invariant — plans/materialize.py)."""
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    j = F.explode(F.sequence(F.lit(0), F.lit(fanout - 1))).alias("j")
    edges = (
        docs.select(F.col("doc_id").alias("src"))
        .select("src", j)
        .select(
            "src",
            F.pmod(
                F.col("src") * F.lit(31) + F.col("j") * F.lit(stride) + F.lit(1),
                F.lit(int(n)),
            ).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return edges


def graph_expand(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 2,
) -> DataFrame:
    """All nodes reachable from ``seeds`` in at most ``max_depth`` hops
    (seeds themselves included at depth 0). Returns (node, depth) with
    depth = LENGTH OF THE SHORTEST PATH from the seed set, ordered by
    (depth, node) — the deterministic BFS layering.

    ``seeds``: a DataFrame with a ``node`` column; ``edges``: (src,
    dst). Each hop joins the CURRENT frontier (nodes first reached at
    depth d) against edges and anti-joins everything already visited,
    so a node is emitted exactly once at its minimal depth. Work per
    hop is |frontier ⋈ edges| — the textbook BFS bound — and the
    visited set is carried as a DataFrame union whose dedup rides the
    same shuffle as the next hop's join."""
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0 (use dup_clusters for closure)")
    visited = seeds.select(F.col("node").cast("long").alias("node")).distinct(
    ).withColumn("depth", F.lit(0))
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited.orderBy("depth", "node")


def shortest_path(
    edges: DataFrame, src: int, dst: int, max_depth: int = 6
) -> DataFrame:
    """Solr ``shortestPath()`` streaming-expression analog (the graph
    verb next to ``nodes()`` in the /stream registry the reference's
    Solr core exposes; the reference forwards such expressions verbatim
    — app/process/solr.go:48-49): THE deterministic shortest path from
    ``src`` to ``dst`` over ``edges`` (src, dst), as (step, node) rows,
    step 0 = src … step L = dst; empty if ``dst`` is unreachable within
    ``max_depth`` hops.

    Spark-first shape, two bounded phases:

    1. **BFS with min-parent** — the same iterative-hash-join layering
       as :func:`graph_expand`, but each newly-reached node also
       records ``parent = min(src over the reaching frontier edges)``.
       Solr breaks shortest-path ties by traversal order, which is
       partition-dependent; min-parent is the deterministic refinement
       (lowest-id predecessor), so the SAME path comes back on any
       cluster layout and the relational oracle can replay it. One
       shuffle per hop, lineage truncated per hop
       (``localCheckpoint``, the dup_clusters discipline), early-exit
       as soon as ``dst`` enters the frontier.
    2. **Distributed backtrack** — ``max_depth`` broadcast joins of the
       one-row current-path-node set against the parents table; the
       union of joined rows IS the path (each node on it appears in
       parents exactly once, at its BFS depth = its step). No driver
       loop over collected parents: the parents relation can be
       |V|-sized at 10^12-doc scale, while every backtrack probe moves
       one broadcast row.
    """
    spark = edges.sparkSession
    src, dst = int(src), int(dst)
    parents = spark.createDataFrame(
        [(src, None, 0)], "node long, parent long, depth int"
    )
    frontier = parents.select("node")
    found = src == dst
    for d in range(1, max_depth + 1):
        if found:
            break
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "src")
            .groupBy("node")
            .agg(F.min("src").alias("parent"))
            .join(parents.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .select("node", "parent", "depth")
            .localCheckpoint(eager=True)
        )
        parents = parents.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
        found = nxt.where(F.col("node") == F.lit(dst)).limit(1).count() > 0
    path = parents.where(F.col("node") == F.lit(dst))
    acc = path
    for _ in range(max_depth):
        path = parents.join(
            F.broadcast(
                path.where(F.col("parent").isNotNull()).select(
                    F.col("parent").alias("node")
                )
            ),
            "node",
        )
        acc = acc.unionByName(path)
    return acc.select(F.col("depth").alias("step"), "node").orderBy("step")


def score_nodes(
    edges: DataFrame, roots: DataFrame, n_nodes: int, k: int = 10
) -> DataFrame:
    """Solr ``scoreNodes()`` streaming-expression analog: relevance-
    score the nodes gathered by a one-hop ``nodes()`` walk so hub nodes
    that every walk reaches do not drown out discriminative ones —
    Solr's own formula is walk-count × idf over the collection link
    field; here ``score = cnt * ln((n_nodes + 1) / (indeg + 1))`` with
    ``indeg`` the node's GLOBAL in-degree in ``edges`` (the docFreq
    analog) and ``cnt`` the number of walk edges reaching it.

    Plan: two aggregates over the edge relation — the walk gather
    (edges ⋈ broadcast roots, grouped on dst) and the global in-degree
    (grouped on dst, shuffle keyed the same so AQE can reuse the
    exchange) — joined on node, scored as a column expression,
    TakeOrderedAndProject for the top-k. Returns (node, cnt, indeg,
    score) ordered score DESC, node ASC."""
    walk = (
        edges.join(F.broadcast(roots.withColumnRenamed("node", "src")), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("indeg")
    )
    scored = walk.join(indeg, "node").select(
        "node",
        "cnt",
        "indeg",
        F.round(
            F.col("cnt")
            * F.log(
                (F.lit(float(n_nodes)) + F.lit(1.0))
                / (F.col("indeg").cast("double") + F.lit(1.0))
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("node")).limit(int(k))


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    k: int = 20,
) -> DataFrame:
    """Fixed-iteration PageRank over the edge relation — the graph
    centrality companion to the BFS verbs (Solr exposes the same
    capability class through its graph streaming expressions; link
    authority over citation/reply graphs is the canonical use).

    Power iteration, the Pregel-lite pattern: ``r_{t+1}(v) = (1−d)/n
    + d·Σ_{(u,v)∈E} r_t(u)/outdeg(u)``, ``iters`` rounds from the
    uniform start. Dangling mass is NOT redistributed (the simple
    variant; the synthetic graphs here have no dangling nodes, and
    the redistribution term is one extra broadcast scalar when
    needed).

    Spark-first shape: outdegrees join the edge relation ONCE and the
    pair is lineage-truncated (localCheckpoint — the dup_clusters
    discipline); each round is one src-keyed broadcast-or-shuffle
    join + one dst-keyed aggregate + a left join back onto the node
    spine so rankless nodes keep the teleport term. Lineage truncates
    every round, so the plan stays O(1) deep regardless of ``iters``.

    Returns (node, rank) rounded 6dp, ordered rank DESC, node ASC,
    top ``k``."""
    n = nodes.count()
    d = float(damping)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(deg, "src").localCheckpoint(eager=True)
    spine = nodes.select(F.col("node").cast("long").alias("node")).distinct()
    ranks = spine.withColumn("r", F.lit(1.0 / n))
    for _ in range(int(iters)):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            spine.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.select("node", F.round("r", 6).alias("rank"))
        .orderBy(F.desc(F.col("rank")), F.asc("node"))
        .limit(int(k))
    )
