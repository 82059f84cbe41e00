"""Document materialization — the ingest analog.

The reference turns an ordered list of OCR page files into Solr docs
with a dense positional ordinal ``Page.{position}`` that increments
only for non-empty, processed files (app/handler/indexer.go:98-148) —
the comment at indexer.go:71-80 warns that unstable ordering corrupts
word-highlight positions. Our analog:

- a *document* is a conversation, materialized in stable
  (conv_id, turn_idx, ts) order;
- empty/whitespace-only turns are filtered BEFORE the ordinal is
  assigned (dense ordinal semantics);
- each surviving turn gets doc-global character offsets
  [char_start, char_end) under a single-space joiner — the payload
  analog of the reference's per-word "HPOS VPOS WIDTH HEIGHT" string
  (app/process/alto.go:357-358);
- doc ids are DENSE and DETERMINISTIC: row_number over globally
  sorted conv_id, never monotonically_increasing_id (which is
  partition-layout-dependent and breaks resume identity — SURVEY §4.2).

Everything is plain DataFrame ops: one window per conv (narrow after a
hash partition on conv_id) and one global range-sort for doc ids.
At 10^12 turns the conv window shuffles once on conv_id; the doc-id
sort is over distinct conv_ids only (~3 orders of magnitude smaller).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

JOINER = " "  # single-space joiner between turn texts

# Doc-id maps up to this many rows are broadcast in materialize_docs
# (~40 B/row in the broadcast hash table -> ~160 MB at the cap, well
# inside a 32 g driver). Beyond it the join shuffles and the tokenizer
# pays its own repartition — correctness first at 10^9-conv scale.
BROADCAST_DOC_IDS_MAX = 4_000_000


@dataclass
class Materialized:
    turns: DataFrame  # conv_id, turn_idx, ordinal, role, tool, ts, text, char_start, char_end
    docs: DataFrame   # doc_id, conv_id, doc_text?, n_turns, n_chars, last_ts?
    # True iff each doc_id's turn rows are guaranteed wholly inside one
    # partition of `turns` (the tokenizer's no-shuffle precondition).
    # Only the BROADCAST doc-id join gives this guarantee: it preserves
    # the ordinal window's conv_id hash partitioning untouched. A
    # shuffled join does NOT — AQE skew-join splitting
    # (spark.sql.adaptive.skewJoin, on by default in session.py) splits
    # an oversized partition by map-output ranges, not by key, so one
    # conv's rows can land in two task splits and a downstream
    # per-partition kernel would see the doc twice.
    doc_co_located: bool = False
    # The PERSISTED ordered_turns node `turns` was derived from. `turns`
    # itself is a join on top of it, so unpersisting `turns` would not
    # release (or even find) the cache entry — a leak that also poisons
    # same-session retries after a crash: the next build's identical
    # logical plan over the same paths matches the stale entry and
    # silently serves rows whose backing files were replaced.
    turns_base: DataFrame | None = None
    # Intermediate caches from the deferred doc-id assignment (the
    # rank output + its range-partitioned parents). They stay cached
    # until the build finishes so the first REAL action materializes
    # them in-line instead of paying dedicated count() barrier jobs.
    extra_caches: tuple = ()
    # The subset of extra_caches needed ONLY until the rank output
    # materializes (the range-partitioned parents). Long-lived owners
    # that keep the index (and therefore the rank cache) alive should
    # call release_intermediates() after the first build action —
    # otherwise every build in a long session pins two conv-count-sized
    # caches it will never read again.
    intermediates: tuple = ()

    def unpersist(self) -> None:
        """Release every cache entry this materialization created."""
        for df in (self.docs, self.turns_base, *self.extra_caches):
            if df is not None:
                df.unpersist()

    def release_intermediates(self) -> None:
        """Release only the deferred-rank parents — safe once any build
        action has run (the rank cache is filled by then). Keeps turns/
        docs/doc-ids persisted for owners that serve queries."""
        for df in self.intermediates:
            df.unpersist()


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Filter empty turns, then assign the dense ordinal + char offsets.

    Order: (turn_idx, ts) within conv — turn_idx is authoritative, ts
    breaks duplicate turn_idx deterministically (reference bundle-order
    fallback, app/handler/indexer.go:178-184).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    nonempty = transcripts.where(F.length(F.trim(F.col("text"))) > 0)
    turns = nonempty.withColumn("ordinal", F.row_number().over(w) - F.lit(1))
    tlen = F.length("text")
    # char_start = sum of (len+joiner) over preceding turns of the conv
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    turns = turns.withColumn(
        "char_start",
        F.coalesce(F.sum(tlen + F.lit(len(JOINER))).over(prev), F.lit(0)).cast("long"),
    ).withColumn("char_end", (F.col("char_start") + tlen).cast("long"))
    return turns


def assign_doc_ids(turns: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Dense deterministic doc_id per conv_id: the global sorted rank
    of conv_id. Returns (doc_id, conv_id), materialized (persisted +
    counted) with the intermediate caches already released — the eager
    form for callers that immediately write the map out (lifecycle
    checkpoint, stream fold-in). :func:`materialize_docs` uses the
    deferred core instead to keep driver job barriers off the build's
    critical path."""
    out, _n, caches = _assign_doc_ids_deferred(turns, num_partitions)
    out.count()
    for c in caches:
        c.unpersist()
    return out


def _assign_doc_ids_deferred(
    turns: DataFrame, num_partitions: int | None = None
) -> tuple[DataFrame, int, tuple]:
    """Deferred two-pass doc-id rank. Returns ``(out, n_convs, caches)``
    where ``out`` is persisted but NOT yet materialized: the first
    downstream action fills the cache in-line, so no dedicated
    ``count()`` barrier job runs on the build path (Amdahl: barrier
    jobs are pure serial fraction — the 2→8 scaling profile attributed
    ~10 s of core-count-independent time to exactly these driver
    round-trips). ``n_convs`` is exact and FREE — it is the sum of the
    per-partition counts the offset pass already collected — so
    callers never re-count the map. ``caches`` (the range-partitioned
    parents) must stay persisted until ``out`` materializes; owners
    release them via ``Materialized.unpersist``.

    Scalable two-pass rank instead of a partitionless Window (which
    funnels every conv_id through ONE task): range-partition the
    distinct conv_ids, count per partition (tiny collect), turn the
    counts into partition offsets, and add the within-partition
    row_number. The result is the exact global rank — a pure function
    of the conv_id set, independent of where the sampled range
    boundaries fall — so determinism (SURVEY §4.2-5) is preserved
    while both passes stay fully parallel.
    """
    # Persisted: repartitionByRange submits an internal SAMPLING job
    # over its child to pick range boundaries — without the cache the
    # distinct (a full scan + shuffle of the turn table) runs twice.
    convs = turns.select("conv_id").distinct().persist()
    spark = convs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = convs.repartitionByRange(num_partitions, "conv_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.persist()
    counts = {r["_pid"]: r["n"] for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("conv_id")
    out = (
        parts.withColumn("_rn", F.row_number().over(w).cast("long") - F.lit(1))
        .join(F.broadcast(off_df), "_pid")
        .select((F.col("_rn") + F.col("_off")).alias("doc_id"), "conv_id")
    )
    # Persisted but not materialized here — see docstring. acc is the
    # exact conv count (sum of the per-partition counts).
    out = out.persist()
    return out, acc, (parts, convs)


def materialize_docs(
    transcripts: DataFrame,
    doc_map: DataFrame | None = None,
    with_text: bool = False,
    n_docs_hint: int | None = None,
) -> Materialized:
    """Full materialization: ordered turns + per-conversation metadata.

    By default ``doc_text`` is NOT materialized: every doc-level fact
    the engine needs (n_turns, n_chars, dl) is a plain aggregation, and
    tokenization streams the turns directly (tokenize_turns). Building
    doc_text via groupBy+collect_list+array_sort was the worst-scaling
    stage of the whole build (JVM string/array churn — minutes at 12M
    turns); pass ``with_text=True`` only when the inline text is the
    point (reference "full" indexing mode, tests).

    ``doc_map`` (doc_id, conv_id), when given, overrides the local
    doc-id assignment with a checkpointed global one — how resumable
    shard builds keep ids stable across runs (SURVEY §4.2-5);
    ``n_docs_hint`` is its EXACT row count when the caller already
    knows it (shard width, stream fold-in's distinct count), sparing
    the broadcast-decision count() job — a per-shard serial barrier
    in resumable builds.
    """
    # turns feeds three consumers (doc-id assignment, the doc agg, and
    # the output turns frame). Persist it or Spark recomputes the
    # scan+window chain once per consumer — measured 3-4x wall on the
    # build and the recompute compounds at high parallelism.
    base = ordered_turns(transcripts).persist()
    turns = base
    extra_caches: tuple = ()
    intermediates: tuple = ()
    if doc_map is not None:
        doc_ids = doc_map.select("doc_id", "conv_id")
        n_doc_ids = n_docs_hint if n_docs_hint is not None else doc_ids.count()
    else:
        doc_ids, n_doc_ids, parents = _assign_doc_ids_deferred(turns)
        extra_caches = (doc_ids, *parents)
        intermediates = parents
    # Broadcast the doc-id map when it is provably driver-sized. This
    # is a CORRECTNESS gate, not only a perf hint: the broadcast join
    # leaves the window's conv_id partitioning untouched, so the
    # tokenizer may skip its repartition (doc_partitioned=True). Past
    # the threshold the plain shuffled join is used and downstream
    # consumers must re-establish co-location themselves (see
    # Materialized.doc_co_located).
    doc_co_located = n_doc_ids <= BROADCAST_DOC_IDS_MAX
    if doc_co_located:
        doc_ids = F.broadcast(doc_ids)
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        # n_chars of the joined doc text, without joining it:
        # sum(len) + (n_turns - 1) joiner chars
        (
            F.sum(F.length("text"))
            + F.count(F.lit(1))
            - F.lit(1)
        ).cast("long").alias("n_chars"),
    ]
    # last_ts: the doc's last-activity timestamp, captured as a
    # doc-values column at BUILD time (Solr docValues discipline) so
    # date-range facets / sorts never re-aggregate the turn table at
    # query time. Rides the same groupBy — zero extra shuffle. ts is
    # always present (the ordinal window orders by it); only stores
    # written BEFORE this column existed lack it at read time.
    aggs.append(F.max("ts").alias("last_ts"))
    if with_text:
        aggs.insert(
            0,
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ordinal", "text"))),
                    lambda s: s["text"],
                ),
                JOINER,
            ).alias("doc_text"),
        )
    cols = ["doc_id", "conv_id", "n_turns", "n_chars", "last_ts"] + (
        ["doc_text"] if with_text else []
    )
    docs = turns.groupBy("conv_id").agg(*aggs).join(doc_ids, "conv_id").select(*cols)
    turns = turns.join(doc_ids, "conv_id").select(
        "doc_id",
        "conv_id",
        "turn_idx",
        "ordinal",
        "role",
        "tool",
        "ts",
        "text",
        "char_start",
        "char_end",
    )
    return Materialized(
        turns=turns,
        docs=docs,
        doc_co_located=doc_co_located,
        turns_base=base,
        extra_caches=extra_caches,
        intermediates=intermediates,
    )
