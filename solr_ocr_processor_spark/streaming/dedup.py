"""Streaming exact dedup — a CUSTOM STATEFUL operator.

A training-data ingest stream must not admit a document whose exact
content already arrived — and "already" spans microbatches, so this
cannot be a windowed aggregation: it needs persistent per-key state.
:func:`dedup_doc_stream` is the Structured Streaming shape for that —
``groupBy(text_hash).applyInPandasWithState``:

- **key**: the md5 content hash (same discipline as
  operators/dedup.exact_dup_groups — Spark ``F.md5`` == DuckDB
  ``md5``, so the batch twin is oracle-replayable);
- **state**: one boolean per hash ("seen"), the minimal possible
  state — at 10^10 distinct documents the state store holds one flag
  per distinct hash, partitioned by the shuffle on the key, RocksDB-
  backed on a real cluster;
- **semantics**: FIRST occurrence wins. Within a microbatch the min
  id wins (deterministic under any partitioning — the grouped kernel
  sees ALL of the key's rows in the batch); across microbatches
  arrival order decides, which is the only causal choice a stream can
  make. A single-batch replay (``trigger(availableNow=True)`` over a
  static source) therefore equals the BATCH keep-one
  (exact_dup_groups' min-doc_id canonical) bit-for-bit — that identity
  is the correctness gate.

No timeout is registered: content identity never expires. A pipeline
that wants bounded state (e.g. dedup within a 30-day horizon) sets
``GroupStateTimeout.EventTimeTimeout`` and a watermark — one-line
change, noted here rather than implemented because unbounded identity
is the semantics the batch operators define.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_doc_stream(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First-occurrence-wins exact dedup over a document stream:
    emits one (id, text_hash) row per NEVER-SEEN-BEFORE content hash
    and drops every later duplicate, in this batch or any after it.
    Works on batch DataFrames too? No — state needs a stream; for
    batch use operators/dedup.exact_dup_groups (the semantics agree,
    see module docstring)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream.select(
        F.col(id_col).cast("long").alias("id"),
        F.md5(F.col(text_col).cast("binary")).alias("text_hash"),
    )

    def kernel(key, pdfs, state):
        if state.exists:
            return  # seen in an earlier microbatch: drop everything
        best = None
        for pdf in pdfs:  # iterator of chunks — fold, don't assume one
            if len(pdf):
                m = int(pdf["id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"id": [best], "text_hash": [key[0]]})

    return hashed.groupBy("text_hash").applyInPandasWithState(
        kernel,
        "id long, text_hash string",
        "seen boolean",
        "append",
        GroupStateTimeout.NoTimeout,
    )
