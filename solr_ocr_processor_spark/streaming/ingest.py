"""Structured Streaming ingest: incremental index maintenance.

The reference is strictly batch request/response (SURVEY §2.6 —
no event-time logic anywhere); its incremental story is "POST another
item" (app/handler/indexer.go:46-151). At 10^12-turn scale the analog
is a continuous feed of new transcript turns. This module gives the
engine a streaming surface without inventing semantics the reference
lacks:

- :func:`stream_transcripts`    — readStream over a transcript
  directory (files = micro-batches; on a cluster, Kafka/Iceberg
  incremental scan slots in with the same downstream code).
- :func:`turn_token_stream`     — per-turn tokenization as pure
  built-in expressions (JVM codegen end-to-end; the batch tokenizer's
  regex, turn-local positions).
- :func:`append_to_index`       — foreachBatch appender: each
  micro-batch's token rows land in the store's ``stream_tokens``
  table; the streaming checkpoint makes the append resumable
  (exactly-once file sink), the streaming analog of the per-shard
  build manifest. A periodic compaction folds ``stream_tokens`` into
  the main index (same code path as lifecycle.compact).
- :func:`turns_per_window`      — event-time windowed counts per role
  with a watermark: the standard late-data-tolerant monitoring agg
  over the ingest stream (build-metrics analog of S11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming source of transcript rows (one file set per batch)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )


def turn_token_stream(stream: DataFrame, cfg: IndexConfig = DEFAULT) -> DataFrame:
    """(conv_id, turn_idx, ts, pos_in_turn, term, char_start, char_end)
    per token of each non-empty turn — the same normalization contract
    as the batch tokenizer (lower + the [a-z0-9]+ pattern), expressed
    with built-ins so the stream stays in whole-stage codegen.

    Positions are turn-local here; doc-global offsets require the
    turn's final ordinal, which is only stable at compaction time —
    exactly the reference's lesson that ordinals must come from the
    full ordered set (app/handler/indexer.go:71-95).
    """
    toks = F.expr(f"regexp_extract_all(lower(text), '{cfg.token_pattern}', 0)")
    return (
        stream.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            F.posexplode(toks).alias("pos_in_turn", "term"),
        )
    )


def append_to_index(
    tokens: DataFrame, store_root: str, checkpoint_dir: str
):
    """Resumable micro-batch append of streaming tokens into the store.

    Returns the StreamingQuery. foreachBatch alone is only
    at-least-once (a crash between the write and the checkpoint commit
    replays the batch), so the write is made IDEMPOTENT: each batch
    overwrites its own ``batch_id=N`` subdirectory — a replay rewrites
    the same rows instead of appending duplicates, which would
    silently inflate tf/df once the stream folds into the index. The
    checkpoint + idempotent write together give exactly-once, the
    streaming analog of lifecycle.build_store's shard manifest.
    """
    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{store_root}/stream_tokens/batch_id={batch_id}")
        )

    return (
        tokens.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def turns_per_window(
    stream: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time turns-per-window per role with late-data tolerance.

    The watermark bounds state: turns later than ``watermark`` behind
    the max event time are dropped instead of growing state forever —
    the standard correctness/cost trade for unbounded streams.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            # exact distinct is unsupported on streams (unbounded
            # state); HLL sketch is the standard streaming answer
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_convs",
        )
    )
