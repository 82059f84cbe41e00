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
from .dedup import dup_clusters
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
