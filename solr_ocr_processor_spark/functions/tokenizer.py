"""Vectorized tokenizer with character-offset capture.

The analog of the reference's word-coordinate capture: when converting
ALTO/hOCR to MiniOCR it keeps, for every word, its content plus an
``x="HPOS VPOS WIDTH HEIGHT"`` payload (app/process/alto.go:275-385,
app/process/hocr.go:47-183). Our payload per token is
(token_pos, char_start, char_end) in doc-text coordinates, which later
maps onto turns via the turn char ranges (highlight offsets, Q10).

Normalization lesson from the reference: whatever transform happens at
build time must be applied identically to queries
(app/assets/build/config.yml:34-39; escape-at-build
app/process/encoding.go:10-32). ``normalize``/``tokenize_batch`` are
the single shared implementation used by build, query parsing, AND the
in-repo oracle scorer.

All batch paths are pandas/numpy vectorized (mapInPandas over Arrow
batches) — no row-at-a-time Python UDFs anywhere.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import DEFAULT, IndexConfig

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("token_pos", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("char_start", T.LongType(), False),
        T.StructField("char_end", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)


def normalize(text: str, cfg: IndexConfig = DEFAULT) -> str:
    """Index-time == query-time normalization (casefold + NFKC).

    NOTE offsets: the tokenizer records offsets in the NORMALIZED
    string. casefold/NFKC can change lengths for exotic codepoints;
    for highlight fidelity we normalize per-turn at materialization too
    so coordinates always refer to the same normalized space.
    """
    if cfg.unicode_nfkc:
        text = unicodedata.normalize("NFKC", text)
    if cfg.casefold:
        text = text.casefold()
    return text


def tokenize_text(text: str, cfg: IndexConfig = DEFAULT) -> list[tuple[int, str, int, int]]:
    """(token_pos, term, char_start, char_end) for one string.
    Driver-side helper for query parsing and the oracle scorer."""
    pat = re.compile(cfg.token_pattern)
    out = []
    norm = normalize(text, cfg)
    for i, m in enumerate(pat.finditer(norm)):
        out.append((i, m.group(0), m.start(), m.end()))
    return out


def query_terms(query: str, cfg: IndexConfig = DEFAULT) -> list[str]:
    """Distinct query terms in first-occurrence order."""
    seen: dict[str, None] = {}
    for _, term, _, _ in tokenize_text(query, cfg):
        seen.setdefault(term)
    return list(seen)


def tokenize_turns(
    turns: DataFrame,
    cfg: IndexConfig = DEFAULT,
    num_partitions: int | None = None,
) -> DataFrame:
    """Tokenize documents WITHOUT ever materializing doc_text.

    Input: the materialized turns frame (doc_id, conv_id, ordinal,
    text, char_start). The pass repartitions by conv_id, sorts turns
    within partitions, and streams them through one stateful
    mapInPandas: per conversation it keeps a running token counter and
    emits token rows with doc-global token_pos and char offsets
    (turn.char_start + match offset). Because the token pattern cannot
    match across the single-space joiner, per-turn tokenization is
    EXACTLY doc-level tokenization of the joined text — verified
    against the pandas oracle (which does join) in rank-identity tests.

    Why: assembling doc_text via groupBy+collect_list+array_sort was
    the single most expensive and worst-scaling stage of the build
    (JVM string/array garbage, measured >2 min at 12M turns on 32
    cores). This pass shuffles only turn rows, assembles nothing, and
    its Python cost is the regex scan itself.

    State discipline: a conversation's turns can span Arrow batch
    boundaries within a partition (batches arrive in partition sort
    order), so the generator buffers the open conversation and flushes
    completed ones; dl backfills when a conversation closes.
    """
    pat_src = cfg.token_pattern
    do_nfkc, do_fold = cfg.unicode_nfkc, cfg.casefold
    if num_partitions is None:
        num_partitions = int(
            turns.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )

    part = (
        turns.select("doc_id", "conv_id", "ordinal", "text", "char_start")
        .repartition(num_partitions, "conv_id")
        .sortWithinPartitions("conv_id", "ordinal")
    )

    # Yield in moderate chunks: one huge burst can fill the worker's
    # output socket faster than the JVM drains it under concurrent
    # stages (observed as a tcp send-buffer stall at 12M turns).
    FLUSH_ROWS = 50_000

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(pat_src)
        out = {k: [] for k in ("doc_id", "token_pos", "term", "char_start", "char_end", "dl")}
        # open-conversation buffer: rows already tokenized but dl unknown
        cur_conv = None
        cur_doc = -1
        cur_n = 0  # running token count of the open conv
        buf: list[tuple[int, str, int, int]] = []  # (pos, term, start, end)

        def close_conv():
            nonlocal buf, cur_n
            if cur_conv is not None and buf:
                out["doc_id"].extend([cur_doc] * len(buf))
                out["dl"].extend([cur_n] * len(buf))
                for p, term, s, e in buf:
                    out["token_pos"].append(p)
                    out["term"].append(term)
                    out["char_start"].append(s)
                    out["char_end"].append(e)
            buf = []
            cur_n = 0

        def emit() -> pd.DataFrame:
            pdf = pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "token_pos": pd.Series(out["token_pos"], dtype="int32"),
                    "term": pd.Series(out["term"], dtype="object"),
                    "char_start": pd.Series(out["char_start"], dtype="int64"),
                    "char_end": pd.Series(out["char_end"], dtype="int64"),
                    "dl": pd.Series(out["dl"], dtype="int64"),
                }
            )
            for k in out:
                out[k] = []
            return pdf

        for pdf_in in batches:
            for did, conv, text, cstart in zip(
                pdf_in["doc_id"].values,
                pdf_in["conv_id"].values,
                pdf_in["text"].values,
                pdf_in["char_start"].values,
            ):
                if conv != cur_conv:
                    close_conv()
                    cur_conv, cur_doc = conv, did
                    if len(out["doc_id"]) >= FLUSH_ROWS:
                        yield emit()
                if text is None:
                    continue
                s = text
                if do_nfkc:
                    s = unicodedata.normalize("NFKC", s)
                if do_fold:
                    s = s.casefold()
                base = int(cstart)
                for m in pat.finditer(s):
                    buf.append((cur_n, m.group(0), base + m.start(), base + m.end()))
                    cur_n += 1
            if len(out["doc_id"]) >= FLUSH_ROWS:  # closed convs only
                yield emit()
        close_conv()
        if out["doc_id"]:
            yield emit()

    return part.mapInPandas(_tok, TOKEN_SCHEMA)


def count_turn_tokens(turns: DataFrame, cfg: IndexConfig = DEFAULT) -> DataFrame:
    """(conv_id, n_toks) per turn — the token COUNT under exactly the
    build tokenizer's normalization (NFKC + casefold + pattern), with
    none of the per-token rows. One narrow mapInPandas scan, no
    shuffle: feeds the global corpus-stats prepass that sharded builds
    need BEFORE any shard index exists (lifecycle.build_store step 0),
    so block-max bounds are computed against the global avgdl."""
    pat_src = cfg.token_pattern
    do_nfkc, do_fold = cfg.unicode_nfkc, cfg.casefold

    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("n_toks", T.LongType(), False),
        ]
    )

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(pat_src)
        for pdf in batches:
            counts = []
            for text in pdf["text"].values:
                if text is None:
                    counts.append(0)
                    continue
                s = text
                if do_nfkc:
                    s = unicodedata.normalize("NFKC", s)
                if do_fold:
                    s = s.casefold()
                counts.append(sum(1 for _ in pat.finditer(s)))
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].astype("object"),
                    "n_toks": pd.Series(counts, dtype="int64"),
                }
            )

    return turns.select("conv_id", "text").mapInPandas(_count, out_schema)


def tokenize_docs(docs: DataFrame, cfg: IndexConfig = DEFAULT) -> DataFrame:
    """doc-level tokenization: (doc_id, doc_text) -> token rows.

    mapInPandas: each Arrow batch of docs explodes to token rows with
    positions + offsets computed by a compiled regex over the
    normalized doc text. Vectorized at the batch level; the regex scan
    per doc is C-speed (re module), no Python per-token loop beyond
    list building.
    """
    pat_src = cfg.token_pattern
    do_nfkc, do_fold = cfg.unicode_nfkc, cfg.casefold

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(pat_src)
        for pdf in batches:
            doc_ids: list[int] = []
            poss: list[int] = []
            terms: list[str] = []
            starts: list[int] = []
            ends: list[int] = []
            dls: list[int] = []
            for did, text in zip(pdf["doc_id"].values, pdf["doc_text"].values):
                if text is None:
                    continue
                s = text
                if do_nfkc:
                    s = unicodedata.normalize("NFKC", s)
                if do_fold:
                    s = s.casefold()
                first = len(poss)
                for i, m in enumerate(pat.finditer(s)):
                    doc_ids.append(did)
                    poss.append(i)
                    terms.append(m.group(0))
                    starts.append(m.start())
                    ends.append(m.end())
                # dl (doc token count) denormalized onto every token row
                # — BM25's length norm without ever joining doc_meta in
                # the hot path (1 varint in blocks; constant col here).
                dls.extend([len(poss) - first] * (len(poss) - first))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "token_pos": pd.Series(poss, dtype="int32"),
                    "term": pd.Series(terms, dtype="object"),
                    "char_start": pd.Series(starts, dtype="int64"),
                    "char_end": pd.Series(ends, dtype="int64"),
                    "dl": pd.Series(dls, dtype="int64"),
                }
            )

    return docs.select("doc_id", "doc_text").mapInPandas(_tok, TOKEN_SCHEMA)
