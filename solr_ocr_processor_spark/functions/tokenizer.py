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


POSTING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.LongType(), False),
        T.StructField("pos_bytes", T.BinaryType(), False),
        T.StructField("loc_bytes", T.BinaryType(), False),
    ]
)


def tokenize_postings(
    turns: DataFrame,
    cfg: IndexConfig = DEFAULT,
    num_partitions: int | None = None,
) -> DataFrame:
    """Tokenize documents into PER-POSTING rows — the primary index
    artifact: (doc_id, term, tf, dl, pos_bytes, loc_bytes).

    - ``pos_bytes``: the posting's doc-global token positions,
      delta+varint (first absolute). Concatenating postings in doc
      order reproduces the block position stream bit-for-bit (the
      codec resets deltas at posting boundaries), so the block encoder
      just joins byte slices — it never re-encodes positions.
    - ``loc_bytes``: per occurrence (char_start gap, length) varint
      pairs — the highlight payload, decoded only for query winners.

    Why posting rows instead of one row per token: Spark's JVM->Python
    Arrow writer costs ~1 µs per VALUE regardless of type (measured:
    65M-token flat transfer ≈ 24 s on 8 cores, all-int identical), so
    the per-token layout made the downstream block shuffle
    transfer-bound. Posting rows carry ~2.3x fewer rows and pack
    positions as binary (one value per row), cutting the values moved
    through the expensive direction by >2x. The flat token view still
    exists for tests/small corpora (``flat_tokens``), derived by a
    vectorized decode.

    Python->JVM output (this function) rides the cheap direction: the
    JVM reads Arrow columns vectorized.
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

    FLUSH_ROWS = 50_000

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codec import gap_reset, varint_slices

        pat = re.compile(pat_src)
        out = {k: [] for k in ("doc_id", "term", "tf", "dl", "pos_bytes", "loc_bytes")}
        cur_conv = None
        cur_doc = -1
        # open-conversation accumulators
        tid_of: dict[str, int] = {}
        terms_seen: list[str] = []
        tids: list[int] = []
        poss: list[int] = []
        stts: list[int] = []
        lens: list[int] = []

        def close_conv():
            nonlocal tid_of, terms_seen, tids, poss, stts, lens
            n = len(tids)
            if cur_conv is not None and n:
                tid_a = np.asarray(tids, dtype=np.int64)
                pos_a = np.asarray(poss, dtype=np.int64)
                stt_a = np.asarray(stts, dtype=np.int64)
                len_a = np.asarray(lens, dtype=np.int64)
                order = np.argsort(tid_a, kind="stable")
                tid_a, pos_a, stt_a, len_a = (
                    tid_a[order], pos_a[order], stt_a[order], len_a[order]
                )
                bnd = np.flatnonzero(
                    np.concatenate(([True], tid_a[1:] != tid_a[:-1]))
                )
                tfs = np.diff(np.concatenate((bnd, [n])))
                pos_slices = varint_slices(
                    gap_reset(pos_a, tfs).astype(np.uint64), tfs
                )
                locv = np.empty(2 * n, dtype=np.int64)
                locv[0::2] = gap_reset(stt_a, tfs)
                locv[1::2] = len_a
                loc_slices = varint_slices(locv.astype(np.uint64), tfs * 2)
                out["doc_id"].extend([cur_doc] * bnd.size)
                out["dl"].extend([n] * bnd.size)
                out["term"].extend(terms_seen[t] for t in tid_a[bnd])
                out["tf"].extend(tfs.tolist())
                out["pos_bytes"].extend(pos_slices)
                out["loc_bytes"].extend(loc_slices)
            tid_of = {}
            terms_seen = []
            tids, poss, stts, lens = [], [], [], []

        def emit() -> pd.DataFrame:
            pdf = pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "term": pd.Series(out["term"], dtype="object"),
                    "tf": pd.Series(out["tf"], dtype="int32"),
                    "dl": pd.Series(out["dl"], dtype="int64"),
                    "pos_bytes": pd.Series(out["pos_bytes"], dtype="object"),
                    "loc_bytes": pd.Series(out["loc_bytes"], dtype="object"),
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
                npos = len(tids)
                for m in pat.finditer(s):
                    t = m.group(0)
                    tid = tid_of.get(t)
                    if tid is None:
                        tid = len(terms_seen)
                        tid_of[t] = tid
                        terms_seen.append(t)
                    tids.append(tid)
                    poss.append(npos)
                    npos += 1
                    stts.append(base + m.start())
                    lens.append(m.end() - m.start())
            if len(out["doc_id"]) >= FLUSH_ROWS:
                yield emit()
        close_conv()
        if out["doc_id"]:
            yield emit()

    return part.mapInPandas(_tok, POSTING_SCHEMA)


def flat_tokens(postings: DataFrame) -> DataFrame:
    """Decode posting rows back into the flat positional token view
    (doc_id, token_pos, term, char_start, char_end, dl) — one row per
    occurrence. Vectorized: each Arrow batch's pos/loc byte streams are
    joined and decoded in ONE numpy pass (the codec's posting-boundary
    delta resets make concatenated streams decodable with the tf
    vector). Used by tests and by query operators AFTER a term filter
    has already shrunk the posting set — never on the full corpus in a
    hot path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codec import decode_locs, decode_positions

        for pdf in batches:
            if not len(pdf):
                continue
            tfs = pdf["tf"].values.astype(np.int64)
            pos = decode_positions(tfs, b"".join(pdf["pos_bytes"].values))
            starts, ends = decode_locs(tfs, b"".join(pdf["loc_bytes"].values))
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].values.astype(np.int64), tfs),
                    "token_pos": pos.astype(np.int32),
                    "term": np.repeat(pdf["term"].values, tfs),
                    "char_start": starts,
                    "char_end": ends,
                    "dl": np.repeat(pdf["dl"].values.astype(np.int64), tfs),
                }
            )

    return postings.select(
        "doc_id", "term", "tf", "dl", "pos_bytes", "loc_bytes"
    ).mapInPandas(gen, TOKEN_SCHEMA)


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
