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
    doc_partitioned: bool = False,
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

    # Transfer diet: the Python side needs only (doc_id, text,
    # char_start). conv_id was carried solely to detect document
    # boundaries — doc_id is 1:1 with conv and does the same job
    # without shipping 1 string value/row through the ~1 µs/value
    # JVM->Python pipe; ordinal is only the JVM-side sort key, pruned
    # by the projection AFTER the sort. 5 -> 3 values/row, and the two
    # dropped columns were the widest (string) and a long.
    #
    # ``doc_partitioned``: the kernel below needs each doc's rows
    # CONTIGUOUS in one partition, nothing more. materialize_docs
    # already hash-partitions turns by conv_id (the ordinal window's
    # shuffle) and doc_id is 1:1 with conv_id, so for that caller the
    # repartition here would re-shuffle the full turn table to arrive
    # at an equivalent layout — the in-partition sort alone
    # re-establishes contiguity after the doc-id join. Callers passing
    # arbitrarily-partitioned turns keep the explicit shuffle.
    sel = turns.select("doc_id", "ordinal", "text", "char_start")
    if not doc_partitioned:
        sel = sel.repartition(num_partitions, "doc_id")
    part = (
        sel.sortWithinPartitions("doc_id", "ordinal")
        .select("doc_id", "text", "char_start")
    )

    # Flush granularity: the numpy encode (lexsort + delta + varint)
    # runs once per ~this many buffered tokens, amortizing numpy call
    # overhead across hundreds of conversations — a per-conversation
    # encode measured ~150 µs of fixed numpy overhead per conv, which
    # at 500k convs dominated the tokenizer.
    FLUSH_TOKENS = 200_000

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .codec import gap_reset, varint_slices

        pat = re.compile(pat_src)
        cur_doc = None
        # flush-buffer state: token-level parallel lists spanning many
        # docs; per-doc term dictionaries for string lookup at encode
        doc_terms: list[list[str]] = []   # per buffered doc: tid -> term
        doc_ids_of: list[int] = []        # per buffered doc: doc_id
        tid_of: dict[str, int] = {}       # open doc's term -> tid
        docix: list[int] = []
        tids: list[int] = []
        poss: list[int] = []
        stts: list[int] = []
        lens: list[int] = []
        npos = 0  # open doc's running token counter

        def flush() -> pd.DataFrame | None:
            """Encode every buffered (complete) doc's postings in ONE
            vectorized pass: stable lexsort by (doc, term), boundary
            detection, grouped delta+varint with per-posting slices."""
            n = len(tids)
            if not n:
                return None
            dx = np.asarray(docix, dtype=np.int64)
            td = np.asarray(tids, dtype=np.int64)
            ps = np.asarray(poss, dtype=np.int64)
            st = np.asarray(stts, dtype=np.int64)
            ln = np.asarray(lens, dtype=np.int64)
            order = np.lexsort((td, dx))  # stable: position order kept
            dx, td, ps, st, ln = dx[order], td[order], ps[order], st[order], ln[order]
            bnd = np.flatnonzero(
                np.concatenate(([True], (dx[1:] != dx[:-1]) | (td[1:] != td[:-1])))
            )
            tfs = np.diff(np.concatenate((bnd, [n])))
            dls = np.bincount(dx, minlength=len(doc_terms))
            gdx = dx[bnd]
            did_arr = np.asarray(doc_ids_of, dtype=np.int64)
            pos_slices = varint_slices(gap_reset(ps, tfs).astype(np.uint64), tfs)
            locv = np.empty(2 * n, dtype=np.int64)
            locv[0::2] = gap_reset(st, tfs)
            locv[1::2] = ln
            loc_slices = varint_slices(locv.astype(np.uint64), tfs * 2)
            gtid = td[bnd]
            terms = [doc_terms[i][t] for i, t in zip(gdx, gtid)]
            pdf = pd.DataFrame(
                {
                    "doc_id": did_arr[gdx],
                    "term": pd.Series(terms, dtype="object"),
                    "tf": tfs.astype(np.int32),
                    "dl": dls[gdx],
                    "pos_bytes": pd.Series(pos_slices, dtype="object"),
                    "loc_bytes": pd.Series(loc_slices, dtype="object"),
                }
            )
            doc_terms.clear()
            doc_ids_of.clear()
            docix.clear()
            tids.clear()
            poss.clear()
            stts.clear()
            lens.clear()
            return pdf

        for pdf_in in batches:
            for did, text, cstart in zip(
                pdf_in["doc_id"].values,
                pdf_in["text"].values,
                pdf_in["char_start"].values,
            ):
                if did != cur_doc:
                    # only flush at doc boundaries: groups never split
                    if len(tids) >= FLUSH_TOKENS:
                        pdf_out = flush()
                        if pdf_out is not None:
                            yield pdf_out
                    cur_doc = did
                    tid_of = {}
                    npos = 0
                    doc_terms.append([])
                    doc_ids_of.append(int(did))
                if text is None:
                    continue
                s = text
                if do_nfkc:
                    s = unicodedata.normalize("NFKC", s)
                if do_fold:
                    s = s.casefold()
                base = int(cstart)
                dxi = len(doc_terms) - 1
                terms_seen = doc_terms[-1]
                for m in pat.finditer(s):
                    t = m.group(0)
                    tid = tid_of.get(t)
                    if tid is None:
                        tid = len(terms_seen)
                        tid_of[t] = tid
                        terms_seen.append(t)
                    docix.append(dxi)
                    tids.append(tid)
                    poss.append(npos)
                    npos += 1
                    stts.append(base + m.start())
                    lens.append(m.end() - m.start())
        pdf_out = flush()
        if pdf_out is not None:
            yield pdf_out

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


# ---------------------------------------------------------------------------
# Analysis-chain extras: Lucene's default English stop set + the
# Harman S-stemmer, both as pure column expressions so index-time,
# query-time and the DuckDB oracle share one definition.
# ---------------------------------------------------------------------------

# org.apache.lucene.analysis.en.EnglishAnalyzer#ENGLISH_STOP_WORDS_SET
# (Lucene's 33-word default; StandardAnalyzer inherits it).
STOPWORDS_EN = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)


def s_stem(col):
    """Harman's S-stemmer (Harman 1991, "How effective is suffixing?")
    — the minimal English plural stripper (same niche as Lucene's
    EnglishMinimalStemFilter): exactly one of three ordered rules
    fires:

      1. ``ies`` → ``y``   unless the word ends ``eies``/``aies``
      2. ``es``  → ``e``   (drop the s) unless ``aes``/``ees``/``oes``
      3. ``s``   → ``''``  unless ``us``/``ss``

    The LONGEST matching suffix selects its rule and the rule's
    exception blocks stemming OUTRIGHT (no fall-through: "goes"
    matches rule 2, its ``oes`` exception protects it, and rule 3
    never sees it — falling through would undo every exception).
    Words of length <= 2 pass through (nothing shorter has a plural
    suffix to strip). A pure nested-CASE + regexp_replace column
    expression — whole-stage codegen on Spark, literally replayable
    as SQL CASE in the oracle."""
    from pyspark.sql import Column, functions as F

    t = col if isinstance(col, Column) else F.col(col)
    return (
        F.when(F.length(t) <= 2, t)
        .when(
            t.rlike("ies$"),
            F.when(t.rlike("(eies|aies)$"), t).otherwise(
                F.regexp_replace(t, "ies$", "y")
            ),
        )
        .when(
            t.rlike("es$"),
            F.when(t.rlike("(aes|ees|oes)$"), t).otherwise(
                F.regexp_replace(t, "s$", "")
            ),
        )
        .when(
            t.rlike("s$"),
            F.when(t.rlike("(us|ss)$"), t).otherwise(
                F.regexp_replace(t, "s$", "")
            ),
        )
        .otherwise(t)
    )


S_STEM_SQL_CASE = """
CASE WHEN length({t}) <= 2 THEN {t}
     WHEN regexp_matches({t}, 'ies$')
       THEN CASE WHEN regexp_matches({t}, '(eies|aies)$') THEN {t}
                 ELSE regexp_replace({t}, 'ies$', 'y') END
     WHEN regexp_matches({t}, 'es$')
       THEN CASE WHEN regexp_matches({t}, '(aes|ees|oes)$') THEN {t}
                 ELSE regexp_replace({t}, 's$', '') END
     WHEN regexp_matches({t}, 's$')
       THEN CASE WHEN regexp_matches({t}, '(us|ss)$') THEN {t}
                 ELSE regexp_replace({t}, 's$', '') END
     ELSE {t} END
""".strip()


def analysis_stages(spark, text: str):
    """Solr ``/analysis/field`` handler analog: show a raw string's
    journey through the analysis chain, one row per (stage, position,
    token) — the debugging surface an operator uses to answer "why
    does/doesn't this query match". Three stages, sharing the exact
    definitions index/query time use:

      1_tokenize — the build tokenizer's pattern over the lowered text
                   (``[a-z0-9]+``, _DOCS parity);
      2_stop     — Lucene's default English stop set (STOPWORDS_EN)
                   removed; surviving tokens KEEP their original
                   positions (Lucene's position-increment contract —
                   a phrase query across a removed stopword still
                   sees the gap);
      3_stem     — the S-stemmer (:func:`s_stem`) applied to the
                   stage-2 survivors, positions unchanged.

    Pure column expressions end-to-end (posexplode + filters + the
    s_stem CASE), so the DuckDB oracle replays every stage verbatim
    (S_STEM_SQL_CASE). Returns (stage, pos, token) ordered stage ASC,
    pos ASC. A one-row literal input: this is a debug verb, not a
    corpus pass — the plan is LocalTableScan → Generate → Filter."""
    from pyspark.sql import functions as F

    one = spark.createDataFrame([(text,)], "raw string")
    toks = one.select(
        F.posexplode(
            F.expr("regexp_extract_all(lower(raw), '[a-z0-9]+', 0)")
        ).alias("pos", "token")
    )
    s1 = toks.select(F.lit("1_tokenize").alias("stage"), "pos", "token")
    stopped = toks.where(~F.col("token").isin(*STOPWORDS_EN))
    s2 = stopped.select(F.lit("2_stop").alias("stage"), "pos", "token")
    s3 = stopped.select(
        F.lit("3_stem").alias("stage"), "pos", s_stem("token").alias("token")
    )
    return s1.unionByName(s2).unionByName(s3).orderBy("stage", "pos")
