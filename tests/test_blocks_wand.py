"""M2/M3: codec roundtrip, block index integrity, WAND rank identity.

Rank identity is the BASELINE.json gate: the pruned block scorer must
return bit-identical (doc_id, score) lists to both the exhaustive
DataFrame scorer and the pure-pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from solr_ocr_processor_spark.config import IndexConfig
from solr_ocr_processor_spark.functions.codec import (
    decode_positions,
    delta_decode,
    delta_encode,
    encode_positions,
    varint_decode,
    varint_encode,
)
from solr_ocr_processor_spark.operators.blocks import build_block_index
from solr_ocr_processor_spark.operators.build import build_postings
from solr_ocr_processor_spark.operators.score import bm25_topk
from solr_ocr_processor_spark.operators.wand import wand_topk
from solr_ocr_processor_spark.oracle import oracle_bm25_topk, oracle_materialize
from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

# Small geometry so even the synth corpus spans many ranges/blocks.
CFG = IndexConfig(block_size=4, range_size=8)

QUERIES = [
    "spark window merge",
    "the",                      # stopword: hits nearly every doc
    "café naïve",               # unicode -> NFKC/casefold path
    "nonexistentterm",          # absent term
    "spark nonexistentterm",    # mixed present/absent
]


def test_varint_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(100):
        n = int(rng.integers(0, 200))
        v = rng.integers(0, 2 ** int(rng.integers(1, 63)), size=n, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(v)), v)
        s = np.sort(v)
        assert np.array_equal(delta_decode(delta_encode(s)), s)


def test_positions_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(100):
        ndocs = int(rng.integers(1, 15))
        tfs = rng.integers(1, 9, size=ndocs)
        flat = np.concatenate(
            [np.sort(rng.choice(500, size=t, replace=False)) for t in tfs]
        )
        assert np.array_equal(
            decode_positions(tfs, encode_positions(tfs, flat)), flat
        )


@pytest.fixture(scope="module")
def corpus(spark):
    t = synth_transcripts(spark, n_convs=40, max_turns=10, seed=11)
    idx = build_postings(t, CFG)
    for df in (idx.tokens, idx.doc_meta, idx.term_stats):
        df.persist()
    bidx = build_block_index(idx, CFG)
    bidx.blocks.persist().count()
    docs_pd = oracle_materialize(t.toPandas())
    return idx, bidx, docs_pd


def test_block_integrity(corpus):
    """Decoding every block reconstructs the exact M1 postings."""
    idx, bidx, _ = corpus
    blocks = bidx.blocks.toPandas()
    rebuilt = []
    for row in blocks.itertuples():
        docs = delta_decode(row.doc_ids).astype(np.int64)
        tfs = varint_decode(row.tfs).astype(np.int64)
        assert row.n_docs == len(docs)
        assert row.first_doc == docs[0] and row.last_doc == docs[-1]
        assert len(docs) <= CFG.block_size
        # block never crosses its range
        assert docs[0] // CFG.range_size == row.range_id
        assert docs[-1] // CFG.range_size == row.range_id
        for d, tf in zip(docs, tfs):
            rebuilt.append((row.term, int(d), int(tf)))
    expect = {
        (r["term"], r["doc_id"], r["tf"])
        for r in idx.postings.select("term", "doc_id", "tf").collect()
    }
    assert set(rebuilt) == expect and len(rebuilt) == len(expect)


def test_block_positions_match_postings(corpus):
    idx, bidx, _ = corpus
    sample = bidx.blocks.where("term = 'spark'").toPandas()
    want: dict[int, list[int]] = {}
    for r in (
        idx.tokens.where("term = 'spark'")
        .select("doc_id", "token_pos")
        .collect()
    ):
        want.setdefault(r["doc_id"], []).append(r["token_pos"])
    want = {k: sorted(v) for k, v in want.items()}
    got: dict[int, list[int]] = {}
    for row in sample.itertuples():
        docs = delta_decode(row.doc_ids).astype(np.int64)
        tfs = varint_decode(row.tfs).astype(np.int64)
        flat = decode_positions(tfs, row.positions)
        off = 0
        for d, tf in zip(docs, tfs):
            got[int(d)] = list(flat[off : off + tf])
            off += tf
    assert got == want


@pytest.mark.parametrize("query", QUERIES)
def test_wand_rank_identity(spark, corpus, query):
    idx, bidx, docs_pd = corpus
    k = 10
    wand = wand_topk(spark, bidx, query, k=k, cfg=CFG).collect()
    exhaustive = bm25_topk(spark, idx, query, k=k, cfg=CFG).collect()
    oracle = oracle_bm25_topk(docs_pd, query, k=k, cfg=CFG)

    w = [(r["doc_id"], r["score"]) for r in wand]
    e = [(r["doc_id"], r["score"]) for r in exhaustive]
    o = list(zip(oracle["doc_id"], oracle["score"]))

    assert [x[0] for x in w] == [x[0] for x in e] == [x[0] for x in o]
    # engine paths are bit-identical; oracle within float tolerance
    assert all(abs(a[1] - b[1]) == 0.0 for a, b in zip(w, e))
    assert all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(w, o))


def test_wand_stopword_covers_all_docs(spark, corpus):
    """'the' appears in most docs — pruning must still return the exact
    global top-k, not just the seed ranges' docs."""
    idx, bidx, docs_pd = corpus
    oracle = oracle_bm25_topk(docs_pd, "the", k=25, cfg=CFG)
    wand = wand_topk(spark, bidx, "the", k=25, cfg=CFG).collect()
    assert [r["doc_id"] for r in wand] == list(oracle["doc_id"])


def test_varint_slices_and_locs_roundtrip():
    """Per-posting payload primitives: varint_slices must slice the
    stream exactly at group boundaries, and gap_reset/decode_locs must
    invert each other — including concatenation across postings (the
    property the block encoder relies on)."""
    from solr_ocr_processor_spark.functions.codec import (
        decode_locs,
        decode_positions,
        gap_reset,
        varint_slices,
    )

    rng = np.random.default_rng(7)
    for _ in range(50):
        n_groups = int(rng.integers(1, 20))
        tfs = rng.integers(1, 12, size=n_groups)
        total = int(tfs.sum())
        # per-group sorted positions (doc-global style)
        flat = np.concatenate(
            [np.sort(rng.choice(10_000, size=t, replace=False)) for t in tfs]
        ).astype(np.int64)
        gaps = gap_reset(flat, tfs).astype(np.uint64)
        slices = varint_slices(gaps, tfs)
        assert len(slices) == n_groups
        # concatenated slices decode to the original flat positions
        assert np.array_equal(decode_positions(tfs, b"".join(slices)), flat)
        # any sub-range of postings decodes standalone (block property)
        lo = int(rng.integers(0, n_groups))
        hi = int(rng.integers(lo + 1, n_groups + 1))
        sub = b"".join(slices[lo:hi])
        assert np.array_equal(
            decode_positions(tfs[lo:hi], sub),
            np.concatenate(
                [flat[int(tfs[:i].sum()):int(tfs[:i + 1].sum())] for i in range(lo, hi)]
            ),
        )
        # loc stream: interleaved (start gap, length) pairs
        starts = flat
        lens = rng.integers(1, 15, size=total).astype(np.int64)
        locv = np.empty(2 * total, dtype=np.int64)
        locv[0::2] = gap_reset(starts, tfs)
        locv[1::2] = lens
        loc_slices = varint_slices(locv.astype(np.uint64), tfs * 2)
        ds, de = decode_locs(tfs, b"".join(loc_slices))
        assert np.array_equal(ds, starts) and np.array_equal(de, starts + lens)


def test_varint_slices_zero_size_groups():
    """Regression (ADVICE r2): a zero-size TRAILING group put
    starts[-1] == len(nbytes), out of range for np.add.reduceat.
    Zero-size groups anywhere must yield empty byte slices and leave
    the non-empty groups' payloads intact."""
    from solr_ocr_processor_spark.functions.codec import (
        varint_decode,
        varint_encode,
        varint_slices,
    )

    vals = np.array([5, 300, 7], dtype=np.uint64)
    # trailing zero group
    s = varint_slices(vals, np.array([2, 1, 0], dtype=np.int64))
    assert len(s) == 3 and s[2] == b""
    assert np.array_equal(varint_decode(b"".join(s)), vals)
    # leading + mid zero groups
    s = varint_slices(vals, np.array([0, 2, 0, 1], dtype=np.int64))
    assert [len(x) > 0 for x in s] == [False, True, False, True]
    assert np.array_equal(varint_decode(s[1]), vals[:2])
    assert np.array_equal(varint_decode(s[3]), vals[2:])
    # all-zero groups over an empty stream
    s = varint_slices(np.empty(0, dtype=np.uint64), np.array([0, 0], dtype=np.int64))
    assert s == [b"", b""]
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
