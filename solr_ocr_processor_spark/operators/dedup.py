"""Deduplication operators for large-scale training-data pipelines.

Five family members over the ``documents(doc_id, text, ...)`` table:

- :func:`exact_dup_groups`   — hash-groupBy exact dedup (canonical =
  min doc_id per normalized-text hash).
- :func:`ngram_jaccard_pairs`— EXACT n-gram-shingle Jaccard pairs ≥ τ
  via shingle-explode + self-join. The correctness spine the
  approximate methods are verified against.
- :func:`minhash_lsh_pairs`  — MinHash signatures + banded LSH
  bucketing; candidates exact-verified. The 100 TB path: cost is
  O(docs × k) + bucket-join instead of all-pairs.
- :func:`simhash64`          — 60-bit SimHash fingerprints (md5 term
  hashes, tf-weighted bit votes); near-dup = small Hamming distance.
- :func:`embedding_near_dup` — cosine ≥ τ pairs over an embedding
  column (brute all-pairs here; the LSH/IVF machinery in
  operators/ann.py is the scale path).

Hash discipline: every hash bottoms out in md5 (Spark ``F.md5`` ==
DuckDB ``md5`` on the same bytes), so the DuckDB oracle can recompute
fingerprints bit-for-bit. MinHash derives its k functions from one md5
per shingle via Kirsch-Mitzenmacher (h1 + i*h2 mod p) — one hash
invocation, k permutations, numpy-vectorized.

Scale notes: exact pair-join explodes on common shingles (a shingle in
m docs yields m² candidate rows); it exists as the oracle-checkable
baseline and for bounded vocabularies. LSH caps the blowup at
bucket-width and is the default at scale; its band join is a plain
groupBy on (band, bucket-hash) — AQE skew-join splits hot buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_hash, group_size, is_canonical): exact-duplicate
    groups by md5 of the raw text; canonical member = min doc_id.
    One shuffle (groupBy hash); no text comparison beyond the hash."""
    h = docs.select("doc_id", F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
    g = h.groupBy("text_hash").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("doc_id").alias("canonical_id"),
    )
    return (
        h.join(g, "text_hash")
        .select(
            "doc_id",
            "text_hash",
            "group_size",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# shingling (shared)
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): DISTINCT word n-grams of the tokenized text.
    Pure built-ins: regexp tokenize -> sliding window via transform
    over an index sequence -> explode -> distinct."""
    toks = docs.select(
        "doc_id",
        F.expr(r"regexp_extract_all(lower(" + text_col + r"), '[a-z0-9]+', 0)").alias(
            "toks"
        ),
    )
    # Docs with fewer than n tokens have no n-grams: guard with an
    # empty array — sequence(0, -1) yields [0, -1] and slice(toks, 0, n)
    # then throws INVALID_PARAMETER_VALUE.START, aborting the whole job
    # on the first short/empty document.
    idx_seq = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(idx_seq, lambda i: F.array_join(F.slice("toks", i + 1, n), " "))
        ).alias("shingle"),
    )
    return grams.where(F.col("shingle") != "").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, tau: float = 0.3, text_col: str = "text"
) -> DataFrame:
    """EXACT Jaccard-similar pairs: (doc1, doc2, jaccard) with
    doc1 < doc2 and jaccard >= tau, over distinct word n-grams."""
    sh = shingles(docs, n, text_col)
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    c1 = card.select(F.col("doc_id").alias("doc1"), F.col("c").alias("c1"))
    c2 = card.select(F.col("doc_id").alias("doc2"), F.col("c").alias("c2"))
    return (
        inter.join(c1, "doc1")
        .join(c2, "doc2")
        .withColumn(
            "jaccard", F.col("i") / (F.col("c1") + F.col("c2") - F.col("i"))
        )
        .where(F.col("jaccard") >= tau)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def _minhash_bands(num_bands: int, rows_per_band: int):
    """mapInPandas: (doc_id, shingles array) -> (doc_id, band, bucket).

    One md5 per shingle, split into two 60-bit halves (h1, h2); the
    k = bands*rows permutations are h1 + i*h2 mod 2^61-1
    (Kirsch-Mitzenmacher). Band bucket = tuple-hash of that band's row
    minima. All numpy; no per-shingle Python beyond the md5 calls.
    """
    import hashlib

    k = num_bands * rows_per_band
    iota = np.arange(1, k + 1, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            out_doc, out_band, out_bucket = [], [], []
            for did, sh_list in zip(pdf["doc_id"].values, pdf["shingles"].values):
                if sh_list is None or len(sh_list) == 0:
                    continue
                digs = np.frombuffer(
                    b"".join(hashlib.md5(s.encode()).digest() for s in sh_list),
                    dtype=np.uint64,
                ).reshape(-1, 2)
                h1 = digs[:, 0] % np.uint64(_MERSENNE61)
                h2 = digs[:, 1] % np.uint64(_MERSENNE61)
                # (n_shingles, k) permutation matrix -> column minima
                perm = (h1[:, None] + iota[None, :] * h2[:, None]) % np.uint64(
                    _MERSENNE61
                )
                sig = perm.min(axis=0).reshape(num_bands, rows_per_band)
                # bucket id per band: md5 of the band's row minima bytes
                for bi in range(num_bands):
                    bh = hashlib.md5(sig[bi].tobytes()).digest()[:8]
                    out_doc.append(did)
                    out_band.append(bi)
                    out_bucket.append(
                        int(np.frombuffer(bh, dtype=np.uint64)[0] >> np.uint64(1))
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "band": pd.Series(out_band, dtype="int32"),
                    "bucket": pd.Series(out_bucket, dtype="int64"),
                }
            )

    return gen


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    tau: float = 0.3,
    num_bands: int = 32,
    rows_per_band: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash LSH, exact-verified.

    P(candidate | jaccard=s) = 1-(1-s^r)^b; with b=32, r=4 a 0.9-similar
    pair is missed with p≈7e-17 — so above ~0.75 similarity the output
    is indistinguishable from the exact join, at O(docs·k) cost.
    Candidates are then exact-verified with :func:`ngram_jaccard_pairs`
    restricted to the candidate set, so no false positives survive.
    """
    sh = shingles(docs, n, text_col)
    sh_arr = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    sig = sh_arr.mapInPandas(
        _minhash_bands(num_bands, rows_per_band), _SIG_SCHEMA
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    # exact verification of candidates only
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    sh1 = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    sh2 = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        cand.join(sh1, "doc1")
        .join(sh2, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    c1 = card.select(F.col("doc_id").alias("doc1"), F.col("c").alias("c1"))
    c2 = card.select(F.col("doc_id").alias("doc2"), F.col("c").alias("c2"))
    return (
        inter.join(c1, "doc1")
        .join(c2, "doc2")
        .withColumn("jaccard", F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")))
        .where(F.col("jaccard") >= tau)
        .select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # fits a signed 64-bit int on both engines


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash — per distinct term, hash =
    first 15 md5 hex chars; each bit votes +tf / -tf; fingerprint bit
    = 1 iff the vote is positive. Deterministic and reproducible in
    ANSI SQL (the DuckDB oracle recomputes it exactly).

    Pure built-ins: tokenize -> explode -> tf agg -> per-bit vote agg.
    Two shuffles ((doc,term) then doc), both map-side combinable.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                r"regexp_extract_all(lower(" + text_col + r"), '[a-z0-9]+', 0)"
            )
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn(
        "th",
        F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    bits = h.select(
        "doc_id",
        "tf",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
        "th",
    ).withColumn(
        "vote",
        F.when(
            F.expr("shiftright(th, bit) & 1") == 1,
            F.col("tf"),
        ).otherwise(-F.col("tf")),
    )
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return (
        votes.withColumn(
            "contrib",
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("simhash"))
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via banded LSH:
    candidates -> exact popcount verify.

    The band count is DERIVED from the radius (bands = max_hamming + 1)
    so the pigeonhole recall guarantee always holds: a pair differing
    in at most max_hamming bits cannot differ in every one of
    max_hamming + 1 bands, hence collides on >= 1 band. A fixed band
    count with a larger radius would silently miss pairs whose diffs
    spread across all bands."""
    s = simhash64(docs)
    num_bands = max_hamming + 1
    width = -(-SIMHASH_BITS // num_bands)  # ceil; last band may be narrower
    chunks = s.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(num_bands - 1))).alias("band"),
    ).withColumn(
        "chunk",
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    embs: DataFrame, tau: float = 0.45, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id1, id2, cos) pairs with cosine >= tau — blocked matrix
    multiply, exact.

    Each Arrow batch of rows is GEMMed (numpy, BLAS) against a
    broadcast of the full normalized matrix, keeping only pairs with
    id1 < id2 and cos >= tau. One scan + one tiny broadcast — no
    quadratic row join materializes; the 25M-candidate space for 5k
    vectors lives only inside the n×m GEMM tile.

    Scale path: at 10^9+ vectors broadcast stops fitting — replace the
    broadcast side with a block-id cross join (block_i <= block_j) over
    pre-normalized, pre-blocked row groups and run the identical tile
    kernel per block pair (classic blocked all-pairs), or prune tiles
    first with operators/ann.py LSH buckets. The kernel here is that
    tile kernel.
    """
    sc = embs.sparkSession.sparkContext
    rows = embs.select(id_col, vec_col).collect()
    ids = np.fromiter((r[id_col] for r in rows), dtype=np.int64, count=len(rows))
    M = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids, kind="stable")
    ids, M = ids[order], M[order]
    b_ids, b_M = sc.broadcast(ids), sc.broadcast(M)

    schema = T.StructType(
        [
            T.StructField("id1", T.LongType(), False),
            T.StructField("id2", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def gen(batches):
        all_ids, allM = b_ids.value, b_M.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            my = pdf[id_col].values.astype(np.int64)
            S = V @ allM.T  # (batch, n) cosine tile
            ri, ci = np.nonzero((S >= tau) & (my[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id1": my[ri],
                    "id2": all_ids[ci],
                    "cos": np.round(S[ri, ci], 6),
                }
            )

    return embs.select(id_col, vec_col).mapInPandas(gen, schema)
