"""Similarity search over an embedding column (array<float>).

Three tiers:

- :func:`cosine_topk`      — exact brute-force top-k for one query
  vector. Dot product and norms are column expressions
  (zip_with/aggregate — whole-stage codegen, no UDF); top-k lowers to
  TakeOrderedAndProject. The correctness baseline + DuckDB-oracle
  target; also the right tool when the query set is small and the
  corpus scan is unavoidable anyway.
- :func:`lsh_assign` / :func:`lsh_topk` — random-hyperplane LSH with
  md5-DERIVED planes (uniform [-1,1) from md5(seed:plane:dim) — the
  dedup.py hash discipline), sign pattern per band = bucket; search
  probes only matching buckets then exact-re-ranks. Sub-linear
  candidates at 100 TB, and the bucketing is reproducible in ANSI SQL,
  so the DuckDB oracle replays candidates + re-rank exactly.
- :func:`ivf_assign` / :func:`ivf_topk` — IVF: coarse centroids =
  the n_centroids vectors of smallest md5(seed:id) rank (TakeOrdered
  in Spark, ORDER BY md5 LIMIT n in SQL — no corpus collect), vectors
  assigned to nearest centroid (one narrow pandas-UDF pass), search
  probes the ``nprobe`` nearest centroid lists. The classic
  billion-vector layout: centroid assignment is the partition key, so
  a probe reads only its lists (partition pruning on parquet/Iceberg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_expr(vec_col: str, q: list[float]):
    """Σ v[i]*q[i] as a fold over zip_with against an array literal."""
    qarr = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _exact_rerank(
    embs: DataFrame,
    ids: list,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The shared tail of every candidate→rerank ANN surface (pq /
    int8 / matryoshka / stored IVF-PQ): isin-pruned point read of the
    float table, exact cosine with the zero-norm guard, (cos desc, id
    asc) cut to k, 6-dp rounding. ONE home so the guard and rounding
    stay bit-identical across the family."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    denom = _norm_expr(vec_col) * F.lit(qn)
    return (
        embs.where(F.col(id_col).isin(ids))
        .select(
            F.col(id_col).alias("id"),
            F.when(denom > 0, _dot_expr(vec_col, query_vec) / denom)
            .otherwise(F.lit(0.0))
            .alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
        .select("id", F.round("cos", 6).alias("cos"))
    )


def adc_dist_expr(dt: np.ndarray):
    """ADC over a ``codes`` array column: the query's (m × n_codes)
    distance table rides the plan as a literal and each row's
    approximate distance is the m-term table-lookup fold (j-ordered —
    the order the oracle's list_sum replays). Shared by pq_topk and
    ann_store.ivfpq_topk_stored so the 1-based element_at indexing
    has one home."""
    m = int(dt.shape[0])
    dt_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in dt])
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.lit(m)),
            lambda c, j: F.element_at(F.element_at(dt_lit, j), c + 1),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def cosine_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.
    (id, cos) ordered by (cos desc, id asc)."""
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    out = embs.select(
        F.col(id_col).alias("id"),
        (_dot_expr(vec_col, query_vec) / (_norm_expr(vec_col) * F.lit(qn))).alias(
            "cos"
        ),
    )
    return (
        out.orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
        .select("id", F.round("cos", 6).alias("cos"))
    )


def knn_filtered_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    predicate=None,
    allowed_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Solr 9 ``{!knn f=... topK=k}`` combined with ``fq=`` filters —
    PRE-filter semantics (Lucene's filtered vector search: the filter
    restricts the candidate set *before* top-k, so the result always
    holds k matching docs; post-filtering a plain knn would under-fill
    whenever filter selectivity < k/n).

    Two filter shapes, composable:

    - ``predicate``: a Column predicate over the embedding table's own
      metadata columns (Solr ``fq=label:2``). Plain ``where`` — at
      scale it reaches the parquet/Iceberg scan as a pushed filter
      (PushedFilters in the plan), so non-matching row groups are
      never read.
    - ``allowed_ids``: a one-column (``doc_id``) DataFrame of ids that
      pass filters living on ANOTHER table (Solr fq on a stored field
      of the main index). Applied as a broadcast LEFT SEMI join —
      the filter side of an fq is small relative to a 10^9-vector
      corpus, and a semi join never widens rows.

    The survivor set then goes through the exact :func:`cosine_topk`
    kernel (codegen column expressions, TakeOrderedAndProject). At
    selective filters this IS the optimal plan — a pruned scan of
    survivors beats probing an ANN structure and re-checking the
    filter per candidate (the same reason Lucene switches to exact
    search when the filter matches < topK·beamWidth docs)."""
    src = embs
    if predicate is not None:
        src = src.where(predicate)
    if allowed_ids is not None:
        ids = allowed_ids.toDF("__allow_id")
        src = src.join(
            F.broadcast(ids), F.col(id_col) == F.col("__allow_id"), "left_semi"
        )
    return cosine_topk(src, query_vec, k, id_col, vec_col)


def knn_postfilter_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefetch_k: int = 40,
    predicate=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """POST-filter knn — the other half of Solr 9's documented
    filtered-vector-search distinction (:func:`knn_filtered_topk` is
    the pre-filter): take the global cosine top-``prefetch_k`` FIRST,
    then apply the filter to the survivors, then cut to ``k``. When
    the filter is selective this UNDER-FILLS (fewer than k rows come
    back) — exactly the failure mode Solr's reference manual warns
    about and the reason `fq` defaults to pre-filtering; the verb
    exists because post-filtering is the only correct semantics for
    filters that must not influence recall measurement (e.g. dedup
    masking applied after ANN evaluation).

    Plan: the prefetch is the exact codegen cosine scan lowered to
    TakeOrderedAndProject(prefetch_k) — corpus-scan cost, k'-row
    result; the filter then runs on prefetch_k rows (driver-scale),
    so at 10^9 vectors the added cost over plain knn is zero.
    Returns (id, cos) ordered cos DESC, id ASC — up to k rows."""
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    scored = embs.select(
        "*",
        (_dot_expr(vec_col, query_vec) / (_norm_expr(vec_col) * F.lit(qn))).alias(
            "__cos"
        ),
    )
    pre = scored.orderBy(F.desc("__cos"), F.asc(id_col)).limit(int(prefetch_k))
    if predicate is not None:
        pre = pre.where(predicate)
    return (
        pre.orderBy(F.desc("__cos"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).alias("id"), F.round("__cos", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def _planes(dim: int, num_bands: int, bits_per_band: int, seed: int) -> np.ndarray:
    """md5-derived hyperplanes (the dedup.py hash discipline): entry
    (p, d) = first 15 hex chars of md5(f"{seed}:{p}:{d}") mapped to
    uniform [-1, 1). Any engine with md5 — the DuckDB oracle included —
    reproduces the matrix bit-for-bit, so LSH bucketing is fully
    oracle-replayable (uniform sign-planes are a standard substitute
    for gaussian ones: bucketing only uses the dot-product sign)."""
    import hashlib

    k = num_bands * bits_per_band
    u = np.empty((k, dim), dtype=np.float64)
    for p in range(k):
        for d in range(dim):
            u[p, d] = int(
                hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16
            )
    # Tolerance assumption, stated: "bit-for-bit replay" of the BUCKETS
    # additionally requires the sign of each plane dot to agree between
    # numpy (BLAS GEMM order) and the oracle's SUM order. Float addition
    # isn't associative, so a dot whose magnitude is at machine epsilon
    # (|dot| ~ 1e-16 against typical |v|~1 coordinates) could flip sign
    # between engines. With continuous-valued embeddings the event has
    # probability ~0 (never observed across the test corpora); an
    # exactly-zero dot would need adversarially constructed inputs. If
    # that guarantee is ever needed, scale planes and vectors to
    # integers and bucket on exact integer sums.
    return u / float(1 << 59) - 1.0


def lsh_assign(
    embs: DataFrame,
    dim: int,
    num_bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket): sign-pattern bucket per band. One
    mapInPandas pass; the plane matrix is generated inside each task
    from the seed (cheaper than broadcasting for small dims, and
    bit-deterministic)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.IntegerType(), False),
        ]
    )

    def gen(batches):
        P = _planes(dim, num_bands, bits_per_band, seed)
        pw = (1 << np.arange(bits_per_band)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            S = (V @ P.T) > 0  # (n, bands*bits)
            S = S.reshape(len(pdf), num_bands, bits_per_band)
            buckets = (S * pw[None, None, :]).sum(axis=2).astype(np.int32)
            ids = pdf[id_col].values.astype(np.int64)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, num_bands),
                    "band": np.tile(
                        np.arange(num_bands, dtype=np.int32), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return embs.select(id_col, vec_col).mapInPandas(gen, schema)


def lsh_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's bucket in every band,
    union candidates, exact cosine re-rank. Candidate volume ≈
    n · num_bands / 2^bits_per_band."""
    dim = len(query_vec)
    P = _planes(dim, num_bands, bits_per_band, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    S = ((P @ q) > 0).reshape(num_bands, bits_per_band)
    pw = (1 << np.arange(bits_per_band)).astype(np.int64)
    q_buckets = [(int(bd), int((S[bd] * pw).sum())) for bd in range(num_bands)]

    assign = lsh_assign(embs, dim, num_bands, bits_per_band, seed, id_col, vec_col)
    probe = assign.sparkSession.createDataFrame(q_buckets, "band int, bucket int")
    cand_ids = (
        assign.join(F.broadcast(probe), ["band", "bucket"]).select("id").distinct()
    )
    cand = embs.join(cand_ids, embs[id_col] == cand_ids["id"], "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------


def ivf_centroids(
    embs: DataFrame,
    n_centroids: int = 16,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse centroids: the vectors whose md5(seed:id)
    rank is smallest (a seedless uniform sample any engine reproduces —
    Spark F.md5 == DuckDB md5 == hashlib on the same bytes),
    L2-normalized, ordered by that rank (list_id = rank).

    The rank-and-take runs IN Spark (orderBy + limit lowers to
    TakeOrderedAndProject: per-partition heaps of n rows); only the
    n_centroids winning rows ever reach the driver — no corpus-sized
    collect. At 100 TB you'd k-means from this same sample; md5-rank
    sampling keeps the operator deterministic and oracle-checkable."""
    rows = (
        embs.select(
            id_col,
            vec_col,
            F.md5(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ).alias("rk"),
        )
        .orderBy("rk")
        .limit(n_centroids)
        .collect()
    )
    C = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def lsh_near_dup(
    embs: DataFrame,
    dim: int,
    tau: float = 0.45,
    num_bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id1, id2, cos) near-duplicate pairs via LSH candidate pruning —
    the sub-quadratic scale path for dedup.embedding_near_dup's exact
    blocked all-pairs, in its high-similarity regime.

    Candidates = pairs sharing >= 1 (band, bucket) under the md5-derived
    sign-plane LSH (:func:`lsh_assign`); each candidate is then
    EXACT-verified with a whole-stage-codegen cosine (zip_with fold —
    no UDF), keeping only cos >= tau. At 8x8 banding a RANDOM pair
    collides with p = 1-(1-2^-8)^8 ≈ 3% — a ~32x candidate reduction
    that grows with more selective banding — while a cos 0.9 pair is
    recalled with ~0.94 and cos 0.95 with ~0.999 (recall = 1-(1-p^r)^b,
    p = 1 - arccos(cos)/π).

    Honest regime boundary: at weakly-similar thresholds (cos ~0.5,
    p ≈ 0.65) NO sign-LSH banding is simultaneously selective and
    high-recall — e.g. 16x4 recalls 96% but admits 64% of ALL random
    pairs (quadratic with extra steps). Below cos ~0.8 use the exact
    blocked all-pairs (dedup.embedding_near_dup) or IVF-bucketed
    search; this operator is for true near-duplicates. The
    deterministic planes make bucketing, candidates, and verification
    replayable in ANSI SQL, so the driver oracle checks the pipeline
    exactly (including its sub-full recall at the demo threshold).
    """
    assign = lsh_assign(embs, dim, num_bands, bits_per_band, seed, id_col, vec_col)
    a, b = assign.alias("a"), assign.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    e1 = embs.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1")
    )
    e2 = embs.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2")
    )
    dot = F.aggregate(
        F.zip_with("v1", "v2", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1, n2 = _norm_expr("v1"), _norm_expr("v2")
    return (
        cand.join(e1, "id1")
        .join(e2, "id2")
        .withColumn("cos", F.round(dot / (n1 * n2), 6))
        .where(F.col("cos") >= tau)
        .select("id1", "id2", "cos")
    )


def ivf_centroids_kmeans(
    embs: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "sample",
) -> np.ndarray:
    """Lloyd-refined coarse centroids: md5-rank seeds, then ``iters``
    distributed k-means steps — assignment is the narrow pandas-UDF
    pass (:func:`ivf_assign`), the centroid update is a per-(list, dim)
    SUM/COUNT aggregation (map-side combinable; n_centroids x dim rows
    collect per iteration — 1,024 values at 16x64, never the vectors).
    Empty clusters keep their previous centroid. This is the quantizer
    you train at 10^9+ vectors; the md5-rank sample
    (:func:`ivf_centroids`) remains the deterministic, oracle-checkable
    default for the driver queries (float-sum order makes k-means
    centroids reproducible only within a run config).

    ``init='kmeanspar'`` seeds from :func:`ivf_centroids_kmeanspar`
    (D²-weighted k-means|| oversampling) instead of the uniform
    md5-rank sample — better starting cost, fewer distributed Lloyd
    iterations to converge."""
    if init == "kmeanspar":
        C = ivf_centroids_kmeanspar(
            embs, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
        )
    elif init == "sample":
        C = ivf_centroids(embs, n_centroids, seed, id_col, vec_col)
    else:
        raise ValueError(f"unknown init {init!r}")
    # fewer vectors than requested centroids: degrade, don't crash
    n_centroids = C.shape[0]
    dim = C.shape[1]
    for _ in range(iters):
        assign = ivf_assign(embs, C, id_col, vec_col)
        joined = embs.join(
            assign, embs[id_col] == assign["id"], "inner"
        ).select("list_id", vec_col)
        sums = (
            joined.select(
                "list_id", F.posexplode(F.col(vec_col)).alias("d", "x")
            )
            .groupBy("list_id", "d")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        C_new = C.copy()
        acc = np.zeros((n_centroids, dim))
        cnt = np.zeros(n_centroids)
        for r in sums:
            acc[r["list_id"], r["d"]] = r["s"]
            cnt[r["list_id"]] = r["c"]
        nonempty = cnt > 0
        C_new[nonempty] = acc[nonempty] / cnt[nonempty, None]
        norms = np.linalg.norm(C_new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        C = C_new / norms
    return C


def _d2_frame(
    embs: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, d2): squared cosine distance to the NEAREST current
    centroid, d2 = (1 - max cos)² — the D² weight of k-means|| seeding.
    Same narrow mapInPandas shape as :func:`ivf_assign` (one corpus
    pass, two values out per row)."""
    C = centroids
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("d2", T.DoubleType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            d = np.clip(1.0 - (Vn @ C.T).max(axis=1), 0.0, None)
            yield pd.DataFrame(
                {"id": pdf[id_col].values.astype(np.int64), "d2": d * d}
            )

    return embs.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_centroids_kmeanspar(
    embs: DataFrame,
    n_centroids: int = 16,
    rounds: int = 3,
    oversample: int | None = None,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """k-means|| seeding (Bahmani et al., VLDB'12 — the distributed
    D²-weighted initializer Spark MLlib also uses) with DETERMINISTIC
    md5-threshold sampling, then a driver-side weighted reduction to
    ``n_centroids`` seeds.

    Per round (``rounds`` ~ O(log corpus), 3 suffices in practice):
    one corpus pass computes each vector's D² to the nearest chosen
    seed (:func:`_d2_frame`), one aggregation yields ΣD², and each
    vector self-selects with probability ``min(1, l·D²/ΣD²)`` — the
    coin is ``md5(seed:round:id)`` mapped to [0,1), so reruns and
    resumes pick the identical seed set with no RNG state. Expected
    picks per round ≈ ``l`` (default 2k); only picked ROWS reach the
    driver, never the corpus.

    The ≈ ``rounds·l`` candidates are then weighted by how many corpus
    vectors each one attracts (one :func:`ivf_assign` pass + count —
    |candidates| rows collected) and reduced driver-side with weighted
    k-means++ + Lloyd on the candidate set (tiny: O(rounds·l) × dim).
    Seeding quality feeds :func:`ivf_centroids_kmeans` via ``init`` —
    better seeds mean fewer distributed Lloyd iterations for the same
    quantization cost, which at 10⁹ vectors is the whole game.

    Determinism matches :func:`ivf_centroids_kmeans`'s contract: exact
    within a run config (float-sum order), not oracle-replayed — the
    md5-rank sample (:func:`ivf_centroids`) remains the driver-query
    default."""
    l = int(oversample if oversample is not None else 2 * n_centroids)
    first = ivf_centroids(embs, 1, seed, id_col, vec_col)
    C = first  # (1, dim) — the md5-rank-min vector
    # Deterministic unit coin in [0,1): top 15 md5 hex digits / 16^15,
    # inlined in the loop over the d2 frame's own id column.
    for r in range(rounds):
        # Persist the corpus D² pass: it feeds TWO actions (the ΣD²
        # aggregate and the pick filter) and would otherwise run the
        # Vn@C.T kernel twice per round.
        d2 = _d2_frame(embs, C, id_col, vec_col).persist()
        tot = d2.agg(F.sum("d2").alias("s")).first()["s"]
        if not tot or tot <= 0.0:  # corpus already fully covered
            d2.unpersist()
            break
        # The coin and the threshold depend only on (id, d2), so the
        # ~l winning IDS select BEFORE any join — the vectors then
        # attach via a join against an l-row side (broadcast), never a
        # corpus×corpus shuffle.
        p = F.least(F.lit(1.0), F.lit(float(l)) * F.col("d2") / F.lit(float(tot)))
        coin = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}:{r}:"), F.col("id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("double")
            / float(16**15)
        )
        picked_ids = d2.where((F.col("d2") > 0) & (coin < p)).select("id")
        picked = (
            embs.select(id_col, vec_col)
            .join(F.broadcast(picked_ids), embs[id_col] == F.col("id"))
            .select(vec_col)
            .collect()
        )
        d2.unpersist()
        if picked:
            P = np.vstack([np.asarray(row[vec_col], dtype=np.float64) for row in picked])
            P = P / np.linalg.norm(P, axis=1, keepdims=True)
            C = np.vstack([C, P])
    if C.shape[0] <= n_centroids:
        return C
    # Weight candidates by attraction, then reduce on the driver.
    counts = (
        ivf_assign(embs, C, id_col, vec_col)
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    w = np.zeros(C.shape[0])
    for row in counts:
        w[row["list_id"]] = float(row["w"])
    return _weighted_kmeans(C, w, n_centroids, seed)


def _weighted_kmeans(
    X: np.ndarray, w: np.ndarray, k: int, seed: int, iters: int = 20
) -> np.ndarray:
    """Driver-side weighted k-means++ + Lloyd over a CANDIDATE set
    (rows of X are unit vectors, w their attraction weights) — the
    k-means|| reduction step. Deterministic: the k-means++ D²-draws use
    md5(seed:step) as the uniform variate, no RNG state."""
    n = X.shape[0]
    sims = X @ X.T
    d2 = None
    chosen = [int(np.argmax(w))]  # heaviest candidate first
    for step in range(1, k):
        d = np.clip(1.0 - sims[:, chosen].max(axis=1), 0.0, None)
        d2 = w * d * d
        tot = d2.sum()
        if tot <= 0:
            break
        import hashlib

        u = (
            int(hashlib.md5(f"{seed}:{step}".encode()).hexdigest()[:15], 16)
            / float(16**15)
        )
        # clamp: float rounding can leave cumsum[-1] < u, and
        # searchsorted would then return n (out of range)
        chosen.append(min(int(np.searchsorted(np.cumsum(d2 / tot), u)), n - 1))
    C = X[chosen].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        C_new = C.copy()
        for j in range(C.shape[0]):
            m = a == j
            if m.any():
                C_new[j] = (X[m] * w[m, None]).sum(axis=0)
        norms = np.linalg.norm(C_new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        C_new = C_new / norms
        if np.allclose(C_new, C):
            break
        C = C_new
    return C


def ivf_assign(
    embs: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id): nearest centroid by cosine. On a cluster this is
    the write-side partition key (partitionBy(list_id))."""
    C = centroids
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("list_id", T.IntegerType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            lists = np.argmax(Vn @ C.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"id": pdf[id_col].values.astype(np.int64), "list_id": lists}
            )

    return embs.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_topk(
    embs: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest centroid lists, exact re-rank."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    # stable sort: centroid-similarity ties break by list_id asc, the
    # same contract the SQL oracle's ORDER BY cs DESC, list_id ASC uses
    probe_lists = np.argsort(-(centroids @ qn), kind="stable")[:nprobe].tolist()
    assign = ivf_assign(embs, centroids, id_col, vec_col)
    cand_ids = assign.where(F.col("list_id").isin(probe_lists)).select("id")
    cand = embs.join(cand_ids, embs[id_col] == cand_ids["id"], "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# int8 scalar quantization — the 4x-compression storage path
# ---------------------------------------------------------------------------


def quantize_embeddings(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the standard
    vector-store compression (FAISS SQ8 / Lucene int8 HNSW): each
    float32 coordinate maps to round(v * 127 / max|v|), stored with
    its scale. 4x less at rest and 4x less scan I/O at 10^9+ vectors
    — at 100 TB the quantized table is the stored search artifact and
    the float table is the rerank side, read only for top-k winners.

    Returns (id, qvec array<int> in [-127, 127], scale double,
    qnorm double = sqrt(Σ q_i²)). Zero vectors quantize to all-zero
    with scale 0. Pure column expressions on both engines: the
    round() is the only lossy step and both engines round the same
    IEEE doubles, so the quantized table is bit-identical to the
    DuckDB replay."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    qvec = F.when(maxabs > 0, F.transform(
        v,
        lambda x: F.round(x.cast("double") * 127.0 / maxabs).cast("int"),
    )).otherwise(F.transform(v, lambda x: F.lit(0)))
    out = embs.select(
        F.col(id_col).alias("id"),
        qvec.alias("qvec"),
        F.when(maxabs > 0, maxabs / 127.0).otherwise(F.lit(0.0)).alias("scale"),
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qvec"), lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
    )
    return out.withColumn("qnorm", qnorm)


def int8_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by quantized cosine with exact float rerank — the
    compressed-scan ANN: candidates come from the int8 table
    (integer dot products — EXACT arithmetic, so candidate ranking is
    fully deterministic and oracle-replayable, unlike float-sum
    order), the top k*refine candidates re-score against the float
    vectors, and the final page is exact cosine.

    Quantized cosine = Σ(qq·qv) / (|qq|·|qv|): the per-vector scales
    cancel, so the candidate score needs ONLY the stored int8 rows.
    Integer dots cannot overflow (|q| <= 127, dim <= 2^15 fits long).

    Output (id, cos) — exact cosine of the reranked winners, matching
    :func:`cosine_topk`'s contract on the candidate set. Candidate
    cut: (qcos DESC, id ASC), a TakeOrderedAndProject over the
    quantized scan; rerank touches k*refine float rows (isin-pruned
    point reads of the float table)."""
    q = np.asarray(query_vec, dtype=np.float64)
    maxabs = float(np.max(np.abs(q))) if q.size else 0.0
    # half-AWAY-FROM-ZERO rounding, matching Spark/DuckDB round() —
    # np.round is banker's (half-to-even) and would diverge on ties
    scaled = q * 127.0 / maxabs if maxabs > 0 else np.zeros_like(q)
    qq = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
    qq_norm = float(np.sqrt(float(np.dot(qq, qq))))
    quant = quantize_embeddings(embs, id_col, vec_col)
    qq_arr = F.array(*[F.lit(int(x)) for x in qq])
    idot = F.aggregate(
        F.zip_with(F.col("qvec"), qq_arr, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = quant.select(
        "id",
        F.when(
            (F.col("qnorm") > 0) & (F.lit(qq_norm) > 0),
            idot.cast("double") / (F.col("qnorm") * F.lit(qq_norm)),
        )
        .otherwise(F.lit(0.0))
        .alias("qcos"),
    )
    cand = scored.orderBy(F.desc("qcos"), F.asc("id")).limit(k * refine)
    ids = [r["id"] for r in cand.select("id").collect()]
    return _exact_rerank(embs, ids, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# product quantization — the m-byte-per-vector compression path
# ---------------------------------------------------------------------------


def pq_codebooks(
    embs: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic PQ codebooks, shape (m, n_codes, dim/m): the
    md5-rank top ``n_codes`` sample vectors (same seedless-uniform
    discipline as :func:`ivf_centroids` — Spark F.md5 == DuckDB md5,
    so the oracle reselects the identical sample), split into m
    contiguous subspaces; codebook j's code c is sample c's j-th
    subvector. At 100 TB you'd k-means each subspace from this same
    sample; md5-rank selection keeps encode/ADC oracle-replayable.
    Only n_codes rows reach the driver (TakeOrderedAndProject)."""
    rows = (
        embs.select(
            id_col,
            vec_col,
            F.md5(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ).alias("rk"),
        )
        .orderBy("rk")
        .limit(n_codes)
        .collect()
    )
    S = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    dim = S.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sd = dim // m
    return np.stack([S[:, j * sd : (j + 1) * sd] for j in range(m)])


def pq_encode(
    embs: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> length m): each subvector's nearest code
    by squared L2, ties to the smallest code id (numpy argmin picks
    the first minimum — the same contract the oracle's ORDER BY
    d ASC, code ASC replays). The stored artifact is m small ints per
    vector — dim/m×:sizeof(float) compression; on a cluster this table
    is the scan side of every ADC query, the float table is rerank-
    only. One Arrow-batched kernel, no shuffle (encode is per-row)."""
    mb, n_codes, sd = codebooks.shape
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
        ]
    )
    C = codebooks

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            codes = np.empty((V.shape[0], mb), dtype=np.int32)
            for j in range(mb):
                Vj = V[:, j * sd : (j + 1) * sd]
                # elementwise (v - c)^2 summed along the subspace axis:
                # the same 16-term sum the SQL twin folds, so the only
                # cross-engine seam is float associativity (documented
                # 1-ulp tolerance, as for plane signs / d2 frames)
                d2 = ((Vj[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"id": pdf[id_col].values.astype(np.int64), "codes": list(codes)}
            )

    return embs.select(id_col, vec_col).mapInPandas(gen, schema)


def pq_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    refine: int = 4,
    m: int = 4,
    n_codes: int = 16,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by PQ asymmetric distance (ADC) with exact float rerank
    (Jégou et al. 2011): the query builds an (m × n_codes) distance
    table once on the driver, every encoded vector's approximate
    distance is the m-term table-lookup sum — a pure JVM column
    expression over the codes array (the dtable rides the plan as a
    literal; nothing per-row in Python beyond the one encode kernel)
    — candidates cut at (adist ASC, id ASC) via
    TakeOrderedAndProject, and the top k*refine rerank by exact
    cosine against the float table (isin-pruned point reads).

    Output (id, cos) — exact cosine of the reranked winners, the
    same contract as :func:`int8_topk`/:func:`cosine_topk`."""
    C = pq_codebooks(embs, m, n_codes, seed, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    sd = C.shape[2]
    # dtable[j][c] = ||q_j - C[j,c]||^2, m*n_codes doubles
    dt = np.stack(
        [((q[j * sd : (j + 1) * sd][None, :] - C[j]) ** 2).sum(axis=1) for j in range(m)]
    )
    enc = pq_encode(embs, C, id_col, vec_col)
    cand = (
        enc.select("id", adc_dist_expr(dt).alias("adist"))
        .orderBy(F.asc("adist"), F.asc("id"))
        .limit(k * refine)
    )
    ids = [r["id"] for r in cand.select("id").collect()]
    return _exact_rerank(embs, ids, query_vec, k, id_col, vec_col)


def matryoshka_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefix_dim: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Truncated-dimension prefilter + full-dim rerank — the
    Matryoshka retrieval recipe (Kusupati et al. 2022, MRL): when
    embeddings are trained so information concentrates in the leading
    coordinates, cosine over the first ``prefix_dim`` dims is a cheap
    high-recall candidate ranking (prefix_dim/dim of the flop and
    scan cost), and the full-dim exact cosine reranks only the
    k·refine survivors. Same candidate→rerank contract as
    :func:`int8_topk` / :func:`pq_topk` — this is the THIRD
    compression axis (fewer dims) next to narrower ints and codes,
    and it composes with both.

    Returns (id, cos) — EXACT full-dim cosine of the winners, ordered
    (cos desc, id asc).

    Plan: the prefix leg is F.slice + the same zip_with fold — pure
    codegen over a prefix_dim-element array, TakeOrderedAndProject
    cut; the rerank is an isin-pruned point read. At 10^12 vectors the
    hot scan reads prefix_dim/dim of the vector bytes (with a
    column-pruned prefix table materialized at build time, the
    standard MRL serving layout)."""
    q = np.asarray(query_vec, dtype=np.float64)
    if not 0 < prefix_dim <= q.shape[0]:
        raise ValueError(f"prefix_dim must be in 1..{q.shape[0]}, got {prefix_dim}")
    qp = q[:prefix_dim]
    qpn = float(np.linalg.norm(qp))
    pvec = F.slice(F.col(vec_col), 1, prefix_dim)
    qarr = F.array(*[F.lit(float(x)) for x in qp])
    pdot = F.aggregate(
        F.zip_with(pvec, qarr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pnorm = F.sqrt(
        F.aggregate(
            F.transform(pvec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pden = pnorm * F.lit(qpn)
    cand = (
        embs.select(
            F.col(id_col).alias("id"),
            F.when(pden > 0, pdot / pden).otherwise(F.lit(0.0)).alias("pcos"),
        )
        .orderBy(F.desc("pcos"), F.asc("id"))
        .limit(k * refine)
    )
    ids = [r["id"] for r in cand.select("id").collect()]
    return _exact_rerank(embs, ids, query_vec, k, id_col, vec_col)


def prf_vector_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    fb_k: int = 5,
    alpha: float = 1.0,
    beta: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector-side pseudo-relevance feedback — Rocchio's query update
    applied to dense retrieval (the ANN symmetry of the text side's
    RM3, and what ColBERT-PRF / vector-PRF papers standardized): take
    the top ``fb_k`` hits of the original query, move the query toward
    their centroid,

        q' = alpha·q + beta·mean(v_1..v_fb_k)

    and answer with exact cosine against q'. Feedback drift is the
    known failure mode — alpha anchors the original intent.

    Returns (id, cos) — cosine to the UPDATED query q', ordered
    (cos desc, id asc), rounded 6 dp.

    Plan: the feedback probe is the standard TakeOrderedAndProject
    top-fb_k (fb_k·dim floats to the driver — bounded); q' is driver
    arithmetic; the answer pass is the same whole-stage-codegen
    cosine scan as :func:`cosine_topk` (or any ANN family member —
    q' drops into lsh/ivf/pq probes unchanged)."""
    if fb_k <= 0:
        raise ValueError(f"fb_k must be positive, got {fb_k}")
    fb = cosine_topk(embs, query_vec, fb_k, id_col, vec_col)
    ids = [r["id"] for r in fb.select("id").collect()]
    if not ids:
        # empty corpus / no feedback: degrade to the original query,
        # the same no-feedback contract as rm3_topk's empty guard
        return cosine_topk(embs, query_vec, k, id_col, vec_col)
    # sort the collected feedback rows by id: collect() arrives in
    # partition order and float mean is order-sensitive in the last
    # ulp — the sorted-fold discipline applied driver-side
    rows = sorted(
        embs.where(F.col(id_col).isin(ids)).select(id_col, vec_col).collect(),
        key=lambda r: r[id_col],
    )
    V = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    q = np.asarray(query_vec, dtype=np.float64)
    q2 = float(alpha) * q + float(beta) * V.mean(axis=0)
    return cosine_topk(embs, q2.tolist(), k, id_col, vec_col)


def vector_stats(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Vector-field diagnostics — the admin check an operator runs
    BEFORE building any ANN structure over a 10^9-row embedding table
    (Lucene runs the same validations per KnnVectorField segment
    write): dimension consistency, zero-norm rows (cosine-undefined —
    every kernel here guards them), and the norm mass.

    Returns ONE row: (n_vecs, n_null, dim_min, dim_max, n_zero_norm,
    sum_norm_scaled, avg_norm_scaled). Norms are integer-scaled PER
    ROW (floor(1e6·||v||) — the in-order fold both engines replay),
    then summed as exact BIGINTs and averaged with integer division —
    a float mean over rows would depend on partition sum order.

    Plan: ONE map-only projection + ONE scalar aggregate; the scan
    reads only the vector column; no shuffle beyond the final 1-row
    combine."""
    per = embs.select(
        F.col(id_col).alias("id"),
        F.size(F.col(vec_col)).alias("dim"),
        F.when(
            F.col(vec_col).isNotNull(),
            F.floor(_norm_expr(vec_col) * F.lit(1_000_000)).cast("long"),
        ).alias("norm_scaled"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.col("norm_scaled").isNull().cast("long"))
        .cast("long")
        .alias("n_null"),
        F.min("dim").cast("int").alias("dim_min"),
        F.max("dim").cast("int").alias("dim_max"),
        F.sum((F.col("norm_scaled") == 0).cast("long"))
        .cast("long")
        .alias("n_zero_norm"),
        F.sum("norm_scaled").cast("long").alias("sum_norm_scaled"),
        F.expr("sum(norm_scaled) div count(norm_scaled)")
        .cast("long")
        .alias("avg_norm_scaled"),
    )


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Offline recall@k — the eval job every ANN deployment runs
    before trusting an index (FAISS benchmarks, Lucene's KNN recall
    harness): ``|approx ∩ exact| / k`` for one query. Both inputs are
    the k-row (id, …) answers of any two probe paths; the operator is
    deliberately surface-agnostic so the same evaluator grades LSH /
    IVF / PQ / int8 against the brute-force scan.

    Returns ONE row (k, n_hit, recall_scaled) with
    ``recall_scaled = floor(1e6 · n_hit / k)`` — exact integers, no
    float boundary.

    Plan: a k-row broadcast join + a 1-row aggregate; the cost is the
    two probe legs themselves, the evaluation is free."""
    hit = exact.select("id").join(F.broadcast(approx.select("id")), "id")
    return hit.agg(
        F.lit(int(k)).cast("int").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.floor(F.count(F.lit(1)) * F.lit(1_000_000) / F.lit(int(k)))
        .cast("long")
        .alias("recall_scaled"),
    )


def hard_triplets(
    embs: DataFrame,
    n_anchors: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-triplet mining for contrastive / metric training (FaceNet
    semantics): for each anchor vector, the hardest POSITIVE (same
    label, MINIMUM cosine — the same-class example currently furthest
    away) and the hardest NEGATIVE (different label, MAXIMUM cosine —
    the impostor currently closest). The triplet is violated when
    ``neg_cos > pos_cos`` (margin < 0), and those violations are
    exactly the examples worth training on.

    Returns (anchor, label, pos_id, pos_cos, neg_id, neg_cos, margin)
    ordered anchor ASC; cosines rounded 6dp, margin = round(pos − neg,
    6); ties broken id ASC under the SAME row_number ordering the
    oracle replays. An anchor that lacks EITHER a same-label positive
    or a different-label negative among the non-anchor rows is DROPPED
    (the pos/neg inner join — FaceNet mines only complete triplets),
    so the output can have fewer than ``n_anchors`` rows; callers that
    need per-anchor diagnostics should outer-join the anchor panel
    back against this result.

    Plan: the anchor slice broadcasts (n_anchors × dim floats), the
    corpus streams past it once — cosine is a zip_with/aggregate fold
    in whole-stage codegen (no Python), one (anchor, side)-keyed
    window pass picks both extremes. Mining cost is inherently
    anchors × corpus; at 10^12 scale the corpus leg narrows to the
    ANN store's probed candidates (ann_store.py) with this exact
    kernel as the rerank tail."""
    from pyspark.sql.window import Window

    base = embs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("long").alias("label"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col).alias("nrm"),
    )
    anchors = base.where(F.col("id") < F.lit(int(n_anchors))).select(
        F.col("id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("av"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        base.crossJoin(F.broadcast(anchors))
        .where(F.col("id") != F.col("aid"))
        .select(
            "aid",
            "albl",
            "id",
            "label",
            F.when(
                F.col("nrm") * F.col("anrm") > 0,
                dot / (F.col("nrm") * F.col("anrm")),
            )
            .otherwise(F.lit(0.0))
            .alias("c"),
            (F.col("label") == F.col("albl")).alias("is_pos"),
        )
    )
    win = Window.partitionBy("aid", "is_pos").orderBy(
        # hardest positive = min cos; hardest negative = max cos —
        # one ordering expression serves both sides
        F.when(F.col("is_pos"), F.col("c")).otherwise(-F.col("c")).asc(),
        F.asc("id"),
    )
    top = pairs.withColumn("rn", F.row_number().over(win)).where(
        F.col("rn") == 1
    )
    pos = top.where(F.col("is_pos")).select(
        F.col("aid").alias("anchor"),
        F.col("albl").alias("label"),
        F.col("id").alias("pos_id"),
        F.col("c").alias("pc"),
    )
    neg = top.where(~F.col("is_pos")).select(
        F.col("aid").alias("anchor"),
        F.col("id").alias("neg_id"),
        F.col("c").alias("nc"),
    )
    return (
        pos.join(neg, "anchor")
        .select(
            "anchor",
            "label",
            "pos_id",
            F.round("pc", 6).alias("pos_cos"),
            "neg_id",
            F.round("nc", 6).alias("neg_cos"),
            F.round(F.col("pc") - F.col("nc"), 6).alias("margin"),
        )
        .orderBy("anchor")
    )


def maxsim_topk(
    vecs: DataFrame,
    query_group: int = 0,
    n_groups: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (MaxSim): documents
    are BAGS of vectors (multi-vector representation — one embedding
    per token/passage), the query is likewise a bag, and relevance is
    ``score(d) = Σ_{q∈Q} max_{v∈d} cos(q, v)`` — each query vector
    finds its best match in the document independently, then the
    per-query maxima sum. This is the retrieval model single-vector
    ANN cannot express (a doc matching ALL query aspects beats one
    matching a single aspect strongly).

    The sandbox embeddings table carries no doc grouping, so the bag
    structure is derived deterministically: ``group = pmod(vec_id,
    n_groups)`` (the synth_edges discipline), and the query bag is
    group ``query_group``.

    Returns (group_id, n_query_vecs, score) rounded 6dp, ordered
    score DESC, group_id ASC, top ``k``.

    Plan: the query bag broadcasts (|Q| × dim floats); the corpus
    streams past it once — cosine per (corpus vec, query vec) pair in
    whole-stage codegen, then a two-level aggregate: max per
    (group, query vec) and sum per group, both map-side combinable on
    the SAME group key (one shuffle). At 10^12 vectors the corpus leg
    narrows to per-query-vector ANN candidates (the PLAID pattern)
    with this exact kernel as the scoring tail."""
    base = vecs.select(
        F.col(id_col).alias("vid"),
        F.pmod(F.col(id_col), F.lit(int(n_groups))).cast("long").alias("gid"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col).alias("nrm"),
    )
    q = base.where(F.col("gid") == F.lit(int(query_group))).select(
        F.col("vid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("qv"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = base.crossJoin(F.broadcast(q)).select(
        "gid",
        "qid",
        F.when(
            F.col("nrm") * F.col("qnrm") > 0,
            dot / (F.col("nrm") * F.col("qnrm")),
        )
        .otherwise(F.lit(0.0))
        .alias("c"),
    )
    per_q = pairs.groupBy("gid", "qid").agg(F.max("c").alias("mx"))
    return (
        per_q.groupBy("gid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_query_vecs"),
            F.round(F.sum("mx"), 6).alias("score"),
        )
        .select(F.col("gid").alias("group_id"), "n_query_vecs", "score")
        .orderBy(F.desc("score"), F.asc("group_id"))
        .limit(int(k))
    )


def mutual_knn(
    vecs: DataFrame,
    k: int = 5,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs: (i, j) such that
    j is in i's cosine top-k AND i is in j's — the symmetric
    refinement dedup/matching pipelines use when one-directional kNN
    is too permissive (a hub vector appears in everyone's top-k;
    mutuality kills hub edges, and mutual-kNN graphs are the standard
    substrate for clustering/re-ranking à la k-reciprocal encoding).

    ``max_id`` bounds the panel (ids < max_id) so the all-pairs pass
    is explicitly budgeted; at 10^12 scale each side's top-k comes
    from the ANN store's probes and the mutuality check is the same
    rank join over candidate lists.

    Returns (id1, id2, cos) with id1 < id2, cos rounded 6dp, ordered
    cos DESC, id1, id2. Plan: one crossJoin of the bounded panel with
    itself (codegen cosine), ONE window pass ranks both directions
    (the rank of (a,b) under partition a), and the mutual filter is a
    self-join on the reversed key — rank rows only, k·n each side."""
    from pyspark.sql.window import Window

    base = vecs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm_expr(vec_col).alias("nrm"),
    )
    if max_id is not None:
        base = base.where(F.col("id") < F.lit(int(max_id)))
    a = base.select(
        F.col("id").alias("ia"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("id").alias("ib"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("va"),
            F.col("vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            F.when(
                F.col("na") * F.col("nb") > 0,
                dot / (F.col("na") * F.col("nb")),
            )
            .otherwise(F.lit(0.0))
            .alias("c"),
        )
    )
    w = Window.partitionBy("ia").orderBy(F.desc("c"), F.asc("ib"))
    knn = pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= F.lit(int(k))
    )
    fwd = knn.select("ia", "ib", "c")
    rev = knn.select(
        F.col("ib").alias("ia"), F.col("ia").alias("ib")
    )
    return (
        fwd.join(rev, ["ia", "ib"], "left_semi")
        .where(F.col("ia") < F.col("ib"))
        .select(
            F.col("ia").alias("id1"),
            F.col("ib").alias("id2"),
            F.round("c", 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id1"), F.asc("id2"))
    )
