"""BM25 scoring math — ONE definition shared by the Spark engine, the
block-max metadata computation, and the in-repo oracle scorer, so rank
identity is never broken by two drifting formulas (SURVEY §7.3).

Lucene/Solr (the engine behind the reference) formula, k1=1.2 b=0.75:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = sum_t idf(t) * tfnorm(t, d)

All float64. Ties broken by doc_id ASC (Lucene convention).
"""

from __future__ import annotations

import math

import numpy as np


def idf(N: int, df) -> "np.ndarray | float":
    """Lucene BM25 idf. Accepts scalar or numpy array df."""
    return np.log1p((N - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def idf_scalar(N: int, df: int) -> float:
    return math.log1p((N - df + 0.5) / (df + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float = 1.2, b: float = 0.75):
    """Vectorized tf normalization (numpy arrays or scalars)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def max_block_score(tfs, dls, avgdl: float, idf_t: float, k1: float = 1.2, b: float = 0.75) -> float:
    """Per-block max score for block-max WAND: the max over the block's
    postings of idf*tfnorm. Computed at build time (Q6/Q9)."""
    return float(idf_t * np.max(tf_norm(tfs, dls, avgdl, k1, b)))


# SQL fragments (Spark SQL == DuckDB ANSI) for the same formulas, used
# by __spark_entry__.oracle_sql so the DuckDB oracle and the engine
# share one spelling of the math.
SQL_IDF = "ln(1 + ({N} - df + 0.5) / (df + 0.5))"
SQL_TFNORM = "(tf * ({k1} + 1.0) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
