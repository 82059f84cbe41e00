"""In-repo oracle: a deliberately naive, exact BM25 scorer in pure
pandas/python — the "reference engine" for rank-identity tests
(BASELINE.json: rank-identical docIDs and scores on the query set).

No pruning, no blocks, no Spark: exhaustive document-at-a-time scoring
over a local corpus. Shares the tokenizer and BM25 math modules with
the engine so the ONLY thing the differential test exercises is the
distributed dataflow.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from .config import DEFAULT, IndexConfig
from .functions.bm25 import idf_scalar, tf_norm
from .functions.tokenizer import query_terms, tokenize_text


def oracle_materialize(transcripts: pd.DataFrame, joiner: str = " ") -> pd.DataFrame:
    """conv_id -> doc_text under dense-ordinal semantics (skip empty
    turns, order by (turn_idx, ts), join with a single space)."""
    t = transcripts[transcripts["text"].fillna("").str.strip() != ""].copy()
    t = t.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    docs = (
        t.groupby("conv_id", sort=True)["text"].agg(joiner.join).reset_index()
    )
    docs = docs.rename(columns={"text": "doc_text"})
    docs["doc_id"] = range(len(docs))  # dense, sorted by conv_id
    return docs[["doc_id", "conv_id", "doc_text"]]


def oracle_bm25_topk(
    docs: pd.DataFrame,
    query: str,
    k: int = 10,
    cfg: IndexConfig = DEFAULT,
) -> pd.DataFrame:
    """Exhaustive exact BM25 top-k. Returns (doc_id, conv_id, score)
    sorted by (score desc, doc_id asc)."""
    terms = query_terms(query, cfg)
    tok = {
        row.doc_id: [t for _, t, _, _ in tokenize_text(row.doc_text, cfg)]
        for row in docs.itertuples()
    }
    dls = {d: len(v) for d, v in tok.items()}
    n_docs = len(docs)
    avgdl = sum(dls.values()) / n_docs if n_docs else 0.0
    tfs = {d: Counter(v) for d, v in tok.items()}
    df = {t: sum(1 for d in tfs.values() if t in d) for t in terms}

    rows = []
    conv = dict(zip(docs["doc_id"], docs["conv_id"]))
    for d, counts in tfs.items():
        s = 0.0
        for t in terms:
            tf = counts.get(t, 0)
            if tf == 0:
                continue
            s += idf_scalar(n_docs, df[t]) * float(
                tf_norm(tf, dls[d], avgdl, cfg.k1, cfg.b)
            )
        if s > 0.0:
            rows.append((d, conv[d], s))
    out = pd.DataFrame(rows, columns=["doc_id", "conv_id", "score"])
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out.reset_index(drop=True)
