"""The fixed reference query set (FIXTURES.md §2).

The reference's query workload is whatever Solr queries its users
issue; BASELINE.json pins our gate to "rank-identical docIDs and BM25
scores on the reference query set". This module IS that set — shared
by the rank-identity pytest suite (which reports a match rate over
it) and by bench.py's query-throughput loop, so the numbers always
refer to the same workload.

Shapes covered: single term, OR bag, AND conjunction, hot term
(stopword), absent term, mixed present/absent, unicode, phrase,
k extremes (1 and 100).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Query:
    query_id: str
    text: str
    k: int = 10
    mode: str = "or"  # or | and | phrase


QUERY_SET: tuple[Query, ...] = (
    Query("q01_single", "spark", 10),
    Query("q02_bag", "spark window merge", 10),
    Query("q03_hot", "the", 10),
    Query("q04_absent", "zzzunseenterm", 10),
    Query("q05_mixed", "spark zzzunseenterm", 10),
    Query("q06_unicode", "café naïve", 10),
    Query("q07_k1", "window", 1),
    Query("q08_k100", "merge batch", 100),
    Query("q09_and", "spark window", 10, mode="and"),
    Query("q10_phrase", "the spark", 10, mode="phrase"),
    Query("q11_long_bag", "scan filter join sort agg stream", 10),
    Query("q12_numeric", "k8s gpu", 10),
)
