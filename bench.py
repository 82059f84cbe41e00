#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Headline metric: end-to-end wall seconds for the full suite
(index build materialized once + every query from __spark_entry__).
Extra keys carry the BASELINE.md north-rule numbers: build turns/sec
and per-query latencies.

Usage:  python bench.py            # one timed run after a warm-up build
        python bench.py --scaling  # local[8] vs local[32] efficiency run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def run_suite(cpus: int, sf_dir: str) -> dict:
    """Build the index once (timed), then run every driver query (timed).

    Returns {"build_sec", "n_turns", "turns_per_sec", "queries": {...}}.
    """
    import __spark_entry__ as entry
    from solr_ocr_processor_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    try:
        from solr_ocr_processor_spark.sources.transcripts import derive_transcripts

        t = derive_transcripts(spark, sf_dir, entry.TW)
        n_turns = t.count()  # warm the scan; excluded from build timing

        entry._index_cache.clear()
        t0 = time.perf_counter()
        idx = entry._index(spark, sf_dir)
        # Force the whole build: postings + stats fully materialized.
        idx.postings.count()
        idx.doc_meta.count()
        idx.corpus.count()
        build_sec = time.perf_counter() - t0

        timings: dict[str, float] = {}
        for name, fn in entry.queries().items():
            q0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - q0, 3)

        return {
            "build_sec": round(build_sec, 3),
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / build_sec, 1) if build_sec else 0.0,
            "queries": timings,
        }
    finally:
        spark.stop()
        # a fresh JVM per parallelism level keeps scaling runs honest
        from pyspark import SparkContext

        SparkContext._gateway = None  # noqa: SLF001
        SparkContext._jvm = None  # noqa: SLF001


def main() -> None:
    if "--scaling" in sys.argv:
        res = {}
        for cpus in (8, 32):
            res[cpus] = run_suite(cpus, SF_DIR)
        tp8, tp32 = res[8]["turns_per_sec"], res[32]["turns_per_sec"]
        eff = (tp32 / tp8) / (32 / 8) if tp8 else 0.0
        print(
            json.dumps(
                {
                    "metric": "scaling-efficiency local[8]->local[32]",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sf": _sf_of(SF_DIR),
                    "turns_per_sec": {"8": tp8, "32": tp32},
                    "detail": {str(k): v for k, v in res.items()},
                }
            )
        )
        return

    r = run_suite(CPUS, SF_DIR)
    total = r["build_sec"] + sum(r["queries"].values())
    print(
        json.dumps(
            {
                "metric": "index-build + headline-query suite wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": r["queries"],
                "sf": _sf_of(SF_DIR),
                "build_sec": r["build_sec"],
                "n_turns": r["n_turns"],
                "turns_per_sec": r["turns_per_sec"],
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
