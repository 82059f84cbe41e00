#!/usr/bin/env python
"""Phase-split profiler for the index build's scaling behaviour.

Times the build's three pipeline phases separately at one parallelism
level, in a pristine JVM (invoke once per (cpus, phase) from a shell
loop — process exit is the only reliable JVM isolation):

    jvm   scan + repartition(doc_id) + sortWithinPartitions, written to
          the `noop` sink — pure JVM dataflow, no Python workers.
    tok   jvm + tokenize mapInPandas (Arrow JVM->Py transfer, Python
          regex+encode kernel, Py->JVM posting rows) -> noop sink.
    full  the whole build (tok + term/range shuffle + mapInArrow block
          encode), i.e. exactly bench.py's --scaling-leg DAG.

Phase deltas attribute wall time: shuffle ~= jvm, tokenizer+transfer
~= tok - jvm, block encode ~= full - tok. Usage:

    python tools/profile_build.py CPUS PATH PHASE

Prints one JSON line: {"cpus", "phase", "sec", "n_turns"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus, path, phase = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from solr_ocr_processor_spark.functions.tokenizer import tokenize_postings
    from solr_ocr_processor_spark.operators.blocks import build_block_index
    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.plans.materialize import materialize_docs
    from solr_ocr_processor_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{phase}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    t = spark.read.parquet(path)
    n_turns = t.count()
    # warm python workers (same exclusion as bench --scaling-leg)
    t.repartition(cpus * 2).mapInPandas(
        lambda it: (pdf.iloc[:0] for pdf in it), t.schema
    ).count()

    t0 = time.perf_counter()
    if phase == "jvm":
        mat = materialize_docs(t)
        turns = mat.turns
        # mirrors tokenize_postings(doc_partitioned=True): in-partition
        # sort only, reusing the ordinal window's conv_id partitioning
        part = (
            turns.select("doc_id", "ordinal", "text", "char_start")
            .sortWithinPartitions("doc_id", "ordinal")
            .select("doc_id", "text", "char_start")
        )
        part.write.format("noop").mode("overwrite").save()
    elif phase == "tok":
        mat = materialize_docs(t)
        tokenize_postings(
            mat.turns, doc_partitioned=mat.doc_co_located
        ).write.format("noop").mode("overwrite").save()
    elif phase == "full":
        idx = build_postings(t)
        bidx = build_block_index(idx)
        bidx.blocks.count()
    else:
        raise SystemExit(f"unknown phase {phase}")
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {"cpus": cpus, "phase": phase, "sec": round(sec, 3), "n_turns": n_turns}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
