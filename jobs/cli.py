#!/usr/bin/env python
"""spark-submit entry point — the reference's HTTP surface as CLI verbs.

Route/method dispatch (app/main.go:94-116,163-171) maps to subcommands:

    POST /item/{uuid}   -> build     (full resumable index build)
    GET  /item/{uuid}   -> check     (membership; exit 0 found / 4 not)
    DELETE /item/{uuid} -> delete    (tombstone)  + compact (physical)
    /status             -> status    (manifest / lineage metrics)
    (Solr query side)   -> query     (BM25 WAND top-k over the store)

Run on a cluster:

    spark-submit --py-files dist/solr_ocr_processor_spark.zip \
        jobs/cli.py build --input <iceberg-table-or-parquet> --store /idx

Locally the session factory falls back to local[*] (session.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_ocr_processor_spark.config import DEFAULT
from solr_ocr_processor_spark.operators import lifecycle
from solr_ocr_processor_spark.operators.wand import wand_topk
from solr_ocr_processor_spark.session import get_spark
from solr_ocr_processor_spark.sources.transcripts import read_transcripts

# Exit-code analog of the reference's typed error taxonomy
# (app/err/errors.go:5-36, mapped to HTTP codes app/main.go:123-137):
#   BadRequest (400) / MethodNotAllowed (405) -> exit 2 — argparse
#     rejects malformed args and unknown verbs with code 2, the CLI
#     equivalent of a bad route or method.
#   UnProcessableEntity (422) -> exit 3 — input exists but holds
#     nothing indexable (the reference's empty-OCR-content case).
#   NotFound (404) -> exit 4 — membership check miss.
BAD_REQUEST_EXIT = 2
UNPROCESSABLE_EXIT = 3
NOT_FOUND_EXIT = 4


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="solr_ocr_processor_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or resume the index")
    b.add_argument("--input", required=True, help="iceberg table name or parquet path")
    b.add_argument("--store", required=True)
    b.add_argument("--shards", type=int, default=16)

    q = sub.add_parser("query", help="top-k search over the store")
    q.add_argument("--store", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument(
        "--mode",
        choices=("wand", "and", "phrase", "near", "spannear", "rerank",
                 "not", "bool",
                 "prefix", "fuzzy", "wildcard", "regexp", "mm", "sort",
                 "collapse", "group", "filter", "frange", "boost", "join",
                 "synonym", "bq", "elevate", "termboost", "pf", "bm25f",
                 "pf2", "lmdir", "rm3"),
        default="wand",
        help="wand: BM25 OR-of-terms via the pruned block index; "
        "and: every term required; phrase: exact positional phrase; "
        "near: sloppy phrase — terms in order within --slop extra "
        "positions (Lucene '\"a b\"~N'); "
        "spannear: two terms within the window in EITHER direction "
        "(SpanNearQuery inOrder=false); "
        "rerank: BM25 top --rwindow docs rescored original + "
        "--rweight * sloppy-phrase score of --rq (Solr rq={!rerank}); "
        "not: positives AND NOT --neg terms; "
        "bool: nested boolean grammar, e.g. 'a AND (b OR c) NOT d'; "
        "prefix: dictionary expansion of 'pre*'; "
        "fuzzy: terms within n edits of 'word~n' (bare ~ means 2); "
        "wildcard: '?'/'*' in any position, e.g. 's?a*'; "
        "mm: edismax minimum-should-match via the full --mm spec; "
        "sort: matches ordered by --sort-by instead of relevance; "
        "collapse: at most one hit per --width dl-bucket (Solr "
        "{!collapse}); group: top --k groups with --group-limit docs "
        "each (Solr group=true); filter: BM25 restricted by --fq; "
        "boost: relevance decayed by doc recency (--half-life days); "
        "join: BM25 admitted through a dimension-table filter — Solr "
        "{!join}; needs --dim and --jq; "
        "synonym: query-time SynonymQuery expansion via --syn; "
        "bq: additive boost query (--bq-q, --bweight — edismax bq=); "
        "elevate: --pin conv ids first in list order, organic after "
        "(QueryElevationComponent); "
        "regexp: anchored Lucene /re/ dictionary rewrite; "
        "termboost: caret per-term boosts 'spark^2 merge^0.5'; "
        "pf: edismax phrase-field boost (--pf-weight); "
        "frange: {!frange} --func value in [--lower, --upper]; "
        "bm25f: field-weighted BM25 over turn roles (--qf, needs "
        "--input — scores the source, not the stored index)",
    )
    q.add_argument("--qf", default="assistant^2 user^1",
                   help="role weights for --mode bm25f, edismax qf "
                   "syntax: 'assistant^2 user^1' (bare role = ^1)")
    q.add_argument("--syn", default="",
                   help="synonym map for --mode synonym: "
                   "'term:syn1,syn2;term2:syn3' (group tf=sum, df=max; "
                   "multi-word members like 'ml:machine learning' take "
                   "the phrase-occurrence path)")
    q.add_argument("--bq-q", default="",
                   help="boost query terms for --mode bq")
    q.add_argument("--bweight", type=float, default=1.0,
                   help="boost weight for --mode bq (>= 0)")
    q.add_argument("--pin", default="",
                   help="comma-separated conv ids to elevate for "
                   "--mode elevate, in rank order")
    q.add_argument("--dim", default="",
                   help="dimension table (parquet path) for --mode join")
    q.add_argument("--jq", default="",
                   help="dimension filter for --mode join, Solr syntax "
                   "'field:value' (fields: lang, source)")
    q.add_argument("--mm", default="2",
                   help="minimum-should-match for --mode mm — full "
                   "edismax spec: '3', '-1', '75%%', '-25%%', or "
                   "conditionals '2<75%% 5<50%%'")
    q.add_argument("--slop", type=int, default=2,
                   help="ordered-window slack for --mode near/rerank")
    q.add_argument("--rq", default="",
                   help="rerank phrase for --mode rerank (Solr reRankQuery)")
    q.add_argument("--rweight", type=float, default=2.0,
                   help="rerank boost weight for --mode rerank (>= 0)")
    q.add_argument("--rwindow", type=int, default=40,
                   help="rerank window size for --mode rerank (reRankDocs)")
    q.add_argument("--group-limit", type=int, default=2,
                   help="docs per group for --mode group")
    q.add_argument("--half-life", type=float, default=30.0,
                   help="recency decay half-life in days for --mode boost")
    q.add_argument("--pf-weight", type=float, default=1.0,
                   help="phrase clause weight for --mode pf / pf2 (>= 0)")
    q.add_argument("--mu", type=float, default=2000.0,
                   help="Dirichlet smoothing mass for --mode lmdir (> 0)")
    q.add_argument("--fb-docs", type=int, default=5,
                   help="pseudo-relevant feedback docs for --mode rm3")
    q.add_argument("--fb-terms", type=int, default=5,
                   help="expansion terms for --mode rm3")
    q.add_argument("--orig-weight", type=float, default=0.5,
                   help="interpolation weight of the original query for "
                   "--mode rm3 (in [0, 1])")
    q.add_argument("--func", default="div(dl, avgdl)",
                   help="function expression for --mode frange "
                   "(add/sub/mult/div over dl, n_turns, n_chars, avgdl)")
    q.add_argument("--lower", type=float, default=None,
                   help="frange lower bound (l=)")
    q.add_argument("--upper", type=float, default=None,
                   help="frange upper bound (u=)")
    q.add_argument("--width", type=int, default=64,
                   help="dl-bucket width for --mode collapse")
    q.add_argument("--fq", default="",
                   help="doc-values range filter for --mode filter, Solr "
                   "syntax 'field:[lo TO hi]' (* = open end; fields: dl, "
                   "n_turns, n_chars, last_ts as epoch seconds)")
    q.add_argument("--sort-by", default="n_chars",
                   help="doc field for --mode sort (n_chars, n_turns, dl, "
                   "last_ts — dates sort as epoch seconds)")
    q.add_argument("--asc", action="store_true",
                   help="ascending field order for --mode sort")
    q.add_argument("--neg", default="", help="negative terms for --mode not")
    q.add_argument("--start", type=int, default=0,
                   help="result offset — Solr start= pagination; the "
                   "(score DESC, doc_id ASC) total order keeps pages stable")
    q.add_argument(
        "--snippets",
        action="store_true",
        help="also print rendered snippet text (<em>-marked matched "
        "turns) for the hits — wand and phrase modes only; needs "
        "--input (the store is lazy: content lives in the source table)",
    )
    q.add_argument(
        "--input",
        default=None,
        help="transcripts source for --snippets text resolution",
    )

    f = sub.add_parser(
        "facet", help="histogram of matching docs bucketed by a doc field"
    )
    f.add_argument("--store", required=True)
    f.add_argument("--q", required=True)
    f.add_argument("--width", type=int, default=64, help="bucket width in tokens")
    f.add_argument("--by", choices=("dl", "last_ts", "pivot"), default="dl",
                   help="dl: token-length range facet; last_ts: date-range "
                   "facet over the build-time last-activity doc-values; "
                   "pivot: two-level dl x last_ts counts (facet.pivot)")
    f.add_argument("--gap", type=int, default=10,
                   help="date bucket gap in minutes for --by last_ts")

    st = sub.add_parser(
        "stats", help="numeric summary of matching docs (Solr stats component)"
    )
    st.add_argument("--store", required=True)
    st.add_argument("--q", required=True)
    st.add_argument("--field", choices=("dl", "n_turns", "n_chars"),
                    default="dl")
    st.add_argument("--percentiles", default="",
                    help="also report exact interpolated percentiles, "
                    "comma-separated fractions e.g. '0.5,0.9,0.99' "
                    "(Solr stats.percentiles)")

    m = sub.add_parser(
        "mlt", help="more-like-this: docs similar to a conversation"
    )
    m.add_argument("--store", required=True)
    m.add_argument("--conv-id", required=True)
    m.add_argument("--k", type=int, default=10)
    m.add_argument("--max-terms", type=int, default=25,
                   help="tf*idf-ranked seed terms (Lucene MLT default 25)")

    sg = sub.add_parser("suggest", help="dictionary completions for a prefix")
    sg.add_argument("--store", required=True)
    sg.add_argument("--q", required=True)
    sg.add_argument("--n", type=int, default=10)

    sp = sub.add_parser(
        "spellcheck", help="did-you-mean: closest dictionary terms to a word"
    )
    sp.add_argument("--store", required=True)
    sp.add_argument("--q", required=True)
    sp.add_argument("--n", type=int, default=5)
    sp.add_argument("--max-edits", type=int, default=2)

    te = sub.add_parser(
        "terms", help="dictionary enumeration (Solr /terms component)"
    )
    te.add_argument("--store", required=True)
    te.add_argument("--regex", default="", help="full-match term filter")
    te.add_argument("--mincount", type=int, default=1)
    te.add_argument("--n", type=int, default=50)

    tv = sub.add_parser(
        "tv", help="one document's term vector (Solr TermVectors component)"
    )
    tv.add_argument("--store", required=True)
    tv.add_argument("--conv-id", required=True)

    pl = sub.add_parser(
        "payload",
        help="payload-score ranking: --func over the term's stored "
        "position payloads (Solr {!payload_score})",
    )
    pl.add_argument("--store", required=True)
    pl.add_argument("--q", required=True, help="exactly ONE term")
    pl.add_argument("--func", choices=("max", "min", "avg"), default="max")
    pl.add_argument("--k", type=int, default=10)

    tp = sub.add_parser(
        "topic",
        help="checkpointed incremental pull (Solr streaming topic()): "
        "docs matching --q whose last_ts is after --checkpoint, oldest "
        "first; prints checkpoint_next to pass back on the next pull",
    )
    tp.add_argument("--store", required=True)
    tp.add_argument("--q", required=True, help="exactly ONE term")
    tp.add_argument("--checkpoint", default="1970-01-01T00:00:00",
                    help="ISO timestamp of the last pull")
    tp.add_argument("--rows", type=int, default=50)

    ba = sub.add_parser(
        "batch",
        help="answer a whole query workload in ONE postings pass "
        "(bm25_batch_topk): prints (query_id, rank, conv_id, score)",
    )
    ba.add_argument("--store", required=True)
    ba.add_argument("--queries", required=True,
                    help="workload: 'id1:query one;id2:query two'")
    ba.add_argument("--k", type=int, default=10)

    ex = sub.add_parser(
        "export",
        help="training-corpus export: near-dup keep-one + quality/lang "
        "gates + train/val/test split, optionally decontaminated "
        "against the test split",
    )
    ex.add_argument("--input", required=True,
                    help="transcripts source (parquet path or table)")
    ex.add_argument("--min-quality", type=float, default=0.5)
    ex.add_argument("--lang", default="en")
    ex.add_argument("--decontaminate", action="store_true",
                    help="also flag train rows sharing a word n-gram "
                    "with the test split (GPT-3-style rule)")
    ex.add_argument("--ngram", type=int, default=3,
                    help="n-gram order for --decontaminate")
    ex.add_argument("--bloom", action="store_true",
                    help="run --decontaminate through a Bloom bitmap "
                    "instead of the broadcast n-gram set (bounded "
                    "driver traffic; may over-flag, never under-flags)")

    c = sub.add_parser("check", help="membership check")
    c.add_argument("--store", required=True)
    c.add_argument("--conv-id", required=True)

    d = sub.add_parser("delete", help="tombstone a conversation")
    d.add_argument("--store", required=True)
    d.add_argument("--conv-id", required=True)

    sy = sub.add_parser(
        "sync", help="diff-and-fold the store against a new corpus snapshot"
    )
    sy.add_argument("--input", required=True, help="new corpus (parquet path/table)")
    sy.add_argument("--store", required=True)
    sy.add_argument(
        "--no-compact", action="store_true",
        help="leave tombstoned docs suppressed-but-present (cheaper)",
    )

    sub.add_parser("compact", help="physically drop tombstoned docs").add_argument(
        "--store", required=True
    )
    mg = sub.add_parser(
        "merge",
        help="policy-driven shard compaction: execute the size-tiered "
        "merge plan against the store's shard census (heals any "
        "interrupted merge first)",
    )
    mg.add_argument("--store", required=True)
    mg.add_argument("--factor", type=int, default=4)
    sub.add_parser("status", help="build lineage/metrics").add_argument(
        "--store", required=True
    )

    args = p.parse_args(argv)
    if args.cmd == "check":
        # Cluster-free when the store is on the local filesystem:
        # membership is a point lookup against the store's own parquet
        # (pyarrow pushdown) — no Spark session, no job, same
        # exit-code contract (reference GET = one HTTP call,
        # app/process/solr.go:100-124). Stores on a Hadoop filesystem
        # (hdfs://, s3a://, ...) fall through to the Spark-backed
        # lookup — pyarrow's local-path reader can't see them, and a
        # silent "not found" would be a wrong answer, not a slow one.
        scheme_local = "://" not in args.store or args.store.startswith("file://")
        if scheme_local:
            found = lifecycle.check_offline(args.store, args.conv_id)
        else:
            spark = get_spark(app_name="socr-check")
            store = lifecycle.IndexStore(args.store, DEFAULT)
            found = lifecycle.check(spark, store, args.conv_id)
        print(json.dumps({"conv_id": args.conv_id, "found": found}))
        return 0 if found else NOT_FOUND_EXIT
    spark = get_spark(app_name=f"socr-{args.cmd}")
    # export is store-less (source -> stdout); every other verb
    # addresses a persisted index store
    store = (
        lifecycle.IndexStore(args.store, DEFAULT)
        if args.cmd != "export"
        else None
    )

    if args.cmd == "build":
        try:
            t = read_transcripts(spark, args.input)
        except Exception as e:  # unreadable/absent input = bad request
            print(json.dumps({"error": "bad_request", "detail": str(e)[:200]}))
            return BAD_REQUEST_EXIT
        # UnProcessableEntity analog: the reference 422s when an item
        # has no processable OCR content (err/errors.go:13-15); for us,
        # an input with zero non-empty turns builds nothing.
        from pyspark.sql import functions as F

        if t.where(F.length(F.trim(F.col("text"))) > 0).limit(1).count() == 0:
            print(json.dumps({"error": "unprocessable", "detail": "no non-empty turns"}))
            return UNPROCESSABLE_EXIT
        lifecycle.build_store(spark, t, args.store, DEFAULT, n_shards=args.shards)
        print(json.dumps({"built": args.store}))
        return 0
    if args.cmd == "export":
        from solr_ocr_processor_spark.functions.textstats import LANG_MARKERS
        from solr_ocr_processor_spark.operators.dedup import minhash_lsh_pairs
        from solr_ocr_processor_spark.operators.pipeline import (
            contamination_flags,
            corpus_export,
        )
        from solr_ocr_processor_spark.plans.materialize import materialize_docs

        if not 0.0 <= args.min_quality <= 1.0:
            print(json.dumps({"error": "bad_request",
                              "detail": f"min-quality {args.min_quality} "
                              "outside [0, 1]"}))
            return BAD_REQUEST_EXIT
        if args.lang not in LANG_MARKERS:
            print(json.dumps({"error": "bad_request",
                              "detail": f"unknown lang {args.lang!r}; one "
                              f"of {sorted(LANG_MARKERS)}"}))
            return BAD_REQUEST_EXIT
        if args.ngram < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"ngram {args.ngram} < 1"}))
            return BAD_REQUEST_EXIT
        try:
            t = read_transcripts(spark, args.input)
        except Exception as e:
            print(json.dumps({"error": "bad_request", "detail": str(e)[:200]}))
            return BAD_REQUEST_EXIT
        from pyspark.sql import functions as F

        mat = materialize_docs(t, with_text=True)
        docs = mat.docs.select(
            "doc_id", "conv_id", F.col("doc_text").alias("text")
        )
        pairs = minhash_lsh_pairs(docs, n=3, tau=0.3)
        out = corpus_export(
            docs, pairs, min_quality=args.min_quality, lang=args.lang
        ).join(docs.select("doc_id", "conv_id"), "doc_id")
        if args.decontaminate:
            if args.bloom:
                from solr_ocr_processor_spark.operators.pipeline import (
                    bloom_contamination_flags,
                )

                flagger, flag_col = bloom_contamination_flags, "flagged"
            else:
                flagger, flag_col = contamination_flags, "contaminated"
            # audit column over the export: train rows vs test shingles
            flags = flagger(
                out.where("split = 'train'").join(
                    docs.select("doc_id", "text"), "doc_id"
                ),
                out.where("split = 'test'").join(
                    docs.select("doc_id", "text"), "doc_id"
                ),
                n=args.ngram,
            ).select("doc_id", F.col(flag_col).alias("contaminated"))
            out = out.join(flags, "doc_id", "left").withColumn(
                "contaminated", F.coalesce("contaminated", F.lit(False))
            )
        cols = ["conv_id", "quality", "lang_pred", "split"] + (
            ["contaminated"] if args.decontaminate else []
        )
        for r in out.orderBy("doc_id").collect():
            print(json.dumps({c: r[c] for c in cols}))
        return 0
    if args.cmd == "batch":
        from solr_ocr_processor_spark.operators.score import bm25_batch_topk

        workload: dict[str, str] = {}
        for part in filter(None, args.queries.split(";")):
            qid, sep, text = part.partition(":")
            if not qid.strip() or not sep or not text.strip():
                print(json.dumps({"error": "bad_request",
                                  "detail": f"bad --queries {args.queries!r}: "
                                  "expected 'id1:query;id2:query'"}))
                return BAD_REQUEST_EXIT
            workload[qid.strip()] = text.strip()
        if args.k < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"k {args.k} < 1"}))
            return BAD_REQUEST_EXIT
        dead_df = lifecycle.tombstoned_convs(spark, store)
        idx = lifecycle.load_index(spark, store)
        out = bm25_batch_topk(
            spark, idx, workload, k=args.k, exclude_docs=dead_df
        )
        for r in out.collect():
            print(json.dumps({"query_id": r["query_id"], "rank": r["rank"],
                              "conv_id": r["conv_id"], "score": r["score"]}))
        return 0
    if args.cmd == "query":
        if args.snippets and args.mode not in ("wand", "phrase"):
            print(json.dumps({"error": "bad_request",
                              "detail": f"--snippets unsupported for mode {args.mode}"}))
            return BAD_REQUEST_EXIT
        if args.snippets and not args.input:
            print(json.dumps({"error": "bad_request",
                              "detail": "--snippets needs --input (lazy store: "
                              "snippet text resolves from the source table)"}))
            return BAD_REQUEST_EXIT
        if args.start < 0:
            print(json.dumps({"error": "bad_request",
                              "detail": f"negative start {args.start}"}))
            return BAD_REQUEST_EXIT
        # Pagination: every top-k fetches the page's END (start+k rows,
        # still driver-bounded) and slices the page off — the total
        # order (score DESC, doc_id ASC) makes pages stable.
        fetch_k = args.k + args.start
        if args.mode == "wand":
            # tombstones ride the PLAN: dead ids group by range and
            # each kernel receives only its own range's list, so a
            # store with 10^8 deletes between compactions never
            # collects an id list to the driver (r3 verdict fix).
            dead_df = lifecycle.tombstoned_convs(spark, store).select("doc_id")
            bidx = lifecycle.load_block_index(spark, store)
            rows = wand_topk(
                spark, bidx, args.q, k=fetch_k, exclude_docs=dead_df
            ).collect()[args.start:]
        else:
            from solr_ocr_processor_spark.operators.boolean import (
                BooleanSyntaxError,
                boolean_topk,
            )
            from solr_ocr_processor_spark.operators.query import (
                boolean_not_topk,
                conjunctive_topk,
                phrase_topk,
            )

            # tombstone suppression IN THE PLAN: the tombstone table
            # anti-joins before the top-k, so k stays k and no
            # unbounded dead-id list ever reaches the driver.
            dead_df = lifecycle.tombstoned_convs(spark, store)
            idx = lifecycle.load_index(spark, store)
            if args.mode == "and":
                out = conjunctive_topk(
                    spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                )
            elif args.mode == "phrase":
                # block-range prune: common terms' postings drop
                # everywhere the rarest term has no block
                out = phrase_topk(
                    spark, idx, args.q, k=fetch_k, exclude_docs=dead_df,
                    bidx=lifecycle.load_block_index(spark, store),
                )
            elif args.mode == "near":
                from solr_ocr_processor_spark.operators.query import (
                    proximity_topk,
                )

                if args.slop < 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"negative slop {args.slop}"}))
                    return BAD_REQUEST_EXIT
                out = proximity_topk(
                    spark, idx, args.q, slop=args.slop, k=fetch_k,
                    exclude_docs=dead_df,
                    bidx=lifecycle.load_block_index(spark, store),
                )
            elif args.mode == "spannear":
                from solr_ocr_processor_spark.operators.query import (
                    span_near_topk,
                )

                if args.slop < 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"negative slop {args.slop}"}))
                    return BAD_REQUEST_EXIT
                try:  # unordered spans are a two-term surface
                    out = span_near_topk(
                        spark, idx, args.q, slop=args.slop, k=fetch_k,
                        exclude_docs=dead_df,
                    )
                except ValueError as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "rerank":
                from solr_ocr_processor_spark.operators.query import (
                    rerank_topk,
                )

                if not args.rq or args.rweight < 0 or args.slop < 0:
                    print(json.dumps({
                        "error": "bad_request",
                        "detail": "rerank needs --rq, --rweight >= 0 "
                                  "and --slop >= 0",
                    }))
                    return BAD_REQUEST_EXIT
                out = rerank_topk(
                    spark, idx, args.q, args.rq, slop=args.slop,
                    window=max(args.rwindow, fetch_k), weight=args.rweight,
                    k=fetch_k, exclude_docs=dead_df,
                )
            elif args.mode == "bool":
                # parse errors are the 400 analog (Solr would reject
                # malformed query syntax as a bad request)
                try:
                    out = boolean_topk(
                        spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                    )
                except BooleanSyntaxError as e:
                    print(json.dumps({"error": "bad_request", "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "prefix":
                from solr_ocr_processor_spark.operators.expand import (
                    is_valid_prefix_pattern,
                    prefix_topk,
                )

                # Lucene rejects a bare '*' (whole-dictionary expansion)
                # and this is a PREFIX surface: '*abc' / 's*r' are not
                # prefix queries and must not silently run as one.
                if not is_valid_prefix_pattern(args.q):
                    print(json.dumps({"error": "bad_request",
                                      "detail": "bad prefix pattern: need "
                                      "a non-empty stem, '*' only at the end"}))
                    return BAD_REQUEST_EXIT
                out = prefix_topk(
                    spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                )
            elif args.mode == "fuzzy":
                from solr_ocr_processor_spark.operators.expand import fuzzy_topk

                # 'word~n' with bare '~' meaning 2 edits (Lucene default)
                word, _, edits = args.q.partition("~")
                if not word.strip():
                    print(json.dumps({"error": "bad_request",
                                      "detail": "empty fuzzy pattern"}))
                    return BAD_REQUEST_EXIT
                try:
                    max_edits = int(edits) if edits else 2
                except ValueError:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"bad edit count {edits!r}"}))
                    return BAD_REQUEST_EXIT
                # Lucene's FuzzyQuery bound: maxEdits in 0..2. Negative
                # silently matches nothing; large values brute-force
                # Levenshtein over the whole dictionary.
                if not 0 <= max_edits <= 2:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"edit count {max_edits} "
                                      "outside 0..2"}))
                    return BAD_REQUEST_EXIT
                out = fuzzy_topk(
                    spark, idx, word, k=fetch_k, max_edits=max_edits,
                    exclude_docs=dead_df,
                )
            elif args.mode == "wildcard":
                from solr_ocr_processor_spark.operators.expand import (
                    is_valid_wildcard_pattern,
                    wildcard_topk,
                )

                # Lucene-shaped wildcard: literal chars must be index
                # alphabet and at least one literal is required (a bare
                # '*' is the whole-dictionary expansion Lucene refuses).
                if not is_valid_wildcard_pattern(args.q):
                    print(json.dumps({"error": "bad_request",
                                      "detail": "bad wildcard pattern: "
                                      "[a-z0-9*?]+ with at least one "
                                      "literal character"}))
                    return BAD_REQUEST_EXIT
                out = wildcard_topk(
                    spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                )
            elif args.mode == "regexp":
                from solr_ocr_processor_spark.operators.expand import regexp_topk

                try:
                    out = regexp_topk(
                        spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                    )
                except ValueError as e:  # outside the dialect-shared subset
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "termboost":
                from solr_ocr_processor_spark.operators.query import term_boost_topk

                try:
                    out = term_boost_topk(
                        spark, idx, args.q, k=fetch_k, exclude_docs=dead_df
                    )
                except ValueError as e:  # malformed caret weight
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "pf":
                from solr_ocr_processor_spark.operators.query import pf_topk

                if args.pf_weight < 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"pf-weight {args.pf_weight} "
                                      "must be >= 0"}))
                    return BAD_REQUEST_EXIT
                out = pf_topk(
                    spark, idx, args.q, pf_weight=args.pf_weight,
                    k=fetch_k, exclude_docs=dead_df,
                )
            elif args.mode == "pf2":
                from solr_ocr_processor_spark.operators.query import pf2_topk

                # same shared --pf-weight contract as the pf arm above
                if args.pf_weight < 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"pf-weight {args.pf_weight} "
                                      "must be >= 0"}))
                    return BAD_REQUEST_EXIT
                out = pf2_topk(
                    spark, idx, args.q, pf2_weight=args.pf_weight,
                    k=fetch_k, exclude_docs=dead_df,
                )
            elif args.mode == "lmdir":
                from solr_ocr_processor_spark.operators.query import lmdir_topk

                if args.mu <= 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"mu {args.mu} must be > 0"}))
                    return BAD_REQUEST_EXIT
                out = lmdir_topk(
                    spark, idx, args.q, k=fetch_k, mu=args.mu,
                    exclude_docs=dead_df,
                )
            elif args.mode == "rm3":
                from solr_ocr_processor_spark.operators.query import rm3_topk

                if not 0.0 <= args.orig_weight <= 1.0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"orig-weight "
                                      f"{args.orig_weight} must be in "
                                      "[0, 1]"}))
                    return BAD_REQUEST_EXIT
                if args.fb_docs < 1 or args.fb_terms < 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"fb-docs {args.fb_docs} "
                                      f"must be >= 1, fb-terms "
                                      f"{args.fb_terms} must be >= 0"}))
                    return BAD_REQUEST_EXIT
                out = rm3_topk(
                    spark, idx, args.q, k=fetch_k, fb_docs=args.fb_docs,
                    fb_terms=args.fb_terms, orig_weight=args.orig_weight,
                    exclude_docs=dead_df,
                )
            elif args.mode == "bm25f":
                from solr_ocr_processor_spark.functions.tokenizer import (
                    query_terms,
                )
                from solr_ocr_processor_spark.operators.bm25f import bm25f_topk

                if not args.input:
                    print(json.dumps({"error": "bad_request",
                                      "detail": "bm25f needs --input (it "
                                      "scores role fields in the source)"}))
                    return BAD_REQUEST_EXIT
                weights: dict[str, float] = {}
                for part in args.qf.split():
                    fld, _, w = part.partition("^")
                    try:
                        weights[fld] = float(w) if w else 1.0
                    except ValueError:
                        print(json.dumps({"error": "bad_request",
                                          "detail": f"bad qf weight {part!r}"}))
                        return BAD_REQUEST_EXIT
                    if weights[fld] < 0:
                        print(json.dumps({"error": "bad_request",
                                          "detail": f"qf weight {part!r} < 0"}))
                        return BAD_REQUEST_EXIT
                try:
                    src = read_transcripts(spark, args.input)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
                terms = query_terms(args.q)
                if not terms:
                    print(json.dumps({"error": "unprocessable",
                                      "detail": "empty query"}))
                    return UNPROCESSABLE_EXIT
                # tombstoned convs lose their mass BEFORE stats, the
                # compacted-index semantics (anti-join in the plan)
                t = src.join(dead_df, "conv_id", "left_anti") if dead_df is not None else src
                out = bm25f_topk(t, terms, weights, k=args.k + args.start)
                for r in out.collect()[args.start:]:
                    print(json.dumps({"conv_id": r["conv_id"],
                                      "score": r["score"]}))
                return 0
            elif args.mode == "frange":
                from solr_ocr_processor_spark.operators.query import frange_topk
                from solr_ocr_processor_spark.operators.stream_expr import (
                    StreamExprError,
                )

                if args.lower is None and args.upper is None:
                    print(json.dumps({"error": "bad_request",
                                      "detail": "frange needs --lower "
                                      "and/or --upper"}))
                    return BAD_REQUEST_EXIT
                try:
                    out = frange_topk(
                        spark, idx, args.q, args.func, args.lower,
                        args.upper, k=fetch_k, exclude_docs=dead_df,
                    )
                except StreamExprError as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "mm":
                from solr_ocr_processor_spark.functions.tokenizer import (
                    query_terms,
                )
                from solr_ocr_processor_spark.operators.query import (
                    mm_topk,
                    parse_mm_spec,
                )

                n_terms = len(set(query_terms(args.q)))
                try:
                    m = parse_mm_spec(args.mm, max(n_terms, 1))
                except ValueError as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
                out = mm_topk(
                    spark, idx, args.q, mm=m, k=fetch_k,
                    exclude_docs=dead_df,
                )
            elif args.mode == "boost":
                from solr_ocr_processor_spark.operators.query import boosted_topk

                if args.half_life <= 0:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"half-life {args.half_life} "
                                      "must be positive"}))
                    return BAD_REQUEST_EXIT
                try:
                    out = boosted_topk(
                        spark, idx, args.q, half_life_days=args.half_life,
                        k=fetch_k, exclude_docs=dead_df,
                    )
                except ValueError as e:  # ts-less store has no date field
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
                for r in out.collect()[args.start:]:
                    print(json.dumps({"doc_id": r["doc_id"],
                                      "conv_id": r["conv_id"],
                                      "score": r["score"],
                                      "boosted": r["boosted"]}))
                return 0
            elif args.mode == "group":
                from solr_ocr_processor_spark.operators.collapse import group_topk

                if args.width < 1 or args.group_limit < 1:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"bucket width {args.width} "
                                      f"/ group limit {args.group_limit} < 1"}))
                    return BAD_REQUEST_EXIT
                # --start pages flat hit lists; a grouped page is
                # group-shaped, so offset paging doesn't apply here
                out = group_topk(
                    spark, idx, args.q, width=args.width, k=args.k,
                    group_limit=args.group_limit, exclude_docs=dead_df,
                )
                for r in out.collect():
                    print(json.dumps({"group": r["group"],
                                      "doc_id": r["doc_id"],
                                      "conv_id": r["conv_id"],
                                      "score": r["score"],
                                      "rn": r["rn"]}))
                return 0
            elif args.mode == "sort":
                from solr_ocr_processor_spark.operators.query import (
                    SORT_FIELDS,
                    sort_topk,
                )

                if args.sort_by not in SORT_FIELDS:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"unknown sort field "
                                      f"{args.sort_by!r}; one of {SORT_FIELDS}"}))
                    return BAD_REQUEST_EXIT
                out = sort_topk(
                    spark, idx, args.q, by=args.sort_by,
                    descending=not args.asc, k=fetch_k, exclude_docs=dead_df,
                )
                for r in out.collect()[args.start:]:
                    print(json.dumps({"doc_id": r["doc_id"],
                                      "conv_id": r["conv_id"],
                                      args.sort_by: r[args.sort_by]}))
                return 0
            elif args.mode == "filter":
                from solr_ocr_processor_spark.operators.query import (
                    FilterSyntaxError,
                    filtered_topk,
                )

                try:
                    out = filtered_topk(
                        spark, idx, args.q, args.fq, k=fetch_k,
                        exclude_docs=dead_df,
                    )
                except FilterSyntaxError as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "join":
                from solr_ocr_processor_spark.operators.query import (
                    JoinSyntaxError,
                    join_topk,
                )

                if not args.dim or not args.jq:
                    print(json.dumps({"error": "bad_request",
                                      "detail": "join needs --dim and --jq"}))
                    return BAD_REQUEST_EXIT
                try:
                    dim = spark.read.parquet(args.dim)
                except Exception as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
                try:
                    out = join_topk(
                        spark, idx, args.q, dim, args.jq, k=fetch_k,
                        exclude_docs=dead_df,
                    )
                except JoinSyntaxError as e:
                    print(json.dumps({"error": "bad_request",
                                      "detail": str(e)[:200]}))
                    return BAD_REQUEST_EXIT
            elif args.mode == "collapse":
                from solr_ocr_processor_spark.operators.collapse import (
                    collapse_topk,
                )

                if args.width < 1:
                    print(json.dumps({"error": "bad_request",
                                      "detail": f"bucket width {args.width} < 1"}))
                    return BAD_REQUEST_EXIT
                out = collapse_topk(
                    spark, idx, args.q, width=args.width, k=fetch_k,
                    exclude_docs=dead_df,
                )
                for r in out.collect()[args.start:]:
                    print(json.dumps({"group": r["group"],
                                      "doc_id": r["doc_id"],
                                      "conv_id": r["conv_id"],
                                      "score": r["score"]}))
                return 0
            elif args.mode == "synonym":
                from solr_ocr_processor_spark.operators.expand import (
                    synonym_topk,
                )

                syn: dict[str, tuple[str, ...]] = {}
                ok = True
                for grp in filter(None, args.syn.split(";")):
                    head, sep, rest = grp.partition(":")
                    members = tuple(
                        t.strip() for t in rest.split(",") if t.strip()
                    )
                    if not head.strip() or not sep or not members:
                        ok = False
                        break
                    syn[head.strip()] = members
                if not ok:
                    print(json.dumps({
                        "error": "bad_request",
                        "detail": f"bad --syn {args.syn!r}: expected "
                                  "'term:syn1,syn2;term2:syn3'",
                    }))
                    return BAD_REQUEST_EXIT
                out = synonym_topk(
                    spark, idx, args.q, syn, k=fetch_k, exclude_docs=dead_df
                )
            elif args.mode == "bq":
                from solr_ocr_processor_spark.operators.query import bq_topk

                if not args.bq_q or args.bweight < 0:
                    print(json.dumps({
                        "error": "bad_request",
                        "detail": "bq needs --bq-q and --bweight >= 0",
                    }))
                    return BAD_REQUEST_EXIT
                out = bq_topk(
                    spark, idx, args.q, args.bq_q, bq_weight=args.bweight,
                    k=fetch_k, exclude_docs=dead_df,
                )
                for r in out.collect()[args.start:]:
                    print(json.dumps({"doc_id": r["doc_id"],
                                      "conv_id": r["conv_id"],
                                      "score": r["score"],
                                      "boosted": r["boosted"]}))
                return 0
            elif args.mode == "elevate":
                from solr_ocr_processor_spark.operators.query import (
                    elevation_topk,
                )

                pins = [c.strip() for c in args.pin.split(",") if c.strip()]
                out = elevation_topk(
                    spark, idx, args.q, pins, k=fetch_k, exclude_docs=dead_df
                )
                for r in out.collect()[args.start:]:
                    print(json.dumps({"rank": r["rank"],
                                      "conv_id": r["conv_id"],
                                      "score": r["score"],
                                      "elevated": r["elevated"]}))
                return 0
            else:
                out = boolean_not_topk(
                    spark, idx, args.q, args.neg, k=fetch_k,
                    exclude_docs=dead_df,
                )
            rows = out.collect()[args.start:]
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "conv_id": r["conv_id"], "score": r["score"]}))
        if args.snippets and rows:
            # The user-visible half of the reference's capability: the
            # matched turns' text with <em>-marked hits, resolved via
            # the lazy content pointer. The ALREADY-COLLECTED hit list
            # feeds the renderers (no second scan+score+top-k), and the
            # source reads ONLY the winning convs — the isin predicate
            # pushes into the parquet scan, so the whole snippet half
            # is k-bounded.
            from pyspark.sql import functions as F

            from solr_ocr_processor_spark.operators.score import (
                phrase_snippets,
                snippets,
            )

            try:
                src = read_transcripts(spark, args.input)
            except Exception as e:
                print(json.dumps({"error": "bad_request", "detail": str(e)[:200]}))
                return BAD_REQUEST_EXIT
            win = [r["conv_id"] for r in rows]
            s_idx = lifecycle.load_index_with_content(
                spark, store, src.where(F.col("conv_id").isin(win))
            )
            top = [(r["doc_id"], r["conv_id"], r["score"]) for r in rows]
            if args.mode == "phrase":
                sn = phrase_snippets(spark, s_idx, args.q, k=args.k, top_rows=top)
            else:
                top_df = spark.createDataFrame(
                    top, "doc_id long, conv_id string, score double"
                )
                sn = snippets(spark, s_idx, args.q, k=args.k, top=top_df)
            for r in sn.collect():
                print(json.dumps({
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "snippet": r["snippet"],
                }))
        return 0
    if args.cmd == "facet":
        from solr_ocr_processor_spark.operators.facet import (
            date_facet_counts,
            facet_counts,
        )

        if args.width < 1 or args.gap < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"bucket width {args.width} / gap "
                              f"{args.gap} < 1"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        if args.by == "last_ts":
            try:
                out = date_facet_counts(
                    spark, idx, args.q, gap_minutes=args.gap,
                    exclude_docs=dead_df,
                )
            except ValueError as e:  # ts-less store has no date field
                print(json.dumps({"error": "bad_request",
                                  "detail": str(e)[:200]}))
                return BAD_REQUEST_EXIT
            for r in out.collect():
                print(json.dumps({"bucket_start": r["bucket_start"],
                                  "n_docs": r["n_docs"]}))
            return 0
        if args.by == "pivot":
            from solr_ocr_processor_spark.operators.facet import (
                pivot_facet_counts,
            )

            try:
                out = pivot_facet_counts(
                    spark, idx, args.q, width=args.width,
                    gap_minutes=args.gap, exclude_docs=dead_df,
                )
            except ValueError as e:  # ts-less store has no date field
                print(json.dumps({"error": "bad_request",
                                  "detail": str(e)[:200]}))
                return BAD_REQUEST_EXIT
            for r in out.collect():
                print(json.dumps({"dl_bucket": r["dl_bucket"],
                                  "ts_bucket": r["ts_bucket"],
                                  "n_docs": r["n_docs"]}))
            return 0
        for r in facet_counts(
            spark, idx, args.q, width=args.width, exclude_docs=dead_df
        ).collect():
            print(json.dumps({"bucket": r["bucket"], "n_docs": r["n_docs"]}))
        return 0
    if args.cmd == "stats":
        from solr_ocr_processor_spark.operators.facet import stats_field

        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        if args.percentiles:
            from solr_ocr_processor_spark.operators.facet import (
                stats_percentiles,
            )

            try:
                ps = tuple(float(x) for x in args.percentiles.split(","))
                prow = stats_percentiles(
                    spark, idx, args.q, field=args.field,
                    percentiles=ps, exclude_docs=dead_df,
                ).first()
            except ValueError as e:
                print(json.dumps({"error": "bad_request",
                                  "detail": str(e)[:200]}))
                return BAD_REQUEST_EXIT
            print(json.dumps({"field": args.field,
                              **(prow.asDict() if prow is not None
                                 else {"n": 0})}))
            return 0
        row = stats_field(
            spark, idx, args.q, field=args.field, exclude_docs=dead_df
        ).first()
        # row is None only for an empty query (no analyzable terms) —
        # a zero-match query still yields one n=0 row from the agg.
        stats = row.asDict() if row is not None else {
            "n": 0, "min": None, "max": None, "sum": None,
            "mean": None, "stddev": None,
        }
        print(json.dumps({"field": args.field, **stats}))
        return 0
    if args.cmd == "mlt":
        from solr_ocr_processor_spark.operators.expand import mlt_topk

        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        seed = idx.doc_meta.where(
            idx.doc_meta["conv_id"] == args.conv_id
        ).select("doc_id").first()
        dead_seed = (
            seed is not None
            and dead_df.where(dead_df["conv_id"] == args.conv_id).first() is not None
        )
        if seed is None or dead_seed:  # unknown/deleted = GET-miss 404
            print(json.dumps({"error": "not_found", "conv_id": args.conv_id}))
            return NOT_FOUND_EXIT
        out = mlt_topk(
            spark, idx, seed["doc_id"], k=args.k,
            max_query_terms=args.max_terms, exclude_docs=dead_df,
        )
        for r in out.collect():
            print(json.dumps({"doc_id": r["doc_id"], "conv_id": r["conv_id"],
                              "score": r["score"]}))
        return 0
    if args.cmd == "suggest":
        from solr_ocr_processor_spark.operators.expand import (
            is_valid_prefix_pattern,
            suggest_terms,
        )

        if not is_valid_prefix_pattern(args.q):
            print(json.dumps({"error": "bad_request",
                              "detail": "bad prefix pattern: need a non-empty "
                              "stem, '*' only at the end"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        for r in suggest_terms(spark, idx, args.q, n=args.n).collect():
            print(json.dumps({"term": r["term"], "df": r["df"]}))
        return 0
    if args.cmd == "spellcheck":
        from solr_ocr_processor_spark.operators.expand import spellcheck_terms

        if not (0 <= args.max_edits <= 2):
            print(json.dumps({"error": "bad_request",
                              "detail": f"max edits {args.max_edits} "
                              "outside 0..2"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        for r in spellcheck_terms(
            spark, idx, args.q, n=args.n, max_edits=args.max_edits
        ).collect():
            print(json.dumps({"term": r["term"], "dist": r["dist"],
                              "df": r["df"]}))
        return 0
    if args.cmd == "terms":
        from solr_ocr_processor_spark.operators.terms import (
            is_valid_terms_regex,
            terms_enum,
        )

        if args.regex and not is_valid_terms_regex(args.regex):
            print(json.dumps({"error": "bad_request",
                              "detail": f"bad terms regex {args.regex!r}"}))
            return BAD_REQUEST_EXIT
        if args.mincount < 1 or args.n < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"mincount {args.mincount} / "
                              f"n {args.n} < 1"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        out = terms_enum(
            spark, idx, regex=args.regex or None,
            mincount=args.mincount, limit=args.n,
        )
        for r in out.collect():
            print(json.dumps({"term": r["term"], "df": r["df"],
                              "cf": r["cf"]}))
        return 0
    if args.cmd == "tv":
        from solr_ocr_processor_spark.operators.terms import term_vectors

        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        present = idx.doc_meta.where(
            idx.doc_meta["conv_id"] == args.conv_id
        ).first()
        dead = (
            present is not None
            and dead_df.where(dead_df["conv_id"] == args.conv_id).first()
            is not None
        )
        if present is None or dead:  # unknown/deleted doc = GET-miss 404
            print(json.dumps({"error": "not_found", "conv_id": args.conv_id}))
            return NOT_FOUND_EXIT
        for r in term_vectors(spark, idx, args.conv_id).collect():
            print(json.dumps({"term": r["term"], "tf": r["tf"],
                              "df": r["df"],
                              "tf_idf_scaled": r["tf_idf_scaled"]}))
        return 0
    if args.cmd == "payload":
        from solr_ocr_processor_spark.operators.query import payload_score_topk

        terms = args.q.split()
        if len(terms) != 1:
            print(json.dumps({"error": "bad_request",
                              "detail": "payload needs exactly one term"}))
            return BAD_REQUEST_EXIT
        if args.k < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"k {args.k} < 1"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        out = payload_score_topk(
            spark, idx, terms[0], func=args.func, k=args.k,
            exclude_docs=dead_df,
        )
        for r in out.collect():
            print(json.dumps({"doc_id": r["doc_id"], "conv_id": r["conv_id"],
                              "payload": r["payload"]}))
        return 0
    if args.cmd == "topic":
        import datetime as _dt

        from solr_ocr_processor_spark.operators.query import topic_pull

        terms = args.q.split()
        if len(terms) != 1:
            print(json.dumps({"error": "bad_request",
                              "detail": "topic needs exactly one term"}))
            return BAD_REQUEST_EXIT
        if args.rows < 1:
            print(json.dumps({"error": "bad_request",
                              "detail": f"rows {args.rows} < 1"}))
            return BAD_REQUEST_EXIT
        try:
            ckpt = _dt.datetime.fromisoformat(args.checkpoint)
        except ValueError:
            print(json.dumps({"error": "bad_request",
                              "detail": f"bad checkpoint "
                              f"{args.checkpoint!r} (need ISO timestamp)"}))
            return BAD_REQUEST_EXIT
        idx = lifecycle.load_index(spark, store)
        dead_df = lifecycle.tombstoned_convs(spark, store)
        rows = topic_pull(
            spark, idx, terms[0], ckpt, limit=args.rows,
            exclude_docs=dead_df,
        ).collect()
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "conv_id": r["conv_id"],
                              "last_ts": str(r["last_ts"])}))
        # at-least-once contract: the subscriber stores this and passes
        # it back; an empty pull keeps the old checkpoint
        nxt = str(rows[-1]["last_ts"]) if rows else args.checkpoint
        print(json.dumps({"checkpoint_next": nxt}))
        return 0
    if args.cmd == "sync":
        try:
            t = read_transcripts(spark, args.input)
        except Exception as e:  # unreadable/absent input = bad request
            print(json.dumps({"error": "bad_request", "detail": str(e)[:200]}))
            return BAD_REQUEST_EXIT
        res = lifecycle.sync_store(
            spark, store, t, compact_after=not args.no_compact
        )
        print(json.dumps({"synced": args.store, **res}))
        return 0
    if args.cmd == "delete":
        lifecycle.delete_conv(spark, store, args.conv_id)
        print(json.dumps({"deleted": args.conv_id}))
        return 0
    if args.cmd == "compact":
        lifecycle.compact(spark, store)
        print(json.dumps({"compacted": args.store}))
        return 0
    if args.cmd == "merge":
        n = lifecycle.merge_shards_tiered(spark, store, merge_factor=args.factor)
        print(json.dumps({"merged_groups": n, "store": args.store}))
        return 0
    if args.cmd == "status":
        for r in lifecycle.build_metrics(spark, store).collect():
            print(json.dumps(r.asDict()))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
