"""End-to-end launch-mode test (north rule): package the engine as a
zip, run build + query + check through ``spark-submit --py-files`` as
a real subprocess, assert the results."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "solr_ocr_processor_spark.zip")
    pkg = os.path.join(REPO, "solr_ocr_processor_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_build_query_check(spark, tmp_path):
    # stage a tiny transcripts input from the session fixture
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "input")
    store = str(tmp_path / "store")
    synth_transcripts(spark, n_convs=8, max_turns=5, seed=9).write.parquet(src)

    zpath = _make_zip(str(tmp_path))
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_MASTER="local[4]")

    def submit(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            [
                "spark-submit",
                "--master", "local[4]",
                "--py-files", zpath,
                os.path.join(REPO, "jobs", "cli.py"),
                *args,
            ],
            capture_output=True,
            text=True,
            timeout=420,
            env=env,
        )

    r = submit("build", "--input", src, "--store", store, "--shards", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == {"built": store}

    r = submit("query", "--store", store, "--q", "spark merge", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert 0 < len(rows) <= 3
    assert all({"doc_id", "conv_id", "score"} <= set(x) for x in rows)
    scores = [x["score"] for x in rows]
    assert scores == sorted(scores, reverse=True)

    r = submit("check", "--store", store, "--conv-id", "s000001")
    assert r.returncode == 0
    r = submit("check", "--store", store, "--conv-id", "missing")
    assert r.returncode == 4  # the 404 analog


def _cli():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "socr_cli", os.path.join(REPO, "jobs", "cli.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_error_taxonomy(spark, tmp_path):
    """A5: the reference's typed errors (err/errors.go:5-36) map to
    distinct exit codes — BadRequest/MethodNotAllowed=2,
    UnProcessableEntity=3, NotFound=4 (the 404 analog is covered e2e
    in the spark-submit test above)."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    # UnProcessableEntity: input exists but holds nothing indexable
    src = str(tmp_path / "empty_src")
    spark.createDataFrame(
        [("c1", 0, "user", "   ", None, None), ("c2", 0, "user", "", None, None)],
        TRANSCRIPT_SCHEMA,
    ).write.parquet(src)
    rc = cli.main(["build", "--input", src, "--store", str(tmp_path / "s1")])
    assert rc == cli.UNPROCESSABLE_EXIT == 3

    # BadRequest: unreadable input location
    rc = cli.main(
        ["build", "--input", str(tmp_path / "no_such_dir"), "--store", str(tmp_path / "s2")]
    )
    assert rc == cli.BAD_REQUEST_EXIT == 2

    # bad route / method: argparse rejects unknown verbs with code 2
    with pytest.raises(SystemExit) as e:
        cli.main(["frobnicate"])
    assert e.value.code == 2


def test_cli_query_modes(spark, tmp_path, capsys):
    """The query verb covers the reference's full query surface from
    the store: OR (wand), AND, phrase, NOT — all against the persisted
    index, no rebuild."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, wand = run("--q", "spark merge", "--k", "5")
    assert rc == 0 and wand and all({"doc_id", "conv_id", "score"} <= set(r) for r in wand)

    rc, conj = run("--q", "spark merge", "--k", "5", "--mode", "and")
    assert rc == 0
    # AND results are a subset of the OR result universe with both terms
    assert {r["conv_id"] for r in conj} <= {
        r["conv_id"] for r in run("--q", "spark merge", "--k", "100")[1]
    }

    rc, ph = run("--q", "spark merge", "--k", "5", "--mode", "phrase")
    assert rc == 0  # may be empty (exact adjacency), but must not error

    rc, neg = run("--q", "spark", "--k", "5", "--mode", "not", "--neg", "merge")
    assert rc == 0
    # no NOT result may contain the negative term: check via conjunctive
    both = {r["conv_id"] for r in run("--q", "spark merge", "--k", "100", "--mode", "and")[1]}
    assert not ({r["conv_id"] for r in neg} & both)

    # near (sloppy phrase): slop large enough behaves like AND-with-
    # order, so its hit set sits between exact phrase and conjunctive;
    # exact-phrase hits are always near hits at any slop
    rc, near = run("--q", "spark merge", "--k", "100", "--mode", "near",
                   "--slop", "8")
    assert rc == 0
    ph_all = run("--q", "spark merge", "--k", "100", "--mode", "phrase")[1]
    assert {r["conv_id"] for r in ph_all} <= {r["conv_id"] for r in near}
    assert {r["conv_id"] for r in near} <= both | {r["conv_id"] for r in ph_all}
    assert run("--q", "spark merge", "--mode", "near", "--slop", "-1")[0] == 2

    # rerank: weight 0 must reproduce the plain BM25 ranking; missing
    # --rq or a negative weight is a bad request
    rc, rr = run("--q", "spark merge", "--k", "5", "--mode", "rerank",
                 "--rq", "spark merge", "--rweight", "0")
    base = run("--q", "spark merge", "--k", "5", "--mode", "wand")[1]
    assert rc == 0
    assert [r["conv_id"] for r in rr] == [r["conv_id"] for r in base]
    assert run("--q", "spark merge", "--mode", "rerank")[0] == 2
    assert run("--q", "spark merge", "--mode", "rerank", "--rq", "x",
               "--rweight", "-1")[0] == 2


def test_cli_check_is_cluster_free(spark, tmp_path, capsys, monkeypatch):
    """The check verb is a point lookup against the store's parquet
    (pyarrow pushdown) — it must never create a Spark session, keep
    its exit-code contract, and agree with the Spark-side check across
    delete/compact."""
    cli = _cli()
    from solr_ocr_processor_spark.config import DEFAULT
    from solr_ocr_processor_spark.operators import lifecycle
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store_path = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=8, max_turns=5, seed=3).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store_path, "--shards", "2"]) == 0

    def boom(*a, **k):
        raise AssertionError("check must not create a Spark session")

    monkeypatch.setattr(cli, "get_spark", boom)

    def run_check(conv):
        capsys.readouterr()
        return cli.main(["check", "--store", store_path, "--conv-id", conv])

    assert run_check("s000001") == 0
    assert run_check("missing") == 4  # 404 analog, unchanged
    assert run_check("s000001") == 0

    store = lifecycle.IndexStore(store_path, DEFAULT)
    lifecycle.delete_conv(spark, store, "s000001")
    assert run_check("s000001") == 4  # tombstone visible offline
    assert run_check("s000002") == 0

    lifecycle.compact(spark, store)
    assert run_check("s000001") == 4  # physically gone
    # offline and Spark-side answers agree post-compaction
    for conv in ("s000001", "s000002", "missing"):
        assert lifecycle.check_offline(store_path, conv) == lifecycle.check(
            spark, store, conv
        )


def test_cli_tombstones_exceed_k(spark, tmp_path, capsys):
    """Tombstone suppression runs IN THE PLAN (anti-join before top-k):
    with more deletes than k, and/phrase/not modes must still return up
    to k live docs — the old over-fetch-k+|dead| driver filter is gone,
    so this also guards against any future reintroduction."""
    cli = _cli()
    from solr_ocr_processor_spark.config import DEFAULT
    from solr_ocr_processor_spark.operators import lifecycle
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store_path = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=14, max_turns=6, seed=13).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store_path, "--shards", "2"]) == 0

    store = lifecycle.IndexStore(store_path, DEFAULT)
    victims = [f"s{i:06d}" for i in range(8)]  # 8 deletes > k=3
    for v in victims:
        lifecycle.delete_conv(spark, store, v)

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store_path, *args])
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    for mode_args in (
        ("--q", "the", "--k", "3", "--mode", "and"),
        ("--q", "the", "--k", "3", "--mode", "not", "--neg", "zzznope"),
        ("--q", "the", "--k", "3"),  # wand path: scalar exclude list
    ):
        rc, rows = run(*mode_args)
        assert rc == 0 and 0 < len(rows) <= 3, (mode_args, rows)
        assert not ({r["conv_id"] for r in rows} & set(victims)), (mode_args, rows)


def test_cli_rewrite_modes_and_facet(spark, tmp_path, capsys):
    """prefix/fuzzy query modes + the facet verb, including the 400
    analogs for malformed patterns and tombstone suppression."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=7).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(verb, *args):
        capsys.readouterr()
        rc = cli.main([verb, "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    # prefix mode: 'sp*' must reach the docs a plain 'spark' query hits
    rc, pre = run("query", "--q", "sp*", "--mode", "prefix", "--k", "100")
    assert rc == 0
    rc, spark_hits = run("query", "--q", "spark", "--k", "100")
    assert {r["conv_id"] for r in spark_hits} <= {r["conv_id"] for r in pre}

    # fuzzy mode: one edit away recovers the term; bare ~ defaults to 2
    rc, fz = run("query", "--q", "spork~1", "--mode", "fuzzy", "--k", "100")
    assert rc == 0 and {r["conv_id"] for r in spark_hits} <= {r["conv_id"] for r in fz}

    # 400 analogs
    assert run("query", "--q", "*", "--mode", "prefix")[0] == 2
    assert run("query", "--q", "~1", "--mode", "fuzzy")[0] == 2
    assert run("query", "--q", "spark~x", "--mode", "fuzzy")[0] == 2

    # facet verb: histogram over matching docs; counts cover the hits
    rc, fc = run("facet", "--q", "spark", "--width", "8")
    assert rc == 0 and fc
    assert sum(r["n_docs"] for r in fc) == len(spark_hits)

    # tombstone suppression: delete a hit conv, it must vanish from all
    victim = pre[0]["conv_id"]
    assert cli.main(["delete", "--store", store, "--conv-id", victim]) == 0
    rc, pre2 = run("query", "--q", "sp*", "--mode", "prefix", "--k", "100")
    assert victim not in {r["conv_id"] for r in pre2}
    rc, fc2 = run("facet", "--q", "spark", "--width", "8")
    n_before = sum(r["n_docs"] for r in fc)
    n_after = sum(r["n_docs"] for r in fc2)
    assert n_after == n_before - (1 if victim in {r["conv_id"] for r in spark_hits} else 0)


def test_cli_snippets_lazy_resolution(spark, tmp_path, capsys):
    """query --snippets resolves matched-turn text from the SOURCE table
    (lazy store: content never lives in the index) and marks hits with
    <em>; guarded by the 400 analogs for unsupported modes / no input."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=10, max_turns=5, seed=11).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, rows = run("--q", "spark", "--k", "3", "--snippets", "--input", src)
    assert rc == 0
    hits = [r for r in rows if "score" in r]
    snips = [r for r in rows if "snippet" in r]
    assert hits and snips
    # every snippet marks the matched term and belongs to a hit conv
    assert all("<em>spark</em>" in s["snippet"] for s in snips)
    assert {s["conv_id"] for s in snips} <= {h["conv_id"] for h in hits}

    # phrase-mode snippets run through the same flag
    rc, rows = run("--q", "spark merge", "--k", "3", "--mode", "phrase",
                   "--snippets", "--input", src)
    assert rc == 0  # may be hitless, but must not error

    # 400 analogs: unsupported mode, missing input
    assert run("--q", "spark", "--mode", "and", "--snippets", "--input", src)[0] == 2
    assert run("--q", "spark", "--snippets")[0] == 2

    # tombstone suppression reaches the snippet path
    victim = hits[0]["conv_id"]
    assert cli.main(["delete", "--store", store, "--conv-id", victim]) == 0
    rc, rows2 = run("--q", "spark", "--k", "3", "--snippets", "--input", src)
    assert rc == 0
    assert victim not in {r["conv_id"] for r in rows2}


def test_cli_pattern_validation_regressions(spark, tmp_path, capsys):
    """Review regressions: non-trailing prefix wildcards, out-of-range
    fuzzy edit counts, and non-positive facet widths are 400s, not
    silent wrong answers."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=6, max_turns=4, seed=3).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "1"]) == 0

    def rc(*args):
        capsys.readouterr()
        code = cli.main(list(args))
        capsys.readouterr()
        return code

    assert rc("query", "--store", store, "--q", "*spark", "--mode", "prefix") == 2
    assert rc("query", "--store", store, "--q", "sp*rk", "--mode", "prefix") == 2
    assert rc("query", "--store", store, "--q", "spark~3", "--mode", "fuzzy") == 2
    assert rc("query", "--store", store, "--q", "spark~-1", "--mode", "fuzzy") == 2
    assert rc("facet", "--store", store, "--q", "spark", "--width", "0") == 2
    assert rc("facet", "--store", store, "--q", "spark", "--width", "-4") == 2


def test_cli_mlt_and_suggest(spark, tmp_path, capsys):
    """mlt returns similar convs (never the seed, 404 for unknown or
    deleted seeds); suggest returns ranked completions."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=10, max_turns=5, seed=13).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(verb, *args):
        capsys.readouterr()
        rc = cli.main([verb, "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    # pick a real conv from suggest's corpus surface
    rc, sugg = run("suggest", "--q", "s", "--n", "5")
    assert rc == 0 and sugg
    assert all({"term", "df"} <= set(r) for r in sugg)
    # ranked df DESC, ties term ASC
    keys = [(-r["df"], r["term"]) for r in sugg]
    assert keys == sorted(keys)
    assert run("suggest", "--q", "*s")[0] == 2

    rc, hits = run("mlt", "--conv-id", "s000001", "--k", "5")
    assert rc == 0 and hits
    assert all(r["conv_id"] != "s000001" for r in hits)

    assert run("mlt", "--conv-id", "cNOPE")[0] == 4
    # deleting the seed makes it a 404 and removes it from others' results
    assert cli.main(["delete", "--store", store, "--conv-id", "s000001"]) == 0
    assert run("mlt", "--conv-id", "s000001")[0] == 4
    rc, hits2 = run("mlt", "--conv-id", "s000002", "--k", "100")
    assert rc == 0 and all(r["conv_id"] != "s000001" for r in hits2)


def test_cli_sort_mode(spark, tmp_path, capsys):
    """query --mode sort orders matches by the field, validates the
    field name, and suppresses tombstones."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=8, max_turns=6, seed=17).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, rows = run("--q", "spark", "--mode", "sort", "--sort-by", "n_chars", "--k", "50")
    assert rc == 0 and rows
    vals = [r["n_chars"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    rc, asc = run("--q", "spark", "--mode", "sort", "--sort-by", "n_chars", "--asc", "--k", "50")
    assert [r["conv_id"] for r in asc] == [r["conv_id"] for r in reversed(rows)] or \
        [r["n_chars"] for r in asc] == sorted(vals)
    assert run("--q", "spark", "--mode", "sort", "--sort-by", "nope")[0] == 2

    victim = rows[0]["conv_id"]
    assert cli.main(["delete", "--store", store, "--conv-id", victim]) == 0
    rc, rows2 = run("--q", "spark", "--mode", "sort", "--sort-by", "n_chars", "--k", "50")
    assert victim not in {r["conv_id"] for r in rows2}


def test_cli_pagination(spark, tmp_path, capsys):
    """--start pages every query mode; negative start is a 400."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=8, max_turns=5, seed=19).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    rc, full = run("--q", "spark", "--k", "6")
    assert rc == 0 and len(full) >= 3
    rc, page = run("--q", "spark", "--k", "2", "--start", "1")
    assert rc == 0 and page == full[1:3]
    rc, spage = run("--q", "spark", "--mode", "sort", "--sort-by", "n_chars",
                    "--k", "2", "--start", "1")
    assert rc == 0 and len(spage) == 2
    assert run("--q", "spark", "--start", "-1")[0] == 2


def test_cli_stats_facet_collapse(spark, tmp_path, capsys):
    """The Solr response components over a real store: stats verb,
    date-range facet, and collapse mode (one hit per dl-bucket), with
    tombstones excluded everywhere."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=10, max_turns=6, seed=23).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    # stats: one row, n equals the match count from a wide query
    rc, rows = run("stats", "--store", store, "--q", "spark", "--field", "dl")
    assert rc == 0 and len(rows) == 1
    st = rows[0]
    assert st["field"] == "dl" and st["n"] >= 1
    assert st["min"] <= st["mean"] <= st["max"] and st["sum"] >= st["max"]

    # date facet: buckets are epoch-aligned multiples of the gap and
    # cover every matching doc exactly once (sum == stats n)
    rc, fac = run("facet", "--store", store, "--q", "spark",
                  "--by", "last_ts", "--gap", "5")
    assert rc == 0 and fac
    assert all(r["bucket_start"] % 300 == 0 for r in fac)
    assert sum(r["n_docs"] for r in fac) == st["n"]
    # bad gap is a 400
    assert run("facet", "--store", store, "--q", "spark",
               "--by", "last_ts", "--gap", "0")[0] == 2

    # collapse: one hit per group, scores non-increasing
    rc, col = run("query", "--store", store, "--q", "spark",
                  "--mode", "collapse", "--width", "8", "--k", "10")
    assert rc == 0 and col
    groups = [r["group"] for r in col]
    assert len(groups) == len(set(groups))
    scores = [r["score"] for r in col]
    assert scores == sorted(scores, reverse=True)
    assert run("query", "--store", store, "--q", "spark",
               "--mode", "collapse", "--width", "0")[0] == 2

    # delete the top collapse hit: its conv disappears, its group's
    # runner-up (if any) may surface, and stats shrink by one
    victim = col[0]["conv_id"]
    assert cli.main(["delete", "--store", store, "--conv-id", victim]) == 0
    rc, col2 = run("query", "--store", store, "--q", "spark",
                   "--mode", "collapse", "--width", "8", "--k", "10")
    assert victim not in {r["conv_id"] for r in col2}
    rc, rows2 = run("stats", "--store", store, "--q", "spark")
    assert rows2[0]["n"] == st["n"] - 1


def test_cli_filter_and_spellcheck(spark, tmp_path, capsys):
    """--mode filter applies the fq range in-plan (bad fq = 400);
    the spellcheck verb suggests dictionary terms by edit distance."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=10, max_turns=6, seed=29).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    rc, full = run("query", "--store", store, "--q", "spark", "--k", "50")
    assert rc == 0 and full
    rc, kept = run("query", "--store", store, "--q", "spark",
                   "--mode", "filter", "--fq", "n_turns:[2 TO *]", "--k", "50")
    assert rc == 0 and 0 < len(kept) <= len(full)
    # rejected: malformed / unknown-field / inverted ranges
    for bad in ("dl:(1 TO 2)", "score:[1 TO 2]", "dl:[9 TO 1]", ""):
        assert run("query", "--store", store, "--q", "spark",
                   "--mode", "filter", "--fq", bad)[0] == 2

    rc, sug = run("spellcheck", "--store", store, "--q", "spxrk")
    assert rc == 0 and any(s["term"] == "spark" and s["dist"] == 1 for s in sug)
    assert run("spellcheck", "--store", store, "--q", "spxrk",
               "--max-edits", "9")[0] == 2


def test_cli_wildcard_mm_group_boost_modes(spark, tmp_path, capsys):
    """The round-3 extended surfaces from the store: wildcard, mm,
    group, boost — results consistent with their flat-query siblings,
    malformed params rejected as the 400 analog."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=9).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    # wildcard: 'sp?rk' reaches at least the docs a plain 'spark' hits
    rc, wc = run("--q", "sp?rk", "--mode", "wildcard", "--k", "100")
    assert rc == 0
    plain = {r["conv_id"] for r in run("--q", "spark", "--k", "100")[1]}
    assert plain <= {r["conv_id"] for r in wc}
    # 400 analogs: no literal char / alphabet violation
    assert run("--q", "*", "--mode", "wildcard")[0] == 2
    assert run("--q", "sp!rk*", "--mode", "wildcard")[0] == 2

    # mm: mm=1 == OR universe, over-large mm clamps to AND
    rc, or_rows = run("--q", "spark merge", "--mode", "mm", "--mm", "1", "--k", "100")
    assert rc == 0
    assert {r["conv_id"] for r in or_rows} == {
        r["conv_id"] for r in run("--q", "spark merge", "--k", "100")[1]
    }
    rc, and_rows = run("--q", "spark merge", "--mode", "mm", "--mm", "9", "--k", "100")
    assert rc == 0
    assert {r["conv_id"] for r in and_rows} == {
        r["conv_id"]
        for r in run("--q", "spark merge", "--mode", "and", "--k", "100")[1]
    }
    # Solr accepts mm=0 (all clauses optional == the OR query: a doc
    # still needs >= 1 match to score); malformed specs exit 400
    rc0, zero_rows = run("--q", "spark merge", "--mode", "mm", "--mm", "0",
                         "--k", "100")
    assert rc0 == 0
    assert {r["conv_id"] for r in zero_rows} == {r["conv_id"] for r in or_rows}
    assert run("--q", "spark", "--mode", "mm", "--mm", "x%")[0] == 2

    # group: per-group rank present, group_limit respected
    rc, grp = run("--q", "spark merge", "--mode", "group", "--k", "3",
                  "--group-limit", "2")
    assert rc == 0 and grp
    per = {}
    for r in grp:
        assert {"group", "doc_id", "conv_id", "score", "rn"} <= set(r)
        per.setdefault(r["group"], []).append(r["rn"])
    assert len(per) <= 3
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per.values())
    assert run("--q", "spark", "--mode", "group", "--group-limit", "0")[0] == 2

    # boost: boosted <= score everywhere, page ordered by boosted
    rc, bst = run("--q", "spark merge", "--mode", "boost", "--half-life", "0.01",
                  "--k", "5")
    assert rc == 0 and bst
    assert all(r["boosted"] <= r["score"] + 1e-12 for r in bst)
    assert [r["boosted"] for r in bst] == sorted(
        (r["boosted"] for r in bst), reverse=True
    )
    assert run("--q", "spark", "--mode", "boost", "--half-life", "0")[0] == 2


def test_cli_pivot_facet(spark, tmp_path, capsys):
    """facet --by pivot: two-level dl x date counts whose total equals
    the flat facet's total; ts-less params rejected as 400."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=10, max_turns=5, seed=11).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["facet", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, piv = run("--q", "spark", "--by", "pivot", "--width", "8", "--gap", "5")
    assert rc == 0 and piv
    assert all({"dl_bucket", "ts_bucket", "n_docs"} <= set(r) for r in piv)
    rc, flat = run("--q", "spark", "--width", "8")
    assert sum(r["n_docs"] for r in piv) == sum(r["n_docs"] for r in flat)
    assert run("--q", "spark", "--by", "pivot", "--gap", "0")[0] == 2


def test_cli_export_verb(spark, tmp_path, capsys):
    """The export verb runs the full corpus pipeline from a transcripts
    source: JSON rows with quality/lang/split, optional contamination
    audit column, 400 analogs for bad params."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    synth_transcripts(spark, n_convs=14, max_turns=5, seed=13).write.parquet(src)

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["export", "--input", src, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, rows = run("--min-quality", "0.2")
    assert rc == 0 and rows
    assert all({"conv_id", "quality", "lang_pred", "split"} <= set(r) for r in rows)
    assert all(r["quality"] >= 0.2 and r["lang_pred"] == "en" for r in rows)
    assert "contaminated" not in rows[0]

    rc, flagged = run("--min-quality", "0.2", "--decontaminate", "--ngram", "2")
    assert rc == 0 and flagged
    assert all("contaminated" in r for r in flagged)
    # non-train rows are never flagged (the audit targets train rows)
    assert all(not r["contaminated"] for r in flagged if r["split"] != "train")

    assert run("--min-quality", "1.5")[0] == 2
    assert run("--lang", "xx")[0] == 2
    assert run("--decontaminate", "--ngram", "0")[0] == 2


def test_cli_terms_tv_join(spark, tmp_path, capsys):
    """Round-3 components: /terms enumeration, per-doc term vectors,
    and the {!join} query mode against a dimension parquet."""
    import datetime

    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    cli = _cli()
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("c00000000", 0, "user", "spark shuffle spark merge", None, ts),
        ("c00000001", 0, "user", "spark window functions", None, ts),
        ("c00000002", 0, "user", "sort merge join plans", None, ts),
        ("c00000003", 0, "user", "window window sort spark", None, ts),
    ]
    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(src)
    spark.createDataFrame(
        [(0, "web", "en"), (1, "web", "en"), (2, "code", "en"), (3, "code", "de")],
        "doc_id long, source string, lang string",
    ).write.parquet(dim_path)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    # terms: regex + mincount
    rc, te = run("terms", "--store", store, "--regex", "s[a-z]*", "--mincount", "2")
    assert rc == 0
    assert [(r["term"], r["df"], r["cf"]) for r in te] == [
        ("spark", 3, 4), ("sort", 2, 2)]
    assert run("terms", "--store", store, "--regex", "s[")[0] == 2
    assert run("terms", "--store", store, "--mincount", "0")[0] == 2

    # tv: known doc; 404 for unknown; 404 after delete
    rc, tv = run("tv", "--store", store, "--conv-id", "c00000003")
    assert rc == 0
    got = {r["term"]: (r["tf"], r["df"]) for r in tv}
    assert got["window"] == (2, 2) and got["spark"] == (1, 3)
    assert run("tv", "--store", store, "--conv-id", "cNOPE")[0] == 4
    assert run("delete", "--store", store, "--conv-id", "c00000002")[0] == 0
    assert run("tv", "--store", store, "--conv-id", "c00000002")[0] == 4

    # join mode: dimension filter admits only source=web convs
    rc, j = run("query", "--store", store, "--q", "spark merge",
                "--mode", "join", "--dim", dim_path, "--jq", "source:web")
    assert rc == 0
    assert {r["conv_id"] for r in j} == {"c00000000", "c00000001"}
    assert run("query", "--store", store, "--q", "spark", "--mode", "join")[0] == 2
    assert run("query", "--store", store, "--q", "spark", "--mode", "join",
               "--dim", dim_path, "--jq", "bad = filter")[0] == 2


def test_cli_stats_percentiles_and_bloom_export(spark, tmp_path, capsys):
    """stats --percentiles (exact interpolated quantiles) and
    export --decontaminate --bloom (bitmap-digested eval side)."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        return rc, [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]

    rc, rows = run("stats", "--store", store, "--q", "spark",
                   "--percentiles", "0.5,0.9")
    assert rc == 0 and rows
    r = rows[0]
    assert r["field"] == "dl" and r["n"] >= 1
    assert r["p50"] is not None and r["p90"] >= r["p50"]
    assert run("stats", "--store", store, "--q", "spark",
               "--percentiles", "1.5")[0] == 2
    assert run("stats", "--store", store, "--q", "spark",
               "--percentiles", "abc")[0] == 2

    # bloom export emits the same schema as the exact variant, and on a
    # small corpus (filter far under capacity) the same flags
    rc, ex = run("export", "--input", src, "--min-quality", "0",
                 "--decontaminate")
    rc2, bl = run("export", "--input", src, "--min-quality", "0",
                  "--decontaminate", "--bloom")
    assert rc == 0 and rc2 == 0 and len(ex) == len(bl)
    assert all("contaminated" in r for r in bl)
    ex_map = {r["conv_id"]: bool(r["contaminated"]) for r in ex}
    bl_map = {r["conv_id"]: bool(r["contaminated"]) for r in bl}
    # no false negatives: every exact-contaminated row stays flagged
    assert all(bl_map[c] for c, v in ex_map.items() if v)


def test_cli_synonym_bq_elevate_modes(spark, tmp_path, capsys):
    """Round-3-late query modes: synonym expansion, additive boost
    query, and elevation pins — all store-backed, tombstone-aware."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    # synonym: empty map == plain BM25 (exhaustive scorer ranks match wand's)
    rc, syn0 = run("--q", "spark merge", "--k", "5", "--mode", "synonym")
    base = run("--q", "spark merge", "--k", "5")[1]
    assert rc == 0
    assert [r["conv_id"] for r in syn0] == [r["conv_id"] for r in base]
    # a real synonym group widens (or keeps) the match set
    rc, syn1 = run("--q", "merge", "--k", "100", "--mode", "synonym",
                   "--syn", "merge:join")
    only = run("--q", "merge", "--k", "100", "--mode", "synonym")[1]
    assert rc == 0
    assert {r["conv_id"] for r in only} <= {r["conv_id"] for r in syn1}
    # malformed map is a bad request
    assert run("--q", "merge", "--mode", "synonym", "--syn", "nocolon")[0] == 2

    # bq: weight 0 reproduces the plain ranking; boosted >= score
    rc, bq0 = run("--q", "spark merge", "--k", "5", "--mode", "bq",
                  "--bq-q", "join", "--bweight", "0")
    assert rc == 0
    assert [r["conv_id"] for r in bq0] == [r["conv_id"] for r in base]
    rc, bq1 = run("--q", "spark merge", "--k", "5", "--mode", "bq",
                  "--bq-q", "join", "--bweight", "2")
    assert rc == 0 and all(r["boosted"] >= r["score"] for r in bq1)
    assert run("--q", "spark", "--mode", "bq")[0] == 2
    assert run("--q", "spark", "--mode", "bq", "--bq-q", "x",
               "--bweight", "-1")[0] == 2

    # elevate: pinned conv first with rank 1, even if it never matches
    pin = "s000003"
    rc, el = run("--q", "spark merge", "--k", "5", "--mode", "elevate",
                 "--pin", pin)
    assert rc == 0 and el[0]["conv_id"] == pin and el[0]["rank"] == 1
    assert el[0]["elevated"] and not el[1]["elevated"]
    # a tombstoned doc cannot be elevated
    assert cli.main(["delete", "--store", store, "--conv-id", pin]) == 0
    capsys.readouterr()
    rc, el2 = run("--q", "spark merge", "--k", "5", "--mode", "elevate",
                  "--pin", pin)
    assert rc == 0 and all(r["conv_id"] != pin for r in el2)


def test_cli_round3d_modes(spark, tmp_path, capsys):
    """regexp/termboost/pf/frange query modes: result equivalences,
    400 analogs for malformed input, tombstone suppression in-plan."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=7).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, plain = run("--q", "spark", "--k", "100")
    assert rc == 0 and plain

    # regexp: anchored 'spark'-only pattern hits exactly the term's docs
    rc, rx = run("--q", "spar[a-z]", "--mode", "regexp", "--k", "100")
    assert rc == 0
    assert {r["conv_id"] for r in rx} == {r["conv_id"] for r in plain}
    assert run("--q", "spark\\d", "--mode", "regexp")[0] == 2  # outside subset

    # termboost: ^1 is scoring-identical to the plain query
    rc, tb = run("--q", "spark^1", "--mode", "termboost", "--k", "100")
    assert rc == 0
    assert [(r["conv_id"], r["score"]) for r in tb] == [
        (r["conv_id"], r["score"]) for r in plain
    ]
    assert run("--q", "spark^fast", "--mode", "termboost")[0] == 2

    # pf weight 0 reduces to plain BM25 over the same terms
    rc, pf0 = run("--q", "spark", "--mode", "pf", "--pf-weight", "0")
    assert rc == 0 and [r["conv_id"] for r in pf0] == [r["conv_id"] for r in plain[:10]]
    assert run("--q", "spark", "--mode", "pf", "--pf-weight", "-1")[0] == 2

    # frange: a wide-open ratio range admits every plain hit
    rc, fr = run("--q", "spark", "--mode", "frange", "--lower", "0",
                 "--upper", "1000", "--k", "100")
    assert rc == 0 and {r["conv_id"] for r in fr} == {r["conv_id"] for r in plain}
    assert run("--q", "spark", "--mode", "frange")[0] == 2          # no bounds
    assert run("--q", "spark", "--mode", "frange", "--lower", "0",
               "--func", "bogus(")[0] == 2                           # bad func

    # tombstones suppress in-plan for all four modes
    victim = plain[0]["conv_id"]
    assert cli.main(["delete", "--store", store, "--conv-id", victim]) == 0
    for extra in (["--mode", "regexp", "--q", "spar[a-z]"],
                  ["--mode", "termboost", "--q", "spark^2"],
                  ["--mode", "pf", "--q", "spark"],
                  ["--mode", "frange", "--q", "spark", "--lower", "0",
                   "--upper", "1000"]):
        rc, rows = run("--k", "100", *extra)
        assert rc == 0 and victim not in {r["conv_id"] for r in rows}


def test_cli_bm25f_mode(spark, tmp_path, capsys):
    """--mode bm25f scores role fields in the SOURCE (edismax qf=):
    needs --input, validates qf weights, and weighting the assistant
    field changes the ranking signal relative to user-only."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, rows = run("--q", "spark merge", "--k", "5", "--mode", "bm25f",
                   "--input", src)
    assert rc == 0 and rows
    assert all({"conv_id", "score"} <= set(r) for r in rows)
    assert [r["score"] for r in rows] == sorted(
        (r["score"] for r in rows), reverse=True
    )
    # user-only weighting is a different signal than the default
    rc2, rows2 = run("--q", "spark merge", "--k", "5", "--mode", "bm25f",
                     "--input", src, "--qf", "user")
    assert rc2 == 0 and rows2
    # validation: missing --input, bad weight syntax, negative weight
    assert run("--q", "spark", "--mode", "bm25f")[0] == 2
    assert run("--q", "spark", "--mode", "bm25f", "--input", src,
               "--qf", "user^x")[0] == 2
    assert run("--q", "spark", "--mode", "bm25f", "--input", src,
               "--qf", "user^-1")[0] == 2
    # empty query -> 422
    assert run("--q", "???", "--mode", "bm25f", "--input", src)[0] == 3


def test_cli_mm_spec(spark, tmp_path, capsys):
    """--mm accepts the full edismax spec; bad specs exit 400."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(["query", "--store", store, *args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    # 50% of 2 terms -> mm 1 == the OR result; '2' == AND-of-2
    rc, pct = run("--q", "spark merge", "--k", "100", "--mode", "mm", "--mm", "50%")
    rc2, all2 = run("--q", "spark merge", "--k", "100", "--mode", "mm", "--mm", "2")
    rc3, orq = run("--q", "spark merge", "--k", "100")
    assert rc == rc2 == rc3 == 0
    assert {r["conv_id"] for r in pct} == {r["conv_id"] for r in orq}
    assert {r["conv_id"] for r in all2} <= {r["conv_id"] for r in pct}
    # conditional spec: 1<100% with 2 terms -> all required
    rc4, cond = run("--q", "spark merge", "--k", "100", "--mode", "mm",
                    "--mm", "1<100%")
    assert rc4 == 0
    assert {r["conv_id"] for r in cond} == {r["conv_id"] for r in all2}
    assert run("--q", "spark merge", "--mode", "mm", "--mm", "nope")[0] == 2


def test_cli_batch_workload(spark, tmp_path, capsys):
    """batch verb: whole workload in one pass; per-query results match
    the single-query verb; malformed workload exits 400."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store, "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main([*args])
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
        return rc, rows

    rc, rows = run("batch", "--store", store, "--k", "3",
                   "--queries", "a:spark merge;b:window")
    assert rc == 0 and rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    rc2, single = run("query", "--store", store, "--q", "spark merge", "--k", "3")
    assert rc2 == 0
    assert [(r["conv_id"], r["score"]) for r in by_q["a"]] == [
        (r["conv_id"], r["score"]) for r in single
    ]
    assert [r["rank"] for r in by_q["a"]] == [1, 2, 3][: len(by_q["a"])]
    assert run("batch", "--store", store, "--queries", "nocolon")[0] == 2
    assert run("batch", "--store", store, "--queries", "a:x", "--k", "0")[0] == 2


def test_cli_payload_topic_spannear(spark, tmp_path, capsys):
    """Round-3 continuation verbs: payload-score ranking, topic()
    checkpointed pulls (with checkpoint_next echo), unordered
    span-near — plus their BadRequest knob validation."""
    cli = _cli()
    from solr_ocr_processor_spark.sources.transcripts import synth_transcripts

    src = str(tmp_path / "in")
    store = str(tmp_path / "st")
    synth_transcripts(spark, n_convs=12, max_turns=6, seed=5).write.parquet(src)
    assert cli.main(["build", "--input", src, "--store", store,
                     "--shards", "2"]) == 0

    def run(*args):
        capsys.readouterr()
        rc = cli.main(list(args))
        out = capsys.readouterr().out
        rows = [json.loads(l) for l in out.strip().splitlines()
                if l.startswith("{")]
        return rc, rows

    # payload: exact BIGINT payloads, score DESC
    rc, rows = run("payload", "--store", store, "--q", "spark",
                   "--func", "max", "--k", "5")
    assert rc == 0 and rows
    pls = [r["payload"] for r in rows]
    assert all(isinstance(p, int) for p in pls)
    assert pls == sorted(pls, reverse=True)
    rc, _ = run("payload", "--store", store, "--q", "spark merge")
    assert rc == cli.BAD_REQUEST_EXIT  # exactly one term

    # spannear matches a SUPERSET of the ordered near docs
    rc, sp = run("query", "--store", store, "--q", "spark merge",
                 "--mode", "spannear", "--slop", "2", "--k", "50")
    assert rc == 0
    rc, nr = run("query", "--store", store, "--q", "spark merge",
                 "--mode", "near", "--slop", "2", "--k", "50")
    assert rc == 0
    assert {r["conv_id"] for r in nr} <= {r["conv_id"] for r in sp}
    rc, _ = run("query", "--store", store, "--q", "spark",
                "--mode", "spannear")
    assert rc == cli.BAD_REQUEST_EXIT  # two-term surface

    # topic: checkpointed paging, no overlap between pulls
    rc, out1 = run("topic", "--store", store, "--q", "spark", "--rows", "3")
    assert rc == 0
    ck1 = out1[-1]["checkpoint_next"]
    page1 = {r["doc_id"] for r in out1[:-1]}
    rc, out2 = run("topic", "--store", store, "--q", "spark",
                   "--rows", "50", "--checkpoint", ck1)
    assert rc == 0
    page2 = {r["doc_id"] for r in out2[:-1]}
    assert not (page1 & page2)
    # empty pull keeps the checkpoint
    rc, out3 = run("topic", "--store", store, "--q", "spark",
                   "--checkpoint", "2300-01-01T00:00:00")
    assert rc == 0 and out3[-1]["checkpoint_next"] == "2300-01-01T00:00:00"
    rc, _ = run("topic", "--store", store, "--q", "spark",
                "--checkpoint", "not-a-time")
    assert rc == cli.BAD_REQUEST_EXIT
