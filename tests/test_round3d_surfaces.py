"""Round-3 late surfaces (batch d): Solr streaming expressions
(/stream) compiled to DataFrame plans, and the /sql handler.
Hand-computed expectations on a purpose-built mini-collection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.stream_expr import (
    Node,
    StreamExprError,
    compile_stream,
    parse,
    q_filter,
    sql_handler,
)

DOCS = [
    # (doc_id, src, lang, n)
    (0, "a", "en", 10),
    (1, "a", "en", 20),
    (2, "a", "de", 30),
    (3, "b", "en", 40),
    (4, "b", "de", 50),
    (5, "b", "de", 50),
]
TAGS = [(0, 7), (2, 7), (3, 9)]  # (ref_id, label)


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, src string, lang string, n long")
    tags = spark.createDataFrame(TAGS, "ref_id long, label int")
    return {"docs": docs, "tags": tags}


# --- parser ---------------------------------------------------------------


def test_parse_nested_kwarg_stream():
    n = parse('hashJoin(search(a, q="x:1"), hashed=rollup(search(b), over="k", count(*)), on="k")')
    assert n.name == "hashJoin"
    assert isinstance(n.kwargs["hashed"], Node)
    assert n.kwargs["hashed"].name == "rollup"
    assert n.args[0].kwargs["q"] == "x:1"


def test_parse_evaluator_alias():
    n = parse('select(search(a), doc_id, mult(n, 2) as n2)')
    assert n.args[2].name == "mult" and n.args[2].out_alias == "n2"


def test_parse_quoted_commas_and_errors():
    n = parse('top(n=3, search(a), sort="n desc, doc_id asc")')
    assert n.kwargs["sort"] == "n desc, doc_id asc"
    with pytest.raises(StreamExprError):
        parse("rollup(search(a)")  # unterminated
    with pytest.raises(StreamExprError):
        parse('search(a) trailing')


# --- q= filter ------------------------------------------------------------


def test_q_filter_typed_and_range(tables):
    d = tables["docs"]
    assert q_filter(d, "lang:de AND n:[30 TO 50]").count() == 3
    assert q_filter(d, "n:[* TO 20]").count() == 2
    assert q_filter(d, "*:*").count() == 6
    with pytest.raises(StreamExprError):
        q_filter(d, "nope:1")


# --- compile: each streaming function -------------------------------------


def test_rollup_having(tables):
    out = compile_stream(
        'having(rollup(search(docs, fl="src,n"), over="src", count(*), '
        "sum(n), avg(n), min(n), max(n)), gt(sum_n, 100))",
        tables,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src"], r["count_all"], r["sum_n"], r["min_n"], r["max_n"]) == (
        "b", 3, 140, 40, 50,
    )


def test_select_evaluators(tables):
    out = (
        compile_stream(
            'select(search(docs, q="doc_id:1", fl="doc_id,n"), doc_id, '
            "add(mult(n, 2), 1) as m, div(n, 4) as q, sub(n, 5) as s)",
            tables,
        )
        .collect()[0]
    )
    assert (out["m"], out["q"], out["s"]) == (41, 5.0, 15)


def test_inner_and_left_join(tables):
    inner = compile_stream(
        'innerJoin(search(docs, fl="doc_id,src"), search(tags, fl="ref_id,label"), '
        'on="doc_id=ref_id")',
        tables,
    )
    assert inner.count() == 3 and set(inner.columns) == {"doc_id", "src", "ref_id", "label"}
    left = compile_stream(
        'leftOuterJoin(search(docs, fl="doc_id,src"), search(tags, fl="ref_id,label"), '
        'on="doc_id=ref_id")',
        tables,
    )
    assert left.count() == 6
    assert left.where(F.col("label").isNull()).count() == 3


def test_hashjoin_broadcasts(tables):
    df = compile_stream(
        'hashJoin(search(docs, fl="doc_id,src"), '
        'hashed=rollup(search(docs, fl="src,n"), over="src", count(*)), on="src")',
        tables,
    )
    assert "BroadcastHashJoin" in df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    ) or "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()
    # same-name key dropped once
    assert df.columns.count("src") == 1
    assert df.count() == 6


def test_intersect_complement(tables):
    semi = compile_stream(
        'intersect(search(docs, fl="doc_id,lang"), search(tags, fl="ref_id"), '
        'on="doc_id=ref_id")',
        tables,
    )
    assert sorted(r.doc_id for r in semi.collect()) == [0, 2, 3]
    anti = compile_stream(
        'complement(search(docs, fl="doc_id,lang"), search(tags, fl="ref_id"), '
        'on="doc_id=ref_id")',
        tables,
    )
    assert sorted(r.doc_id for r in anti.collect()) == [1, 4, 5]


def test_merge_unique_top_sort_parallel(tables):
    out = compile_stream(
        'top(n=2, unique(merge(search(docs, q="lang:en", fl="src,n"), '
        'search(docs, q="lang:de", fl="src,n"), on="n asc"), over="src", '
        'sort="n asc"), sort="n desc")',
        tables,
    ).collect()
    # unique picks min-n row per src: a->10, b->40; top 2 by n desc
    assert [(r.src, r.n) for r in out] == [("b", 40), ("a", 10)]
    wrapped = compile_stream('parallel(search(docs, fl="doc_id"), workers=4)', tables)
    assert wrapped.count() == 6


def test_compile_errors(tables):
    for bad in [
        'search(missing, q="*:*")',
        'rollup(search(docs), over="src")',  # no metric
        'unique(search(docs), over="src")',  # no sort
        'frobnicate(search(docs))',
        'search(docs, fl="doc_id", sort="n sideways")',
    ]:
        with pytest.raises(StreamExprError):
            compile_stream(bad, tables)


@pytest.fixture(scope="module")
def boost_idx(spark):
    import datetime

    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("cA", 0, "user", "spark spark merge other words here", None, ts),
        ("cB", 0, "user", "merge merge spark other words here", None, ts),
        ("cC", 0, "user", "table value prefix words", None, ts),
        ("cD", 0, "user", "value table prefix words", None, ts),  # terms, no phrase
    ]
    return build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))


def test_term_boost_scales_and_reduces_to_bm25(spark, boost_idx):
    from solr_ocr_processor_spark.operators.query import term_boost_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    plain = {r.conv_id: r.score for r in bm25_topk(spark, boost_idx, "spark merge", k=10).collect()}
    unit = {r.conv_id: r.score for r in term_boost_topk(spark, boost_idx, "spark^1 merge", k=10).collect()}
    for c in plain:
        assert unit[c] == pytest.approx(plain[c], abs=1e-12)
    # boosting 'merge' flips the cA/cB order (symmetric corpus)
    boosted = [r.conv_id for r in term_boost_topk(spark, boost_idx, "spark merge^3", k=10).collect()]
    assert boosted.index("cB") < boosted.index("cA")
    # duplicate term sums boosts: spark^1 spark^2 == spark^3
    a = {r.conv_id: r.score for r in term_boost_topk(spark, boost_idx, "spark^1 spark^2", k=10).collect()}
    b = {r.conv_id: r.score for r in term_boost_topk(spark, boost_idx, "spark^3", k=10).collect()}
    assert a == b
    with pytest.raises(ValueError):
        term_boost_topk(spark, boost_idx, "spark^fast", k=10)


def test_regexp_expansion_anchored_and_pruned(spark, boost_idx):
    from solr_ocr_processor_spark.operators.expand import expand_regexp, regexp_topk

    # anchored: 'ord' must NOT match 'words' (substring) — only full terms
    assert expand_regexp(spark, boost_idx, "ord[a-z]*") == []
    assert expand_regexp(spark, boost_idx, "wor[a-z]+") == ["words"]
    # optional quantifier after the literal run: 'spa?rk' must match 'spark'
    assert expand_regexp(spark, boost_idx, "spa?rk") == ["spark"]
    # alternation, df-desc order
    got = expand_regexp(spark, boost_idx, "(spark|merge|table)")
    assert got[:2] == ["merge", "spark"] and "table" in got
    with pytest.raises(ValueError):
        expand_regexp(spark, boost_idx, "spark\\d")  # escapes outside subset
    assert regexp_topk(spark, boost_idx, "zzz[0-9]+", k=5).count() == 0


def test_pf_boosts_phrase_docs_only(spark, boost_idx):
    from solr_ocr_processor_spark.operators.query import pf_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk

    plain = {r.conv_id: r.score for r in bm25_topk(spark, boost_idx, "table value", k=10).collect()}
    pf = {r.conv_id: r.score for r in pf_topk(spark, boost_idx, "table value", pf_weight=0.5, k=10).collect()}
    assert pf["cC"] > plain["cC"]                      # phrase doc boosted
    assert pf["cD"] == pytest.approx(plain["cD"], abs=1e-12)  # terms-only doc unchanged
    # weight 0 reduces to plain BM25
    pf0 = {r.conv_id: r.score for r in pf_topk(spark, boost_idx, "table value", pf_weight=0.0, k=10).collect()}
    for c in plain:
        assert pf0[c] == pytest.approx(plain[c], abs=1e-12)


def test_stats_cardinality_exact_vs_hll(spark, boost_idx):
    from solr_ocr_processor_spark.operators.facet import stats_cardinality

    exact = stats_cardinality(spark, boost_idx, "words", field="dl").collect()[0]
    # corpus: 4 docs contain 'words'? cA/cB/cC/cD all have 'words'; dl
    # values 6,6,4,4 -> 2 distinct
    assert (exact.n_docs, exact.cardinality) == (4, 2)
    approx = stats_cardinality(
        spark, boost_idx, "words", field="dl", approx=True
    ).collect()[0]
    # HLL++ default rsd = 5%: at tiny cardinalities the sketch is exact
    assert abs(approx.cardinality - exact.cardinality) <= max(
        1, 0.05 * exact.cardinality
    )
    with pytest.raises(ValueError):
        stats_cardinality(spark, boost_idx, "words", field="score")


def test_semantic_dedup_groups_and_keep_rule(spark):
    """SemDeDup: scaled copies of one direction (cos=1) always land in
    the same cluster, so they are flagged against the smallest lower
    id; orthogonal directions are never pairs at tau=0.9."""
    from solr_ocr_processor_spark.operators.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (5, [2.0, 0.0, 0.0, 0.0]),   # same direction as 1
        (9, [0.5, 0.0, 0.0, 0.0]),   # same direction as 1
        (2, [0.0, 1.0, 0.0, 0.0]),
        (6, [0.0, 3.0, 0.0, 0.0]),   # same direction as 2
        (3, [0.0, 0.0, 1.0, 0.0]),   # singleton
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.dup_id: (r.keep_id, round(r.cos, 6))
        for r in semantic_dedup(embs, tau=0.9, n_clusters=2, seed=17).collect()
    }
    assert got == {5: (1, 1.0), 9: (1, 1.0), 6: (2, 1.0)}


# --- /sql handler ----------------------------------------------------------


def test_sql_handler_select(spark, tables):
    out = sql_handler(
        spark,
        tables,
        "SELECT src, count(*) AS c FROM docs GROUP BY src ORDER BY src",
    ).collect()
    assert [(r.src, r.c) for r in out] == [("a", 3), ("b", 3)]


def test_frange_filters_matchset_not_scores(spark):
    """{!frange}: surviving docs keep their unfiltered scores (stats
    stay global); docs outside the function range are excluded."""
    import datetime

    from solr_ocr_processor_spark.operators.build import build_postings
    from solr_ocr_processor_spark.operators.query import frange_topk
    from solr_ocr_processor_spark.operators.score import bm25_topk
    from solr_ocr_processor_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("cA", 0, "user", "spark merge spark", None, ts),          # dl=3
        ("cB", 0, "user", "spark merge join sort filter scan agg window", None, ts),  # dl=8
        ("cC", 0, "user", "spark", None, ts),                      # dl=1
    ]
    idx = build_postings(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    # avgdl = 4; div(dl, avgdl) in [0.5, 1.0] keeps dl in [2, 4] -> only cA
    got = frange_topk(spark, idx, "spark merge", "div(dl, avgdl)", 0.5, 1.0, k=10).collect()
    assert [r.conv_id for r in got] == ["cA"]
    full = {r.conv_id: r.score for r in bm25_topk(spark, idx, "spark merge", k=10).collect()}
    assert got[0].score == pytest.approx(full["cA"], abs=1e-12)
    # open lower bound keeps everything
    assert frange_topk(spark, idx, "spark", "div(dl, avgdl)", None, 2.5, k=10).count() == 3


def test_sql_handler_read_only(spark, tables):
    for bad in [
        "DROP TABLE docs",
        "SELECT 1; SELECT 2",
        "SELECT * FROM docs WHERE 1=1; DELETE FROM docs",
        "INSERT INTO docs VALUES (9,'c','en',1)",
    ]:
        with pytest.raises(StreamExprError):
            sql_handler(spark, tables, bad)


def test_facet_buckets_sort_limit(tables):
    out = compile_stream(
        'facet(docs, q="n:[20 TO *]", buckets="src,lang", '
        'bucketSorts="count_all desc, src asc, lang asc", '
        "bucketSizeLimit=2, count(*), sum(n), avg(n))",
        tables,
    ).collect()
    # qualifying rows: (a,de,30) (b,en,40) (b,de,50) (b,de,50)
    assert [(r.src, r.lang, r.count_all, r.sum_n, r.avg_n) for r in out] == [
        ("b", "de", 2, 100, 50.0),
        ("a", "de", 1, 30, 30.0),
    ]


def test_stats_single_row(tables):
    out = compile_stream(
        'stats(docs, q="lang:de", count(*), min(n), max(n), avg(n))', tables
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.count_all, r.min_n, r.max_n) == (3, 30, 50)
    assert abs(r.avg_n - 130 / 3) < 1e-9


def test_fetch_decorates_left_outer_and_broadcasts(tables):
    df = compile_stream(
        'fetch(tags, search(docs, q="lang:en", fl="doc_id,src"), '
        'on="doc_id=ref_id", fl="label")',
        tables,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r.doc_id: r.label for r in df.collect()}
    # every stream tuple survives; unmatched keys get NULL label
    assert got == {0: 7, 1: None, 3: 9}
    assert "ref_id" not in df.columns


def test_facet_stats_fetch_errors(tables):
    for bad in (
        'facet(docs, buckets="src")',          # no metric
        'facet(docs, count(*))',               # no buckets
        'stats(nope, count(*))',               # unknown collection
        'fetch(tags, search(docs, fl="doc_id"), fl="label")',   # no on=
        'fetch(tags, search(docs, fl="doc_id"), on="doc_id=ref_id,src=label", fl="label")',
    ):
        with pytest.raises(StreamExprError):
            compile_stream(bad, tables)


def test_cartesian_product_explodes_and_errors(spark, tables):
    arr = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "id long, vals array<string>"
    )
    out = compile_stream(
        'cartesianProduct(search(arr, fl="id,vals"), vals, '
        'productSort="id asc, vals asc")',
        {"arr": arr},
    ).collect()
    assert [(r.id, r.vals) for r in out] == [(1, "a"), (1, "b"), (2, "c")]
    with pytest.raises(StreamExprError):
        compile_stream('cartesianProduct(search(docs, fl="doc_id"))', tables)
