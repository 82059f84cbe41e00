"""Round-3 continuation surfaces (batch ll): Heaps'-law vocabulary
growth, daily volume anomalies."""

from __future__ import annotations

import datetime
import statistics

from solr_ocr_processor_spark.functions.textstats import vocab_growth
from solr_ocr_processor_spark.operators.analytics import daily_anomalies


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_vocab_growth_monotone_and_exact_tail(spark):
    texts = ["a b c", "a b d", "a e", "f g h i", "a b"]
    out = vocab_growth(_docs(spark, texts), n_steps=5).collect()
    assert [r["step"] for r in out] == [1, 2, 3, 4, 5]
    assert [r["n_docs_prefix"] for r in out] == [1, 2, 3, 4, 5]
    vs = [r["vocab_size"] for r in out]
    ts = [r["n_tokens"] for r in out]
    assert vs == sorted(vs) and ts == sorted(ts)
    # exact hand counts: prefixes of the doc list
    assert vs == [3, 4, 5, 9, 9]
    assert ts == [3, 6, 8, 12, 14]
    assert out[-1]["pct"] == 100


def test_vocab_growth_sublinear(spark):
    # heavy term reuse: vocabulary grows sublinearly vs tokens
    texts = ["common words repeat here"] * 9 + ["novel unique terms appear"]
    out = vocab_growth(_docs(spark, texts), n_steps=10).collect()
    assert out[0]["vocab_size"] == 4
    assert out[-2]["vocab_size"] == 4  # steps 1..9 identical docs
    assert out[-1]["vocab_size"] == 8


def _events(spark, rows):
    base = datetime.datetime(2026, 1, 1)
    data = [
        (i, base + datetime.timedelta(days=d, hours=h % 24), 1, t, 1.0, "{}")
        for i, (t, d, h) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_daily_anomalies_flags_spike(spark):
    rows = []
    for d in range(10):
        n = 24 if d == 5 else 2  # spike day
        rows += [("click", d, h) for h in range(n)]
    out = daily_anomalies(_events(spark, rows), z_thresh=2.0, k=20).collect()
    top = out[0]
    assert top["day"] == "2026-01-06" and top["is_anomaly"] == 1
    counts = [24 if d == 5 else 2 for d in range(10)]
    mu = statistics.mean(counts)
    sd = statistics.stdev(counts)
    assert top["z"] == round((24 - mu) / sd, 6)


def test_daily_anomalies_constant_type_excluded(spark):
    rows = [("view", d, 0) for d in range(5)]  # identical every day
    assert daily_anomalies(_events(spark, rows)).count() == 0


def test_daily_anomalies_orders_by_abs_z(spark):
    rows = []
    for d in range(8):
        n = {0: 20, 7: 1}.get(d, 5)
        rows += [("x", d, h) for h in range(n)]
    out = daily_anomalies(_events(spark, rows), k=3).collect()
    zs = [abs(r["z"]) for r in out]
    assert zs == sorted(zs, reverse=True)


# ---------------------------------------------------------------------------
# cdc_chunk_stats
# ---------------------------------------------------------------------------

from solr_ocr_processor_spark.operators.dedup import cdc_chunk_stats  # noqa: E402


def test_cdc_exact_duplicates_fully_dedup(spark):
    text = "the exact same long document body repeated verbatim " * 4
    docs = _docs(spark, [text, text, text])
    out = cdc_chunk_stats(docs, k=8, modulus=16).collect()
    r = out[0]
    # 3 identical docs (internally repetitive too): at least 2/3 of
    # the chunk mass is redundant, and the ratio is consistent
    assert r["dedup_ratio"] >= round(1 - 1 / 3, 6) - 1e-9
    assert abs(r["dedup_ratio"] - (1 - r["n_unique"] / r["n_chunks"])) < 1e-6


def test_cdc_insertion_shifts_only_local_chunks(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    edited = base[:100] + " INSERTED NOVEL MATERIAL " + base[100:]
    docs = _docs(spark, [base, edited])
    out = cdc_chunk_stats(docs, k=8, modulus=16).collect()[0]
    # the suffix chunks re-sync after the insertion: most chunks shared
    assert out["dedup_ratio"] > 0.25


def test_cdc_chunks_cover_document(spark):
    # chunk lengths must sum to the doc length (cuts partition the doc)
    text = "abcdefghijklmnopqrstuvwxyz0123456789 " * 8
    docs = _docs(spark, [text])
    out = cdc_chunk_stats(docs, k=8, modulus=8).collect()[0]
    total = out["avg_len"] * out["n_chunks"]
    assert abs(total - len(text.lower())) < 1e-3


def test_cdc_short_docs_skipped(spark):
    docs = _docs(spark, ["short", "x"])
    assert cdc_chunk_stats(docs, k=8).count() == 0


# ---------------------------------------------------------------------------
# split_leakage
# ---------------------------------------------------------------------------

from solr_ocr_processor_spark.operators.split import split_leakage  # noqa: E402


def test_split_leakage_bands_and_rates(spark):
    docs = _docs(spark, ["d%d" % i for i in range(10)])
    pairs = spark.createDataFrame(
        [
            (0, 1, 0.35),
            (0, 2, 0.45),
            (3, 4, 0.75),
            (5, 6, 0.95),
            (7, 8, 0.96),
        ],
        "doc1 long, doc2 long, jaccard double",
    )
    out = {r["band"]: r for r in split_leakage(docs, pairs).collect()}
    assert set(out) == {"0.30-0.50", "0.70-0.90", "0.90-1.00"}
    assert out["0.30-0.50"]["n_pairs"] == 2
    assert out["0.90-1.00"]["n_pairs"] == 2
    for r in out.values():
        assert 0.0 <= r["leak_rate"] <= 1.0
        assert r["leak_rate"] == round(r["n_leaked"] / r["n_pairs"], 6)


def test_split_leakage_same_split_pair_not_leaked(spark):
    from solr_ocr_processor_spark.operators.split import hash_split

    docs = _docs(spark, ["d%d" % i for i in range(50)])
    sp = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.select("doc_id")).collect()
    }
    # build one same-split and one cross-split pair from actual labels
    ids = list(sp)
    same = next(
        (a, b) for a in ids for b in ids if a < b and sp[a] == sp[b]
    )
    cross = next(
        (a, b) for a in ids for b in ids if a < b and sp[a] != sp[b]
    )
    pairs = spark.createDataFrame(
        [(same[0], same[1], 0.99), (cross[0], cross[1], 0.99)],
        "doc1 long, doc2 long, jaccard double",
    )
    out = split_leakage(docs, pairs).collect()
    assert out[0]["n_pairs"] == 2 and out[0]["n_leaked"] == 1
    assert out[0]["leak_rate"] == 0.5
