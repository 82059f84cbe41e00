"""Banded (prefix-filtered) containment == the exact spine on
adversarial corpora (round-4 scale path, operators/dedup.
containment_pairs_banded)."""

from __future__ import annotations

import random

from solr_ocr_processor_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_banded,
)


def _pairs(df):
    return {
        (r["doc_src"], r["doc_dst"]): r["containment_scaled"]
        for r in df.collect()
    }


def test_banded_equals_exact_on_quote_with_low_jaccard(spark):
    # A (5 tokens) fully quoted inside B (60 tokens): containment
    # C(A->B)=1.0 while Jaccard ~ 3/58 — the pair Jaccard-keyed
    # MinHash banding would likely MISS; the prefix filter must not.
    quote = "alpha bravo charlie delta echo"
    filler = " ".join(f"w{i}" for i in range(55))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    exact = _pairs(containment_pairs(docs, n=3, tau_num=1, tau_den=2))
    banded = _pairs(containment_pairs_banded(docs, n=3, tau_num=1, tau_den=2))
    assert banded == exact
    assert banded[(1, 2)] == 1_000_000


def test_banded_equals_exact_with_hot_boilerplate_shingle(spark):
    # every doc shares one boilerplate trigram (the s^2 killer); the
    # banded path must still find exactly the same >= tau pairs
    boiler = "terms of service"
    rng = random.Random(7)
    rows = []
    for i in range(30):
        body = " ".join(rng.choice("abcdefgh") + str(rng.randint(0, 9)) for _ in range(12))
        rows.append((i, boiler + " " + body))
    # plus one true containment pair
    rows.append((100, rows[0][1] + " extra tail tokens here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = _pairs(containment_pairs(docs, n=3, tau_num=1, tau_den=2))
    banded = _pairs(containment_pairs_banded(docs, n=3, tau_num=1, tau_den=2))
    assert banded == exact
    assert (0, 100) in banded  # doc 0 contained in doc 100


def test_banded_equals_exact_across_thresholds(spark):
    rng = random.Random(21)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for num, den in [(1, 2), (3, 4), (1, 4)]:
        exact = _pairs(containment_pairs(docs, n=2, tau_num=num, tau_den=den))
        banded = _pairs(
            containment_pairs_banded(docs, n=2, tau_num=num, tau_den=den)
        )
        assert banded == exact, (num, den)


def test_banded_prefix_actually_prunes(spark):
    # structural check on the scale claim: with a hot shingle shared
    # by all docs, the prefix side must carry far fewer rows than the
    # full shingle table (the hot shingle ranks LAST per doc, so it
    # only enters prefixes of docs whose prefix covers everything)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from solr_ocr_processor_spark.operators.dedup import shingles

    rows = [(i, "common base gram " + " ".join(f"u{i}x{j}" for j in range(20)))
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, 3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    card = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .join(card, "doc_id")
    )
    ceil_tau_c = F.floor((F.col("c") + F.lit(1)) / F.lit(2))
    prefix_rows = ranked.where(F.col("rk") <= F.col("c") - ceil_tau_c + 1).count()
    all_rows = sh.count()
    assert prefix_rows <= all_rows * 0.6
    # and the hot shingle appears on the prefix side of NO doc
    hot_in_prefix = (
        ranked.where(F.col("rk") <= F.col("c") - ceil_tau_c + 1)
        .where(F.col("shingle") == "common base gram")
        .count()
    )
    assert hot_in_prefix == 0
