"""Round-5: the last two global-NTILE windows (length_buckets,
curriculum_order) replaced by the closed-form two-pass parallel rank —
plan has no partitionless window, results stay ANSI-NTILE-exact."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from solr_ocr_processor_spark.operators.split import (
    curriculum_order,
    length_buckets,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import __spark_entry__ as e

    return e._docs(spark, sf_dir)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_partitionless_window_in_either_plan(spark, docs):
    for df in (
        length_buckets(docs, n_buckets=8),
        curriculum_order(docs, n_buckets=4),
    ):
        plan = _plan(df)
        assert "ntile" not in plan.lower()
        # every window spec in the plan is keyed by the range
        # partition id — none runs over the whole table in one task
        for i, chunk in enumerate(plan.split("windowspecdefinition(")):
            if i == 0:
                continue
            assert chunk.startswith("_pid"), chunk[:120]


def test_bucket_heights_are_ansi_ntile(spark, docs):
    n = docs.count()
    for nb in (3, 8):
        got = (
            length_buckets(docs, n_buckets=nb)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("h"))
            .orderBy("bucket")
            .collect()
        )
        base, rem = divmod(n, nb)
        want = [base + 1] * rem + [base] * (nb - rem)
        assert [r["bucket"] for r in got] == list(range(1, nb + 1))
        assert [r["h"] for r in got] == want


def test_bucket_boundaries_respect_total_order(spark, docs):
    lb = length_buckets(docs, n_buckets=4)
    rows = lb.orderBy("n_tokens", "doc_id").collect()
    seq = [r["bucket"] for r in rows]
    assert seq == sorted(seq)  # buckets are contiguous under the order


def test_curriculum_positions_dense_and_bucket_major(spark, docs):
    co = curriculum_order(docs, n_buckets=4)
    rows = co.orderBy("position").collect()
    assert [r["position"] for r in rows] == list(range(len(rows)))
    assert [r["bucket"] for r in rows] == sorted(r["bucket"] for r in rows)
