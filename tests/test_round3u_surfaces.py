"""Round-3 continuation surfaces (batch hh): spatial geofilt/geodist,
first-occurrence funnel, cohort retention."""

from __future__ import annotations

import datetime
import math

from solr_ocr_processor_spark.operators.analytics import (
    funnel,
    retention_cohorts,
)
from solr_ocr_processor_spark.operators.spatial import (
    EARTH_RADIUS_KM,
    geofilt_topk,
    synth_coords,
)


def _coords(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lat double, lon double")


def test_geofilt_radius_and_order(spark):
    rows = [
        (0, 0.0, 0.0),  # at the point
        (1, 0.0, 1.0),  # ~111.2 km east
        (2, 1.0, 0.0),  # ~111.2 km north
        (3, 0.0, 50.0),  # far outside d
    ]
    out = geofilt_topk(_coords(spark, rows), 0.0, 0.0, 300.0, k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]
    assert out[0]["dist_km"] == 0.0
    # one degree of longitude at the equator == one degree of latitude
    # along a meridian: equal distances, doc_id tie-break
    assert out[1]["dist_km"] == out[2]["dist_km"]
    deg = math.pi / 180 * EARTH_RADIUS_KM
    assert abs(out[1]["dist_km"] - deg) < 1e-6


def test_geofilt_antipode_and_k_cut(spark):
    rows = [(i, 0.0, float(i)) for i in range(10)]
    out = geofilt_topk(_coords(spark, rows), 0.0, 0.0, 1e6, k=4).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]


def test_synth_coords_in_bounds_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = synth_coords(docs).collect()
    assert len(rows) == 100
    for r in rows:
        assert -90.0 <= r["lat"] < 90.0 and -180.0 <= r["lon"] < 180.0
    r7 = [r for r in rows if r["doc_id"] == 7][0]
    assert r7["lat"] == (7 * 37 % 1800) / 10.0 - 90.0
    assert r7["lon"] == (7 * 73 % 3600) / 10.0 - 180.0


def _events(spark, rows):
    base = datetime.datetime(2026, 1, 1)
    data = [
        (i, base + datetime.timedelta(hours=h), u, t, 1.0, "{}")
        for i, (u, t, h) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_strict_first_occurrence(spark):
    rows = [
        # u1 completes in order
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        # u2: first purchase precedes first click -> stops at click
        (2, "view", 0), (2, "purchase", 1), (2, "click", 3),
        # u3: only view
        (3, "view", 0),
        # u4: click without view -> never enters funnel at step 2
        (4, "click", 0),
    ]
    out = funnel(_events(spark, rows), ["view", "click", "purchase"]).collect()
    got = {r["step"]: r for r in out}
    assert [r["step_ord"] for r in out] == [0, 1, 2]
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 2  # u1, u2
    assert got["purchase"]["n_users"] == 1  # u1 only
    assert got["view"]["conv_rate"] == 1.0
    assert got["click"]["conv_rate"] == round(2 / 3, 6)
    assert got["purchase"]["conv_rate"] == 0.5


def test_funnel_equal_timestamps_do_not_convert(spark):
    rows = [(1, "view", 0), (1, "click", 0)]  # same ts: not strictly after
    out = funnel(_events(spark, rows), ["view", "click"]).collect()
    got = {r["step"]: r["n_users"] for r in out}
    assert got == {"view": 1, "click": 0}


def test_retention_cohorts(spark):
    rows = [
        (1, "view", 0),  # day 0 cohort
        (1, "view", 25),  # day 1
        (1, "view", 26),  # same day 1 -> still one active day
        (2, "view", 0),  # day 0 cohort, only day 0
        (3, "view", 24 * 5),  # day 5 cohort
        (3, "view", 24 * 15),  # offset 10 > 7 -> dropped
    ]
    out = retention_cohorts(_events(spark, rows), max_offset_days=7).collect()
    got = {(str(r["cohort_day"]), r["day_offset"]): r["n_users"] for r in out}
    assert got == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 1): 1,
        ("2026-01-06", 0): 1,
    }
