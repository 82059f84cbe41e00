"""Event-stream product analytics — funnel + cohort retention.

The reference's deployment story is an indexing service observed
through its request log (SURVEY §2 S11 maps the log sink to a metrics
table); funnels and retention cohorts are the two standard queries a
team runs over exactly that kind of event table, and both are
first-class operators in the engines this repo's stream verbs mirror
(Solr streaming expressions feed dashboards; Druid/ClickHouse ship
funnel/retention builtins).

Both operators are pure DataFrame compositions: per-user milestone
aggregates (funnel) and first-touch cohorting (retention) — each ONE
user-keyed aggregate plus request-scale reshaping, no UDFs, no
windows over the raw event stream. At 10^12 events the user-keyed
shuffle is the only data-scale exchange; everything after is
|users| or |cohorts × offsets| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """First-occurrence funnel (Amplitude's "first occurrence" mode):
    a user reaches step i when their FIRST step-i event strictly
    follows the first event that qualified them for step i-1 — a
    purchase whose first occurrence precedes the first click does not
    convert, even if later purchases exist. One conditional-min
    aggregate covers every step; the any-occurrence strict variant
    needs one ordered pass per step and is the |steps|-aggregate
    generalization of the same plan.

    Returns one row per step: (step_ord, step, n_users, conv_rate)
    where conv_rate = n_users / previous step's n_users (1.0 for the
    first step), rounded 6dp, ordered step_ord.

    Plan: ONE scan of the filtered event table grouped by user with a
    conditional-min per step (map-side combinable), then an iterated
    column fold over the |steps| milestone columns — the per-user row
    is the only shuffled payload, |steps| doubles wide."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    aggs = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.where(F.col("event_type").isin(list(steps))).groupBy(
        "user_id"
    ).agg(*aggs)
    # milestone i qualifies only if it strictly follows milestone i-1
    reached = per_user.select(
        "user_id",
        F.col("t0").alias("m0"),
        *[F.col(f"t{i}") for i in range(1, len(steps))],
    )
    for i in range(1, len(steps)):
        prev, cur = f"m{i - 1}", f"t{i}"
        # earliest step-i event after the qualified step-(i-1) time:
        # with only min(ts) per type available, the strict rule is
        # "min ts of step i is later than the qualified prev ts" —
        # identical to the SQL twin's formulation.
        reached = reached.withColumn(
            f"m{i}",
            F.when(
                F.col(prev).isNotNull() & (F.col(cur) > F.col(prev)),
                F.col(cur),
            ),
        )
    counts = reached.agg(
        *[
            F.count(F.col(f"m{i}")).cast("long").alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    spark = events.sparkSession
    spine = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "step_ord int, step string"
    )
    wide = spine.crossJoin(F.broadcast(counts))
    n_col = F.when(F.col("step_ord") == 0, F.col("n0"))
    prev_col = F.when(F.col("step_ord") == 0, F.col("n0"))
    for i in range(1, len(steps)):
        n_col = n_col.when(F.col("step_ord") == i, F.col(f"n{i}"))
        prev_col = prev_col.when(F.col("step_ord") == i, F.col(f"n{i - 1}"))
    return (
        wide.select(
            "step_ord",
            "step",
            n_col.cast("long").alias("n_users"),
            F.round(
                F.when(
                    prev_col > 0, n_col.cast("double") / prev_col.cast("double")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("conv_rate"),
        )
        .orderBy("step_ord")
    )


def retention_cohorts(events: DataFrame, max_offset_days: int = 7) -> DataFrame:
    """First-touch cohort retention: users cohort by the DAY of their
    first event; each later active day counts them into (cohort_day,
    day_offset). Returns (cohort_day DATE, day_offset INT, n_users)
    for offsets 0..``max_offset_days``, ordered (cohort_day,
    day_offset).

    Plan: one user-keyed aggregate for first-touch, broadcast back
    onto the per-(user, day) distinct activity — two data-scale
    shuffles total (user, then (cohort, offset) request-scale agg)."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .where(F.col("day_offset") <= F.lit(int(max_offset_days)))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def daily_anomalies(
    events: DataFrame, z_thresh: float = 2.0, k: int = 20
) -> DataFrame:
    """Per-event-type daily volume anomalies — the ops-dashboard query
    over the reference deployment's request log (the S11 metrics-table
    mapping): day counts per event_type scored by z-score against that
    type's own daily distribution; |z| beyond ``z_thresh`` is an
    anomaly (traffic spike, collapse, stuck producer).

    Returns the top ``k`` days by |z|: (event_type, day, n, z,
    is_anomaly) with day formatted yyyy-MM-dd, z rounded 6dp, ordered
    |z| DESC then (event_type, day); types whose volume never varies
    (stddev 0) are excluded — z is undefined there.

    Plan: one (type, day) aggregate over the event stream (the only
    data-scale exchange), then a type-keyed window for mean/stddev
    over |types × days| rows — request-scale."""
    from pyspark.sql.window import Window

    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type")
    scored = (
        daily.withColumn("mu", F.avg("n").over(w))
        .withColumn("sd", F.stddev_samp(F.col("n").cast("double")).over(w))
        .where(F.col("sd") > 0)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            ((F.col("n") - F.col("mu")) / F.col("sd")).alias("_z"),
        )
    )
    return (
        scored.select(
            "event_type",
            "day",
            "n",
            F.round("_z", 6).alias("z"),
            (F.abs(F.col("_z")) > F.lit(float(z_thresh))).cast("int").alias(
                "is_anomaly"
            ),
        )
        .orderBy(F.desc(F.abs(F.col("z"))), F.asc("event_type"), F.asc("day"))
        .limit(int(k))
    )
