"""Event analytics composites: funnel and cohort retention — the two
workhorse product-analytics shapes, each as one declarative plan over the
event stream.

Scale notes: both are user-keyed — every shuffle is on user_id (or the
derived cohort day), so they partition to any corpus size; no sessionful
state, no driver logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import round6, table
from kwery_spark.registry import register


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
        GROUP BY e.user_id
    )
    SELECT 'view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT 'click', count(*) FROM c
    UNION ALL SELECT 'purchase', count(*) FROM p
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user advances a stage
    only with an event strictly after their previous stage's first event.
    Three user-keyed aggregates chained by joins; every shuffle is on
    user_id, so the funnel scales with the user population, not the event
    volume (counts pre-aggregate map-side)."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    count = lambda df, stage: df.agg(  # noqa: E731
        F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n_users")
    )
    return (
        count(v, "view").unionByName(count(c, "click")).unionByName(count(p, "purchase"))
    )


@register(
    "events_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id,
               min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP))
                   AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
        FROM events
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.d) AS INTEGER) AS day_offset,
           count(*) AS n_active
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day; each
    later active day counts toward (cohort_day, day_offset). Two
    user-keyed aggregates + one join; the result is bounded by
    days x days, regardless of event volume."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_day", F.datediff("d", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                         > 1800000000
                    OR lag(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    tagged AS (
        SELECT user_id, event_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
               AS duration_secs
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-minute inactivity gap): the lag-flag →
    running-sum session-id assignment — the canonical windowed rewrite of
    the per-user loop. One shuffle on user_id serves both windows and the
    final aggregate; ties broken by event_id so ordering (and therefore
    session boundaries) is fully deterministic. The streaming twin is
    stream_session (session_window); this is the backfill/batch form."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: second-truncated arithmetic would disagree
    # with the oracle's interval comparison on sub-second boundaries
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1_000_000
            ).cast("long").alias("duration_secs"),
        )
    )


@register(
    "events_gapfill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               count(*) AS n,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h0,
               max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h1
        FROM events
    ),
    spine AS (
        SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
        FROM (SELECT DISTINCT event_type FROM events) t, bounds b
    )
    SELECT s.event_type, s.h AS bucket,
           CAST(coalesce(hh.n, 0) AS BIGINT) AS n_events,
           coalesce(hh.n, 0) > 0 AS observed,
           last_value(hh.avg_v IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.h
               ROWS UNBOUNDED PRECEDING) AS avg_value_locf
    FROM spine s LEFT JOIN hourly hh ON s.event_type = hh.event_type AND s.h = hh.h
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (time_bucket_gapfill parity): build the
    dense hourly spine between the corpus bounds for every event type,
    left-join observed buckets, zero-fill counts, and carry the last
    observed hourly average forward (LOCF) into the gaps. The spine is
    generated from ONE min/max aggregate (a scalar, broadcast into the
    tiny type×hour cross), so at 100 TB the dense spine costs
    |types| × |hours| rows, never a scan. Averages are rounded BEFORE
    the carry so both engines forward identical values."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(F.col("event_type"), hour.alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        round6(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_v"),
    )
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("bucket"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            (F.coalesce("n", F.lit(0)) > 0).alias("observed"),
            F.last("avg_v", ignorenulls=True).over(w).alias("avg_value_locf"),
        )
    )


@register(
    "events_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               avg(n) AS mu,
               stddev_samp(n) AS sigma
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.h AS bucket, CAST(h.n AS BIGINT) AS n_events,
           round((h.n - s.mu) / s.sigma, 6) AS zscore,
           abs((h.n - s.mu) / s.sigma) > 3.0 AS is_anomaly
    FROM hourly h JOIN stats s USING (event_type)
    WHERE abs((h.n - s.mu) / s.sigma) > 2.0
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score each (event_type, hour) bucket
    against its type's mean/stddev, surface buckets beyond 2σ and flag
    >3σ — the standard ops-monitoring shape. Two aggregates over the same
    hourly rollup (Catalyst reuses the exchange) + a broadcast of the
    per-type stats (|types| rows at any scale). In streaming this is the
    same plan over a sliding window; here it's the batch/backfill form."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.0)
        .select(
            "event_type",
            F.col("h").alias("bucket"),
            F.col("n").cast("long").alias("n_events"),
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
    )


@register(
    "events_pattern_adjacent",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id,
           count(*) AS n_patterns,
           min(ts) AS first_match_ts
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id
    """,
)
def events_pattern_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching (MATCH_RECOGNIZE-style, which neither
    engine parses): find STRICTLY ADJACENT view→click→purchase runs per
    user via a lead()-chain — unlike events_funnel, no other event may
    intervene. One shuffle on user_id serves the window and the
    aggregate; ties broken by event_id so adjacency is deterministic.
    Longer patterns are more lead() columns, not more shuffles."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_patterns"),
            F.min("ts").alias("first_match_ts"),
        )
    )


@register(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
               AS DATE) AS d
        FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
    wau AS (
        SELECT ud.d + CAST(k AS INTEGER) AS d, count(DISTINCT user_id) AS wau
        FROM ud CROSS JOIN unnest([0, 1, 2, 3, 4, 5, 6]) AS t(k)
        GROUP BY 1
    )
    SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users + stickiness (DAU/WAU): WAU uses the
    replicate-by-offset rewrite — each (user, day) fans out to the 7
    week-ending days it supports, then one distinct count per bucket —
    instead of a rolling DISTINCT window (which engines can't
    deaggregate). The fan-out is a constant 7x on the (already
    deduplicated) user-day table and every shuffle is hash-keyed, so the
    classic product-analytics query stays fully distributable. Days
    beyond the corpus only appear via the join with observed DAU days."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("k")).alias("d"))
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_churn",
    oracle="""
    WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS tmax FROM events),
    u AS (
        SELECT user_id,
               max(CAST(ts AS TIMESTAMP)) AS last_seen,
               count(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(datediff('day', last_seen, tmax) AS BIGINT) AS days_inactive,
           datediff('day', last_seen, tmax) > 7 AS is_churned
    FROM u CROSS JOIN mx
    """,
)
def events_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity churn flags: per-user days since last event relative
    to the corpus horizon (max ts), churned if > 7 days dark. The
    horizon is a 1-row aggregate broadcast into the plan (no driver
    action, no second scan barrier); the per-user aggregate is one hash
    shuffle with map-side partials. Day arithmetic via datediff on both
    engines — no sub-second traps since it floors to dates."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("tmax"))
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n_events")
    )
    days = F.datediff(F.col("tmax").cast("date"), F.col("last_seen").cast("date"))
    return u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "n_events",
        days.cast("long").alias("days_inactive"),
        (days > 7).alias("is_churned"),
    )


@register(
    "analytics_rfm",
    oracle="""
    WITH per_cust AS (
        SELECT o.o_custkey,
               date_diff('day', max(o.o_orderdate),
                         (SELECT max(o_orderdate) FROM orders)) AS recency_days,
               count(*) AS frequency,
               round(CAST(sum(o.o_totalprice) AS DOUBLE), 6) AS monetary
        FROM orders o
        GROUP BY o.o_custkey
    ),
    b AS (
        SELECT
            percentile_cont(0.2) WITHIN GROUP (ORDER BY recency_days) AS r1,
            percentile_cont(0.4) WITHIN GROUP (ORDER BY recency_days) AS r2,
            percentile_cont(0.6) WITHIN GROUP (ORDER BY recency_days) AS r3,
            percentile_cont(0.8) WITHIN GROUP (ORDER BY recency_days) AS r4,
            percentile_cont(0.2) WITHIN GROUP (ORDER BY frequency)    AS f1,
            percentile_cont(0.4) WITHIN GROUP (ORDER BY frequency)    AS f2,
            percentile_cont(0.6) WITHIN GROUP (ORDER BY frequency)    AS f3,
            percentile_cont(0.8) WITHIN GROUP (ORDER BY frequency)    AS f4,
            percentile_cont(0.2) WITHIN GROUP (ORDER BY monetary)     AS m1,
            percentile_cont(0.4) WITHIN GROUP (ORDER BY monetary)     AS m2,
            percentile_cont(0.6) WITHIN GROUP (ORDER BY monetary)     AS m3,
            percentile_cont(0.8) WITHIN GROUP (ORDER BY monetary)     AS m4
        FROM per_cust
    )
    SELECT p.o_custkey,
           CAST(p.recency_days AS BIGINT) AS recency_days,
           p.frequency, p.monetary,
           CASE WHEN p.recency_days <= b.r1 THEN 5
                WHEN p.recency_days <= b.r2 THEN 4
                WHEN p.recency_days <= b.r3 THEN 3
                WHEN p.recency_days <= b.r4 THEN 2 ELSE 1 END AS r_score,
           CASE WHEN p.frequency <= b.f1 THEN 1
                WHEN p.frequency <= b.f2 THEN 2
                WHEN p.frequency <= b.f3 THEN 3
                WHEN p.frequency <= b.f4 THEN 4 ELSE 5 END AS f_score,
           CASE WHEN p.monetary <= b.m1 THEN 1
                WHEN p.monetary <= b.m2 THEN 2
                WHEN p.monetary <= b.m3 THEN 3
                WHEN p.monetary <= b.m4 THEN 4 ELSE 5 END AS m_score
    FROM per_cust p CROSS JOIN b
    """,
)
def analytics_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary quintiles).

    Scale: scoring avoids the classic ntile-over-everything trap — a
    global ntile window needs a single-task total sort of every customer.
    Instead the five quintile boundaries are computed once with exact
    interpolated percentiles (a tiny all-to-one partial aggregate) and
    broadcast back as one row; each customer's scores are then pure
    map-side CASE comparisons. Two 1-row broadcasts (corpus horizon,
    boundary set) — both declared BNLJ like events_gapfill.

    Determinism: recency/frequency are integer-valued (orders are
    midnight-aligned), monetary is round(sum,6) BEFORE the percentile
    so both engines interpolate the identical doubles (round-before-
    carry rule); both engines use the same (1-f)*lo + f*hi formula.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    horizon = orders.agg(F.max("o_orderdate").alias("horizon"))
    per_cust = (
        orders.join(F.broadcast(horizon))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("horizon"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 6).alias("monetary"),
        )
    )
    bounds = per_cust.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"{c[0]}{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, p in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]
    )
    p = per_cust.join(F.broadcast(bounds))

    def score(col: str, prefix: str, invert: bool):
        # ascending CASE cascade over the four quintile boundaries
        c = F.col(col)
        asc = (
            F.when(c <= F.col(f"{prefix}1"), 1)
            .when(c <= F.col(f"{prefix}2"), 2)
            .when(c <= F.col(f"{prefix}3"), 3)
            .when(c <= F.col(f"{prefix}4"), 4)
            .otherwise(5)
        )
        return (6 - asc) if invert else asc

    return p.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        score("recency_days", "r", invert=True).alias("r_score"),
        score("frequency", "f", invert=False).alias("f_score"),
        score("monetary", "m", invert=False).alias("m_score"),
    )


@register(
    "events_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island,
               count(*) AS streak_len,
               min(d) AS streak_start
        FROM islands
        GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, streak_len, streak_start,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY streak_len DESC, streak_start) AS rn,
               CAST(sum(streak_len) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_active_days
        FROM streaks
    )
    SELECT user_id,
           streak_len AS best_streak,
           streak_start,
           n_active_days
    FROM best
    WHERE rn = 1
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the canonical
    gaps-and-islands pattern: distinct activity days, row_number per user,
    then (day - row_number) is constant within each unbroken run, so a
    plain group-by on that derived island key collapses each streak.

    Scale: everything is user_id-keyed, so the plan pays ONE shuffle: an
    explicit repartition(user_id) whose partitioning then satisfies the
    day-dedup (hash(user_id) clusters every (user_id, d) group), both
    windows, both aggregates, and the final self-join — Catalyst inserts
    no further Exchange (locked in tests/test_plans.py). n_active_days
    is derived as sum(streak_len) in the same branch rather than from a
    second scan. No global sort anywhere. Tie between equal-length
    streaks resolves to the earliest start date.
    """
    days = (
        table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .repartition("user_id")
        .dropDuplicates(["user_id", "d"])
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start")
    )
    # total active days = sum of island lengths as a WINDOW over the same
    # user_id partitioning — a groupBy+join would make Spark recompute the
    # whole streaks branch (no physical common-subtree reuse) and pay a
    # second Exchange
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .withColumn(
            "n_active_days",
            F.sum("streak_len").over(Window.partitionBy("user_id")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("best_streak"),
            "streak_start",
            "n_active_days",
        )
    )


@register(
    "events_ab_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 90
                        THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ),
    arms AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM per_user GROUP BY variant
    ),
    wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n_users END) AS n_control,
            max(CASE WHEN variant = 0 THEN n_converted END) AS conv_control,
            max(CASE WHEN variant = 1 THEN n_users END) AS n_treatment,
            max(CASE WHEN variant = 1 THEN n_converted END) AS conv_treatment
        FROM arms
    )
    SELECT n_control, conv_control, n_treatment, conv_treatment,
           round(CAST(conv_control AS DOUBLE) / n_control, 6) AS rate_control,
           round(CAST(conv_treatment AS DOUBLE) / n_treatment, 6)
               AS rate_treatment,
           round((CAST(conv_treatment AS DOUBLE) / n_treatment)
                 - (CAST(conv_control AS DOUBLE) / n_control), 6)
               AS abs_lift,
           round(((CAST(conv_treatment AS DOUBLE) / n_treatment)
                  - (CAST(conv_control AS DOUBLE) / n_control))
                 / sqrt((CAST(conv_control + conv_treatment AS DOUBLE)
                         / (n_control + n_treatment))
                        * (1 - CAST(conv_control + conv_treatment AS DOUBLE)
                               / (n_control + n_treatment))
                        * (1.0 / n_control + 1.0 / n_treatment)), 6)
               AS z_score
    FROM wide
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash-bucket assignment
    (user_id % 2 — the md5-free form is fine here because the id IS the
    randomization unit), per-user conversion (a 'purchase' above a
    value threshold — the unthresholded form converts every corpus user
    and degenerates the variance to zero),
    per-arm totals, and the pooled two-proportion z-score for
    treatment-vs-control lift.

    Shape: one shuffle on user_id for the per-user collapse, then a
    2-row arm aggregate conditionally pivoted to a single row — the
    entire statistical readout is O(users) distributed work + O(1)
    final state, which is how experiment pipelines stay cheap at 100 TB
    of raw events. Determinism: counts are exact integers; every
    derived statistic is a fixed chain of divisions/sqrt over them,
    rounded to 6 decimals."""
    per_user = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.col("user_id") % 2).alias("variant"),
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0).alias("c"),
        )
        .groupBy("user_id", "variant")
        .agg(F.max("c").alias("converted"))
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_control"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias(
            "conv_control"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_treatment"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias(
            "conv_treatment"
        ),
    )
    rc = F.col("conv_control").cast("double") / F.col("n_control")
    rt = F.col("conv_treatment").cast("double") / F.col("n_treatment")
    pooled = (F.col("conv_control") + F.col("conv_treatment")).cast("double") / (
        F.col("n_control") + F.col("n_treatment")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_control") + 1.0 / F.col("n_treatment"))
    )
    return wide.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.round(rc, 6).alias("rate_control"),
        F.round(rt, 6).alias("rate_treatment"),
        F.round(rt - rc, 6).alias("abs_lift"),
        F.round((rt - rc) / se, 6).alias("z_score"),
    )


@register(
    "events_forecast_ses",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    ranked AS (
        SELECT event_type, day, n,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS t
        FROM daily
    )
    SELECT event_type,
           CAST(max(t) AS BIGINT) AS n_days,
           CAST(max(CASE WHEN rn = t THEN n END) AS BIGINT) AS last_count,
           round(sum(CASE WHEN rn = 1 THEN power(0.7, t - 1) * n
                          ELSE 0.3 * power(0.7, t - rn) * n END), 6)
               AS forecast
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_forecast_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day volume forecast per event type by simple exponential
    smoothing (alpha=0.3), computed in CLOSED FORM: the recurrence
    s_t = a*y_t + (1-a)*s_{t-1} with s_1=y_1 unrolls to one weighted
    sum, sum_t w_t*y_t with w_t = a*(1-a)^(T-t) (t>1) and
    w_1 = (1-a)^(T-1) — so the whole forecast is a single grouped
    aggregate over the daily counts, no iteration, no ordered state
    carry. The geometric weights decay, so the sum is numerically tame
    at any history length.

    Scale: daily rollup shuffles once on (event_type, day); the ranked
    window and the final aggregate reuse the event_type partitioning.
    Per-series state is O(1) — this is the textbook shape for
    forecasting millions of series in one pass (each series is one
    group). Determinism: counts are exact; power/multiply/sum-per-group
    over <=O(days) terms, rounded to 6."""
    alpha = 0.3
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "n",
        F.row_number().over(w.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("t"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(1 - alpha), F.col("t") - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(1 - alpha), F.col("t") - F.col("rn")))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("t").cast("long").alias("n_days"),
            F.max(F.when(F.col("rn") == F.col("t"), F.col("n")))
            .cast("long")
            .alias("last_count"),
            F.round(F.sum(weight * F.col("n")), 6).alias("forecast"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_sequence_regex",
    oracle="""
    WITH journeys AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS journey
        FROM events
        WHERE user_id < 50
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(strlen(journey) AS INTEGER) AS journey_len,
           CAST(len(regexp_extract_all(journey, 'v[^p]*p')) AS INTEGER)
               AS n_view_to_purchase,
           journey LIKE '%vcp%' AS has_strict_funnel,
           substring(journey, 1, 10) AS journey_head
    FROM journeys
    ORDER BY user_id
    """,
)
def events_sequence_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern matching over per-user event journeys — the
    MATCH_RECOGNIZE analog: render each user's time-ordered event
    stream as a compact symbol string (one initial per event; the five
    corpus types have distinct initials), then run regex patterns over
    it. Patterns here: non-overlapping view→eventually→purchase
    episodes (`v[^p]*p` — greedy left-to-right scan, identical
    semantics in Spark's Java regex and DuckDB's RE2 for this
    p-excluding pattern) and the strict view→click→purchase adjacency.

    Scale: one shuffle on user_id; the journey is built with a SORTED
    collect_list (deterministic (ts, event_id) order — never bare
    collect), and each journey is O(events-per-user), the natural
    bound for any per-entity sequence analysis. Regexes run JVM-side
    in codegen. This string-render + regex shape is how sequence/funnel
    pattern engines (MATCH_RECOGNIZE, funnel SQL dialects) execute at
    scale: sessions become strings, patterns become automata."""
    ini = F.substring("event_type", 1, 1)
    journeys = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", F.struct(F.col("ts"), F.col("event_id"), ini.alias("i")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s.getField("i")
                ),
            ).alias("journey")
        )
    )
    return journeys.select(
        "user_id",
        F.length("journey").alias("journey_len"),
        F.size(F.regexp_extract_all("journey", F.lit("v[^p]*p"), 0)).alias(
            "n_view_to_purchase"
        ),
        F.col("journey").like("%vcp%").alias("has_strict_funnel"),
        F.substring("journey", 1, 10).alias("journey_head"),
    ).coalesce(1).sortWithinPartitions("user_id")


@register(
    "events_ttest_welch",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS variant,
               CAST(count(*) AS BIGINT) AS n,
               avg(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY variant
    ),
    wide AS (
        SELECT
            max(CASE WHEN variant = 0 THEN n END) AS n0,
            max(CASE WHEN variant = 0 THEN m END) AS m0,
            max(CASE WHEN variant = 0 THEN v END) AS v0,
            max(CASE WHEN variant = 1 THEN n END) AS n1,
            max(CASE WHEN variant = 1 THEN m END) AS m1,
            max(CASE WHEN variant = 1 THEN v END) AS v1
        FROM arms
    )
    SELECT n0, n1,
           round(m0, 6) AS mean_control,
           round(m1, 6) AS mean_treatment,
           round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
           round(pow(v0 / n0 + v1 / n1, 2)
                 / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)),
                 6) AS welch_df
    FROM wide
    """,
)
def events_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase values between the
    two experiment arms — the continuous-metric complement to
    events_ab_test's proportion z-test. Per-arm count/mean/sample
    variance come from ONE grouped aggregate (Spark's var_samp is a
    single-pass merge-able moment computation — this is why the whole
    test is O(events) distributed work with 2 rows of final state);
    the t statistic and Welch–Satterthwaite degrees of freedom are
    O(1) arithmetic on top, rounded to 6."""
    arms = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    wide = arms.agg(
        *[
            F.max(F.when(F.col("variant") == a, F.col(c))).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("n", "m", "v")
        ]
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    df = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return wide.select(
        "n0",
        "n1",
        F.round("m0", 6).alias("mean_control"),
        F.round("m1", 6).alias("mean_treatment"),
        F.round((F.col("m1") - F.col("m0")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    )


@register(
    "events_markov_stationary",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        FROM events
    ),
    pairs AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM ev
    ),
    counts AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    p AS (
        SELECT src, dst, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p, n
        FROM counts
    ),
    pi0 AS (SELECT DISTINCT src AS state,
                   1.0 / (SELECT count(DISTINCT src) FROM counts) AS pi
            FROM counts),
    pi1 AS (SELECT p.dst AS state, sum(pi * p.p) AS pi
            FROM pi0 JOIN p ON p.src = pi0.state GROUP BY p.dst),
    pi2 AS (SELECT p.dst AS state, sum(pi * p.p) AS pi
            FROM pi1 JOIN p ON p.src = pi1.state GROUP BY p.dst),
    pi3 AS (SELECT p.dst AS state, sum(pi * p.p) AS pi
            FROM pi2 JOIN p ON p.src = pi2.state GROUP BY p.dst),
    nout AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_out FROM counts GROUP BY src),
    top AS (SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY p DESC, dst) AS rn
                FROM p)
            WHERE rn = 1)
    SELECT pi3.state, round(pi3.pi, 6) AS stationary_p,
           nout.n_out, top.dst AS top_next
    FROM pi3
    JOIN nout ON nout.src = pi3.state
    JOIN top ON top.src = pi3.state
    ORDER BY pi3.state
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of the user journey: transition
    probabilities between event types (lead over each user's time-
    ordered stream, row-normalized counts) and the stationary
    distribution after 3 unrolled power steps from uniform — "where do
    users spend their time in steady state". Also emits each state's
    outgoing volume and argmax next state (deterministic dst tiebreak).

    Scale: the O(events) work is ONE user_id-partitioned window pass +
    one (src, dst) aggregate; everything after operates on the 5x5
    probability matrix — the classic big-data-to-tiny-iterate shape
    (same as embedding_pca, transition version). The tiny-side joins
    broadcast; 5-term dot products round(6) at the end only."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", F.col("event_type").alias("src"))
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    pw = Window.partitionBy("src")
    p = counts.select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.sum("n").over(pw)).alias("p"),
        "n",
    ).localCheckpoint(eager=True)
    pmat = p.select(
        F.col("src").alias("p_src"), F.col("dst").alias("p_dst"), "p"
    )
    # Uniform start = 1/|states|, DERIVED (ADVICE r4: a hardcoded 0.2
    # assumed exactly 5 event types; a regenerated corpus with a
    # different type count would leave pi not summing to 1). One-row
    # count aggregate broadcast into the cross join — same single
    # double division in both engines, so parity is exact.
    nstates = counts.select(F.countDistinct("src").alias("ns"))
    pi = (
        p.select(F.col("src").alias("state"))
        .distinct()
        .crossJoin(F.broadcast(nstates))
        .withColumn("pi", F.lit(1.0) / F.col("ns"))
        .drop("ns")
    )
    for _ in range(3):
        pi = (
            pi.join(F.broadcast(pmat), F.col("state") == F.col("p_src"))
            .groupBy(F.col("p_dst"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
            .select(F.col("p_dst").alias("state"), "pi")
        )
    nout = counts.groupBy("src").agg(F.sum("n").cast("long").alias("n_out")).select(
        F.col("src").alias("n_src"), "n_out"
    )
    tw = Window.partitionBy("src").orderBy(F.col("p").desc(), "dst")
    top = (
        p.withColumn("rn", F.row_number().over(tw))
        .filter(F.col("rn") == 1)
        .select(F.col("src").alias("t_src"), F.col("dst").alias("top_next"))
    )
    return (
        pi.join(F.broadcast(nout), F.col("state") == F.col("n_src"))
        .join(F.broadcast(top), F.col("state") == F.col("t_src"))
        .select("state", F.round("pi", 6).alias("stationary_p"), "n_out", "top_next")
        .coalesce(1)
        .sortWithinPartitions("state")
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    cum AS (
        SELECT event_type, day, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY day) AS prefix,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
               sum(n) OVER (PARTITION BY event_type) AS total,
               count(*) OVER (PARTITION BY event_type) AS days
        FROM daily
    ),
    dev AS (
        SELECT event_type, day, days, total,
               days * prefix - t * total AS d_scaled,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(days * prefix - t * total) DESC, day) AS rk
        FROM cum
    )
    SELECT event_type,
           CAST(days AS BIGINT) AS n_days,
           day AS change_day,
           round(CAST(abs(d_scaled) AS DOUBLE) / days, 6) AS cusum_peak
    FROM dev WHERE rk = 1
    ORDER BY event_type
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume, per type: the
    day t maximizing |sum_{i<=t}(n_i - mean)| is the most likely level
    shift (Page's cumulative-sum statistic with known target = the
    series mean). All comparisons run on INTEGER-scaled deviations —
    days*prefix_t - t*total is the CUSUM times the constant `days`, so
    ranking by its absolute value needs no floating point at all and is
    bit-deterministic in both engines (ties break on the earlier day);
    the one double (the reported peak height) is a single division,
    rounded to 6.

    Scale: one shuffle to the (type, day) rollup — at 100 TB that's the
    standard pre-aggregation that shrinks the series to O(days) rows per
    type; the windows then run inside each type partition. Millions of
    independent series = millions of groups, each O(days) state."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w.orderBy("day")).alias("prefix"),
        F.row_number().over(w.orderBy("day")).alias("t"),
        F.sum("n").over(w).alias("total"),
        F.count(F.lit(1)).over(w).alias("days"),
    )
    dev = cum.select(
        "event_type",
        "day",
        "days",
        (F.col("days") * F.col("prefix") - F.col("t") * F.col("total")).alias(
            "d_scaled"
        ),
    ).withColumn(
        "rk",
        F.row_number().over(w.orderBy(F.abs(F.col("d_scaled")).desc(), F.col("day"))),
    )
    return (
        dev.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("days").cast("long").alias("n_days"),
            F.to_date("day").alias("change_day"),
            F.round(F.abs(F.col("d_scaled")).cast("double") / F.col("days"), 6).alias(
                "cusum_peak"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_attribution",
    oracle="""
    WITH conv AS (
        SELECT user_id, event_id, event_type, ts,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS conv_ts
        FROM events
    ),
    touches AS (
        SELECT user_id, conv_ts, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id, conv_ts
                                  ORDER BY ts, event_id) AS rn_asc,
               row_number() OVER (PARTITION BY user_id, conv_ts
                                  ORDER BY ts DESC, event_id DESC) AS rn_desc,
               count(*) OVER (PARTITION BY user_id, conv_ts) AS n_touch
        FROM conv
        WHERE event_type <> 'purchase' AND conv_ts IS NOT NULL
    )
    SELECT event_type,
           CAST(sum(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(sum(CASE WHEN rn_desc = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch,
           round(CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / n_touch, 9)
                              AS DECIMAL(28,9))) AS DOUBLE), 6)
               AS linear_credit
    FROM touches
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution (first-touch / last-touch /
    linear) over the event stream: every non-purchase event is a
    "touch" credited to that user's NEXT purchase; per conversion the
    first and last touches take the positional credits and every touch
    takes 1/n_touch linear credit. Reported per touching event_type.

    Determinism: conversion assignment and both positional ranks order
    by (ts, event_id) — event_id breaks ts ties exactly like the
    oracle; each touch's 1/n linear credit is rounded to 9dp and summed
    as DECIMAL (order-independent), then the exact sum rounds to 6dp.

    Scale: everything is windowed per user_id — three window passes
    over the same (user_id sort) exchange (Catalyst reuses one sort for
    same-spec windows) and one 5-group aggregate. No joins, no pair
    blowup; the conversion lookup is the reverse-cumulative-min trick
    (min-over-following of a CASE), so no self-join against purchases.
    At 100 TB this partitions by user exactly like sessionization."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    conv = ev.withColumn(
        "conv_ts",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(wseq.rowsBetween(Window.currentRow, Window.unboundedFollowing)),
    )
    grp = Window.partitionBy("user_id", "conv_ts")
    touches = (
        conv.filter(
            (F.col("event_type") != "purchase") & F.col("conv_ts").isNotNull()
        )
        .withColumn(
            "rn_asc", F.row_number().over(grp.orderBy("ts", "event_id"))
        )
        .withColumn(
            "rn_desc",
            F.row_number().over(
                grp.orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .withColumn(
            "n_touch",
            F.count(F.lit(1)).over(
                grp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    return (
        touches.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("first_touch"),
            F.sum(F.when(F.col("rn_desc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_touch"),
            # each touch's 1/n credit is rounded to a fixed 9dp scale and
            # summed as DECIMAL so the aggregate is order-independent
            # (ADVICE r5: raw double summation order differs between
            # engines and can flip the 6dp hash near a rounding boundary)
            F.round(
                F.sum(
                    F.round(F.lit(1.0) / F.col("n_touch"), 9).cast(
                        "decimal(28,9)"
                    )
                ).cast("double"),
                6,
            ).alias("linear_credit"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_entropy",
    oracle="""
    WITH per_type AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    pu AS (
        SELECT user_id, entropy,
               CASE WHEN entropy = 0 THEN 1 ELSE 0 END AS single_type
        FROM (SELECT user_id,
                     round(-sum((c * 1.0 / t) * ln(c * 1.0 / t)), 6) AS entropy
              FROM (SELECT user_id, c, sum(c) OVER (PARTITION BY user_id) AS t
                    FROM per_type)
              GROUP BY user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(entropy), 6) AS avg_entropy,
           round(max(entropy), 6) AS max_entropy,
           CAST(sum(single_type) AS BIGINT) AS n_single_type
    FROM pu
    """,
)
def events_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy (nats) of each user's
    event-type distribution, then population stats — user count, mean
    and max entropy, and how many users are single-type (entropy 0).
    The standard engagement-diversity feature in churn models.

    Determinism: per-user entropy is computed from integer counts with
    ONE division per (user, type) term and rounded to 6dp BEFORE the
    population aggregate, so the float summation order inside avg()
    operates on identical inputs in both engines (same argument as the
    LOCF/carry rule in the working notes).

    Scale: two shuffles, both on user_id ((user,type) counts partial-
    aggregate map-side, then a window-free per-user entropy via
    groupBy(user) over a pre-joined total — here the total comes from
    sum(c) in the same aggregate). Final stats are a 1-row global agg."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wtot = Window.partitionBy("user_id")
    per_user = (
        per_type.withColumn("t", F.sum("c").over(wtot))
        .groupBy("user_id")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") * 1.0 / F.col("t"))
                    * F.log(F.col("c") * 1.0 / F.col("t"))
                ),
                6,
            ).alias("entropy")
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg("entropy"), 6).alias("avg_entropy"),
        F.round(F.max("entropy"), 6).alias("max_entropy"),
        F.sum(F.when(F.col("entropy") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_single_type"),
    )


@register(
    "events_seasonality",
    oracle="""
    WITH counts AS (
        SELECT event_type,
               CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS INTEGER)
                   AS dow,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, sum(c) AS t FROM counts GROUP BY event_type
    ),
    shares AS (
        SELECT c.event_type, c.dow,
               round(c.c * 1.0 / t.t, 6) AS share
        FROM counts c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(max(CASE WHEN rk = 1 THEN dow END) AS INTEGER) AS peak_dow,
           max(CASE WHEN rk = 1 THEN share END) AS peak_share,
           round(max(share) - min(share), 6) AS dow_spread,
           round(sum(abs(share - 1.0/7)), 6) AS l1_from_uniform
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY share DESC, dow) AS rk
          FROM shares)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: peak weekday, its traffic
    share, the spread between busiest and quietest weekday, and total L1
    distance from a uniform weekly profile (0 = no weekly seasonality).
    The screening stat a pipeline computes before fitting any seasonal
    model.

    Determinism: shares are single divisions of integer counts rounded
    to 6dp BEFORE the comparison/aggregate layer (round-before-carry
    rule); peak ties break on dow via row_number in both engines. The
    weekday index is days-since-epoch mod 7 (0 = Thursday) computed
    identically in both engines — Spark's dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday, so neither builtin is used.

    Scale: (type, dow) has <=7*|types| groups — counts partial-aggregate
    map-side and everything after runs on a few dozen rows."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    counts = ev.groupBy(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("int")
        .alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("event_type")
    shares = counts.withColumn(
        "share", F.round(F.col("c") * 1.0 / F.sum("c").over(wt), 6)
    )
    ranked = shares.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("share").desc(), F.col("dow")
            )
        ),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("dow")))
            .cast("int")
            .alias("peak_dow"),
            F.max(F.when(F.col("rk") == 1, F.col("share"))).alias("peak_share"),
            F.round(F.max("share") - F.min("share"), 6).alias("dow_spread"),
            F.round(F.sum(F.abs(F.col("share") - 1.0 / 7)), 6).alias(
                "l1_from_uniform"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "win_trend_slope",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id,
               CAST(CAST(epoch_us(ts) // 60000000 AS BIGINT)
                    AS DECIMAL(38,4)) AS x,
               CAST(value AS DECIMAL(38,4)) AS y,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS seq
        FROM events
    ),
    winsum AS (
        SELECT user_id, event_id, seq,
               count(*)  OVER w AS n,
               sum(x)    OVER w AS sx,
               sum(y)    OVER w AS sy,
               sum(x*x)  OVER w AS sxx,
               sum(x*y)  OVER w AS sxy
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY seq
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    slopes AS (
        SELECT user_id,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS slope
        FROM winsum
        WHERE n = 7
          AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
    )
    SELECT user_id, max(slope) AS max_slope
    FROM slopes
    GROUP BY user_id
    ORDER BY max_slope DESC, user_id
    LIMIT 20
    """,
)
def win_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trend detection: per user, the OLS slope of `value` over
    time within a trailing 7-event frame, reported as each user's
    steepest upward burst (top-20 users). The windowed-regression
    primitive behind "is this metric accelerating per entity".

    Determinism: x (minutes since epoch, integer-valued) and y (2-dec
    value) are summed as DECIMAL inside the frame — frame sums become
    order-independent, so DuckDB's segment-tree window evaluation and
    Spark's running accumulation agree bit-for-bit; the slope is then
    double arithmetic on identical scalars, rounded to 6dp before the
    max/ordering layer. Frames shorter than 7 are excluded (their
    denominator could be 0 for a single point, and partial-frame slopes
    are statistically meaningless anyway).

    Scale: one window shuffle on user_id + one 1-row-per-user aggregate
    + TakeOrdered(20). No joins."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    pts = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 60000000").cast("decimal(38,4)").alias("x"),
        F.col("value").cast("decimal(38,4)").alias("y"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("seq"),
    )
    w = Window.partitionBy("user_id").orderBy("seq").rowsBetween(-6, 0)
    ws = pts.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = F.round(
        (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")),
        6,
    )
    denom = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    return (
        ws.filter((F.col("n") == 7) & (denom != 0))
        .select("user_id", slope.alias("slope"))
        .groupBy("user_id")
        .agg(F.max("slope").alias("max_slope"))
        .orderBy(F.col("max_slope").desc(), "user_id")
        .limit(20)
    )


@register(
    "events_conversion_lag",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    lags AS (
        SELECT p.user_id,
               epoch_us(p.t_purchase) - epoch_us(v.t_view) AS lag_us
        FROM p JOIN v USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converters,
           floor(CAST(CAST(sum(lag_us) AS BIGINT) AS DOUBLE) / count(*)
                 / 1000000.0 * 1000000.0 + 0.5) / 1000000.0 AS avg_lag_s,
           floor(quantile_cont(lag_us, 0.5) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS median_lag_s,
           floor(quantile_cont(lag_us, 0.9) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS p90_lag_s,
           floor(CAST(min(lag_us) AS DOUBLE) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS min_lag_s
    FROM lags
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from first view
    to the first purchase AFTER it, summarized as converter count, mean,
    exact interpolated median and p90, and the fastest conversion — the
    funnel-velocity readout that sits next to events_funnel's counts.

    Determinism: lags stay exact integer MICROSECONDS through every
    aggregate (sub-second rule: epoch_us, never second-truncated
    casts) — the mean is one BIGINT sum divided twice (float-summing
    µs/1e6 doubles would be addition-order-dependent across engines);
    percentile interpolation (a + (b-a)*f) runs on identical
    integer-valued doubles in both engines (Spark percentile == DuckDB
    quantile_cont, both linear); outputs round via catalog.round6
    because a p50 of an even count is a half-µs EXACT tie where plain
    round(x, 6) diverges per-ulp between engines (driver r9 flake
    class).

    Scale: two user-keyed aggregates joined on user_id; the percentile
    is a single-pass sort-based exact aggregate over one row per
    converter (at 100 TB you'd swap in approx_percentile — the corpus
    fits the exact form and the oracle needs exactness)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lags = p.join(v, "user_id").select(
        (F.unix_micros("t_purchase") - F.unix_micros("t_view")).alias(
            "lag_us"
        )
    )
    return lags.agg(
        F.count(F.lit(1)).cast("long").alias("n_converters"),
        round6(
            F.sum("lag_us").cast("long").cast("double")
            / F.count(F.lit(1))
            / 1000000.0
        ).alias("avg_lag_s"),
        round6(F.expr("percentile(lag_us, 0.5)") / 1000000.0).alias(
            "median_lag_s"
        ),
        round6(F.expr("percentile(lag_us, 0.9)") / 1000000.0).alias(
            "p90_lag_s"
        ),
        round6(F.min("lag_us").cast("double") / 1000000.0).alias("min_lag_s"),
    )


@register(
    "events_wow_change",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    wow AS (
        SELECT event_type, day, n,
               lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS n_prev
        FROM daily
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(n_prev AS BIGINT) AS n_prev_week,
           round((n - n_prev) * 1.0 / n_prev, 6) AS wow_change
    FROM wow
    WHERE n_prev IS NOT NULL
    ORDER BY event_type, day
    """,
)
def events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week reporting: daily event counts per type with the
    same-weekday-last-week comparison (lag 7 over the daily series) and
    the relative change — the period-over-period primitive every metrics
    dashboard runs, expressed as one aggregate + one lag window.

    Determinism: integer counts, one division, round 6. Day keys come
    from a DATE cast (the corpus timestamps are µs; both engines
    truncate to the day identically).

    Scale: the daily rollup collapses volume map-side to |types|×|days|
    rows; the lag window then runs on that tiny series. At 100 TB the
    rollup is the only full-data pass."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.withColumn("n_prev", F.lag("n", 7).over(w))
        .filter(F.col("n_prev").isNotNull())
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.col("n_prev").cast("long").alias("n_prev_week"),
            F.round((F.col("n") - F.col("n_prev")) * 1.0 / F.col("n_prev"), 6).alias(
                "wow_change"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type", "day")
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, quantile_cont(n, 0.5) AS med_n
        FROM daily GROUP BY event_type
    ),
    dev AS (
        SELECT d.event_type, d.day, d.n,
               abs(d.n - m.med_n) AS absdev, m.med_n
        FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad_n
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n,
           round(d.med_n, 6) AS median_daily,
           round(m.mad_n, 6) AS mad_daily,
           round((d.n - d.med_n) / (1.4826 * m.mad_n), 6) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad_n > 0
      AND abs((d.n - d.med_n) / (1.4826 * m.mad_n)) > 2.0
    ORDER BY d.event_type, d.day
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on daily volumes: flag days whose
    modified z-score — deviation from the per-type MEDIAN scaled by
    1.4826x the median absolute deviation — exceeds 2 (a threshold that flags a handful of days at gate SF
    while rejecting the bulk — discriminative at both tails). Unlike the
    mean/stddev version (events_anomaly), a single extreme day cannot
    drag the baseline, which is exactly why production alerting uses
    MAD.

    Determinism: daily counts are integers; both medians are exact
    interpolated quantiles over integers (Spark percentile == DuckDB
    quantile_cont); the z-score is computed from those exact scalars
    and rounded at the edge. Zero-MAD series (constant volume) are
    excluded exactly in both engines.

    Scale: the daily rollup is the only full-data pass; medians and
    deviations run on |types|x|days| rows."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med_n")
    )
    dev = daily.join(med, "event_type").withColumn(
        "absdev", F.abs(F.col("n") - F.col("med_n"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad_n")
    )
    z = (F.col("n") - F.col("med_n")) / (1.4826 * F.col("mad_n"))
    return (
        dev.join(mad, "event_type")
        .filter((F.col("mad_n") > 0) & (F.abs(z) > 2.0))
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.round("med_n", 6).alias("median_daily"),
            F.round("mad_n", 6).alias("mad_daily"),
            F.round(z, 6).alias("robust_z"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type", "day")
    )


_POISSON1_CDF_CASE = """CASE WHEN {u} < 0.36787944117144233 THEN 0
         WHEN {u} < 0.7357588823428847 THEN 1
         WHEN {u} < 0.9196986029286058 THEN 2
         WHEN {u} < 0.9810118431238463 THEN 3
         WHEN {u} < 0.9963401531726563 THEN 4
         WHEN {u} < 0.9994058151824183 THEN 5
         ELSE 6 END"""


@register(
    "events_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT e.event_type, e.value, r.range AS b,
               CAST('0x' || substring(md5(CAST(e.event_id AS VARCHAR) || '_'
                        || CAST(r.range AS VARCHAR)), 1, 8) AS BIGINT)
                   / 4294967296.0 AS u
        FROM events e CROSS JOIN range(0, 32) r
    ),
    weighted AS (
        SELECT event_type, b, value,
               {_POISSON1_CDF_CASE.format(u="u")} AS c
        FROM reps
    ),
    boot AS (
        SELECT event_type, b,
               CAST(sum(c * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(sum(c) AS BIGINT) AS mean_b
        FROM weighted
        GROUP BY event_type, b
        HAVING sum(c) > 0
    ),
    ranked AS (
        SELECT event_type, mean_b,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mean_b, b) AS rk,
               count(*) OVER (PARTITION BY event_type) AS nb
        FROM boot
    ),
    ci AS (
        SELECT event_type,
               CAST(max(nb) AS BIGINT) AS n_reps,
               floor(max(CASE WHEN rk = 2 THEN mean_b END)
                     * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
               floor(max(CASE WHEN rk = nb - 1 THEN mean_b END)
                     * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
        FROM ranked
        GROUP BY event_type
    ),
    base AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) * 1000000.0 + 0.5) / 1000000.0 AS mean_obs
        FROM events
        GROUP BY event_type
    )
    SELECT b.event_type, b.n_events, b.mean_obs, c.n_reps, c.ci_lo, c.ci_hi
    FROM base b JOIN ci c ON b.event_type = c.event_type
    ORDER BY b.event_type
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value
    per event_type — the distributed-bootstrap construction of Chamandy
    et al. ("Estimating uncertainty for massive data streams", Google
    2012): instead of resampling n rows with replacement (which needs a
    global shuffle per replicate), each row independently enters
    replicate b with a Poisson(1) count. 32 replicates; the CI is the
    [2nd, 31st] of the 32 sorted replicate means (a ~93.75% interval).

    Determinism discipline: the Poisson draw inverts the exact CDF at
    u = md5(event_id, b)-derived uniform (a rational with denominator
    2^32, bit-identical in both engines), so every replicate is
    replayed hash-for-hash by the oracle — never rand(). Replicate sums
    accumulate DECIMAL(18,2) (order-independent), and the only float
    division happens once per (type, b) on the exact scalars.

    Scale: the 32x fan-out happens INSIDE the scan stage
    (explode(sequence) followed immediately by groupBy — partial
    map-side aggregation folds it before any data moves), so the
    shuffle carries |event_types| x 32 partial rows regardless of input
    size: bootstrap at 100 TB costs one pass over the data plus a
    constant-size shuffle. The rank window partitions by event_type
    with <=32 rows per group."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    reps = ev.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31))))
    u = (
        "CAST(conv(substring(md5(concat(cast(event_id AS string), '_', "
        "cast(b AS string))), 1, 8), 16, 10) AS BIGINT) / 4294967296.0"
    )
    boot = (
        reps.withColumn("c", F.expr(_POISSON1_CDF_CASE.format(u=f"({u})")))
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("c") * F.col("value").cast("decimal(18,2)")).alias("wsum"),
            F.sum("c").alias("wcnt"),
        )
        .filter(F.col("wcnt") > 0)
        .withColumn("mean_b", F.col("wsum").cast("double") / F.col("wcnt"))
    )
    wr = Window.partitionBy("event_type").orderBy("mean_b", "b")
    wn = Window.partitionBy("event_type")
    ci = (
        boot.withColumn("rk", F.row_number().over(wr))
        .withColumn("nb", F.count(F.lit(1)).over(wn))
        .groupBy("event_type")
        .agg(
            F.max("nb").alias("n_reps"),
            # round6: bootstrap means are exact-sum/count ratios — the
            # tie-capable class (catalog.round6, driver-r9 flake)
            round6(
                F.max(F.when(F.col("rk") == 2, F.col("mean_b")))
            ).alias("ci_lo"),
            round6(
                F.max(F.when(F.col("rk") == F.col("nb") - 1, F.col("mean_b")))
            ).alias("ci_hi"),
        )
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        round6(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_obs"),
    )
    return (
        base.join(F.broadcast(ci), "event_type")
        .select("event_type", "n_events", "mean_obs", "n_reps", "ci_lo", "ci_hi")
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_lorenz_gini",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               CAST(value AS DECIMAL(18,2)) AS v,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY value, event_id) AS BIGINT) AS rk
        FROM events
    ),
    agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS DECIMAL(38,2)) AS total,
               CAST(sum(CAST(rk AS DECIMAL(18,0)) * v) AS DECIMAL(38,2))
                   AS rank_weighted
        FROM ranked
        GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(total AS DOUBLE), 2) AS total_value,
           round((2.0 * CAST(rank_weighted AS DOUBLE))
                 / (n * CAST(total AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM agg
    ORDER BY event_type
    """,
)
def events_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of event value per event_type — the Lorenz-curve
    inequality measure (how concentrated is value across events), via
    the rank formulation G = 2*sum(i*x_(i)) / (n*sum(x)) - (n+1)/n.

    Exactness: values are DECIMAL(18,2) (the corpus carries 2dp), ranks
    are exact integers with an event_id tie-break, so both sums are
    order-independent DECIMAL accumulations; the Gini itself is float
    math on bit-identical scalars, rounded to 6dp.

    Scale: ONE shuffle on event_type serves the ranking window and the
    aggregate (Catalyst reuses the partitioning); the rank-weighted sum
    is the textbook distributed-sort formulation of Gini — no pairwise
    |x_i - x_j| space (the naive definition is quadratic)."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.row_number().over(w).cast("long").alias("rk"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("decimal(38,2)").alias("total"),
        F.sum(F.col("rk").cast("decimal(18,0)") * F.col("v"))
        .cast("decimal(38,2)")
        .alias("rank_weighted"),
    )
    total_d = F.col("total").cast("double")
    return (
        agg.select(
            "event_type",
            "n",
            F.round(total_d, 2).alias("total_value"),
            F.round(
                (2.0 * F.col("rank_weighted").cast("double")) / (F.col("n") * total_d)
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_survival_km",
    oracle="""
    WITH u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(last_us) AS obs_end FROM u),
    d AS (
        SELECT (last_us - first_us) // 86400000000 AS duration_day,
               CASE WHEN last_us >= (SELECT obs_end FROM horizon)
                                    - 7 * 86400000000
                    THEN 1 ELSE 0 END AS censored
        FROM u
    ),
    g AS (
        SELECT duration_day,
               CAST(sum(1 - censored) AS BIGINT) AS n_death,
               CAST(sum(censored) AS BIGINT) AS n_censored
        FROM d GROUP BY duration_day
    ),
    r AS (
        SELECT *,
               CAST(sum(n_death + n_censored) OVER (
                   ORDER BY duration_day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS BIGINT) AS n_risk
        FROM g
    ),
    f AS (
        SELECT *,
               CASE WHEN n_death >= n_risk THEN 0.0
                    ELSE 1.0 - CAST(n_death AS DOUBLE) / n_risk END AS factor
        FROM r
    ),
    l AS (
        SELECT *,
               CASE WHEN factor = 0 THEN 1 ELSE 0 END AS iszero,
               CAST(CASE WHEN factor > 0 THEN round(ln(factor), 9)
                         ELSE 0 END AS DECIMAL(28,9)) AS lnr
        FROM f
    ),
    k AS (
        SELECT *,
               sum(lnr) OVER (ORDER BY duration_day) AS cum_ln,
               max(iszero) OVER (ORDER BY duration_day) AS zero_hit
        FROM l
    )
    SELECT duration_day, n_death, n_censored, n_risk,
           CASE WHEN zero_hit = 1 THEN 0.0
                ELSE round(exp(CAST(cum_ln AS DOUBLE)), 6) END AS km_survival
    FROM k ORDER BY duration_day
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes (Kaplan &
    Meier 1958 product-limit): duration = days between a user's first
    and last event; users whose last event falls within 7 days of the
    corpus horizon are right-CENSORED (still alive), everyone else is a
    death at their duration. Emits the life table (deaths, censored,
    at-risk) plus S(t) at each observed duration.

    Exactness: durations come from unix-microsecond integer division
    (sub-second-safe per the repo rule); each hazard factor 1 - d/n is
    a single division of integers; the product-limit is computed as
    exp(sum(ln(factor))) with every ln rounded to 9dp and DECIMAL-cast
    BEFORE the cumulative sum (the ml_logistic_irls pattern), so the
    accumulation is order-independent and the final exp sees a
    bit-identical scalar in both engines; factor = 0 (everyone at risk
    dies) short-circuits through an integer flag, never ln(0).

    Scale: one shuffle on user_id for the lifetime aggregate, a 1-row
    broadcast horizon, then a <=31-row life-table grid — the three
    cumulative windows run over that spec-bounded grid (declared
    GLOBAL_WIN, measured far under the 1024-row audit bound)."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    us = F.unix_micros(F.col("ts"))
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("first_us"), F.max(us).alias("last_us")
    )
    horizon = u.agg(F.max("last_us").alias("obs_end"))
    day_us = 86400000000
    d = u.crossJoin(F.broadcast(horizon)).select(
        F.expr(f"(last_us - first_us) div {day_us}").alias("duration_day"),
        F.when(
            F.col("last_us") >= F.col("obs_end") - F.lit(7 * day_us), 1
        )
        .otherwise(0)
        .alias("censored"),
    )
    g = d.groupBy("duration_day").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("n_death"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    w_suffix = Window.orderBy("duration_day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = g.select(
        "*",
        F.sum(F.col("n_death") + F.col("n_censored"))
        .over(w_suffix)
        .cast("long")
        .alias("n_risk"),
    )
    factor = F.when(F.col("n_death") >= F.col("n_risk"), F.lit(0.0)).otherwise(
        1.0 - F.col("n_death").cast("double") / F.col("n_risk")
    )
    l = r.select(
        "*",
        F.when(factor == 0, 1).otherwise(0).alias("iszero"),
        F.when(factor > 0, F.round(F.log(factor), 9))
        .otherwise(0)
        .cast("decimal(28,9)")
        .alias("lnr"),
    )
    w_prefix = Window.orderBy("duration_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = l.select(
        "*",
        F.sum("lnr").over(w_prefix).alias("cum_ln"),
        F.max("iszero").over(w_prefix).alias("zero_hit"),
    )
    return (
        k.select(
            "duration_day",
            "n_death",
            "n_censored",
            "n_risk",
            F.when(F.col("zero_hit") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("cum_ln").cast("double")), 6))
            .alias("km_survival"),
        )
        .coalesce(1)
        .sortWithinPartitions("duration_day")
    )


@register(
    "events_diff_in_diff",
    oracle="""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    cells AS (
        SELECT event_type,
               CASE WHEN CAST('0x' || substring(
                        md5('did:' || CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN epoch_us(ts) >=
                        (SELECT lo + (hi - lo) // 2 FROM span)
                    THEN 1 ELSE 0 END AS post,
               CAST(round(value, 2) AS DECIMAL(18,2)) AS v
        FROM events
    ),
    g AS (
        SELECT event_type, treated, post,
               CAST(count(*) AS BIGINT) AS n, sum(v) AS s
        FROM cells GROUP BY event_type, treated, post
    ),
    p AS (
        SELECT event_type,
               CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN n END)
                    AS BIGINT) AS n_t_pre,
               CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN n END)
                    AS BIGINT) AS n_t_post,
               CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN n END)
                    AS BIGINT) AS n_c_pre,
               CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN n END)
                    AS BIGINT) AS n_c_post,
               CAST(max(CASE WHEN treated = 1 AND post = 0 THEN s END)
                    AS DOUBLE)
                   / sum(CASE WHEN treated = 1 AND post = 0 THEN n END)
                   AS m_t_pre,
               CAST(max(CASE WHEN treated = 1 AND post = 1 THEN s END)
                    AS DOUBLE)
                   / sum(CASE WHEN treated = 1 AND post = 1 THEN n END)
                   AS m_t_post,
               CAST(max(CASE WHEN treated = 0 AND post = 0 THEN s END)
                    AS DOUBLE)
                   / sum(CASE WHEN treated = 0 AND post = 0 THEN n END)
                   AS m_c_pre,
               CAST(max(CASE WHEN treated = 0 AND post = 1 THEN s END)
                    AS DOUBLE)
                   / sum(CASE WHEN treated = 0 AND post = 1 THEN n END)
                   AS m_c_post
        FROM g GROUP BY event_type
    )
    SELECT event_type, n_t_pre, n_t_post, n_c_pre, n_c_post,
           round(m_t_pre, 6) AS mean_t_pre,
           round(m_t_post, 6) AS mean_t_post,
           round(m_c_pre, 6) AS mean_c_pre,
           round(m_c_post, 6) AS mean_c_post,
           round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)
               AS did_estimate
    FROM p ORDER BY event_type
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (the Card-Krueger two-period, two-group
    estimator): per event type, the treatment effect on mean event value
    is (treated_post - treated_pre) - (control_post - control_pre).
    Treatment assignment is the md5 hash split (never rand()); the
    pre/post boundary is the corpus-span midpoint in exact unix
    microseconds (sub-second rule).

    Exactness: cell sums accumulate DECIMAL(18,2) on 2dp-rounded values
    (order-independent), each cell mean is a single double division of
    the exact scalars, and the DiD contrast is three IEEE subtractions
    before the shared 6dp round.

    Scale: one scan; the (type, treated, post) grid map-side-combines
    into <=|types|*4 rows; the span boundary arrives as a 1-row
    broadcast (declared BNLJ); the per-type pivot is conditional
    aggregation on the tiny grid — no joins, no windows over data."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id", "ts", "value")
    us = F.unix_micros(F.col("ts"))
    span = ev.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    treated = (
        F.expr(
            "CAST(conv(substring(md5(concat('did:', CAST(user_id AS STRING))), "
            "1, 8), 16, 10) AS BIGINT) % 2"
        )
        == 0
    ).cast("int")
    cells = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        treated.alias("treated"),
        (us >= F.col("lo") + F.expr("(hi - lo) div 2")).cast("int").alias("post"),
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    g = cells.groupBy("event_type", "treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("v").alias("s")
    )

    def _n(t, p):
        return (
            F.sum(F.when((F.col("treated") == t) & (F.col("post") == p), F.col("n")))
            .cast("long")
        )

    def _m(t, p):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("s"))
        ).cast("double") / F.sum(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("n"))
        )

    p = g.groupBy("event_type").agg(
        _n(1, 0).alias("n_t_pre"),
        _n(1, 1).alias("n_t_post"),
        _n(0, 0).alias("n_c_pre"),
        _n(0, 1).alias("n_c_post"),
        _m(1, 0).alias("m_t_pre"),
        _m(1, 1).alias("m_t_post"),
        _m(0, 0).alias("m_c_pre"),
        _m(0, 1).alias("m_c_post"),
    )
    return (
        p.select(
            "event_type",
            "n_t_pre",
            "n_t_post",
            "n_c_pre",
            "n_c_post",
            F.round("m_t_pre", 6).alias("mean_t_pre"),
            F.round("m_t_post", 6).alias("mean_t_post"),
            F.round("m_c_pre", 6).alias("mean_c_pre"),
            F.round("m_c_post", 6).alias("mean_c_post"),
            F.round(
                (F.col("m_t_post") - F.col("m_t_pre"))
                - (F.col("m_c_post") - F.col("m_c_pre")),
                6,
            ).alias("did_estimate"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH ev AS (
        SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(round(value, 2) AS DECIMAL(18,2)) AS v
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id
    ),
    csize AS (
        SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY cohort_day
    ),
    cell AS (
        SELECT c.cohort_day,
               CAST(datediff('day', c.cohort_day, e.d) AS BIGINT)
                   AS day_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
               sum(e.v) AS rev
        FROM ev e JOIN cohort c ON e.user_id = c.user_id
        GROUP BY c.cohort_day, datediff('day', c.cohort_day, e.d)
    ),
    tri AS (
        SELECT l.cohort_day, l.day_offset, l.n_active, s.cohort_size,
               l.rev,
               sum(l.rev) OVER (
                   PARTITION BY l.cohort_day ORDER BY l.day_offset
               ) AS cum_rev
        FROM cell l JOIN csize s ON l.cohort_day = s.cohort_day
    )
    SELECT CAST(cohort_day AS DATE) AS cohort_day, day_offset, n_active,
           cohort_size,
           round(CAST(rev AS DOUBLE), 6) AS rev,
           round(CAST(cum_rev AS DOUBLE) / cohort_size, 6)
               AS cum_ltv_per_user
    FROM tri ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle — the revenue complement of the
    events_retention activity triangle: users cohorted by first-active
    day; each (cohort, day-offset) cell carries its active-user count
    and revenue, plus the running cumulative LTV per cohort user (the
    curve a growth team reads payback periods off).

    Exactness: revenue accumulates as DECIMAL(18,2) (2dp-rounded at
    ingest), the cumulative sum runs over exact DECIMALs (order-
    independent), and the only float ops are the final casts and one
    division by the integer cohort size.

    Scale: two user-keyed shuffles (cohort assignment, cell aggregate
    with map-side combine); the triangle itself is bounded by
    days x days (<=31x31 on this corpus, and by retention-window
    policy in production), so the cumulative window partitions by
    cohort over bounded rows; cohort sizes arrive as a <=31-row
    broadcast."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").alias("d"),
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    csize = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cell = (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d").cast("date"), F.col("cohort_day").cast("date"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.sum("v").alias("rev"),
        )
    )
    w = Window.partitionBy("cohort_day").orderBy("day_offset")
    tri = cell.join(F.broadcast(csize), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "cohort_size",
        "rev",
        F.sum("rev").over(w).alias("cum_rev"),
    )
    return (
        tri.select(
            F.col("cohort_day").cast("date").alias("cohort_day"),
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("rev").cast("double"), 6).alias("rev"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("cohort_size"), 6
            ).alias("cum_ltv_per_user"),
        )
        .coalesce(1)
        .sortWithinPartitions("cohort_day", "day_offset")
    )


@register(
    "events_srm_guardrail",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY user_id % 2
    ),
    tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n_total FROM arms),
    chi AS (
        SELECT CAST(sum(CAST(round(
                   (n_users - CAST(n_total AS DOUBLE) / 2)
                       * (n_users - CAST(n_total AS DOUBLE) / 2)
                       / (CAST(n_total AS DOUBLE) / 2), 9)
               AS DECIMAL(28,9))) AS DOUBLE) AS chi2
        FROM arms CROSS JOIN tot
    )
    SELECT arm, n_users, t.n_total,
           round(CAST(n_users AS DOUBLE) / t.n_total, 6) AS arm_frac,
           round(c.chi2, 6) AS chi2,
           CASE WHEN c.chi2 < 3.841459 THEN 1 ELSE 0 END AS srm_ok
    FROM arms CROSS JOIN tot t CROSS JOIN chi c
    ORDER BY arm
    """,
)
def events_srm_guardrail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (the experiment-trust check run
    before ANY A/B readout — Fabijan et al. 2019): chi-square test of
    the observed per-arm user counts against the designed 50/50 split
    for the same user_id % 2 assignment events_ab_test uses. A
    significant chi2 (df=1, alpha=.05 critical value 3.841459) means
    the experiment's randomization is broken and its lift numbers are
    untrustworthy.

    Exactness: counts are exact; each arm's chi-square part is built
    from single divisions of exact integers, rounded 9dp and
    DECIMAL-accumulated (order-independent two-term sum), one final
    cast back to double.

    Scale: one distinct-user aggregate (map-side partial on the
    (arm, user) pair), a 2-row arm table, two 1-row broadcast
    crossJoins (declared BNLJ)."""
    ev = table(spark, sf_dir, "events").select("user_id")
    arms = (
        ev.select((F.col("user_id") % 2).alias("arm"), "user_id")
        .groupBy("arm")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )
    tot = arms.agg(F.sum("n_users").cast("long").alias("n_total"))
    exp_half = F.col("n_total").cast("double") / 2
    chi = (
        arms.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("n_users") - exp_half)
                * (F.col("n_users") - exp_half)
                / exp_half,
                9,
            )
            .cast("decimal(28,9)")
            .alias("part")
        )
        .agg(F.sum("part").cast("double").alias("chi2"))
    )
    return (
        arms.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "arm",
            "n_users",
            "n_total",
            F.round(
                F.col("n_users").cast("double") / F.col("n_total"), 6
            ).alias("arm_frac"),
            F.round("chi2", 6).alias("chi2"),
            F.when(F.col("chi2") < 3.841459, 1).otherwise(0).alias("srm_ok"),
        )
        .coalesce(1)
        .sortWithinPartitions("arm")
    )


@register(
    "events_power_mde",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS sv,
               sum(CAST(round(value, 2) AS DECIMAL(18,2))
                   * CAST(round(value, 2) AS DECIMAL(18,2))) AS sv2
        FROM events GROUP BY event_type
    ),
    v AS (
        SELECT event_type, n,
               CAST(sv AS DOUBLE) / n AS mean_v,
               (CAST(sv2 AS DOUBLE)
                - (CAST(sv AS DOUBLE) / n) * CAST(sv AS DOUBLE))
                   / (n - 1) AS var_v
        FROM s
    )
    SELECT event_type, n,
           floor(mean_v * 1000000.0 + 0.5) / 1000000.0 AS mean_v,
           floor(var_v * 1000000.0 + 0.5) / 1000000.0 AS var_v,
           floor(sqrt(7.848887 * 2.0 * var_v / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS mde_abs,
           floor(sqrt(7.848887 * 2.0 * var_v / n)
                 / mean_v * 1000000.0 + 0.5) / 1000000.0 AS mde_rel,
           CAST(ceil(7.848887 * 2.0 * var_v
                     / ((0.05 * mean_v) * (0.05 * mean_v))) AS BIGINT)
               AS n_per_arm_for_5pct
    FROM v ORDER BY event_type
    """,
)
def events_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis per event type — the design step run
    BEFORE an A/B test: with the observed value variance, (a) the
    minimum detectable effect at the current sample size and (b) the
    per-arm sample size needed to detect a 5% lift, both at the
    standard alpha=.05 / power=.8 operating point ((z_.975 + z_.8)^2 =
    7.848887, the constant in every power calculator).

    Exactness: sums and sums-of-squares accumulate DECIMAL(18,2)/(38,4)
    exactly (order-independent); mean and variance are assembled from
    the exact scalars with single IEEE divisions; sqrt is IEEE-exact;
    the identical expression tree runs in both engines.

    Scale: one scan, one map-side-combined aggregate to <=|types|
    rows; everything after is per-row arithmetic on the tiny grid."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    vdec = F.round("value", 2).cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(vdec).alias("sv"),
        F.sum(vdec * vdec).alias("sv2"),
    )
    mean_v = F.col("sv").cast("double") / F.col("n")
    var_v = (
        F.col("sv2").cast("double") - mean_v * F.col("sv").cast("double")
    ) / (F.col("n") - 1)
    v = s.select("event_type", "n", mean_v.alias("mean_v"), var_v.alias("var_v"))
    zsq2 = F.lit(7.848887) * F.lit(2.0)
    mde = F.sqrt(zsq2 * F.col("var_v") / F.col("n"))
    delta = F.lit(0.05) * F.col("mean_v")
    return (
        v.select(
            "event_type",
            "n",
            # round6: mean/var are exact-moment integer ratios — the
            # tie-capable class (catalog.round6, driver-r9 flake)
            round6(F.col("mean_v")).alias("mean_v"),
            round6(F.col("var_v")).alias("var_v"),
            round6(mde).alias("mde_abs"),
            round6(mde / F.col("mean_v")).alias("mde_rel"),
            F.ceil(zsq2 * F.col("var_v") / (delta * delta))
            .cast("long")
            .alias("n_per_arm_for_5pct"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_top_paths",
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               event_type,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                   ORDER BY epoch_us(ts), event_id
               ) AS rn,
               count(*) OVER (
                   PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
               ) AS n_in_sess
        FROM events
    ),
    sess AS (
        SELECT user_id, d,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 3 AND n_in_sess >= 3
        GROUP BY user_id, d
    ),
    paths AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM sess GROUP BY path
    ),
    tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS n_total FROM paths)
    SELECT path, n_sessions,
           round(CAST(n_sessions AS DOUBLE) / t.n_total, 6) AS sess_frac
    FROM paths CROSS JOIN tot t
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the ten most common opening 3-step
    event-type paths across user-day sessions (sessions with >=3
    events), with each path's share — the entry-path report behind
    every product-analytics "user flows" view (the frequency
    complement of events_markov_stationary's transition matrix).

    Determinism: within-session order breaks timestamp ties on
    event_id; the path string concatenates in rank order on both
    engines; top-10 ties break on the path string.

    Scale: one shuffle on (user, day) serves both windows and the
    path aggregation (same partitioning); paths fold map-side into a
    <=|types|^3 = 125-key space before the bounded top-10
    (TakeOrderedAndProject); the total arrives via a declared 1-row
    broadcast."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    d = F.date_trunc("day", "ts")
    w_rn = Window.partitionBy("user_id", d).orderBy(
        F.unix_micros(F.col("ts")), "event_id"
    )
    w_n = Window.partitionBy("user_id", d)
    ranked = ev.select(
        "user_id",
        d.alias("d"),
        "event_type",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n_in_sess"),
    )
    sess = (
        ranked.filter((F.col("rn") <= 3) & (F.col("n_in_sess") >= 3))
        .groupBy("user_id", "d")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    # contract to the <=|types|^3 path space ONCE (localCheckpoint —
    # otherwise the 1-row total re-evaluates the whole session subtree,
    # doubling the corpus scan)
    paths = (
        sess.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    tot = paths.agg(F.sum("n_sessions").cast("long").alias("n_total"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / F.col("n_total"), 6
            ).alias("sess_frac"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@register(
    "events_inter_arrival",
    oracle="""
    WITH d AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
               ) AS gap
        FROM events
    ),
    g AS (SELECT event_type, gap FROM d WHERE gap IS NOT NULL),
    a AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS s1,
               CAST(sum(CAST(gap AS DECIMAL(38,0)) * gap) AS DECIMAL(38,0))
                   AS s2,
               quantile_cont(gap, 0.5) AS med
        FROM g GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           floor(CAST(s1 AS DOUBLE) / n_gaps / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_sec,
           floor(med / 1000000.0 * 1000000.0 + 0.5) / 1000000.0
               AS median_gap_sec,
           round(CAST(n_gaps AS DOUBLE) * 3600000000.0 / s1, 6)
               AS rate_per_hour,
           CASE WHEN n_gaps >= 2 THEN
               round(sqrt((CAST(s2 AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / n_gaps) * CAST(s1 AS DOUBLE))
                          / (n_gaps - 1))
                     / (CAST(s1 AS DOUBLE) / n_gaps), 6)
           ELSE NULL END AS cv
    FROM a ORDER BY event_type
    """,
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival (point-process) profile per event type: the gaps
    between a user's consecutive events of the same type, summarized as
    mean/median gap, arrival rate per hour, and the coefficient of
    variation — the CV ~ 1 / CV > 1 / CV < 1 reading (Poisson vs bursty
    vs regular) is the standard first diagnostic on an event stream.

    Exactness: gaps are exact unix-microsecond integer differences
    (sub-second rule); moment sums accumulate BIGINT / DECIMAL(38,0)
    (gap^2 exceeds BIGINT); the median interpolates the two middle
    integers identically in both engines (Spark percentile vs DuckDB
    quantile_cont, same (n-1)*q positional formula); every float op
    runs on exact scalars in the same order.

    Scale: one shuffle on (user, event_type) shared by the lag window;
    the summary map-side-combines to <=|types| rows. The exact median
    is per-(type) over gap values — at 100 TB swap for
    approx_percentile or a fixed-width gap histogram; the moments and
    rate columns are already single-pass."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", "event_type").orderBy(us, "event_id")
    g = (
        ev.select("event_type", (us - F.lag(us).over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    a = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s1"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap")).alias("s2"),
        F.expr("percentile(gap, 0.5)").alias("med"),
    )
    mean_us = F.col("s1").cast("double") / F.col("n_gaps")
    var_us = (
        F.col("s2").cast("double") - mean_us * F.col("s1").cast("double")
    ) / (F.col("n_gaps") - 1)
    return (
        a.select(
            "event_type",
            "n_gaps",
            # round6, not round(.,6): mean/median of integer µs can hit
            # an exact half-µs tie (even counts) where the two engines'
            # round() implementations diverge per-ulp (driver r9 flake
            # class — see catalog.round6)
            round6(mean_us / 1000000.0).alias("mean_gap_sec"),
            round6(F.col("med") / 1000000.0).alias("median_gap_sec"),
            F.round(
                F.col("n_gaps").cast("double") * 3600000000.0 / F.col("s1"),
                6,
            ).alias("rate_per_hour"),
            # n_gaps == 1 makes the sample variance 0/0 — double
            # div-by-zero is exactly the cross-engine divergence the
            # oracle-parity rules require excluding EXACTLY (ADVICE r8),
            # so the singleton case is an explicit NULL in both engines
            F.when(
                F.col("n_gaps") >= 2, F.round(F.sqrt(var_us) / mean_us, 6)
            ).alias("cv"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


def _holt_oracle(rounds: int = 45) -> str:
    """Unrolled Holt recursion: r{i} carries one (l, b) row per event
    type; each round consumes the day at index i if that type has one
    (CASE carries the state unchanged past the type's last day). Every
    CTE is MATERIALIZED (the DuckDB plain-CTE inlining rule)."""
    sql = """
    WITH daily AS MATERIALIZED (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
                   AS y
        FROM events GROUP BY event_type, date_trunc('day', CAST(ts AS TIMESTAMP))
    ),
    idx AS MATERIALIZED (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
                   AS i,
               count(*) OVER (PARTITION BY event_type) AS t_days
        FROM daily
    ),
    r1 AS MATERIALIZED (
        SELECT a.event_type, a.t_days,
               a.y AS l, b.y - a.y AS b
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type AND a.i = 0 AND b.i = 1
    )"""
    for i in range(2, rounds + 1):
        p = i - 1
        sql += f""",
    r{i} AS MATERIALIZED (
        SELECT r.event_type, r.t_days,
               CASE WHEN d.y IS NULL THEN r.l
                    ELSE 0.5 * d.y + 0.5 * (r.l + r.b) END AS l,
               CASE WHEN d.y IS NULL THEN r.b
                    ELSE 0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l)
                         + 0.5 * r.b END AS b
        FROM r{p} r LEFT JOIN idx d
          ON d.event_type = r.event_type AND d.i = {i}
    )"""
    sql += f"""
    SELECT r.event_type,
           CASE WHEN r.t_days > {rounds + 1}
                THEN CAST(error('events_forecast_holt: corpus day span '
                                || r.t_days || ' exceeds the oracle unroll '
                                || '{rounds + 1}') AS BIGINT)
                ELSE CAST(r.t_days AS BIGINT) END AS t_days,
           CAST(h AS BIGINT) AS h,
           round(r.l, 6) AS level,
           round(r.b, 6) AS trend,
           round(r.l + h * r.b, 6) AS forecast
    FROM r{rounds} r CROSS JOIN (
        SELECT unnest(range(1, 8)) AS h
    )
    ORDER BY r.event_type, h
    """
    return sql


@register("events_forecast_holt", oracle=_holt_oracle())
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend forecast (double exponential smoothing,
    alpha=beta=1/2) of daily event volume per type, with a 7-day
    horizon: l_t = a*y_t + (1-a)(l_{t-1}+b_{t-1}),
    b_t = B(l_t-l_{t-1}) + (1-B)b_{t-1}, init l_0=y_0, b_0=y_1-y_0 —
    the trend-capable complement of events_forecast_ses (whose SES
    recursion admits a closed form; Holt's does not, so this op keeps
    the true recursion).

    Determinism: daily totals are exact scalars (DECIMAL sums cast to
    double); a=B=1/2 makes every smoothing step a halving (exponent
    shift — exact) plus additions evaluated in the SAME sequential
    order in both engines: Spark folds the per-type day array with an
    aggregate() lambda, the oracle unrolls the identical recursion one
    MATERIALIZED CTE per day — bit-identical trajectories, 6dp rounds
    only at the output.

    Scale: one map-side-combined daily aggregate (the only data
    shuffle); the fold runs over each type's <=45-element day array in
    a single projection — no per-round joins, no iteration state
    outside the row. At 100 TB the day-grid stays calendar-bounded, so
    the fold's work is constant per type."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    ).filter(
        # symmetric with the oracle, which drops single-day types via
        # r1's inner join on i=0/i=1 — before this guard Spark emitted
        # them with NULL trend (latent parity break, ADVICE r8); Holt
        # needs two points to initialize the trend anyway
        F.size("ys") >= 2
    )
    # fold the recursion over days 2..T-1; accumulator = struct(l, b)
    new_l = "0.5D * y + 0.5D * (acc.l + acc.b)"
    holt = series.select(
        "event_type",
        # fail LOUDLY (both engines — oracle uses error()) if the corpus
        # day span outgrows the oracle's 45-round unroll: a truncated
        # recursion would otherwise diverge silently (ADVICE r8)
        F.when(
            F.size("ys") <= 46, F.size("ys").cast("long")
        ).otherwise(
            F.expr(
                "raise_error(concat('events_forecast_holt: corpus day "
                "span ', size(ys), ' exceeds the oracle unroll 46'))"
            ).cast("long")
        ).alias("t_days"),
        F.expr(
            f"""aggregate(
                slice(ys, 3, greatest(size(ys) - 2, 0)),
                named_struct('l', ys[0], 'b', ys[1] - ys[0]),
                (acc, y) -> named_struct(
                    'l', {new_l},
                    'b', 0.5D * (({new_l}) - acc.l) + 0.5D * acc.b))"""
        ).alias("st"),
    )
    return (
        holt.select(
            "event_type",
            "t_days",
            F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
        )
        .select(
            "event_type",
            "t_days",
            F.col("h").cast("long").alias("h"),
            F.round("l", 6).alias("level"),
            F.round("b", 6).alias("trend"),
            F.round(F.col("l") + F.col("h") * F.col("b"), 6).alias("forecast"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type", "h")
    )


@register(
    "events_cuped_adjust",
    oracle="""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    per_user AS (
        SELECT event_type, user_id,
               sum(CASE WHEN epoch_us(ts) <
                            (SELECT lo + (hi - lo) // 2 FROM span)
                        THEN CAST(round(value, 2) AS DECIMAL(18,2))
                        ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS pre,
               sum(CASE WHEN epoch_us(ts) >=
                            (SELECT lo + (hi - lo) // 2 FROM span)
                        THEN CAST(round(value, 2) AS DECIMAL(18,2))
                        ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS post
        FROM events GROUP BY event_type, user_id
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pre) AS DOUBLE) AS sx,
               CAST(sum(post) AS DOUBLE) AS sy,
               CAST(sum(pre * pre) AS DOUBLE) AS sxx,
               CAST(sum(post * post) AS DOUBLE) AS syy,
               CAST(sum(pre * post) AS DOUBLE) AS sxy
        FROM per_user GROUP BY event_type
    ),
    v AS (
        SELECT event_type, n,
               (sxx - sx / n * sx) / (n - 1) AS var_pre,
               (syy - sy / n * sy) / (n - 1) AS var_post,
               (sxy - sx / n * sy) / (n - 1) AS cov
        FROM m
    )
    SELECT event_type, n,
           round(var_post, 6) AS var_post,
           round(cov / var_pre, 6) AS theta,
           round(var_post - cov / var_pre * cov, 6) AS var_adjusted,
           round(cov / var_pre * cov / var_post, 6) AS variance_reduction
    FROM v ORDER BY event_type
    """,
)
def events_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    — the industry-standard pre-experiment covariate adjustment: with
    per-user pre-period value X and post-period value Y, the adjusted
    metric Y - theta*(X - mean(X)) with theta = cov(X,Y)/var(X) has
    variance var(Y) - cov^2/var(X), cutting the sample size an A/B
    test needs by exactly the reported reduction fraction (cov^2/
    (var_pre*var_post) = rho^2). Pre/post split at the corpus-span
    microsecond midpoint (the events_diff_in_diff boundary).

    Exactness: the five moment sums accumulate exact DECIMALs per
    user; variances/covariance are assembled from those exact scalars
    with identically ordered IEEE ops; thetas and reductions are
    single divisions.

    Scale: one per-user shuffle (map-side combined), then a <=|types|
    moment grid; the span boundary is the declared 1-row broadcast.
    Nothing quadratic anywhere."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id", "ts", "value")
    us = F.unix_micros(F.col("ts"))
    span = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    vdec = F.round("value", 2).cast("decimal(18,2)")
    zero = F.lit("0.00").cast("decimal(18,2)")
    cells = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        "user_id",
        F.when(
            us < F.col("lo") + F.expr("(hi - lo) div 2"), vdec
        )
        .otherwise(zero)
        .alias("prev"),
        F.when(
            us >= F.col("lo") + F.expr("(hi - lo) div 2"), vdec
        )
        .otherwise(zero)
        .alias("postv"),
    )
    per_user = cells.groupBy("event_type", "user_id").agg(
        F.sum("prev").alias("pre"), F.sum("postv").alias("post")
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre").cast("double").alias("sx"),
        F.sum("post").cast("double").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).cast("double").alias("sxx"),
        F.sum(F.col("post") * F.col("post")).cast("double").alias("syy"),
        F.sum(F.col("pre") * F.col("post")).cast("double").alias("sxy"),
    )
    nd = F.col("n")
    var_pre = (F.col("sxx") - F.col("sx") / nd * F.col("sx")) / (nd - 1)
    var_post = (F.col("syy") - F.col("sy") / nd * F.col("sy")) / (nd - 1)
    cov = (F.col("sxy") - F.col("sx") / nd * F.col("sy")) / (nd - 1)
    v = m.select(
        "event_type",
        "n",
        var_pre.alias("var_pre"),
        var_post.alias("var_post"),
        cov.alias("cov"),
    )
    return (
        v.select(
            "event_type",
            "n",
            F.round("var_post", 6).alias("var_post"),
            F.round(F.col("cov") / F.col("var_pre"), 6).alias("theta"),
            F.round(
                F.col("var_post") - F.col("cov") / F.col("var_pre") * F.col("cov"),
                6,
            ).alias("var_adjusted"),
            F.round(
                F.col("cov") / F.col("var_pre") * F.col("cov") / F.col("var_post"),
                6,
            ).alias("variance_reduction"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type")
    )


@register(
    "events_funnel_windowed",
    oracle="""
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > v.t_view
          AND epoch_us(e.ts) - v.t_view <= 86400000000
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > c.t_click
          AND epoch_us(e.ts) - c.t_click <= 86400000000
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage,
               (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_users
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click_within_24h',
               (SELECT CAST(count(*) AS BIGINT) FROM c)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase_within_24h',
               (SELECT CAST(count(*) AS BIGINT) FROM p)
    )
    SELECT step, stage, n_users,
           floor(CAST(n_users AS DOUBLE)
                 / max(n_users) OVER ()
                 * 1000000.0 + 0.5) / 1000000.0 AS frac_of_top,
           floor(CAST(n_users AS DOUBLE)
                 / lag(n_users, 1, n_users) OVER (ORDER BY step)
                 * 1000000.0 + 0.5) / 1000000.0 AS step_conversion
    FROM stages ORDER BY step
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERSION-WINDOW funnel (the Amplitude/Mixpanel semantics):
    view -> click -> purchase where each step must land STRICTLY after
    and within 24 HOURS of the previous step's first occurrence (strict
    > lower bound matching events_funnel, so windowed-is-a-subset holds
    by construction — ADVICE r10) — unlike events_funnel,
    whose steps are unbounded-in-time (at the gate SF: 150 -> 60 -> 25
    users windowed vs 150 -> 150 -> 150 unbounded — the window binds hard). A user who clicks a week after
    viewing counts there but not here; the windowed form is what
    product funnels actually report, and the gap between the two keys
    IS the abandonment-latency signal.

    Exactness: step times are exact min() microsecond integers
    (sub-second rule — the 24-hour bound compares exact µs differences,
    never second-truncated casts); stage fractions are integer ratios
    rounded via catalog.round6 (the driver-r9 tie class).

    Scale: three user-keyed min-aggregates chained by equi-joins — each
    stage shrinks the key set, so the joins get cheaper as the funnel
    deepens; the final 3-row ranking is driver-free. At 100 TB this is
    the same plan with the user-keyed shuffles co-partitioned."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    win_us = 86_400_000_000  # 24h: binding at every SF (1h is degenerate
    # at sf0.001 — 0 step-3 users — on this sparse synthetic corpus)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") > F.col("t_view"))
            & (F.col("us") - F.col("t_view") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("t_click"))
            & (F.col("us") - F.col("t_click") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )

    def stage(step, name, df):
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).cast("long").alias("step"),
            F.lit(name).alias("stage"),
            "n_users",
        )

    stages = (
        stage(1, "view", v)
        .unionAll(stage(2, "click_within_24h", c))
        .unionAll(stage(3, "purchase_within_24h", p))
    )
    w_all = Window.partitionBy()
    w_lag = Window.orderBy("step")
    return (
        stages.select(
            "step",
            "stage",
            "n_users",
            round6(
                F.col("n_users").cast("double") / F.max("n_users").over(w_all)
            ).alias("frac_of_top"),
            round6(
                F.col("n_users").cast("double")
                / F.coalesce(
                    F.lag("n_users", 1).over(w_lag), F.col("n_users")
                ).cast("double")
            ).alias("step_conversion"),
        )
        .coalesce(1)
        .sortWithinPartitions("step")
    )


def _holt_winters_oracle(rounds: int = 45, m: int = 7) -> str:
    """Unrolled additive Holt-Winters recursion (alpha=beta=gamma=1/2,
    season m=7 over the OBSERVATION grid): init CTE pivots the first 14
    daily values per event type into explicit columns so the level/trend
    seeds are built with the SAME left-to-right addition order Spark
    uses; each round r{t} consumes observation index t (state carried
    unchanged past a type's last day — the events_forecast_holt
    pattern), updating the one seasonal slot t%m, which is static per
    round. Every CTE MATERIALIZED (DuckDB plain-CTE inlining rule)."""
    y = [f"y{j}" for j in range(2 * m)]
    piv = ",\n               ".join(
        f"max(CASE WHEN i = {j} THEN y END) AS y{j}" for j in range(2 * m)
    )
    w1 = "(" + " + ".join(y[:m]) + f") / {m}.0"
    w2 = "(" + " + ".join(y[m : 2 * m]) + f") / {m}.0"
    seas = ",\n               ".join(f"y{j} - {w1} AS s{j}" for j in range(m))
    sql = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
                   AS y
        FROM events GROUP BY 1, 2
    ),
    idx AS MATERIALIZED (
        SELECT event_type, y,
               row_number() OVER (PARTITION BY event_type ORDER BY d) - 1
                   AS i,
               count(*) OVER (PARTITION BY event_type) AS t_days
        FROM daily
    ),
    init AS MATERIALIZED (
        SELECT event_type, max(t_days) AS t_days,
               {piv}
        FROM idx GROUP BY event_type HAVING count(*) >= {2 * m + 1}
    ),
    r{m - 1} AS MATERIALIZED (
        SELECT event_type, t_days,
               {w1} AS l,
               ({w2} - {w1}) / {m}.0 AS b,
               {seas}
        FROM init
    )"""
    for t in range(m, rounds):
        p = t - 1
        slot = t % m
        lnew = f"0.5 * (d.y - r.s{slot}) + 0.5 * (r.l + r.b)"
        scols = ",\n               ".join(
            f"""CASE WHEN d.y IS NULL THEN r.s{j}
                    ELSE 0.5 * (d.y - ({lnew})) + 0.5 * r.s{j} END AS s{j}"""
            if j == slot
            else f"r.s{j} AS s{j}"
            for j in range(m)
        )
        sql += f""",
    r{t} AS MATERIALIZED (
        SELECT r.event_type, r.t_days,
               CASE WHEN d.y IS NULL THEN r.l ELSE {lnew} END AS l,
               CASE WHEN d.y IS NULL THEN r.b
                    ELSE 0.5 * (({lnew}) - r.l) + 0.5 * r.b END AS b,
               {scols}
        FROM r{p} r LEFT JOIN idx d
          ON d.event_type = r.event_type AND d.i = {t}
    )"""
    scase = " ".join(
        f"WHEN {j} THEN s{j}" for j in range(m)
    )
    sql += f"""
    SELECT r.event_type,
           CASE WHEN r.t_days > {rounds}
                THEN CAST(error('events_forecast_holt_winters: corpus day '
                                || 'span ' || r.t_days
                                || ' exceeds the oracle unroll {rounds}')
                     AS BIGINT)
                ELSE CAST(r.t_days AS BIGINT) END AS t_days,
           CAST(h AS BIGINT) AS h,
           round(r.l, 6) AS level,
           round(r.b, 6) AS trend,
           round(CASE ((r.t_days + h - 1) % {m}) {scase} END, 6) AS seasonal,
           round(r.l + h * r.b
                 + CASE ((r.t_days + h - 1) % {m}) {scase} END, 6)
               AS forecast
    FROM r{rounds - 1} r CROSS JOIN (
        SELECT unnest(range(1, {m + 1})) AS h
    )
    ORDER BY r.event_type, h
    """
    return sql


@register("events_forecast_holt_winters", oracle=_holt_winters_oracle())
def events_forecast_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing,
    alpha=beta=gamma=1/2, season m=7 over the observation grid) of daily
    event volume per type with a one-season horizon — completes the
    SES → Holt → Holt-Winters forecasting ladder (VERDICT r10 item 5):
    l_t = a*(y_t - s_{t-m}) + (1-a)(l_{t-1}+b_{t-1});
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1};
    s_t = G*(y_t - l_t) + (1-G)*s_{t-m};
    seeds l = mean(week1), b = (mean(week2)-mean(week1))/7,
    s_j = y_j - mean(week1); the recursion then consumes observations
    7..T-1 (the second seed week is re-smoothed — documented choice,
    replicated exactly in the oracle).

    Determinism: daily totals are exact scalars (DECIMAL sums cast to
    double); every smoothing step is halvings + additions and the two
    seed means are single /7 divisions, all evaluated in the SAME
    textual order in both engines — Spark folds each type's day array
    with one aggregate() lambda, the oracle unrolls the identical
    recursion one MATERIALIZED CTE per observation; 6dp rounds only at
    the output, and both engines fail LOUDLY past the 45-round unroll.

    Scale: one map-side-combined daily aggregate is the only data
    shuffle; the fold is a constant-work projection per type (the
    calendar bounds the array), so a million series cost one pass —
    the events_forecast_holt scale story with per-slot seasonal state
    riding in a 7-element array column."""
    m = 7
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "y"))),
                lambda s: s["y"],
            ).alias("ys")
        )
        .filter(F.size("ys") >= 2 * m + 1)
    )
    w1 = "(" + " + ".join(f"ys[{j}]" for j in range(m)) + f") / {m}.0D"
    w2 = "(" + " + ".join(f"ys[{j}]" for j in range(m, 2 * m)) + f") / {m}.0D"
    seed_s = ", ".join(f"ys[{j}] - {w1}" for j in range(m))
    lnew = (
        "0.5D * (y - element_at(acc.s, (acc.t % 7) + 1)) "
        "+ 0.5D * (acc.l + acc.b)"
    )
    hw = series.select(
        "event_type",
        F.when(
            F.size("ys") <= 45, F.size("ys").cast("long")
        ).otherwise(
            F.expr(
                "raise_error(concat('events_forecast_holt_winters: corpus "
                "day span ', size(ys), ' exceeds the oracle unroll 45'))"
            ).cast("long")
        ).alias("t_days"),
        F.expr(
            f"""aggregate(
                slice(ys, {m + 1}, greatest(size(ys) - {m}, 0)),
                named_struct(
                    'l', {w1},
                    'b', ({w2} - {w1}) / {m}.0D,
                    's', array({seed_s}),
                    't', {m}),
                (acc, y) -> named_struct(
                    'l', {lnew},
                    'b', 0.5D * (({lnew}) - acc.l) + 0.5D * acc.b,
                    's', transform(acc.s, (x, j) ->
                        IF(j = acc.t % 7,
                           0.5D * (y - ({lnew})) + 0.5D * x, x)),
                    't', acc.t + 1))"""
        ).alias("st"),
    )
    seasonal = F.element_at(
        F.col("st.s"), ((F.col("t_days") + F.col("h") - 1) % m + 1).cast("int")
    )
    return (
        hw.select(
            "event_type",
            "t_days",
            F.explode(F.sequence(F.lit(1), F.lit(m))).alias("h"),
            "st",
        )
        .select(
            "event_type",
            "t_days",
            F.col("h").cast("long").alias("h"),
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(
                F.col("st.l") + F.col("h") * F.col("st.b") + seasonal, 6
            ).alias("forecast"),
        )
        .coalesce(1)
        .sortWithinPartitions("event_type", "h")
    )
