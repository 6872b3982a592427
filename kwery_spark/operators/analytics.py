"""Event analytics composites: funnel and cohort retention — the two
workhorse product-analytics shapes, each as one declarative plan over the
event stream.

Scale notes: both are user-keyed — every shuffle is on user_id (or the
derived cohort day), so they partition to any corpus size; no sessionful
state, no driver logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
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
