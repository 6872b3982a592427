"""Event-time windowing over the ``events`` stream (SURVEY.md §2.9).

Each operator is registered in its BATCH-semantics form (same
window()/session_window() expressions Structured Streaming uses — the
code is literally what you'd put after ``spark.readStream``), which makes
it oracle-checkable. True streaming execution of the same plans (file
source, availableNow trigger, watermarks, state store) lives in
``streaming/live.py`` and is equivalence-tested in tests/test_streaming.py.

Scale notes: windowed aggregation shuffles on (window, key) — at 100 TB
the tumbling form carries one state row per (window,key); sliding ×
(length/slide); session windows merge in the state store keyed by user.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import round6, table
from kwery_spark.registry import register


@register(
    "stream_tumbling",
    oracle="""
    SELECT
        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        event_type,
        count(*) AS n_events,
        sum(value) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type.

    Batch form buckets on integer-floored unix microseconds — for
    tumbling windows the assignment is identical to
    F.window('1 hour').start and to date_trunc('hour'), but skips both
    the per-row (start, end) struct construction AND date_trunc's
    calendar path: measured at sf10 (6M events, warm best-of-3)
    0.455 s (floor) vs 0.556 s (date_trunc) vs 0.759 s (window struct),
    bit-identical outputs (r8 decomposition: scan+decode is 0.199 s of
    the total, the rest is the 6M-row hash aggregate that map-side
    combines to 3.6k groups). The floor form is also tz-robust: it
    truncates the raw UTC microseconds exactly like the naive DuckDB
    oracle, independent of the session timezone. The streaming family
    (stream_watermark and friends) keeps the real F.window operator —
    this key's batch twin only needs its semantics.

    total_value deliberately stays a DOUBLE sum while the non-headline
    value-summing keys moved to exact DECIMAL(18,2) sums (r10): the
    decimal agg measured +55% on this HEADLINE key (0.31 vs 0.48 s
    fresh-process best-of-3 at sf10), and the residual cross-engine
    sum-order risk is ~1e-5 per run here (per-group sums of a few
    hundred 2-dec values, compared at 6 significant digits — relative
    error ~2e-15 vs 1e-6 rendering granularity)."""
    us = F.unix_micros(F.col("ts"))
    hour = F.timestamp_micros(
        F.floor(us / 3_600_000_000).cast("long") * 3_600_000_000
    )
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            hour.alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT
        CAST(time_bucket(INTERVAL 15 MINUTES, ts) - k.k * INTERVAL 15 MINUTES
             AS TIMESTAMP) AS window_start,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 15-minute slide — every event lands
    in exactly 4 windows (oracle replicates via a 4-way offset expansion,
    which is also precisely what Spark's Expand operator generates)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@register(
    "stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTES
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTES AS TIMESTAMP) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: per-user sessions closed by a 30-minute gap.
    session_window end = last event + gap (matched by the oracle's
    gaps-and-islands formulation)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_unique_events
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup by event_id: the input is doubled (union all with
    itself — simulating at-least-once delivery), then dropDuplicates
    restores exactly-once counts. Streaming twin:
    dropDuplicatesWithinWatermark (see streaming/live.py)."""
    ev = table(spark, sf_dir, "events")
    redelivered = ev.unionAll(ev)
    return (
        redelivered.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, e.event_type, count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events joined to the customer dimension.
    In streaming this is a per-micro-batch broadcast lookup — the static
    side never holds state."""
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    return (
        ev.join(c, ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"))
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id, count(*) AS n_view_purchase_pairs
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: views matched to purchases by the same
    user within the following hour. In streaming both sides are watermarked
    and the time-range bound lets Spark expire join state; in batch it is
    an equi-join on user_id with a range residual (hash-joinable)."""
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_view_purchase_pairs"))
    )


@register(
    "stream_rollup_hypertable",
    oracle="""
    SELECT
        CASE WHEN grouping(m) = 0 THEN 'minute'
             WHEN grouping(h) = 0 THEN 'hour'
             ELSE 'day' END AS level,
        CAST(coalesce(m, h, d) AS TIMESTAMP) AS bucket_ts,
        event_type,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
    FROM (
        SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               event_type, value
        FROM events
    )
    GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
    """,
)
def stream_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: minute, hour, and day
    pre-aggregations of the event stream in ONE grouping-sets pass (one
    scan, one shuffle — Spark's Expand feeds all three granularities from
    the same partial aggregates). This is the batch form of the standard
    timeseries downsampling hierarchy; incremental maintenance is the
    stream_tumbling pipeline per level. The level tag derives from
    grouping() markers, identical in both engines.
    """
    ev = table(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("minute", "ts").alias("m"),
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "event_type",
        "value",
    ).createOrReplaceTempView("__hyper_src")
    return spark.sql(
        """
        SELECT
            CASE WHEN grouping(m) = 0 THEN 'minute'
                 WHEN grouping(h) = 0 THEN 'hour'
                 ELSE 'day' END AS level,
            coalesce(m, h, d) AS bucket_ts,
            event_type,
            count(*) AS n_events,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
        FROM __hyper_src
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type), (d, event_type))
        """
    )


@register(
    "stream_asof_join",
    oracle="""
    WITH tagged AS (
        SELECT user_id, epoch_us(ts) AS us, 0 AS tag, NULL AS pt
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, epoch_us(ts) AS us, 1 AS tag,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS pt
        FROM events WHERE event_type = 'purchase'
    ),
    carried AS (
        SELECT *,
               max(CASE WHEN tag = 0 THEN us END) OVER (
                   PARTITION BY user_id ORDER BY us, tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_view_us
        FROM tagged
    ),
    p AS (SELECT * FROM carried WHERE tag = 1)
    SELECT CAST(pt AS TIMESTAMP) AS purchase_hour,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(last_view_us) AS BIGINT) AS n_matched,
           coalesce(
               floor(CAST(CAST(sum(us - last_view_us) AS BIGINT) AS DOUBLE)
                     / count(last_view_us) / 1000000.0 * 1000000.0 + 0.5)
                   / 1000000.0,
               -1.0) AS avg_lag_sec
    FROM p GROUP BY pt
    """,
)
def stream_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of enrichment: every purchase picks up the SAME
    user's most recent view at-or-before it — the latest-state lookup
    that in Structured Streaming runs as a keyed state store holding
    one row per user (update on view, emit-enriched on purchase),
    here in its oracle-checkable batch form. Emits the per-hour
    view-to-purchase lag profile.

    Single-shuffle formulation (the join_asof_nearest idiom): views
    and purchases union with a tag, one window per user carries the
    running max view timestamp forward (views sort before purchases
    at equal timestamps, so an exactly-simultaneous view matches), and
    NO join node exists in the plan. Lags are exact microsecond
    integers (sub-second rule); the average is two float divisions on
    the exact scalars, identical in both engines, rounded via the
    IEEE-exact catalog.round6 formula — plain round(x, 6) flaked in
    driver round 9 because per-hour match counts are small enough for
    sum/count to land on an exact half-microsecond tie, where Spark's
    BigDecimal rounding and DuckDB's std::round disagree per-ulp.

    Scale: one shuffle on user_id, then a map-side-combined rollup to
    <=|hours| rows. The streaming deployment needs only O(|users|)
    state — the same bound the window's running max implies."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    us = F.unix_micros(F.col("ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", us.alias("us"), F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("pt"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us"), F.lit(1).alias("tag"),
        F.date_trunc("hour", "ts").alias("pt"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = v.unionAll(p).select(
        "*",
        F.max(F.when(F.col("tag") == 0, F.col("us"))).over(w).alias(
            "last_view_us"
        ),
    )
    pur = carried.filter(F.col("tag") == 1)
    return (
        pur.groupBy(F.col("pt").alias("purchase_hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.count("last_view_us").cast("long").alias("n_matched"),
            F.coalesce(
                round6(
                    F.sum(F.col("us") - F.col("last_view_us"))
                    .cast("long")
                    .cast("double")
                    / F.count("last_view_us")
                    / F.lit(1000000.0)
                ),
                F.lit(-1.0),
            ).alias("avg_lag_sec"),
        )
        .coalesce(1)
        .sortWithinPartitions("purchase_hour")
    )
