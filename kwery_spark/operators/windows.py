"""Window functions (SURVEY.md §2.5).

Scale notes: every window here partitions by a real key (custkey/segment),
so the physical plan is one shuffle on the partition key + per-partition
sort — no global sort, no driver involvement. Order keys always include a
unique tiebreaker (orderkey/custkey) so ranks, offsets, and ntile are
deterministic under ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking: top-3 orders by price per customer."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT
        c_mktsegment,
        c_custkey,
        CAST(rank()       OVER w AS BIGINT) AS bal_rank,
        CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
        percent_rank() OVER w AS bal_pct_rank,
        cume_dist()    OVER w AS bal_cume_dist,
        CAST(ntile(4) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_quartile
    FROM customer
    WHERE c_custkey <= 1000
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist / ntile in one window
    (unique c_custkey tiebreak makes ntile deterministic)."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1000)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
            F.percent_rank().over(w).alias("bal_pct_rank"),
            F.cume_dist().over(w).alias("bal_cume_dist"),
            F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        )
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_totalprice,
        lag(o_totalprice)  OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        o_totalprice - lag(o_totalprice) OVER w AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic offsets along each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lagp = F.lag("o_totalprice").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        lagp.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - lagp).alias("delta_prev"),
    )


@register(
    "win_running",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend,
        count(*) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_orders_so_far
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running) aggregates over each customer's history."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum("o_totalprice").over(w).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
    )


@register(
    "win_moving_avg",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        avg(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg_7
    FROM orders
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row sliding average along each customer's order history."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.avg("o_totalprice").over(w).alias("moving_avg_7"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT
        o_orderpriority,
        o_orderkey,
        o_totalprice,
        count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
            RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric order key: for each order, how many orders
    of the same priority fall within $10k below its price. RANGE (unlike
    ROWS) is tie-safe: peers by value share a frame, so no tiebreak key is
    needed for determinism. (PySpark's Window.rangeBetween only accepts
    integer offsets, so the fractional frame is expressed in SQL.)"""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.expr(
                "count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice "
                "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"
            ).alias("n_in_band"),
        )
    )


@register(
    "win_first_last_value",
    oracle="""
    SELECT
        c_mktsegment,
        c_custkey,
        first_value(c_name) OVER w AS poorest_name,
        last_value(c_name)  OVER w AS richest_name
    FROM customer
    WHERE c_custkey <= 500
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame (the
    default frame would make last_value just the current row)."""
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.first("c_name").over(w).alias("poorest_name"),
            F.last("c_name").over(w).alias("richest_name"),
        )
    )


@register(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user rolling one-hour count and sum,
    bounded by an INTERVAL, not a row count — the frame every rate-limit
    / rolling-metric query needs. Expressed in SQL (the DataFrame
    rangeBetween API takes only numeric bounds; interval bounds are
    SQL-only). Peers at identical timestamps are in-frame together in
    both engines."""
    table(spark, sf_dir, "events").createOrReplaceTempView("__wtr_events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS value_last_hour
        FROM __wtr_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "win_ntile_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_orderkey <= 5000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: ntile bucketing, percent_rank,
    cume_dist — the remaining §2.5 rank members beyond rank/dense_rank.
    Deterministic via the (o_totalprice, o_orderkey) tiebreak; one
    exchange on the partition key serves all three functions."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "win_distinct_running",
    oracle="""
    SELECT e1.user_id, e1.event_id,
           CAST((SELECT count(DISTINCT e2.event_type)
                 FROM events e2
                 WHERE e2.user_id = e1.user_id
                   AND (e2.ts < e1.ts
                        OR (e2.ts = e1.ts AND e2.event_id <= e1.event_id)))
                AS INTEGER) AS distinct_types_so_far
    FROM events e1
    WHERE e1.user_id <= 50
    """,
)
def win_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user — a surface SQL engines disagree
    on: COUNT(DISTINCT) OVER is illegal in both Spark and DuckDB, so the
    engine-correct rewrite is size(collect_set() OVER (... ROWS
    UNBOUNDED PRECEDING)): one shuffle on user_id, set state bounded by
    the attribute's cardinality (5 event types — constant memory per
    row at any scale). The oracle expresses the same thing as a
    correlated subquery, which DuckDB decorrelates."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("distinct_types_so_far"),
    )


@register(
    "win_cumulative_pct",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
                 / sum(o_totalprice) OVER (PARTITION BY o_orderpriority), 6)
               AS cum_revenue_share
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def win_cumulative_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative share of total (Pareto/ABC analysis): running revenue
    divided by the partition total — 'the top N orders carry X% of
    revenue'. Two frames over ONE partitioning (running + unbounded), so
    Catalyst computes both in a single window stage; ordered by
    (price DESC, key) for a total, engine-stable accumulation order."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    part = Window.partitionBy("o_orderpriority")
    run = part.orderBy(F.col("o_totalprice").desc(), "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.round(
            F.sum("o_totalprice").over(run) / F.sum("o_totalprice").over(part), 6
        ).alias("cum_revenue_share"),
    )
