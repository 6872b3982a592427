"""Warehouse maintenance operators: MERGE-style upsert and SCD type-2
history building — the two table-maintenance shapes every lakehouse
deployment runs nightly.

Both are expressed as single declarative plans (full-outer join /
window runs), so they inherit Spark's shuffle partitioning on the
natural key and scale with the key cardinality, never the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "merge_upsert",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey <= 10000
    ),
    source AS (
        SELECT o_orderkey, o_orderpriority,
               round(o_totalprice * 1.1, 2) AS new_price
        FROM orders WHERE o_orderkey BETWEEN 5000 AND 15000
    ),
    merged AS (
        SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               coalesce(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority,
               coalesce(s.new_price, t.o_totalprice) AS price,
               CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                         THEN 'updated'
                    WHEN s.o_orderkey IS NOT NULL THEN 'inserted'
                    ELSE 'unchanged' END AS action
        FROM target t FULL JOIN source s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_orderpriority, action,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(price) AS BIGINT)) AS BIGINT) AS price_checksum
    FROM merged
    GROUP BY o_orderpriority, action
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT) as one full-outer join + coalesce projection — the engine-
    agnostic core of Delta/Iceberg MERGE, which at scale is exactly this
    plan plus file rewrite bookkeeping. Target = order snapshot (keys
    <= 10000); source = overlapping update batch (5000..15000, +10%
    price). Per (priority, action) row counts + a floored-price checksum
    gate the merged content, not just cardinalities. The join shuffles
    both sides on the natural key — at 100 TB this is the same
    co-partitioned plan, and bucketing the target by key (sink_bucketed)
    removes its shuffle entirely."""
    o = table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") <= 10000).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    source = o.filter(F.col("o_orderkey").between(5000, 15000)).select(
        F.col("o_orderkey").alias("s_orderkey"),
        F.col("o_orderpriority").alias("s_priority"),
        F.round(F.col("o_totalprice") * 1.1, 2).alias("new_price"),
    )
    merged = target.join(
        source, target.o_orderkey == source.s_orderkey, "full"
    ).select(
        F.coalesce("s_priority", "o_orderpriority").alias("o_orderpriority"),
        F.coalesce("new_price", "o_totalprice").alias("price"),
        F.when(
            F.col("o_orderkey").isNotNull() & F.col("s_orderkey").isNotNull(),
            "updated",
        )
        .when(F.col("s_orderkey").isNotNull(), "inserted")
        .otherwise("unchanged")
        .alias("action"),
    )
    return merged.groupBy("o_orderpriority", "action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor("price").cast("long")).alias("price_checksum"),
    )


@register(
    "scd2_dimension",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderpriority,
               CAST(o_orderdate AS TIMESTAMP) AS odate, o_orderkey,
               CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                    THEN 1 ELSE 0 END AS changed
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
        SELECT o_custkey, o_orderpriority, odate,
               CAST(sum(changed) OVER (PARTITION BY o_custkey
                    ORDER BY odate, o_orderkey ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS version
        FROM ordered
    ),
    collapsed AS (
        SELECT o_custkey, version,
               min(o_orderpriority) AS o_orderpriority,
               min(odate) AS valid_from
        FROM runs GROUP BY o_custkey, version
    )
    SELECT o_custkey, version, o_orderpriority, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
               AS valid_to,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
               IS NULL AS is_current
    FROM collapsed
    """,
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse each customer's order
    stream into priority-change history rows with [valid_from, valid_to)
    ranges and a current flag. The classic gaps-and-islands build:
    change flag (lag) → running sum = version → collapse runs → lead for
    the closing timestamp. Every window shares one shuffle on o_custkey;
    determinism from the (o_orderdate, o_orderkey) tiebreak. At 100 TB
    this is the standard backfill for dimension tables — key-partitioned,
    no driver state."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("odate"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("odate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    changed = F.when(
        ~F.lag("o_orderpriority").over(w).eqNullSafe(F.col("o_orderpriority")), 1
    ).otherwise(0)
    runs = (
        o.withColumn("changed", changed)
        .withColumn("version", F.sum("changed").over(cum).cast("long"))
        .groupBy("o_custkey", "version")
        .agg(
            F.min("o_orderpriority").alias("o_orderpriority"),
            F.min("odate").alias("valid_from"),
        )
    )
    vw = Window.partitionBy("o_custkey").orderBy("version")
    valid_to = F.lead("valid_from").over(vw)
    return runs.select(
        "o_custkey",
        "version",
        "o_orderpriority",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
