"""Sorts, limits, pagination, top-k (SURVEY.md §2.6).

Scale notes: global ORDER BY is a range-partitioned sort (sampling pass +
shuffle); ORDER BY + LIMIT fuses into TakeOrderedAndProject (per-partition
heap + driver merge of k rows — no global sort, the only sane top-k at
100 TB). Grouped top-k is a window rank filtered to k, which prunes during
the sort within each hash partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "sort_multikey",
    oracle="""
    SELECT o_orderkey, status_or_null, o_totalprice
    FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
                 o_totalprice
          FROM orders)
    ORDER BY status_or_null DESC NULLS LAST, o_totalprice ASC, o_orderkey
    LIMIT 100
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with mixed direction and explicit NULLS LAST placement
    (NULLs derived via nullif; o_orderkey tiebreak keeps the LIMIT
    deterministic)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    )
    return o.orderBy(
        F.col("status_or_null").desc_nulls_last(),
        F.col("o_totalprice").asc(),
        F.col("o_orderkey"),
    ).limit(100)


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 3 of the price-sorted order list (native offset)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(50)
        .limit(25)
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: top-3 orders by price within each priority class.
    row_number (not rank) + unique-key tiebreak ⇒ deterministic rows."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null, o_totalprice
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY nullif(o_orderstatus, 'P') ASC NULLS FIRST,
             o_totalprice DESC NULLS LAST,
             o_orderkey
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in sorts: Spark defaults NULLS FIRST on
    ASC, DuckDB defaults NULLS LAST — silent cross-engine divergence
    unless spelled out (this repo's differential fuzzer pins the same
    rule). asc_nulls_first/desc_nulls_last make the contract explicit;
    the trailing unique key makes the whole order total, so the sorted
    result is byte-stable. Global sorts range-partition at scale — fine
    here because the output is the deliverable."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey"),
    )


@register(
    "topk_pareto_frontier",
    oracle="""
    WITH sizes AS (
        SELECT p_size, min(p_retailprice) AS best_price
        FROM part GROUP BY p_size
    ),
    frontier AS (
        SELECT s.p_size, s.best_price
        FROM sizes s
        WHERE NOT EXISTS (
            SELECT 1 FROM sizes s2
            WHERE s2.p_size > s.p_size AND s2.best_price <= s.best_price
        )
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    JOIN frontier f
      ON p.p_size = f.p_size AND p.p_retailprice = f.best_price
    ORDER BY p.p_size, p.p_partkey
    """,
)
def topk_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over part: maximize p_size, minimize
    p_retailprice — the rows no other row dominates (>= in both
    dimensions, strictly better in one). The skyline operator of
    Borzsonyi/Kossmann/Stocker (ICDE 2001), expressed Spark-first.

    Scale: a naive skyline is an all-pairs dominance anti-join. For a
    2-D skyline the dominance test factors through one dimension's
    domain: a row is on the frontier iff its price equals the minimum
    price AT its size and no LARGER size achieves <= that price. So the
    plan contracts part to one (size, min_price) row per distinct size
    FIRST (map-side-combined groupBy — p_size is a bounded attribute
    domain, <=50 values at every SF, CONTENT cardinality not row count),
    runs the suffix-min dominance scan as a window over those <=50 rows
    (declared GLOBAL_WIN, measured bound in tools/audit_plans.py), and
    broadcast-joins the surviving (size, price) pairs back to emit the
    frontier rows. No pair space ever exists; the only shuffle is the
    50-group aggregate. Duplicate frontier points are all kept — equal
    rows do not dominate each other (strictness requirement).

    The descending RANGE frame (unboundedPreceding, -1) is exactly
    "all rows with size strictly greater": with a descending ordering
    Spark evaluates range offsets on the negated key, so end=-1 means
    size' >= size+1."""
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    sizes = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("best_price")
    )
    above = (
        Window.orderBy(F.col("p_size").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        sizes.withColumn("best_above", F.min("best_price").over(above))
        .filter(
            F.col("best_above").isNull()
            | (F.col("best_above") > F.col("best_price"))
        )
        .select(F.col("p_size").alias("f_size"), "best_price")
    )
    return (
        part.join(
            F.broadcast(frontier),
            (part.p_size == frontier.f_size)
            & (part.p_retailprice == frontier.best_price),
        )
        .select("p_partkey", "p_size", "p_retailprice")
        .coalesce(1)
        .sortWithinPartitions("p_size", "p_partkey")
    )
