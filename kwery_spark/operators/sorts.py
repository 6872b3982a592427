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
