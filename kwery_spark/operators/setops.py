"""Set operations (SURVEY.md §2.7): UNION [ALL] / by-name, INTERSECT, EXCEPT.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
the distinct variants add one hash-aggregate shuffle on the full row.
INTERSECT/EXCEPT compile to aggregate + join — keep projections narrow
before applying them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register


def _high_value(spark, sf_dir) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 320000.0)
        .select("o_orderkey", "o_orderpriority")
    )


def _urgent(spark, sf_dir) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 320000.0
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000.0
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — overlapping rows appear twice."""
    return _high_value(spark, sf_dir).unionAll(_urgent(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 320000.0
    UNION
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000.0
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — the overlap is deduplicated."""
    return _high_value(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@register(
    "set_union_byname",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS balance
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, NULL AS balance
    FROM supplier
    """,
)
def set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by column NAME (not position) with missing-column fill:
    suppliers lack ``balance`` → NULL-filled via allowMissingColumns."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    # deliberately different column order + missing 'balance'
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("entity_name"), F.col("s_suppkey").alias("entity_key")
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers in both predicate sets."""
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey"))
    )


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .subtract(c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey"))
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000.0
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two sides)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 300000.0)
        .select("o_orderpriority")
        .intersectAll(o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority"))
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 300000.0
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity = left minus right)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 300000.0)
        .select("o_orderpriority")
        .exceptAll(o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority"))
    )
