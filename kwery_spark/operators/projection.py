"""Projection, filters, predicates, conditionals, casts (SURVEY.md §2.2).

All pure Column expressions — whole-stage-codegen'd JVM-side, and every
filter here is a pushdown candidate (comparison/IN/LIKE-prefix reach the
parquet row-group level; see tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "project_expr",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        l_extendedprice * (1 - l_discount) AS net_price,
        l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
        l_quantity * 2.0 + 1.0 AS qty_adj
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic expressions and aliases."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_adj"),
    )


@register(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 45.0
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_returnflag <> 'N'
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates over number / timestamp / string columns."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45.0)
        & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_returnflag") != "N")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "filter_boolean",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
      AND NOT (o_orderpriority = '5-LOW')
    """,
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT predicate composition."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000.0))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_in_between",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_brand IN ('Brand#1', 'Brand#5', 'Brand#12', 'Brand#22')
    """,
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list and BETWEEN predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 20)
        & F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#12", "Brand#22")
    ).select("p_partkey", "p_brand", "p_size")


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%PROMO%'
       OR (p_name LIKE 'a%' AND regexp_matches(p_type, '(ECONOMY|SMALL).*'))
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / prefix / regexp pattern predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%")
        | (F.col("p_name").like("a%") & F.col("p_type").rlike("(ECONOMY|SMALL).*"))
    ).select("p_partkey", "p_name", "p_type")


@register(
    "filter_null",
    oracle="""
    SELECT
        c_custkey,
        seg_or_null,
        seg_or_null IS NULL AS is_missing,
        seg_or_null IS NOT DISTINCT FROM 'BUILDING' AS nullsafe_building
    FROM (
        SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg_or_null
        FROM customer
    )
    WHERE seg_or_null IS NULL OR seg_or_null = 'BUILDING'
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS [NOT] NULL and null-safe equality (<=>).

    The corpus has no stored NULLs, so they are derived with nullif."""
    c = table(spark, sf_dir, "customer").withColumn(
        "seg_or_null", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    )
    return c.filter(
        F.col("seg_or_null").isNull() | (F.col("seg_or_null") == "BUILDING")
    ).select(
        "c_custkey",
        "seg_or_null",
        F.col("seg_or_null").isNull().alias("is_missing"),
        F.col("seg_or_null").eqNullSafe(F.lit("BUILDING")).alias("nullsafe_building"),
    )


@register(
    "case_when",
    oracle="""
    SELECT
        o_orderkey,
        CASE
            WHEN o_totalprice >= 300000.0 THEN 'jumbo'
            WHEN o_totalprice >= 150000.0 THEN 'large'
            WHEN o_totalprice >= 50000.0  THEN 'medium'
            ELSE 'small'
        END AS size_bucket,
        CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                           ELSE 'other' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN cascade + simple CASE."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "jumbo")
        .when(F.col("o_totalprice") >= 150000.0, "large")
        .when(F.col("o_totalprice") >= 50000.0, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_name"),
    )


@register(
    "cast_types",
    oracle="""
    SELECT
        o_orderkey,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(round(o_totalprice) AS BIGINT) AS price_rounded,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
        CAST('42' AS INTEGER) AS parsed_int,
        CAST('3.5' AS DOUBLE) AS parsed_double
    FROM orders
    WHERE o_orderkey <= 100
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit casts: int↔string, double→int (via round: Spark truncates,
    DuckDB rounds — round() first makes them agree), timestamp→date→string."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.round("o_totalprice").cast("bigint").alias("price_rounded"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.lit("42").cast("int").alias("parsed_int"),
        F.lit("3.5").cast("double").alias("parsed_double"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT → partial/final hash aggregate on the row value.

    Scale: distinct is a shuffle on all projected columns; project first
    (2 narrow columns) so the exchange stays small."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_high_value,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe(): named accumulator metrics
    (row count, quality counter, checksum) ride the normal execution —
    zero extra scans, zero extra shuffles — and surface after the action.
    This is how a 100 TB pipeline gets per-stage data-quality counters
    for free instead of re-running audit queries. The returned DataFrame
    is the observed metrics row; the oracle recomputes the same metrics
    relationally."""
    from pyspark.sql import Observation

    obs = Observation("quality")
    df = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_high_value"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    df.write.format("noop").mode("overwrite").save()  # the pipeline action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_high_value"], m["total_price"])],
        "n_rows bigint, n_high_value bigint, total_price double",
    )
