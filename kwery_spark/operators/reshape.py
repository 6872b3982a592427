"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

Scale notes: pivot with an EXPLICIT value list compiles to one grouped
aggregation with N conditional aggregates — no second pass to discover
the domain (an implicit pivot runs a distinct-collect first, which is a
driver-side materialization you never want at 100 TB). Unpivot is a
generator expression per row — narrow, no shuffle at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                AS BIGINT) AS status_F,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                AS BIGINT) AS status_O,
           CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts to one column per status. The value list is
    explicit ('F','O','P' — the TPC-H domain), so the plan is a single
    partial+final hash aggregate; missing combinations coalesce to 0 to
    match SQL's FILTER-style oracle."""
    pv = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s}") for s in ("F", "O", "P")],
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val
    FROM orders WHERE o_orderkey <= 2000
    UNION ALL
    SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot two measures into (metric, val) long form via the native
    unpivot/melt operator (Spark >= 3.4) — per-row generator, no shuffle;
    measures cast to a common double type as unpivot requires."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )
