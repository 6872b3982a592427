"""SQL-string entry-point operators (SURVEY.md §3 entry point 1).

These run the SAME SQL text through Spark SQL and the DuckDB oracle —
dialect-parity proof for the subset of ANSI SQL both engines share, and
coverage for planner features only reachable from SQL: correlated
subquery decorrelation (Catalyst's RewritePredicateSubquery) and
recursive CTEs (Spark >= 4.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register

_SUBQUERY_SQL = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000.0)
"""


@register("sql_subquery", oracle=_SUBQUERY_SQL)
def sql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + correlated EXISTS, submitted as SQL text.
    Catalyst decorrelates the EXISTS into a left-semi join and the scalar
    subquery into a broadcast single-row join — no per-row re-execution
    (the plan shape a naive subquery interpreter cannot give you at
    100 TB). Identical text runs in the oracle."""
    for name in ("customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SUBQUERY_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m AS month_num, count(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON month(o_orderdate) = m
    GROUP BY m
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark >= 4.0): generate the month series
    recursively, left-join order counts onto it so empty months still
    appear. Identical text runs in the oracle — the recursion is
    driver-planned but executes as ordinary unioned stages."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)
