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


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.rnk
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice,
               CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                    AS BIGINT) AS rnk
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey <= 500
"""


@register("sql_lateral", oracle=_LATERAL_SQL)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (top-2 orders per customer), submitted as
    SQL text. Catalyst decorrelates the lateral subquery into a
    window-ranked join rather than re-executing it per outer row — the
    decorrelation that makes LATERAL usable at 100 TB. Identical text
    runs in the DuckDB oracle (both dialects accept comma + LATERAL)."""
    for name in ("customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_LATERAL_SQL)
