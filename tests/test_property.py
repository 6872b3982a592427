"""Property-based differential testing (SURVEY.md §5.4): Hypothesis
generates small tables; the SAME SQL runs on Spark and DuckDB and results
must agree after the harness's normalization (order-insensitive,
float-tolerant — reused from tools/check.py).

Covers the algebraic core where engine semantics could diverge: GROUP BY
over nullable keys, inner/left joins with null keys, three-valued-logic
filters, and set operations with bag semantics. Doubles are restricted to
quarter-integers so sums stay exact and comparisons bitwise-stable.

derandomize=True: the suite is deterministic run-to-run (CI-stable); raise
max_examples locally to fuzz harder.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, "/root/repo/tools")
from check import norm_rows  # noqa: E402

KEYS = st.integers(min_value=0, max_value=5)
STRS = st.one_of(st.none(), st.sampled_from(["x", "y", "z", ""]))
QUARTERS = st.integers(min_value=-8, max_value=8).map(lambda n: n / 4.0)

T1_ROWS = st.lists(st.tuples(KEYS, STRS, QUARTERS), min_size=0, max_size=12)
T2_ROWS = st.lists(st.tuples(KEYS, STRS), min_size=0, max_size=8)

SQLS = [
    # grouped agg over nullable string key; count(*) vs count(col) null rules
    """SELECT b, count(*) AS n, count(b) AS n_b, sum(c) AS sum_c
       FROM t1 GROUP BY b""",
    # inner equi-join + projection
    """SELECT t1.a AS a, t1.b AS b, t2.d AS d
       FROM t1 JOIN t2 ON t1.a = t2.a""",
    # left join null-padding + 3VL filter on the padded side
    """SELECT t1.a AS a, t1.c AS c, t2.d AS d
       FROM t1 LEFT JOIN t2 ON t1.a = t2.a
       WHERE t2.d IS NULL OR t2.d = 'x'""",
    # 3-valued logic: NOT over a nullable comparison
    """SELECT a, b FROM t1 WHERE NOT (b = 'x') OR b IS NULL""",
    # bag-semantics set ops on projections
    """SELECT a FROM t1 EXCEPT ALL SELECT a FROM t2""",
    """SELECT a FROM t1 INTERSECT ALL SELECT a FROM t2""",
    # distinct + order-insensitive compare
    """SELECT DISTINCT a, b FROM t1""",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(t1=T1_ROWS, t2=T2_ROWS)
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_algebraic_core_matches_duckdb(spark, duck, t1, t2):
    p1 = pd.DataFrame(t1, columns=["a", "b", "c"]).astype(
        {"a": "int64", "b": "object", "c": "float64"}
    )
    p2 = pd.DataFrame(t2, columns=["a", "d"]).astype({"a": "int64", "d": "object"})
    spark.createDataFrame(p1, "a long, b string, c double").createOrReplaceTempView("t1")
    spark.createDataFrame(p2, "a long, d string").createOrReplaceTempView("t2")
    duck.register("t1", p1)
    duck.register("t2", p2)
    for sql in SQLS:
        sdf = spark.sql(sql)
        srows = [tuple(r) for r in sdf.collect()]
        rel = duck.sql(sql)
        drows = rel.fetchall()
        assert norm_rows(sdf.columns, srows) == norm_rows(list(rel.columns), drows), sql
