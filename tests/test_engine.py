"""Engine facade tests: the three public entry points agree with each
other on the same question (SQL string vs DataFrame builder vs packaged
operator)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kwery_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(sf_dir, spark)


def test_sql_and_builder_agree(engine):
    via_sql = engine.sql(
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"
    )
    via_builder = (
        engine.table("orders").groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_builder.collect())
    )


def test_run_executes_registry_key(engine):
    rows = engine.run("q1_pricing_summary").collect()
    assert len(rows) == 6


def test_run_unknown_key_raises(engine):
    with pytest.raises(KeyError, match="unknown operator"):
        engine.run("no_such_op")


def test_all_tables_queryable(engine):
    for name in engine.tables():
        assert engine.sql(f"SELECT * FROM {name} LIMIT 1").count() in (0, 1)


def test_operators_listing(engine):
    ops = engine.operators()
    assert len(ops) >= 113
    assert "dedup_minhash" in ops and "stream_tumbling" in ops
