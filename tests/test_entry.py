"""Driver-contract smoke tests: entry(), queries(), oracle_sql() shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 3
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_q1_group_count(spark, sf_dir):
    qs = entrymod.queries()
    rows = qs["q1_pricing_summary"](spark, sf_dir).collect()
    # 3 returnflags x 2 linestatuses present in corpus
    assert len(rows) == 6
