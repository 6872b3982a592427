"""Round-15 invariants (optimization round): the assoc_basket_rules
orderkey-bucketed arm (VERDICT r14 #4) must be value-identical to the raw
arm and obey the kill switch, and the r15 text_bm25 single-scan rewrite
must keep the registered schema."""

from __future__ import annotations

import kwery_spark.all_ops  # noqa: F401 — populate registry
from kwery_spark.registry import QUERIES

SF001 = "/root/testdata/sf0.001"


def test_assoc_bucketed_arm_value_identical(spark):
    """r15: assoc_basket_rules reads lineitem from the orderkey-bucketed
    layout when it exists (the basket groupBy(l_orderkey) rides the
    bucketing exchange-free) — rows must be IDENTICAL to the raw-scan
    arm, and the kill switch must force raw. All float columns derive
    from identical integer counts through the same round6 chain, so
    exact equality is the right assert (no cross-arm addend reorder)."""
    from kwery_spark.catalog import build_bucketed

    build_bucketed(spark, SF001)  # idempotent; seconds at sf0.001
    bucketed = sorted(map(tuple, QUERIES["assoc_basket_rules"](spark, SF001).collect()))
    spark.conf.set("spark.kwery.bucketed", "false")
    try:
        raw = sorted(map(tuple, QUERIES["assoc_basket_rules"](spark, SF001).collect()))
    finally:
        spark.conf.unset("spark.kwery.bucketed")
    assert bucketed == raw and len(raw) > 0


def test_bm25_schema_and_rowcount(spark):
    """The r15 single-scan rewrite keeps the registered contract: top-20
    rows, (doc_id, bm25, n_terms_hit) schema, every row hitting >= 1
    query term."""
    df = QUERIES["text_bm25"](spark, SF001)
    assert df.columns == ["doc_id", "bm25", "n_terms_hit"]
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(1 <= r.n_terms_hit <= 3 for r in rows)
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
