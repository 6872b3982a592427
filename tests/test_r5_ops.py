"""Invariant tests for the round-5 operator additions — properties that
must hold regardless of corpus values, checked independently of the
DuckDB oracle (numpy serves as a third opinion where closed-form math is
involved)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from kwery_spark.registry import QUERIES, load_all

load_all()


def test_cms_one_sided_error(spark, sf_dir):
    # a count-min sketch may overcount (collisions) but NEVER undercount
    rows = QUERIES["agg_cms_estimate"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["never_undercounts"] is True
        assert r["overcount"] >= 0
        assert r["cms_est"] == r["exact_cnt"] + r["overcount"]


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    # the moment-pass + Cramer solve must agree with numpy's QR-based
    # lstsq on the same rows — an oracle independent of DuckDB
    import pandas as pd

    got = QUERIES["ml_ols_normal_equations"](spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [li["l_quantity"], li["l_discount"], np.ones(len(li))]
    )
    beta, *_ = np.linalg.lstsq(X, li["l_extendedprice"].to_numpy(), rcond=None)
    assert abs(got["beta_quantity"] - beta[0]) < 1e-3 * max(1, abs(beta[0]))
    assert abs(got["beta_discount"] - beta[1]) < 1e-3 * max(1, abs(beta[1]))
    assert abs(got["beta_intercept"] - beta[2]) < 1e-3 * max(1, abs(beta[2]))


def test_reservoir_exact_k_and_stable(spark, sf_dir):
    a = QUERIES["sample_reservoir_per_group"](spark, sf_dir).collect()
    b = QUERIES["sample_reservoir_per_group"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    for r in a:
        assert r["n_sampled"] == 50  # exact k per group


def test_attribution_positional_invariants(spark, sf_dir):
    # every conversion with >=1 touch has exactly one first and one last
    # touch, and linear credit sums to the conversion count
    rows = QUERIES["events_attribution"](spark, sf_dir).collect()
    first_total = sum(r["first_touch"] for r in rows)
    last_total = sum(r["last_touch"] for r in rows)
    linear_total = sum(r["linear_credit"] for r in rows)
    assert first_total == last_total
    assert abs(linear_total - first_total) < 1e-3


def test_lsh_recall_bounds(spark, sf_dir):
    r = QUERIES["dedup_lsh_recall_eval"](spark, sf_dir).collect()[0]
    assert 0 <= r["n_detected"] <= min(r["n_truth"], r["n_candidates"])
    if r["n_truth"]:
        assert 0.0 <= r["recall"] <= 1.0
        # the 8x4 banding is lossy by design: it must actually miss some
        # pairs at j>=0.5, otherwise the eval measures nothing
        assert r["recall"] < 1.0


def test_profile_table_consistency(spark, sf_dir):
    rows = {r["col_name"]: r for r in QUERIES["profile_table"](spark, sf_dir).collect()}
    n_rows = next(iter(rows.values()))["n_rows"]
    for r in rows.values():
        assert r["n_rows"] == n_rows  # one table, one row count
        assert r["n_nulls"] + r["n_distinct"] <= r["n_rows"] + 1
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n_rows  # primary key


def test_hll_intersection_tolerance_flag(spark, sf_dir):
    r = QUERIES["agg_hll_intersection"](spark, sf_dir).collect()[0]
    assert r["est_within_15pct"] is True
    assert r["exact_intersection"] <= min(r["exact_a"], r["exact_b"])


def test_dq_expectations_exercises_both_paths(spark, sf_dir):
    rows = QUERIES["dq_expectations"](spark, sf_dir).collect()
    statuses = {r["rule"]: r["passed"] for r in rows}
    assert statuses["l_quantity_le_45"] is False  # deliberately failing
    assert statuses["fk_orders_customer"] is True
    assert all(r["n_violations"] >= 0 for r in rows)
