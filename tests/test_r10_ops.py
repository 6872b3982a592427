"""Round-10 invariants: the cross-engine-deterministic round6 formula
(the driver-r9 stream_asof_join flake class) and its adoption by the
tie-capable µs-statistic keys."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from kwery_spark.catalog import round6, round6_sql
from kwery_spark.registry import QUERIES, load_all

load_all()


def test_round6_bit_identical_on_exact_ties(spark):
    """floor(x*1e6+0.5)/1e6 must produce the IDENTICAL double in Spark
    and DuckDB on exact half-µs ties — averages of integer microseconds
    over even counts, the inputs where plain round(x, 6) resolves
    through two different ulp-lotteries (Spark BigDecimal shortest-repr
    HALF_UP vs DuckDB std::round(x*1e6)/1e6) and flaked in driver r9.

    The tie grid: x = (2k+1)/2 µs → x/1e6 has an exact .5 at the 7th
    decimal. Also sweeps near-tie ulp neighbours and plain off-tie
    values so the formula is exercised away from the boundary too.
    """
    # (sum_us, count) pairs whose quotient is an exact half-integer µs,
    # plus odd cases, large magnitudes, and count values seen per-group
    cases = [(3, 2), (5, 2), (7, 2), (9, 2), (101, 2), (2**33 + 1, 2),
             (3 * 7 + 1, 7), (10**12 + 1, 2), (999_999_999, 4),
             (123_456_789, 8), (1, 3), (2, 3), (10**15 + 7, 6)]
    df = spark.createDataFrame(
        [(float(s), float(c)) for s, c in cases], "s double, c double"
    )
    got = [
        r.v
        for r in df.select(
            round6(F.col("s") / F.col("c") / F.lit(1000000.0)).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    expr = round6_sql("CAST(? AS DOUBLE) / CAST(? AS DOUBLE) / 1000000.0")
    want = [
        con.execute(f"SELECT {expr}", [s, c]).fetchone()[0] for s, c in cases
    ]
    # bit-identical, not approx: the whole point of the formula
    assert got == want, list(zip(cases, got, want))


def test_round6_matches_half_up_off_ties(spark):
    """Away from ties, round6 equals ordinary round-half-up to 6dp."""
    vals = [0.1234564, 0.1234566, 12.9999994, 12.9999996, 5.0, 0.0000001]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.v for r in df.select(round6(F.col("x")).alias("v")).collect()]
    want = [round(v, 6) for v in vals]
    for g, w in zip(got, want):
        assert abs(g - w) < 5e-13, (g, w)


def test_tie_capable_keys_use_round6_not_round(spark):
    """The three µs-ratio keys fixed in r10 must keep FLOOR-based
    rounding in BOTH the Spark plan and the oracle SQL — a regression
    back to round(x, 6) reintroduces the driver-r9 flake."""
    from kwery_spark.registry import ORACLES

    for key in ("stream_asof_join", "events_inter_arrival",
                "events_conversion_lag"):
        sql = ORACLES[key].lower()
        assert "floor(" in sql and "+ 0.5" in sql, key
        # the µs-ratio outputs must not go through round(); percentile
        # inputs stay integer µs so interpolation is exact both sides
        assert "round(cast(s1" not in sql and "round(med" not in sql, key
        assert "round(avg(" not in sql and "round(quantile" not in sql, key


def _q(name):
    import __spark_entry__ as entrymod

    return entrymod.queries()[name]


def test_weighted_median_brute_force(spark, sf_dir):
    """agg_weighted_median == the pandas cum-weight definition."""
    import pyspark.sql.functions as F

    from kwery_spark.catalog import table

    got = {
        r.l_returnflag: (r.total_weight, r.weighted_median_price)
        for r in _q("agg_weighted_median")(spark, sf_dir).collect()
    }
    pdf = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("v"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        g = g.sort_values("v")
        tw = int(g.w.sum())
        cum = g.w.cumsum()
        expect = float(g.v[2 * cum >= tw].iloc[0])
        assert got[flag] == (tw, expect), (flag, got[flag], tw, expect)


def test_weighted_median_single_shuffle(spark, sf_dir):
    """The groupBy must reuse the window's l_returnflag partitioning —
    exactly ONE Exchange in the whole plan."""
    from kwery_spark.plans import inspect

    df = _q("agg_weighted_median")(spark, sf_dir)
    assert inspect.shuffle_count(df) == 1, inspect.formatted_plan(df)


def test_outlier_iqr_fences_and_fraction(spark, sf_dir):
    """Fences sane (q1 <= q3), outliers consistent with their fraction,
    and the fence join stays a broadcast hash join over a pruned scan."""
    from kwery_spark.plans import inspect

    df = _q("dq_outlier_iqr")(spark, sf_dir)
    assert inspect.has_broadcast_join(df)
    assert set(inspect.read_schema_columns(df)) == {
        "o_totalprice",
        "o_orderpriority",
    }
    for r in df.collect():
        assert r.q1 <= r.q3, r
        assert 0 <= r.n_outliers <= r.n_rows, r
        assert abs(r.outlier_frac - r.n_outliers / r.n_rows) < 1e-6, r
        if r.max_high_outlier is not None:
            assert r.max_high_outlier > r.q3, r


def test_tokenizer_fertility_en_reference(spark, sf_dir):
    """The English row's fertility ratio is exactly 1 and every ratio is
    consistent with its integer totals; the reference joins as a 1-row
    broadcast (declared BNLJ), never a shuffle."""
    from kwery_spark.plans import inspect

    df = _q("pipeline_tokenizer_fertility")(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan
    rows = {r.lang: r for r in df.collect()}
    en = rows["en"]
    assert en.fertility_vs_en == 1.0, en
    for r in rows.values():
        assert r.total_tokens > 0 and r.total_chars > 0, r
        assert (
            abs(r.chars_per_token - r.total_chars / r.total_tokens) < 1e-6
        ), r
        assert r.chars_per_token > 1.0, r  # words are longer than 1 char


def test_gbdt_boost_monotone_and_checkpointed(spark, sf_dir):
    """Train RMSE strictly decreases per boosting round, leaf deltas
    oppose (residual sums cancel), splits are non-degenerate, and the
    final plan reads only the checkpointed 1-row state (the
    ml_logistic_irls discipline) — no parquet re-scan per output row."""
    from kwery_spark.plans import inspect

    df = _q("ml_gbdt_residual_boost")(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "Parquet" not in plan and "parquet" not in plan, plan[:2000]
    rows = sorted(df.collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == [0, 1, 2]
    n = rows[0].n_match
    assert rows[0].rmse > rows[1].rmse > rows[2].rmse, rows
    for r in rows[1:]:
        assert 0 < r.n_match < n, r
        assert r.leaf_delta_match * r.leaf_delta_rest < 0, r
        assert 0 < r.sse_reduction_frac < 1, r


def test_context_budget_retention_consistent(spark, sf_dir):
    """Retention at 64 tokens is the exact min-sum ratio, quantiles are
    ordered, and over-limit docs imply retention < 1."""
    rows = _q("pipeline_context_budget")(spark, sf_dir).collect()
    assert rows, "non-empty"
    for r in rows:
        assert r.p50_tokens <= r.p95_tokens <= r.max_tokens, r
        assert 0 < r.retention_at_64 <= 1.0, r
        if r.docs_over_64 > 0:
            assert r.retention_at_64 < 1.0, r
        else:
            assert r.retention_at_64 == 1.0, r
        assert 0 <= r.docs_over_64 <= r.n_docs, r


def test_parquet_bloom_pushes_point_lookup(spark, sf_dir):
    """The IN point predicate must reach the parquet reader of the
    bloom-rewritten copy (PushedFilters), and the lookup result equals
    the same predicate on the original table."""
    import pyspark.sql.functions as F

    from kwery_spark.catalog import table
    from kwery_spark.plans import inspect

    df = _q("scan_parquet_bloom")(spark, sf_dir)
    assert inspect.has_pushed_filters(df), inspect.formatted_plan(df)
    # total_value included (ADVICE r10): counts alone would pass against
    # a value-corrupting stale copy; the DECIMAL sum is exact, so the
    # comparison is equality, not tolerance.
    got = {(r.event_type, r.n, r.total_value) for r in df.collect()}
    want = {
        (r.event_type, r.n, r.total_value)
        for r in table(spark, sf_dir, "events")
        .filter(F.col("user_id").isin(11, 4242))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == want, (got, want)


def test_no_new_tie_capable_rounds_in_oracles():
    """Static guard against reintroducing the driver-r9 flake class:
    oracle SQL must not round() an integer-ratio quotient (a division
    whose denominator is a count-like term, or a µs-unit expression) —
    those can land on exact decimal ties where the engines' round()
    implementations disagree per-ulp. Use the floor-based
    catalog.round6_sql form instead. Keys in the whitelist were assessed
    individually (ties unreachable: huge denominators, sqrt/ln-derived
    values, or exact ≤6-decimal grids that round-trip identically)."""
    import re

    from kwery_spark.registry import ORACLES

    SAFE = {
        # cov/var ratios of large exact-DECIMAL moments — denominators
        # are corpus-scale aggregates, exact ties unreachable
        "events_cuped_adjust",
        # gini: 2*rank_weighted/(n*total) — denominator is a product of
        # corpus-scale exact integers
        "events_lorenz_gini",
        # normal-equation solve: determinant denominators, huge exact
        "ml_ols_normal_equations",
        # single µs difference / 1e6 — an exact ≤6-decimal grid value;
        # round() recovers the grid identically in both engines
        "join_asof_tolerance",
        # ln()-derived sampling keys — irrational-ish, ties unreachable
        "sample_weighted",
        # rate: n*3.6e9/s1 with s1 ~ 1e13 µs; cv: sqrt-derived
        "events_inter_arrival",
    }
    pat_div_count = re.compile(
        r"round\s*\([^;]*?/\s*(?:count\s*\(|n_gaps|cnt\b|n\b)[^;]*?,\s*\d",
        re.I | re.S,
    )
    pat_us = re.compile(
        r"round\s*\([^)]*(?:epoch_us|unix_micros|1000000\.0)[^;]*?,\s*\d",
        re.I | re.S,
    )
    offenders = {
        k
        for k, sql in ORACLES.items()
        if k not in SAFE and (pat_div_count.search(sql) or pat_us.search(sql))
    }
    assert not offenders, (
        f"tie-capable round() in oracles (use round6_sql): {sorted(offenders)}"
    )


def test_balanced_classes_equalizes(spark, sf_dir):
    """Every class keeps exactly min(class size) rows, and membership is
    the md5-rank prefix (reproducible, engine-portable)."""
    import pyspark.sql.functions as F

    from kwery_spark.catalog import table

    rows = _q("sample_balanced_classes")(spark, sf_dir).collect()
    kept = {r.lang: r.n_kept for r in rows}
    true_counts = {
        r.lang: r.n
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    floor = min(true_counts.values())
    assert set(kept) == set(true_counts)
    assert all(v == floor for v in kept.values()), kept


def test_interleave_schedule_round_robin(spark, sf_dir):
    """Positions are 1..50 with no gaps; within the schedule every
    source's rank-r doc precedes any source's rank-(r+1) doc (the
    round-robin property), and the global sort is fused to a bounded
    TakeOrderedAndProject, not a full sort."""
    from kwery_spark.plans import inspect

    df = _q("pipeline_interleave_sources")(spark, sf_dir)
    assert inspect.has_take_ordered(df), inspect.formatted_plan(df)
    rows = sorted(df.collect(), key=lambda r: r.position)
    assert [r.position for r in rows] == list(range(1, len(rows) + 1))
    seen_per_source = {}
    for r in rows:
        seen_per_source[r.source] = seen_per_source.get(r.source, 0) + 1
        # a source can lead by at most 1 over the least-seen source
        assert seen_per_source[r.source] - min(seen_per_source.values()) <= 1, rows


def test_windowed_funnel_is_subset_of_unbounded(spark, sf_dir):
    """Each windowed stage count is <= the unbounded funnel's stage
    count, counts are monotone down the funnel, and fractions are
    consistent."""
    win = {r.stage: r for r in _q("events_funnel_windowed")(spark, sf_dir).collect()}
    unb = {r.stage: r.n_users for r in _q("events_funnel")(spark, sf_dir).collect()}
    assert win["view"].n_users == unb["view"]
    assert win["click_within_24h"].n_users <= unb["click"]
    assert win["purchase_within_24h"].n_users <= unb["purchase"]
    ns = [win["view"].n_users, win["click_within_24h"].n_users,
          win["purchase_within_24h"].n_users]
    assert ns[0] >= ns[1] >= ns[2] > 0, ns
    assert win["view"].frac_of_top == 1.0 and win["view"].step_conversion == 1.0
