"""Aggregation operators (SURVEY.md §2.4).

Scale notes: every groupBy here compiles to partial (map-side) HashAggregate
→ exchange on the group key → final HashAggregate, so the shuffle carries
pre-aggregated rows only. countDistinct expands to a two-phase distinct
aggregate; approx_count_distinct (HyperLogLog++) is the constant-memory
100 TB form. Collect-style aggregates are sorted in-query for determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from kwery_spark.catalog import round6, table
from kwery_spark.registry import register


@register(
    "agg_global",
    oracle="""
    SELECT
        count(*) AS n_rows,
        sum(l_quantity) AS total_qty,
        avg(l_extendedprice) AS avg_price,
        min(l_extendedprice) AS min_price,
        max(l_extendedprice) AS max_price,
        CAST(min(l_shipdate) AS TIMESTAMP) AS first_ship,
        CAST(max(l_shipdate) AS TIMESTAMP) AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (global) aggregate — single-row result."""
    return table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_groupby",
    oracle="""
    SELECT
        event_type,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            AS avg_value,
        CAST(min(ts) AS TIMESTAMP) AS first_ts,
        CAST(max(ts) AS TIMESTAMP) AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate by key (partial + final)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING sum(o_totalprice) > 1500000.0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("total_spent") > 1500000.0)
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT
        o_orderpriority,
        count(*) AS n_orders,
        count(DISTINCT o_custkey) AS n_customers,
        count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (Expand + two-phase aggregate in Spark)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++, rsd=1%).

    The oracle can only check the exact count, so the approx estimate is
    asserted in-query: approx_within_5pct must come out TRUE for every
    group (at rsd=0.01 the estimate is well inside ±5%).

    Scale: HLL sketches merge associatively — constant memory per group vs
    the Expand blow-up of exact distinct; this is the 100 TB form."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
        count(*) AS n_orders,
        sum(o_totalprice) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: per-status subtotals, per-priority subtotals, and the
    grand total in one pass (Spark Expand node — one scan, not three)."""
    return (
        table(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
            "n_orders", "total",
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT
        r.r_name,
        n.n_name,
        CAST(grouping(r.r_name) AS INTEGER) AS g_region,
        CAST(grouping(n.n_name) AS INTEGER) AS g_nation,
        count(*) AS n_customers,
        sum(c.c_acctbal) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: region → nation → grand total."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("total_balance"),
        )
        .select("r_name", "n_name", "g_region", "g_nation", "n_customers", "total_balance")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
        count(*) AS n_orders,
        avg(o_totalprice) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations of status × priority."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("o_totalprice").alias("avg_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
            "n_orders", "avg_price",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT
        l_returnflag,
        stddev_samp(l_quantity) AS qty_stddev,
        var_samp(l_quantity) AS qty_var,
        corr(l_quantity, l_extendedprice) AS qty_price_corr,
        covar_samp(l_quantity, l_extendedprice) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev / variance / correlation / covariance."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_quantity").alias("qty_stddev"),
            F.var_samp("l_quantity").alias("qty_var"),
            F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("qty_price_covar"),
        )
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT
        o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). At 100 TB swap for approx_percentile (t-digest
    sketch) — demonstrated by ``agg_approx_percentile`` (rows-only)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.percentile("o_totalprice", 0.99).alias("p99"),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT
        o_orderpriority,
        round(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
        round(quantile_cont(o_totalprice, 0.9), 6) AS exact_p90,
        round(quantile_cont(o_totalprice, 0.99), 6) AS exact_p99,
        true AS p50_within_5pct,
        true AS p90_within_5pct,
        true AS p99_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, constant memory per
    group — the 100 TB path). The sketch value itself is engine-specific,
    so the hash gate carries (a) the exact interpolated percentiles, which
    the oracle recomputes with quantile_cont, and (b) a Spark-side
    assertion that each sketch value lands within 5% of its exact twin —
    the oracle asserts those booleans are all true."""
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_percentile(
                "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
            ).alias("ap"),
            F.percentile("o_totalprice", 0.5).alias("e50"),
            F.percentile("o_totalprice", 0.9).alias("e90"),
            F.percentile("o_totalprice", 0.99).alias("e99"),
        )
    )
    def within(approx, exact):
        return (F.abs(approx - exact) / exact) <= 0.05
    return agg.select(
        "o_orderpriority",
        F.round("e50", 6).alias("exact_p50"),
        F.round("e90", 6).alias("exact_p90"),
        F.round("e99", 6).alias("exact_p99"),
        within(F.col("ap")[0], F.col("e50")).alias("p50_within_5pct"),
        within(F.col("ap")[1], F.col("e90")).alias("p90_within_5pct"),
        within(F.col("ap")[2], F.col("e99")).alias("p99_within_5pct"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT
        c_custkey,
        array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
        array_to_string(list(DISTINCT o_orderpriority ORDER BY o_orderpriority), ',')
            AS priorities
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey <= 200
    GROUP BY c_custkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List/set aggregation — results array_sort'ed for determinism
    (collect_list order is partition-dependent otherwise), then rendered
    to CSV strings so the grading hasher (which can't factorize list
    cells) gates the values. Sort happens on the native type BEFORE the
    string cast, so numeric order is preserved ("2" < "10")."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "priorities"
            ),
        )
    )


@register(
    "agg_first_last",
    oracle="""
    SELECT
        o_custkey,
        CAST(arg_min(o_orderdate, o_orderkey) AS TIMESTAMP) AS first_key_date,
        CAST(arg_max(o_orderdate, o_orderkey) AS TIMESTAMP) AS last_key_date,
        arg_min(o_orderkey, o_totalprice) AS cheapest_order,
        arg_max(o_orderkey, o_totalprice) AS priciest_order
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first/last per group via min_by/max_by (argmin/argmax)
    — never bare first(): its result is partition-order-dependent.
    Ordering keys chosen unique (o_orderkey; o_totalprice measured unique
    per customer) so argmin ties cannot bite."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderdate", "o_orderkey").alias("first_key_date"),
            F.max_by("o_orderdate", "o_orderkey").alias("last_key_date"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        )
    )


@register(
    "agg_approx_topk",
    oracle="""
    SELECT event_type AS item, count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent-items sketch (approx_top_k, Spark >= 4.0).
    maxItemsTracked (10k default) far exceeds the 5-value domain, so the
    sketch is exact here and the value-hash oracle applies; at real
    cardinalities the same call gives bounded-memory heavy-hitters where
    an exact groupBy would need the full domain in state. k = domain size
    so no boundary-tie ambiguity exists at any SF."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__topk_events")
    return spark.sql(
        """
        SELECT t.item AS item, CAST(t.count AS BIGINT) AS cnt
        FROM (
            SELECT explode(approx_top_k(event_type, 5)) AS t
            FROM __topk_events
        )
        """
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT
        o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        CAST(coalesce(sum(CAST(floor(o_totalprice) AS BIGINT))
                      FILTER (WHERE o_totalprice > 150000), 0) AS BIGINT)
            AS high_value_total,
        round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 6) AS avg_open,
        count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F')
            AS n_finished_custs
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregate family (SQL:2003): per-aggregate predicates
    without exploding the query into self-joins. Spark parses the FILTER
    clause natively; Catalyst folds each into a conditional partial
    aggregate — one scan, one shuffle, regardless of how many filtered
    aggregates ride along. The high-value checksum floors prices before
    the BIGINT cast — Spark's double->bigint cast truncates but DuckDB's
    ROUNDS, so the floor makes both exact."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("count(*) FILTER (WHERE o_orderstatus = 'F')").alias("n_finished"),
            F.coalesce(
                F.expr(
                    "sum(CAST(floor(o_totalprice) AS BIGINT)) "
                    "FILTER (WHERE o_totalprice > 150000)"
                ),
                F.lit(0).cast("long"),
            ).alias("high_value_total"),
            F.round(
                F.expr("avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O')"), 6
            ).alias("avg_open"),
            F.expr(
                "count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F')"
            ).alias("n_finished_custs"),
        )
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH med AS (
        SELECT o_orderpriority, round(median(o_totalprice), 6) AS median_price
        FROM orders GROUP BY o_orderpriority
    ),
    c AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    m AS (
        SELECT o_orderpriority, o_orderstatus AS mode_status,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY n DESC, o_orderstatus) AS rn
        FROM c
    )
    SELECT med.o_orderpriority, med.median_price, m.mode_status
    FROM med JOIN m ON med.o_orderpriority = m.o_orderpriority AND m.rn = 1
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (exact interpolated — Spark median() ≡ DuckDB median ≡
    quantile_cont 0.5) plus a DETERMINISTIC mode: the builtin mode() in
    both engines picks an arbitrary value on ties, so the mode is
    computed as argmax over (count DESC, value ASC) — same single-shuffle
    cost, reproducible answer. Both branches group on the same key, so
    AQE coalesces them onto one exchange footprint."""
    o = table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price")
    )
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), "o_orderstatus"
    )
    m = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("mode_status"))
    )
    return med.join(m, "o_orderpriority")


@register(
    "agg_hll_sketch",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS exact_custs,
           true AS estimate_within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch aggregation (hll_sketch_agg, Spark >= 3.5): the
    MERGEABLE distinct-count path — partial sketches combine across
    partitions/days without re-scanning raw data, which is how a 100 TB
    pipeline maintains rolling cardinalities (store the sketch, union
    later). The sketch estimate is engine-specific, so the hash gate
    carries the exact distinct count (oracle recomputes) plus a
    Spark-side assertion that the sketch lands within 5% of exact."""
    est = F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))")
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_custs"),
            est.alias("est"),
        )
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("est") - F.col("exact_custs"))
                / F.col("exact_custs")
                <= 0.05
            ).alias("estimate_within_5pct"),
        )
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT o_orderpriority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_dec,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money aggregation: cast to DECIMAL(18,2) BEFORE summing, so
    the result is identical regardless of partitioning or summation order
    — the property float sums cannot give and the reason financial
    pipelines aggregate decimals. The SUM stays decimal (exact,
    order-independent); only the FINAL projection casts to DOUBLE, because
    decimal-typed output columns hash differently across the two engines'
    pandas paths (DuckDB .df() narrows to float64, Spark toPandas() keeps
    Decimal objects — r6 driver finding on agg_skew_twophase)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bin,
           CAST(least(floor(o_totalprice / 50000), 9) * 50000 AS DOUBLE) AS bin_lo,
           count(*) AS n,
           round(avg(o_totalprice), 6) AS bin_avg
    FROM orders
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram ($50k bins, top-capped at bin 9): the
    profiling aggregate every engine ships as width_bucket/histogram.
    Expressed as a computed-key groupBy, it partial-aggregates map-side —
    at 100 TB the shuffle carries ≤10 rows per partition, never raw
    values."""
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            bin_.alias("bin"), (bin_ * 50000).cast("double").alias("bin_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 6).alias("bin_avg"),
        )
    )


@register(
    "agg_weighted",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
               AS qty_weighted_price,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (Σwx/Σw): the aggregation shape behind blended
    prices, weighted quality scores, and mixture statistics. Two partial
    sums + ONE final division — numerator and denominator are exact sums
    of products of integral-valued doubles, so the result is stable under
    any summation order before the 6dp round."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            6,
        ).alias("qty_weighted_price"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_weight"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id() over ROLLUP: the marker that separates
    'subtotal row' from 'NULL data value' — without it, rollup output is
    ambiguous whenever the grouped column itself can be NULL. gid is the
    bitmask form (Spark's grouping_id() ≡ the oracle's re-derived
    grouping()*2+grouping()); labels coalesce to '<all>' on total rows
    in both engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.col("g_status").cast("int").alias("g_status"),
            F.col("g_priority").cast("int").alias("g_priority"),
            "gid",
            "n",
        )
    )


@register(
    "agg_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_pop(l_quantity, l_extendedprice), 6)  AS qty_price_covar_pop,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar_samp,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS price_at_zero_qty,
           round(regr_r2(l_extendedprice, l_quantity), 6)    AS fit_r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics family: correlation, population/sample
    covariance, and the SQL:2023 linear-regression aggregates
    (slope/intercept/R²) of price against quantity per return flag.
    All are single-pass streaming co-moment aggregates — partial
    (map-side) combine applies exactly like sum/avg, so the shuffle
    carries one co-moment tuple per (partition, group) at any scale.
    Rounded to 6dp: both engines use numerically-stable co-moment
    updates whose accumulation-order noise sits ~10 orders below that."""
    li = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("qty_price_corr"),
        F.round(F.covar_pop(q, p), 6).alias("qty_price_covar_pop"),
        F.round(F.covar_samp(q, p), 6).alias("qty_price_covar_samp"),
        F.round(F.regr_slope(p, q), 6).alias("price_per_qty"),
        F.round(F.regr_intercept(p, q), 6).alias("price_at_zero_qty"),
        F.round(F.regr_r2(p, q), 6).alias("fit_r2"),
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT n_name,
           string_agg(s_name, '|' ORDER BY s_name)        AS suppliers,
           string_agg(DISTINCT CAST(s_nationkey AS VARCHAR), ',')
                                                          AS nation_keys,
           count(*)                                       AS n_supp
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg surface: ordered string concatenation per
    group — rendered via array_join(array_sort(collect_list(...))) so
    the output is deterministic regardless of partition arrival order
    (bare collect_list order is not reproducible on ANY distributed
    engine; the ORDER BY inside the aggregate is the only sane
    semantics at scale). DISTINCT variant via collect_set + sort."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), "|").alias("suppliers"),
            F.array_join(
                F.array_sort(F.collect_set(F.col("s_nationkey").cast("string"))), ","
            ).alias("nation_keys"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty,
           round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / intercept / r2 /
    avgx / avgy / count): per-group OLS of price on quantity in ONE
    grouped pass — the SQL-standard bivariate fit every warehouse
    exposes. Spark computes these as merge-able moment aggregates
    (single-pass, partial-aggregated map-side), so the fit costs the
    same shuffle as a count. Both engines implement the identical
    SQL-standard definitions; round(6) absorbs sum-order ulp."""
    li = table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_avgx(y, x), 6).alias("avg_qty"),
            F.round(F.regr_avgy(y, x), 6).alias("avg_price"),
        )
        .coalesce(1)
        .sortWithinPartitions("l_returnflag")
    )


@register(
    "agg_hll_rollup_merge",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               count(DISTINCT o_custkey) AS exact_m
        FROM orders GROUP BY month
    )
    SELECT CAST((SELECT count(*) FROM monthly) AS BIGINT) AS n_months,
           CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT)
               AS exact_total,
           CAST((SELECT sum(exact_m) FROM monthly) AS BIGINT)
               AS naive_sum_of_monthlies,
           true AS union_within_5pct
    """,
)
def agg_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-table MERGE pattern (hll_union_agg): per-month HLL
    sketches of distinct customers are built once, then UNIONED into a
    total-period cardinality without touching raw data again — how a
    100 TB pipeline answers "distinct users last quarter" from a tiny
    rolling sketch table instead of a quarter-long rescan. The output
    pins why sketches are needed at all: the naive sum of monthly
    distincts overcounts (customers active in several months), while
    the sketch union lands within 5% of the true total (Spark-side
    assertion; the oracle recomputes the exact values)."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_m"),
    )
    merged = monthly.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("union_est"),
        F.sum("exact_m").cast("long").alias("naive_sum_of_monthlies"),
    )
    exact_total = o.agg(F.countDistinct("o_custkey").alias("exact_total"))
    return (
        merged.join(F.broadcast(exact_total))
        .select(
            "n_months",
            "exact_total",
            "naive_sum_of_monthlies",
            (
                F.abs(F.col("union_est") - F.col("exact_total"))
                / F.col("exact_total")
                <= 0.05
            ).alias("union_within_5pct"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH words AS (
        SELECT o_orderpriority,
               o_custkey // 63 AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(o_custkey % 63 AS INTEGER))
                 AS word_bits
        FROM orders
        GROUP BY o_orderpriority, o_custkey // 63
    )
    SELECT w.o_orderpriority,
           CAST(sum(bit_count(w.word_bits)) AS BIGINT) AS n_distinct_bitmap,
           x.n_check
    FROM words w
    JOIN (SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_check
          FROM orders GROUP BY o_orderpriority) x USING (o_orderpriority)
    GROUP BY w.o_orderpriority, x.n_check
    ORDER BY w.o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via integer bitmaps — the
    ClickHouse/Doris roaring-bitmap pattern on plain SQL types. Keys are
    packed into 63-bit words (word = key/63, bit = key%63 — bit 63 is left clear because DuckDB's BIGINT << traps on sign-bit overflow, so 63 usable bits keeps the two engines' shift semantics identical); per (group,
    word) a bit_or collapses any number of observations into one word;
    popcount-sum over words is the exact distinct count. Unlike
    count(DISTINCT), the per-word partial states are MERGEABLE — a
    rollup table of (group, word_idx, word_bits) supports incremental
    refresh and cross-period unions with no rescan, and unlike HLL the
    answer is exact. The n_check column recomputes via count(DISTINCT)
    in BOTH engines, so the oracle also proves bitmap == exact.

    Scale: two shuffles, both on bounded keys — (priority, word) then
    priority; per-group state is n_keys/64 words. At 100 TB the word
    space shards evenly; no driver state, no UDF, all whole-stage
    codegen."""
    o = table(spark, sf_dir, "orders")
    words = (
        o.select(
            "o_orderpriority",
            (F.col("o_custkey") / 63).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 63 AS INT))"
            ).alias("mask"),
        )
        .groupBy("o_orderpriority", "word_idx")
        .agg(F.bit_or("mask").alias("word_bits"))
    )
    counted = words.groupBy("o_orderpriority").agg(
        F.sum(F.bit_count("word_bits")).cast("long").alias("n_distinct_bitmap")
    )
    check = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_check")
    )
    return (
        counted.join(check, "o_orderpriority")
        .select("o_orderpriority", "n_distinct_bitmap", "n_check")
        .coalesce(1)
        .sortWithinPartitions("o_orderpriority")
    )


_BLOOM_M = 1 << 16  # bits in the filter (1024 63-bit words)
_BLOOM_K = 4  # hash functions


def _bloom_hash_sql(key_expr: str, i: int) -> str:
    # md5-derived hash i of an integer key — identical bytes in both
    # engines (working-notes determinism rule); 8 hex chars fit BIGINT
    return (
        f"CAST('0x' || substring(md5(CAST({key_expr} AS VARCHAR) || ':{i}'), 1, 8) "
        f"AS BIGINT) % {_BLOOM_M}"
    )


def _bloom_oracle() -> str:
    build_hashes = ", ".join(
        f"({_bloom_hash_sql('c_custkey', i)}) AS h{i}" for i in range(_BLOOM_K)
    )
    probe_hashes = ", ".join(
        f"({_bloom_hash_sql('o_custkey', i)}) AS h{i}" for i in range(_BLOOM_K)
    )
    hs = ", ".join(f"h{i}" for i in range(_BLOOM_K))
    return f"""
    WITH hot AS (SELECT c_custkey, {build_hashes}
                 FROM customer WHERE c_acctbal > 7500),
    bits AS (
        SELECT h // 63 AS word_idx,
               bit_or(CAST(1 AS BIGINT) << CAST(h % 63 AS INTEGER)) AS word_bits
        FROM (SELECT unnest([{hs}]) AS h FROM hot) GROUP BY h // 63
    ),
    probe AS (SELECT o_orderkey, o_custkey, {probe_hashes} FROM orders),
    probe_long AS (
        SELECT o_orderkey, o_custkey, unnest([{hs}]) AS h FROM probe
    ),
    hits AS (
        SELECT p.o_orderkey, p.o_custkey,
               count(*) FILTER (
                   b.word_bits & (CAST(1 AS BIGINT) << CAST(p.h % 63 AS INTEGER))
                   <> 0) AS n_set
        FROM probe_long p
        LEFT JOIN bits b ON b.word_idx = p.h // 63
        GROUP BY p.o_orderkey, p.o_custkey
    ),
    cand AS (SELECT o_orderkey, o_custkey FROM hits WHERE n_set = {_BLOOM_K}),
    truth AS (
        SELECT o.o_orderkey FROM orders o
        WHERE EXISTS (SELECT 1 FROM hot h WHERE h.c_custkey = o.o_custkey)
    )
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM orders)  AS n_probe,
        (SELECT CAST(count(*) AS BIGINT) FROM cand)    AS n_candidates,
        (SELECT CAST(count(*) AS BIGINT) FROM truth)   AS n_true,
        (SELECT CAST(count(*) AS BIGINT) FROM cand)
          - (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_false_pos
    """


@register("agg_bloom_prune", oracle=_bloom_oracle())
def agg_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction — the runtime-filter primitive
    every distributed engine uses to prune a fact scan before the join
    (Spark's own InjectRuntimeFilter, Trino dynamic filters). Build: a
    2^16-bit filter (k=4 md5-derived hashes, deterministic across
    engines) over the hot customers (acctbal > 7500). Probe: every
    order tests its custkey's 4 bits; only candidates reach the exact
    join. The output quantifies the pruning contract — candidates ⊇
    true matches (no false negatives, by construction) and the false-
    positive overshoot, which the oracle verifies bit-for-bit.

    Scale: the filter itself is 1024 words REGARDLESS of corpus size —
    a provably-fixed-size broadcast (the one broadcast() class the
    repo's discipline allows); the probe is explode(4)+broadcast-join
    +count, all codegen, one shuffle on the probe key. At 100 TB the
    build side aggregates to the same 8 KB before shipping."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")

    def hashes(key: str) -> list:
        return [
            F.expr(
                f"CAST(conv(substring(md5(concat(CAST({key} AS STRING), ':{i}')), "
                f"1, 8), 16, 10) AS BIGINT) % {_BLOOM_M}"
            ).alias(f"h{i}")
            for i in range(_BLOOM_K)
        ]

    hot = cust.filter(F.col("c_acctbal") > 7500).select("c_custkey", *hashes("c_custkey"))
    bits = (
        hot.select(
            F.explode(F.array(*[F.col(f"h{i}") for i in range(_BLOOM_K)])).alias("h")
        )
        .select(
            (F.col("h") / 63).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word_bits"))
    )
    probe = (
        orders.select("o_orderkey", "o_custkey", *hashes("o_custkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.explode(F.array(*[F.col(f"h{i}") for i in range(_BLOOM_K)])).alias("h"),
        )
        .withColumn("word_idx", (F.col("h") / 63).cast("long"))
        .join(broadcast(bits), "word_idx", "left")
        .withColumn(
            "set",
            (
                F.coalesce(F.col("word_bits"), F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 63 AS INT))")
                )
                != 0
            ).cast("int"),
        )
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum("set").alias("n_set"))
    )
    cand = probe.filter(F.col("n_set") == _BLOOM_K)
    truth = orders.join(
        hot.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    n_probe = orders.agg(F.count(F.lit(1)).alias("n_probe"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    return (
        n_probe.join(broadcast(n_cand))
        .join(broadcast(n_true))
        .select(
            "n_probe",
            "n_candidates",
            "n_true",
            (F.col("n_candidates") - F.col("n_true")).alias("n_false_pos"),
        )
    )


@register(
    "agg_cms_estimate",
    oracle="""
    WITH seeds AS (SELECT CAST(s.range AS INTEGER) AS seed FROM range(4) s),
    cells AS (
        SELECT seed,
               CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '|' ||
                                       CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 256 AS bucket,
               CAST(count(*) AS BIGINT) AS c
        FROM events CROSS JOIN seeds
        GROUP BY 1, 2
    ),
    qry AS (
        SELECT CAST(q.range AS BIGINT) AS user_id, seed,
               CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '|' ||
                                       CAST(q.range AS VARCHAR)), 1, 8)
                    AS BIGINT) % 256 AS bucket
        FROM range(10) q CROSS JOIN seeds
    ),
    est AS (
        SELECT qry.user_id, min(cells.c) AS cms_est
        FROM qry JOIN cells USING (seed, bucket)
        GROUP BY qry.user_id
    ),
    exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM events WHERE user_id < 10 GROUP BY user_id
    )
    SELECT e.user_id, x.exact_cnt, e.cms_est,
           e.cms_est - x.exact_cnt AS overcount,
           e.cms_est >= x.exact_cnt AS never_undercounts
    FROM est e JOIN exact x ON x.user_id = e.user_id
    ORDER BY e.user_id
    """,
)
def agg_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows x w=256 buckets, md5-derived hashing)
    of per-user event frequencies, queried for users 0-9 against their
    exact counts. Emits the exact count, the CMS point estimate, the
    overcount, and the sketch's one-sided guarantee (estimate never
    undercounts) as a boolean the oracle re-derives — the sketch/approx
    oracle pattern from the working notes, except here the hash is
    md5-replayable so BOTH engines build bit-identical sketches.

    Scale: the sketch build is the whole point at 100 TB — each event
    expands to d=4 (seed, bucket) cells that partial-aggregate map-side
    into at most d*w = 1024 groups, so the shuffle carries ~1 KB per
    map task regardless of input size (this is why CMS beats exact
    count-distinct-per-key at scale); the probe side is a 40-row
    broadcast. min-over-d and the exact-count join touch 10 keys."""
    ev = table(spark, sf_dir, "events").select("user_id")
    seeds = F.array(*[F.lit(i) for i in range(4)])
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("seed").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 256
    )
    cells = (
        ev.select("user_id", F.explode(seeds).alias("seed"))
        .select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qry = (
        spark.range(10)
        .select(F.col("id").alias("user_id"))
        .select("user_id", F.explode(seeds).alias("seed"))
        .select("user_id", "seed", bucket.alias("bucket"))
    )
    est = (
        cells.join(F.broadcast(qry), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_est"))
    )
    exact = (
        ev.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_undercounts"),
        )
        .coalesce(1)
        .sortWithinPartitions("user_id")
    )


@register(
    "agg_hll_intersection",
    oracle="""
    WITH a AS (SELECT count(DISTINCT user_id) AS na FROM events
               WHERE event_type = 'view'),
         b AS (SELECT count(DISTINCT user_id) AS nb FROM events
               WHERE event_type = 'purchase'),
         i AS (SELECT count(*) AS exact_intersection FROM
               (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
                INTERSECT
                SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
    SELECT CAST(a.na AS BIGINT) AS exact_a,
           CAST(b.nb AS BIGINT) AS exact_b,
           CAST(i.exact_intersection AS BIGINT) AS exact_intersection,
           true AS est_within_15pct
    FROM a, b, i
    """,
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based set intersection via inclusion-exclusion:
    |A∩B| ≈ est(A) + est(B) − est(A∪B) from three HLL sketches — the
    audience-overlap question ("users who viewed AND purchased") answered
    from mergeable per-segment sketches instead of a raw-data INTERSECT.
    Inclusion-exclusion on HLLs is noisier than plain union (errors add),
    so the Spark-side guarantee is 15%; the oracle recomputes the exact
    cardinalities and asserts the tolerance flag — the sketch-op oracle
    pattern from the working notes.

    Scale: sketches partial-aggregate map-side to ~2^14 registers per
    segment regardless of input size; the exact INTERSECT twin (two
    distincts + one equi-join, all on user_id) exists to pin the error
    and would be the part a 100 TB deployment drops."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    va = F.when(F.col("event_type") == "view", F.col("user_id"))
    pa = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    sk = ev.agg(
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg("
            "CASE WHEN event_type = 'view' THEN user_id END, 14))"
        ).alias("est_a"),
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg("
            "CASE WHEN event_type = 'purchase' THEN user_id END, 14))"
        ).alias("est_b"),
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg("
            "CASE WHEN event_type IN ('view','purchase') THEN user_id END, 14))"
        ).alias("est_union"),
        F.countDistinct(va).alias("exact_a"),
        F.countDistinct(pa).alias("exact_b"),
    )
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact_i = viewers.join(buyers, "user_id").agg(
        F.count(F.lit(1)).alias("exact_intersection")
    )
    return sk.join(F.broadcast(exact_i)).select(
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_intersection").cast("long").alias("exact_intersection"),
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                - F.col("exact_intersection")
            )
            <= F.greatest(
                F.lit(0.15) * F.col("exact_intersection"), F.lit(64.0)
            )
        ).alias("est_within_15pct"),
    )


@register(
    "ml_ols_normal_equations",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS DECIMAL(38,8)) AS n,
               CAST(sum(CAST(l_quantity  AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS s1,
               CAST(sum(CAST(l_discount  AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS s2,
               CAST(sum(CAST(l_quantity  AS DECIMAL(19,4))
                      * CAST(l_quantity  AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s11,
               CAST(sum(CAST(l_quantity  AS DECIMAL(19,4))
                      * CAST(l_discount  AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s12,
               CAST(sum(CAST(l_discount  AS DECIMAL(19,4))
                      * CAST(l_discount  AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s22,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS sy,
               CAST(sum(CAST(l_quantity  AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s1y,
               CAST(sum(CAST(l_discount  AS DECIMAL(19,4))
                      * CAST(l_extendedprice AS DECIMAL(19,4))) AS DECIMAL(38,8)) AS s2y
        FROM lineitem
    ),
    d AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
               CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
               CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
               CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
               CAST(s2y AS DOUBLE) AS s2y
        FROM m
    ),
    k AS (
        SELECT n,
               (n*s11 - s1*s1)   AS a11, (n*s12 - s1*s2) AS a12,
               (n*s22 - s2*s2)   AS a22,
               (n*s1y - s1*sy)   AS b1,  (n*s2y - s2*sy) AS b2,
               s1, s2, sy
        FROM d
    )
    SELECT round((b1*a22 - b2*a12) / (a11*a22 - a12*a12), 6) AS beta_quantity,
           round((b2*a11 - b1*a12) / (a11*a22 - a12*a12), 6) AS beta_discount,
           round((sy - (b1*a22 - b2*a12) / (a11*a22 - a12*a12) * s1
                     - (b2*a11 - b1*a12) / (a11*a22 - a12*a12) * s2) / n, 6)
               AS beta_intercept
    FROM k
    """,
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature OLS (extendedprice ~ quantity + discount + 1) solved
    by normal equations: ONE distributed moment-aggregation pass collects
    the 9 sufficient statistics, then the 2x2 centered system is solved
    in closed form (Cramer) on the 1-row result — the canonical
    big-data-to-tiny-solve shape for linear models at 100 TB (the same
    X^T X accumulation embedding_pca uses, here with the explicit
    normal-equation solve).

    Determinism: every moment is summed as DECIMAL — quantity/discount/
    extendedprice carry <=2 decimals so all products are exact in
    DECIMAL(19,4)*DECIMAL(19,4) — making the aggregation order-
    independent across engines (working-notes rule); the float Cramer
    arithmetic then runs on bit-identical scalars and rounds to 6dp."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(19,4)")
    dd = F.col("l_discount").cast("decimal(19,4)")
    y = F.col("l_extendedprice").cast("decimal(19,4)")
    m = li.agg(
        F.count(F.lit(1)).cast("decimal(38,8)").alias("n"),
        F.sum(q.cast("decimal(38,8)")).cast("decimal(38,8)").alias("s1"),
        F.sum(dd.cast("decimal(38,8)")).cast("decimal(38,8)").alias("s2"),
        F.sum(q * q).cast("decimal(38,8)").alias("s11"),
        F.sum(q * dd).cast("decimal(38,8)").alias("s12"),
        F.sum(dd * dd).cast("decimal(38,8)").alias("s22"),
        F.sum(y).cast("decimal(38,8)").alias("sy"),
        F.sum(q * y).cast("decimal(38,8)").alias("s1y"),
        F.sum(dd * y).cast("decimal(38,8)").alias("s2y"),
    )
    d = m.select(*[F.col(c).cast("double").alias(c) for c in m.columns])
    k = d.select(
        "n", "s1", "s2", "sy",
        (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).alias("a11"),
        (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).alias("a12"),
        (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).alias("a22"),
        (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).alias("b1"),
        (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).alias("b2"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    bq = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det
    bd = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det
    return k.select(
        F.round(bq, 6).alias("beta_quantity"),
        F.round(bd, 6).alias("beta_discount"),
        F.round(
            (F.col("sy") - bq * F.col("s1") - bd * F.col("s2")) / F.col("n"), 6
        ).alias("beta_intercept"),
    )


@register(
    "agg_skew_twophase",
    oracle="""
    WITH salted AS (
        SELECT l_returnflag,
               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 4)
                    AS BIGINT) % 16 AS salt,
               l_quantity, l_extendedprice
        FROM lineitem
    ),
    partial AS (
        SELECT l_returnflag, salt,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DECIMAL(38,4))
                   AS sq,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)))
                    AS DECIMAL(38,4)) AS sp
        FROM salted
        GROUP BY l_returnflag, salt
    ),
    merged AS (
        SELECT l_returnflag,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(sq) AS DECIMAL(38,4)) AS sum_qty,
               CAST(sum(sp) AS DECIMAL(38,4)) AS sum_price,
               CAST(count(*) AS BIGINT) AS n_partials
        FROM partial GROUP BY l_returnflag
    ),
    direct AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_direct,
               CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DECIMAL(38,4))
                   AS sq_direct
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT m.l_returnflag, m.n_rows,
           round(CAST(m.sum_qty AS DOUBLE), 4) AS sum_qty,
           round(CAST(m.sum_price AS DOUBLE), 4) AS sum_price,
           m.n_partials,
           m.n_rows = d.n_direct AND m.sum_qty = d.sq_direct AS matches_direct
    FROM merged m JOIN direct d USING (l_returnflag)
    ORDER BY m.l_returnflag
    """,
)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: a hot group key (l_returnflag has
    only 3 values — at 100 TB each group lands on ONE reducer) is salted
    16 ways, partial aggregates run per (key, salt), and a second tiny
    aggregate merges the partials — the aggregation twin of
    join_skew_salted. The matches_direct flag proves in-query that the
    decomposition is exact (DECIMAL partials make the re-aggregation
    order-independent, so salted == direct bit-for-bit).

    Spark's hash aggregate already does map-side partials, but the salt
    matters when the DISTRIBUTION key must stay the group key (e.g.
    pre-partitioned sinks) or under AQE-less engines; the operator
    demonstrates the pattern with its correctness proof attached.
    The equality proof compares the DECIMALs; the OUTPUT projects them
    to rounded DOUBLE (decimal output columns hash differently across
    the two engines' pandas materialization paths — r6 driver finding).

    Scale: shuffle 1 carries 3x16 salted groups; shuffle 2 carries 3."""
    li = table(spark, sf_dir, "lineitem")
    salt = (
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 16
    )
    partial = (
        li.select(
            "l_returnflag",
            salt.alias("salt"),
            F.col("l_quantity").cast("decimal(19,4)").alias("q"),
            F.col("l_extendedprice").cast("decimal(19,4)").alias("p"),
        )
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").cast("decimal(38,4)").alias("sq"),
            F.sum("p").cast("decimal(38,4)").alias("sp"),
        )
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum("sq").cast("decimal(38,4)").alias("sum_qty"),
        F.sum("sp").cast("decimal(38,4)").alias("sum_price"),
        F.count(F.lit(1)).cast("long").alias("n_partials"),
    )
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_direct"),
        F.sum(F.col("l_quantity").cast("decimal(19,4)"))
        .cast("decimal(38,4)")
        .alias("sq_direct"),
    )
    return (
        merged.join(F.broadcast(direct), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            F.round(F.col("sum_qty").cast("double"), 4).alias("sum_qty"),
            F.round(F.col("sum_price").cast("double"), 4).alias("sum_price"),
            "n_partials",
            (
                (F.col("n_rows") == F.col("n_direct"))
                & (F.col("sum_qty") == F.col("sq_direct"))
            ).alias("matches_direct"),
        )
        .coalesce(1)
        .sortWithinPartitions("l_returnflag")
    )


def _irls_core(rounds: int = 3) -> tuple[str, str]:
    """Unrolled IRLS rounds as pure-arithmetic CTE text, valid verbatim
    in BOTH Spark SQL and DuckDB (shared by ml_logistic_irls and its
    oracle — one generator, zero drift). Expects a CTE ``grid(h, d, n,
    sy)`` with h DECIMAL(2,0), d DECIMAL(1,0), n/sy DECIMAL(12,0).

    Determinism: the sigmoid is evaluated per GRID CELL (<=168 of
    them), rounded to 9dp, and re-cast DECIMAL before every sum — the
    events_attribution discipline — so all nine sufficient statistics
    accumulate exact decimals, order-independently, with every
    intermediate product explicitly cast to stay under DECIMAL(38)
    in both engines' (different) precision-promotion rules. The only
    float arithmetic is the per-cell link evaluation and the final
    3x3 Cramer solve on bit-identical scalars."""
    parts = []
    prev = None
    for r in range(rounds):
        eta = (
            "CAST(0.0 AS DOUBLE)"
            if prev is None
            else "round(b.beta0 + b.beta1*g.h + b.beta2*g.d, 9)"
        )
        src = "grid g" if prev is None else f"grid g CROSS JOIN {prev} b"
        parts.append(f"""
    stats{r} AS (
        SELECT CAST(sum(nw) AS DOUBLE) AS a00,
               CAST(sum(nw*h) AS DOUBLE) AS a01,
               CAST(sum(nw*d) AS DOUBLE) AS a02,
               CAST(sum(nw*h*h) AS DOUBLE) AS a11,
               CAST(sum(nw*h*d) AS DOUBLE) AS a12,
               CAST(sum(nw*d*d) AS DOUBLE) AS a22,
               CAST(sum(bz) AS DOUBLE) AS b0,
               CAST(sum(bz*h) AS DOUBLE) AS b1,
               CAST(sum(bz*d) AS DOUBLE) AS b2
        FROM (
            SELECT h, d, nw,
                   CAST(round(nw*etad, 9) AS DECIMAL(30,9)) + sy - np AS bz
            FROM (
                SELECT g.h, g.d, g.sy,
                       CAST(CAST(g.n AS DECIMAL(12,0))
                            * CAST(round(p*(1-p), 9) AS DECIMAL(11,9))
                            AS DECIMAL(24,9)) AS nw,
                       CAST(eta AS DECIMAL(12,9)) AS etad,
                       CAST(CAST(g.n AS DECIMAL(12,0)) * p AS DECIMAL(24,9)) AS np
                FROM (
                    SELECT g.h, g.d, g.n, g.sy, {eta} AS eta,
                           CAST(round(1.0/(1.0+exp(-({eta}))), 9)
                                AS DECIMAL(10,9)) AS p
                    FROM {src}
                ) g
            ) g
        ) g
    ),
    beta{r} AS (
        SELECT (b0*(a11*a22-a12*a12) - a01*(b1*a22-a12*b2) + a02*(b1*a12-a11*b2))
               / (a00*(a11*a22-a12*a12) - a01*(a01*a22-a12*a02)
                  + a02*(a01*a12-a11*a02)) AS beta0,
               (a00*(b1*a22-b2*a12) - b0*(a01*a22-a12*a02) + a02*(a01*b2-b1*a02))
               / (a00*(a11*a22-a12*a12) - a01*(a01*a22-a12*a02)
                  + a02*(a01*a12-a11*a02)) AS beta1,
               (a00*(a11*b2-a12*b1) - a01*(a01*b2-b1*a02) + b0*(a01*a12-a11*a02))
               / (a00*(a11*a22-a12*a12) - a01*(a01*a22-a12*a02)
                  + a02*(a01*a12-a11*a02)) AS beta2
        FROM stats{r}
    )""")
        prev = f"beta{r}"
    return ",".join(parts), prev


_IRLS_CORE, _IRLS_LAST = _irls_core(3)

_IRLS_FINAL = f"""SELECT round(beta0, 6) AS beta_intercept,
       round(beta1, 6) AS beta_hour,
       round(beta2, 6) AS beta_dow,
       round(1.0/(1.0+exp(-(beta0 + beta1*12 + beta2*3))), 6)
           AS p_error_wed_noon
FROM {_IRLS_LAST}"""


@register(
    "ml_logistic_irls",
    oracle=f"""
    WITH base AS (
        SELECT CAST(extract(hour FROM ts) AS DECIMAL(2,0)) AS h,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS DECIMAL(1,0)) AS d,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    grid AS (
        SELECT h, d, CAST(count(*) AS DECIMAL(12,0)) AS n,
               CAST(sum(y) AS DECIMAL(12,0)) AS sy
        FROM base GROUP BY h, d
    ),{_IRLS_CORE}
    {_IRLS_FINAL}
    """,
)
def ml_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(event_type='error') ~ hour + weekday + 1,
    fit by 3 unrolled IRLS (iteratively reweighted least squares)
    rounds — Newton's method on the log-likelihood, each round one
    weighted normal-equation solve.

    Spark-first shape: both features have BOUNDED ATTRIBUTE DOMAINS
    (24 hours x 7 weekdays), so the input contracts to a <=168-cell
    contingency grid in one map-side-combined groupBy — the classic
    sufficient-statistics-on-the-grid trick. Every IRLS round is then
    arithmetic over <=168 rows: the link evaluation, the nine X^T W X /
    X^T W z moments, and a closed-form 3x3 Cramer solve, all expressed
    as CTEs over the grid. At 100 TB the data pass is the ONE grid
    aggregation; the iterations never touch the input again (vs
    per-round full passes in naive distributed IRLS).

    The round-unrolled CTE text is generated by _irls_core and shared
    VERBATIM with the DuckDB oracle, so both engines run the identical
    arithmetic: per-cell sigmoids rounded to 9dp then DECIMAL-cast
    before order-independent sums (events_attribution discipline),
    float math only on bit-identical scalars. Validated against an
    unrounded NumPy IRLS: identical to 6dp at sf0.001 and sf0.01.

    Weekday via epoch-day %% 7 (engine-neutral — Spark dayofweek and
    DuckDB dow number differently, working-notes rule)."""
    ev = table(spark, sf_dir, "events").select("ts", "event_type")
    base = ev.select(
        F.hour("ts").cast("decimal(2,0)").alias("h"),
        (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7)
        .cast("decimal(1,0)")
        .alias("d"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    grid = base.groupBy("h", "d").agg(
        F.count(F.lit(1)).cast("decimal(12,0)").alias("n"),
        F.sum("y").cast("decimal(12,0)").alias("sy"),
    )
    # each unrolled round references the grid once; localCheckpoint
    # truncates the lineage so the events scan + groupBy run ONCE and
    # the three rounds read the <=168 materialized rows (the iterative-
    # op discipline graph.py uses) instead of re-scanning the input
    grid = grid.localCheckpoint(eager=True)
    grid.createOrReplaceTempView("__irls_grid")
    return spark.sql(
        f"WITH grid AS (SELECT * FROM __irls_grid),{_IRLS_CORE}\n{_IRLS_FINAL}"
    )


@register(
    "ml_decision_stump",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y,
               o_orderstatus AS f_status,
               'm' || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
                   AS f_month,
               'd' || CAST(datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) % 7 AS VARCHAR)
                   AS f_wday
        FROM orders
    ),
    fv AS (
        SELECT 'status' AS feature, f_status AS val, y FROM base
        UNION ALL SELECT 'month', f_month, y FROM base
        UNION ALL SELECT 'wday', f_wday, y FROM base
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(y) AS BIGINT) AS pos_total
        FROM base
    ),
    cand AS (
        SELECT feature, val,
               CAST(count(*) AS BIGINT) AS n_match,
               CAST(sum(y) AS BIGINT) AS pos_match
        FROM fv GROUP BY feature, val
    ),
    split AS (
        SELECT c.feature, c.val, c.n_match, c.pos_match,
               t.n_total - c.n_match AS n_rest,
               t.pos_total - c.pos_match AS pos_rest,
               t.n_total, t.pos_total
        FROM cand c CROSS JOIN tot t
    ),
    gini AS (
        SELECT feature, val, n_match, pos_match, n_rest, pos_rest,
               1.0 - (CAST(pos_total AS DOUBLE) / n_total)
                       * (CAST(pos_total AS DOUBLE) / n_total)
                   - (1.0 - CAST(pos_total AS DOUBLE) / n_total)
                       * (1.0 - CAST(pos_total AS DOUBLE) / n_total) AS g_base,
               CASE WHEN n_match = 0 THEN 0.0
                    ELSE 1.0 - (CAST(pos_match AS DOUBLE) / n_match)
                                 * (CAST(pos_match AS DOUBLE) / n_match)
                             - (1.0 - CAST(pos_match AS DOUBLE) / n_match)
                                 * (1.0 - CAST(pos_match AS DOUBLE) / n_match)
               END AS g_match,
               CASE WHEN n_rest = 0 THEN 0.0
                    ELSE 1.0 - (CAST(pos_rest AS DOUBLE) / n_rest)
                                 * (CAST(pos_rest AS DOUBLE) / n_rest)
                             - (1.0 - CAST(pos_rest AS DOUBLE) / n_rest)
                                 * (1.0 - CAST(pos_rest AS DOUBLE) / n_rest)
               END AS g_rest,
               n_total
        FROM split
    ),
    gain AS (
        SELECT feature, val, n_match, pos_match, n_rest, pos_rest,
               g_base - (CAST(n_match AS DOUBLE) * g_match
                         + CAST(n_rest AS DOUBLE) * g_rest) / n_total AS gain
        FROM gini
    )
    SELECT CAST(row_number() OVER (ORDER BY gain DESC, feature, val)
                AS BIGINT) AS rk,
           feature, val, n_match, pos_match, n_rest, pos_rest,
           round(gain, 6) AS gain
    FROM gain ORDER BY rk
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump learning (the CART/C4.5 root-split step, and the
    weak learner inside AdaBoost): rank every candidate one-feature
    equality split of orders by Gini-impurity gain against the binary
    target "is the order urgent/high priority". Features are three
    spec-bounded categorical encodings — order status (3 values),
    order month (12), order weekday (7, epoch-day mod 7 per the repo's
    portable-weekday rule) — so the candidate grid is <=22 rows
    regardless of corpus size.

    Exactness: every impurity term is built from exact integer counts
    via single divisions and IEEE +/-/* only (no transcendentals), so
    gains are bit-identical across engines; the ranking breaks exact
    ties on (feature, val).

    Scale: the 3x feature fan-out explodes INSIDE the scan stage and
    map-side combine folds it to <=22 candidate rows before the only
    shuffle; totals arrive as a 1-row broadcast (declared BNLJ) and
    the ranking window runs over the bounded candidate grid (declared
    GLOBAL_WIN)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate", "o_orderpriority"
    )
    base = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
        F.col("o_orderstatus").alias("f_status"),
        F.concat(
            F.lit("m"),
            F.lpad(F.month("o_orderdate").cast("string"), 2, "0"),
        ).alias("f_month"),
        F.concat(
            F.lit("d"),
            F.expr(
                "CAST(pmod(datediff(CAST(o_orderdate AS DATE), "
                "DATE '1970-01-01'), 7) AS STRING)"
            ),
        ).alias("f_wday"),
    )
    fv = base.select(
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("status").alias("feature"),
                    F.col("f_status").alias("val"),
                ),
                F.struct(
                    F.lit("month").alias("feature"),
                    F.col("f_month").alias("val"),
                ),
                F.struct(
                    F.lit("wday").alias("feature"),
                    F.col("f_wday").alias("val"),
                ),
            )
        ).alias("fv"),
    ).select("y", "fv.feature", "fv.val")
    cand = fv.groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("long").alias("n_match"),
        F.sum("y").cast("long").alias("pos_match"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("y").cast("long").alias("pos_total"),
    )
    split = cand.crossJoin(F.broadcast(tot)).select(
        "feature",
        "val",
        "n_match",
        "pos_match",
        (F.col("n_total") - F.col("n_match")).alias("n_rest"),
        (F.col("pos_total") - F.col("pos_match")).alias("pos_rest"),
        "n_total",
        "pos_total",
    )

    def _gini(pos, n):
        p = pos.cast("double") / n
        return F.when(n == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - p * p - (F.lit(1.0) - p) * (F.lit(1.0) - p)
        )

    g_base = (
        F.lit(1.0)
        - (F.col("pos_total").cast("double") / F.col("n_total"))
        * (F.col("pos_total").cast("double") / F.col("n_total"))
        - (F.lit(1.0) - F.col("pos_total").cast("double") / F.col("n_total"))
        * (F.lit(1.0) - F.col("pos_total").cast("double") / F.col("n_total"))
    )
    gain = split.select(
        "feature",
        "val",
        "n_match",
        "pos_match",
        "n_rest",
        "pos_rest",
        (
            g_base
            - (
                F.col("n_match").cast("double")
                * _gini(F.col("pos_match"), F.col("n_match"))
                + F.col("n_rest").cast("double")
                * _gini(F.col("pos_rest"), F.col("n_rest"))
            )
            / F.col("n_total")
        ).alias("gain"),
    )
    w_rk = Window.orderBy(F.desc("gain"), "feature", "val")
    return (
        gain.select(
            F.row_number().over(w_rk).cast("long").alias("rk"),
            "feature",
            "val",
            "n_match",
            "pos_match",
            "n_rest",
            "pos_rest",
            F.round("gain", 6).alias("gain"),
        )
        .coalesce(1)
        .sortWithinPartitions("rk")
    )


@register(
    "ml_calibration_ece",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_views,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ),
    scored AS (
        SELECT converted,
               CAST(n_views AS DOUBLE) / (n_views + 5.0) AS s
        FROM per_user
    ),
    binned AS (
        SELECT least(CAST(floor(s * 10.0) AS BIGINT), 9) AS bin,
               CAST(floor(s * 1000000000.0 + 0.5) / 1000000000.0
                    AS DECIMAL(12,9)) AS s9,
               converted
        FROM scored
    ),
    b AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               sum(s9) AS sum_s9,
               CAST(sum(converted) AS BIGINT) AS n_conv
        FROM binned GROUP BY bin
    ),
    g AS (
        SELECT bin, n, n_conv,
               CAST(sum_s9 AS DOUBLE) / n AS mean_score,
               CAST(n_conv AS DOUBLE) / n AS conv_rate
        FROM b
    ),
    e AS (
        SELECT CAST(sum(CAST(floor(abs(mean_score - conv_rate)
                                    * 1000000000.0 + 0.5) / 1000000000.0
                             AS DECIMAL(28,9)) * n) AS DOUBLE)
                   / CAST(sum(n) AS BIGINT) AS ece
        FROM g
    )
    SELECT bin, n, n_conv,
           floor(mean_score * 1000000.0 + 0.5) / 1000000.0 AS mean_score,
           floor(conv_rate * 1000000.0 + 0.5) / 1000000.0 AS conv_rate,
           floor((mean_score - conv_rate) * 1000000.0 + 0.5) / 1000000.0
               AS gap,
           floor((SELECT ece FROM e) * 1000000.0 + 0.5) / 1000000.0 AS ece
    FROM g ORDER BY bin
    """,
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration diagnostics + Expected Calibration Error (the
    reliability-diagram readout, Naeini et al. 2015): a deterministic
    conversion model scores each user p = views/(views+5) (a Laplace-
    smoothed propensity — an exact rational, no transcendentals), the
    outcome is whether the user purchased, and scores bucket into ten
    fixed-width bins. Each bin reports mean predicted probability vs
    empirical rate; ECE is the n-weighted mean absolute gap.

    Exactness: per-bin score sums accumulate 9dp-rounded DECIMAL
    (order-independent); means/rates are single divisions; the ECE
    accumulates round(|gap|,9)-DECIMAL x integer-n products exactly,
    with ONE final division — the repo's float-sum discipline.

    Scale: one scan to a per-user aggregate (the only data shuffle),
    then a <=10-row bin grid; the 1-row ECE joins back via broadcast
    (declared BNLJ)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    s = F.col("n_views").cast("double") / (F.col("n_views") + F.lit(5.0))
    binned = per_user.select(
        F.least(F.floor(s * 10.0).cast("long"), F.lit(9).cast("long")).alias(
            "bin"
        ),
        (F.floor(s * F.lit(1000000000.0) + F.lit(0.5)) / F.lit(1000000000.0))
        .cast("decimal(12,9)")
        .alias("s9"),
        "converted",
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s9").alias("sum_s9"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    g = b.select(
        "bin",
        "n",
        "n_conv",
        (F.col("sum_s9").cast("double") / F.col("n")).alias("mean_score"),
        (F.col("n_conv").cast("double") / F.col("n")).alias("conv_rate"),
    )
    e = g.agg(
        (
            F.sum(
                (
                    F.floor(
                        F.abs(F.col("mean_score") - F.col("conv_rate"))
                        * F.lit(1000000000.0)
                        + F.lit(0.5)
                    )
                    / F.lit(1000000000.0)
                )
                .cast("decimal(28,9)")
                * F.col("n")
            ).cast("double")
            / F.sum("n").cast("long")
        ).alias("ece")
    )
    return (
        g.crossJoin(F.broadcast(e))
        .select(
            "bin",
            "n",
            "n_conv",
            # round6: per-bin conv_rate/mean_score are integer-ratio
            # quotients — the tie-capable class (catalog.round6)
            round6(F.col("mean_score")).alias("mean_score"),
            round6(F.col("conv_rate")).alias("conv_rate"),
            round6(F.col("mean_score") - F.col("conv_rate")).alias("gap"),
            round6(F.col("ece")).alias("ece"),
        )
        .coalesce(1)
        .sortWithinPartitions("bin")
    )


@register(
    "agg_heavy_hitters",
    oracle="""
    WITH ev AS (SELECT user_id, event_id % 8 AS node FROM events),
    nc AS (
        SELECT node, user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM ev GROUP BY 1, 2
    ),
    r8 AS (
        SELECT node, user_id, cnt FROM (
            SELECT node, user_id, cnt,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, user_id) AS rk
            FROM nc)
        WHERE rk <= 8
    ),
    eps AS (SELECT node, min(cnt) AS eps FROM r8 GROUP BY node),
    tot AS (SELECT CAST(sum(eps) AS BIGINT) AS total_eps FROM eps),
    cand AS (
        SELECT r.user_id, CAST(sum(r.cnt) AS BIGINT) AS est_lower,
               CAST(sum(e.eps) AS BIGINT) AS eps_rep
        FROM r8 r JOIN eps e USING (node) GROUP BY r.user_id
    ),
    exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM events GROUP BY user_id
    ),
    scored AS (
        SELECT c.user_id, x.exact_cnt, c.est_lower,
               CAST(c.est_lower + t.total_eps - c.eps_rep AS BIGINT)
                   AS est_upper
        FROM cand c CROSS JOIN tot t JOIN exact x USING (user_id)
    )
    SELECT CAST(row_number() OVER (ORDER BY est_upper DESC, user_id)
                AS BIGINT) AS hh_rank,
           user_id, exact_cnt, est_lower, est_upper,
           est_lower <= exact_cnt AND exact_cnt <= est_upper AS bounds_hold
    FROM scored
    ORDER BY est_upper DESC, user_id
    LIMIT 5
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy hitters over the high-cardinality user_id domain
    (the Misra-Gries / SpaceSaving summary-merge family, complement to
    agg_cms_estimate's CMS and agg_approx_topk's tiny exact domain):
    each of 8 deterministic "nodes" (event_id % 8 — stands in for an
    executor's partition) summarizes its local stream as an exact top-8
    (item, count) list plus the MG-style error bound eps = its k-th
    count; summaries merge into per-candidate deterministic bounds
    [est_lower, est_upper] where lower = sum of reporting nodes' counts
    and upper adds eps for every silent node (an item missed by a
    node's top-k has local count <= that node's eps — the MG
    guarantee). Emits the top 5 by upper bound with the exact count and
    the bound check, which is a THEOREM here and is re-derived by the
    oracle on identically-built summaries.

    Determinism: node assignment is content-derived (event_id), top-k
    and the final ranking tiebreak on user_id, counts are integers.

    Scale: this is the heavy-hitter shape that works at 100 TB — each
    node ships k rows + one eps scalar regardless of its input size
    (8x8 rows + 8 scalars total here), so the merge never sees the
    full domain; the exact-count join is only for the verification
    column and joins the <=64-row candidate summary broadcast against
    one map-side-combined aggregate. The final ranking windows over
    the <=64-row candidate set (bounded by k*nodes, not by data)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    nc = (
        ev.select(
            F.pmod("event_id", F.lit(8)).alias("node"), "user_id"
        )
        .groupBy("node", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_node = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "user_id")
    r8 = nc.withColumn("rk", F.row_number().over(w_node)).filter(
        F.col("rk") <= 8
    )
    eps = r8.groupBy("node").agg(F.min("cnt").alias("eps"))
    tot = eps.agg(F.sum("eps").alias("total_eps"))
    cand = (
        r8.join(broadcast(eps), "node")
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("est_lower"),
            F.sum("eps").alias("eps_rep"),
        )
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    scored = exact.join(
        broadcast(cand.crossJoin(tot)), "user_id"
    ).select(
        "user_id",
        "exact_cnt",
        F.col("est_lower").cast("long").alias("est_lower"),
        (F.col("est_lower") + F.col("total_eps") - F.col("eps_rep"))
        .cast("long")
        .alias("est_upper"),
    )
    # <=64 candidate rows by construction (k=8 x 8 nodes) — the global
    # ranking window is input-bounded, same declared class as the other
    # survivors-of-top-k sites
    w_rank = Window.orderBy(F.col("est_upper").desc(), "user_id")
    return (
        scored.withColumn("hh_rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("hh_rank") <= 5)
        .select(
            "hh_rank",
            "user_id",
            "exact_cnt",
            "est_lower",
            "est_upper",
            (
                (F.col("est_lower") <= F.col("exact_cnt"))
                & (F.col("exact_cnt") <= F.col("est_upper"))
            ).alias("bounds_hold"),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS v,
               CAST(l_quantity AS BIGINT) AS wt,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(l_extendedprice AS DOUBLE),
                            l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cumw,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
               ) AS total_w
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(min(total_w) AS BIGINT) AS total_weight,
           min(CASE WHEN 2 * cumw >= total_w THEN v END)
               AS weighted_median_price
    FROM w GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower): the smallest value whose cumulative
    weight reaches half the group's total — quantity-weighted median
    line price per return flag. The weighted companion to
    agg_median_mode the same way agg_weighted pairs with agg_global's
    plain mean: percentile() can't take per-row weights in either
    engine, so the operator IS the cum-weight window idiom.

    Exactness: weights are exact integers, so the running and total
    sums are exact and `2*cumw >= total_w` is an integer comparison;
    the window orders by (value, orderkey, linenumber) — a UNIQUE key —
    so every row's cumw is fully deterministic, and the selected value
    is an UNMODIFIED input cent-grid double (no rounding anywhere).

    Scale: one shuffle on l_returnflag + an in-partition sort (same
    cost class as any exact per-group quantile; |groups| = 3 — at
    100 TB you'd bucket the histogram first or approx it, but exactness
    is the contract here); the final reduce emits one row per group."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("v", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    scored = li.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wall).alias("total_w"),
    )
    return (
        scored.groupBy("l_returnflag")
        .agg(
            F.min("total_w").cast("long").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cumw") >= F.col("total_w"), F.col("v"))
            ).alias("weighted_median_price"),
        )
        .coalesce(1)
        .sortWithinPartitions("l_returnflag")
    )


@register(
    "ml_gbdt_residual_boost",
    oracle="""
    WITH base AS MATERIALIZED (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS yc,
               o_orderstatus AS f_status,
               'm' || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
                   AS f_month,
               'd' || CAST(datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) % 7 AS VARCHAR)
                   AS f_wday
        FROM orders
    ),
    tot AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yc) AS BIGINT) AS s,
               CAST(sum(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS q
        FROM base
    ),
    fv AS (SELECT 'status' AS feature, f_status AS val, yc FROM base
           UNION ALL SELECT 'month', f_month, yc FROM base
           UNION ALL SELECT 'wday', f_wday, yc FROM base),
    cand1 AS MATERIALIZED (
        SELECT feature, val, CAST(count(*) AS BIGINT) AS nm,
               CAST(sum(yc) AS BIGINT) AS am
        FROM fv GROUP BY feature, val
    ),
    g1 AS MATERIALIZED (
        SELECT feature, val, nm,
               CAST(CAST(t.n AS DECIMAL(19,0)) * CAST(c.am AS DECIMAL(19,0))
                    - CAST(c.nm AS DECIMAL(19,0)) * CAST(t.s AS DECIMAL(19,0))
                    AS DOUBLE) AS num1d,
               CAST(c.nm AS DOUBLE) AS nmd,
               CAST(t.n AS DOUBLE) AS nd
        FROM cand1 c CROSS JOIN tot t
    ),
    g1s AS MATERIALIZED (
        SELECT *,
               CASE WHEN nmd = nd THEN -1.0
                    ELSE ((num1d / nd) * (num1d / nd)) / nmd
                         + ((num1d / nd) * (num1d / nd)) / (nd - nmd)
               END AS gain1
        FROM g1
    ),
    best1 AS MATERIALIZED (
        SELECT * FROM (SELECT *, row_number() OVER (
                           ORDER BY gain1 DESC, feature, val) AS rk FROM g1s)
        WHERE rk = 1
    ),
    sc AS MATERIALIZED (
        SELECT b.feature AS bf, b.val AS bv, b.nm AS n1m, b.gain1,
               b.nd,
               CAST(t.s AS DOUBLE) / b.nd AS mean,
               b.num1d / (b.nd * b.nmd) AS gm,
               (0.0 - b.num1d) / (b.nd * (b.nd - b.nmd)) AS gr,
               CAST(t.s AS DOUBLE) AS sd,
               CAST(t.q AS DOUBLE) AS qd,
               t.n
        FROM best1 b CROSS JOIN tot t
    ),
    base2 AS (
        SELECT base.yc, base.f_status, base.f_month, base.f_wday,
               CASE WHEN (sc.bf = 'status' AND base.f_status = sc.bv)
                      OR (sc.bf = 'month' AND base.f_month = sc.bv)
                      OR (sc.bf = 'wday' AND base.f_wday = sc.bv)
                    THEN 1 ELSE 0 END AS in1
        FROM base CROSS JOIN sc
    ),
    fv2 AS (SELECT 'status' AS feature, f_status AS val, yc, in1 FROM base2
            UNION ALL SELECT 'month', f_month, yc, in1 FROM base2
            UNION ALL SELECT 'wday', f_wday, yc, in1 FROM base2),
    cand2 AS MATERIALIZED (
        SELECT feature, val,
               CAST(count(*) AS BIGINT) AS nm,
               CAST(sum(yc) AS BIGINT) AS am,
               CAST(sum(in1) AS BIGINT) AS kin
        FROM fv2 GROUP BY feature, val
    ),
    g2 AS MATERIALIZED (
        SELECT c.feature, c.val, c.nm,
               CAST(c.nm AS DOUBLE) AS nmd,
               (((CAST(c.am AS DOUBLE) - CAST(c.nm AS DOUBLE) * s.mean)
                 - CAST(c.kin AS DOUBLE) * s.gm)
                - CAST(c.nm - c.kin AS DOUBLE) * s.gr) AS sum2,
               s.nd
        FROM cand2 c CROSS JOIN sc s
    ),
    g2s AS MATERIALIZED (
        SELECT *,
               CASE WHEN nmd = nd THEN -1.0
                    ELSE (sum2 * sum2) / nmd + (sum2 * sum2) / (nd - nmd)
               END AS gain2
        FROM g2
    ),
    best2 AS MATERIALIZED (
        SELECT * FROM (SELECT *, row_number() OVER (
                           ORDER BY gain2 DESC, feature, val) AS rk FROM g2s)
        WHERE rk = 1
    ),
    fin AS MATERIALIZED (
        SELECT s.*, b.feature AS f2, b.val AS v2, b.nm AS n2m,
               b.nmd AS n2md, b.sum2, b.gain2,
               ((s.qd - 2.0 * s.mean * s.sd) + s.nd * (s.mean * s.mean))
                   AS sse0
        FROM sc s CROSS JOIN best2 b
    )
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS round,
               '<baseline>' AS feature, '<baseline>' AS val,
               n AS n_match,
               0.0 AS leaf_delta_match, 0.0 AS leaf_delta_rest,
               0.0 AS sse_reduction_frac,
               floor(sqrt(sse0 / nd) / 100.0 * 1000000.0 + 0.5) / 1000000.0
                   AS rmse
        FROM fin
        UNION ALL
        SELECT CAST(1 AS BIGINT), bf, bv, n1m,
               floor(gm / 100.0 * 1000000.0 + 0.5) / 1000000.0,
               floor(gr / 100.0 * 1000000.0 + 0.5) / 1000000.0,
               floor(gain1 / sse0 * 1000000.0 + 0.5) / 1000000.0,
               floor(sqrt((sse0 - gain1) / nd) / 100.0 * 1000000.0 + 0.5)
                   / 1000000.0
        FROM fin
        UNION ALL
        SELECT CAST(2 AS BIGINT), f2, v2, n2m,
               floor((sum2 / n2md) / 100.0 * 1000000.0 + 0.5) / 1000000.0,
               floor(((0.0 - sum2) / (nd - n2md)) / 100.0 * 1000000.0 + 0.5)
                   / 1000000.0,
               floor(gain2 / (sse0 - gain1) * 1000000.0 + 0.5) / 1000000.0,
               floor(sqrt(((sse0 - gain1) - gain2) / nd) / 100.0
                     * 1000000.0 + 0.5) / 1000000.0
        FROM fin
    ) ORDER BY round
    """,
)
def ml_gbdt_residual_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of L2 gradient boosting with categorical decision
    stumps (Friedman 2001's least-squares boosting, depth-1 trees):
    round 1 fits the best single-feature split of the order-value
    residuals around the global mean, round 2 re-fits on the residuals
    AFTER round 1's leaf adjustments — the additive-ensemble step that
    separates boosting from ml_decision_stump's single split. Emits the
    baseline and both rounds' chosen splits, leaf deltas, per-round SSE
    reduction fraction, and train RMSE (monotone decreasing).

    Exactness (the whole design): every statistic reduces to exact
    integer/DECIMAL aggregates — residual sums over any row set S
    satisfy sum_r(S) = (n*A_S - n_S*total)/n with all pieces exact, and
    the round-2 residual sums expand the same way through the round-1
    leaf means via the (count, cent-sum, in-leaf count) contingency per
    candidate. Doubles appear ONLY in final scalar formulas whose op
    sequences are written identically in both engines (IEEE ops on
    identical inputs are bit-identical); per-round SSE uses the exact
    L2 identity SSE_k = SSE_{k-1} - gain_k (leaf values ARE residual
    means); outputs round via catalog.round6. No float is ever summed
    across rows. Negations are written (0.0 - x) on both sides so a
    zero never renders -0.0.

    Scale: three scans of orders (moments, round-1 candidates, round-2
    candidates), each fanned out x3 features INSIDE the scan stage and
    map-side-combined to a <=22-row candidate grid; the cross-round
    state is a 1-row localCheckpoint broadcast (the ml_logistic_irls
    discipline — no re-expansion per consumer, bounded driver state).
    More rounds = one more candidate scan each, embarrassingly
    scalable; the oracle materializes every round CTE (the graph_kcore
    fd-blowup rule)."""
    o = table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus", "o_orderdate"
    )
    base = o.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("yc"),
        F.col("o_orderstatus").alias("f_status"),
        F.concat(
            F.lit("m"), F.lpad(F.month("o_orderdate").cast("string"), 2, "0")
        ).alias("f_month"),
        F.concat(
            F.lit("d"),
            F.expr(
                "CAST(pmod(datediff(CAST(o_orderdate AS DATE), "
                "DATE '1970-01-01'), 7) AS STRING)"
            ),
        ).alias("f_wday"),
    )

    def _fv(df):
        cols = [c for c in df.columns if c not in ("f_status", "f_month", "f_wday")]
        return df.select(
            *cols,
            F.explode(
                F.array(
                    F.struct(
                        F.lit("status").alias("feature"),
                        F.col("f_status").alias("val"),
                    ),
                    F.struct(
                        F.lit("month").alias("feature"),
                        F.col("f_month").alias("val"),
                    ),
                    F.struct(
                        F.lit("wday").alias("feature"),
                        F.col("f_wday").alias("val"),
                    ),
                )
            ).alias("c"),
        ).select(*cols, "c.feature", "c.val")

    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yc").cast("long").alias("s"),
        F.sum(
            F.col("yc").cast("decimal(19,0)") * F.col("yc").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    ).localCheckpoint(eager=True)

    cand1 = _fv(base).groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.sum("yc").cast("long").alias("am"),
    )
    g1 = cand1.crossJoin(F.broadcast(tot)).select(
        "feature",
        "val",
        "nm",
        (
            F.col("n").cast("decimal(19,0)") * F.col("am").cast("decimal(19,0)")
            - F.col("nm").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
        )
        .cast("double")
        .alias("num1d"),
        F.col("nm").cast("double").alias("nmd"),
        F.col("n").cast("double").alias("nd"),
    )
    sum1 = F.col("num1d") / F.col("nd")
    g1s = g1.select(
        "*",
        F.when(F.col("nmd") == F.col("nd"), F.lit(-1.0))
        .otherwise(
            (sum1 * sum1) / F.col("nmd")
            + (sum1 * sum1) / (F.col("nd") - F.col("nmd"))
        )
        .alias("gain1"),
    )
    wr1 = Window.orderBy(F.col("gain1").desc(), "feature", "val")
    best1 = (
        g1s.withColumn("rk", F.row_number().over(wr1))
        .filter(F.col("rk") == 1)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("feature").alias("bf"),
            F.col("val").alias("bv"),
            F.col("nm").alias("n1m"),
            "gain1",
            "nd",
            (F.col("s").cast("double") / F.col("nd")).alias("mean"),
            (F.col("num1d") / (F.col("nd") * F.col("nmd"))).alias("gm"),
            (
                (F.lit(0.0) - F.col("num1d"))
                / (F.col("nd") * (F.col("nd") - F.col("nmd")))
            ).alias("gr"),
            F.col("s").cast("double").alias("sd"),
            F.col("q").cast("double").alias("qd"),
            "n",
        )
        .localCheckpoint(eager=True)
    )

    in1 = (
        F.when(
            ((F.col("bf") == "status") & (F.col("f_status") == F.col("bv")))
            | ((F.col("bf") == "month") & (F.col("f_month") == F.col("bv")))
            | ((F.col("bf") == "wday") & (F.col("f_wday") == F.col("bv"))),
            1,
        )
        .otherwise(0)
        .alias("in1")
    )
    base2 = base.crossJoin(F.broadcast(best1.select("bf", "bv"))).select(
        "yc", "f_status", "f_month", "f_wday", in1
    )
    cand2 = _fv(base2).groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.sum("yc").cast("long").alias("am"),
        F.sum("in1").cast("long").alias("kin"),
    )
    g2 = cand2.crossJoin(F.broadcast(best1)).select(
        "feature",
        "val",
        "nm",
        F.col("nm").cast("double").alias("nmd"),
        (
            (
                (F.col("am").cast("double") - F.col("nm").cast("double") * F.col("mean"))
                - F.col("kin").cast("double") * F.col("gm")
            )
            - (F.col("nm") - F.col("kin")).cast("double") * F.col("gr")
        ).alias("sum2"),
        "nd",
    )
    g2s = g2.select(
        "*",
        F.when(F.col("nmd") == F.col("nd"), F.lit(-1.0))
        .otherwise(
            (F.col("sum2") * F.col("sum2")) / F.col("nmd")
            + (F.col("sum2") * F.col("sum2")) / (F.col("nd") - F.col("nmd"))
        )
        .alias("gain2"),
    )
    wr2 = Window.orderBy(F.col("gain2").desc(), "feature", "val")
    best2 = (
        g2s.withColumn("rk", F.row_number().over(wr2))
        .filter(F.col("rk") == 1)
        .select(
            F.col("feature").alias("f2"),
            F.col("val").alias("v2"),
            F.col("nm").alias("n2m"),
            F.col("nmd").alias("n2md"),
            "sum2",
            "gain2",
        )
    )
    fin = best1.crossJoin(F.broadcast(best2)).select(
        "*",
        (
            (F.col("qd") - 2.0 * F.col("mean") * F.col("sd"))
            + F.col("nd") * (F.col("mean") * F.col("mean"))
        ).alias("sse0"),
    ).localCheckpoint(eager=True)

    r0 = fin.select(
        F.lit(0).cast("long").alias("round"),
        F.lit("<baseline>").alias("feature"),
        F.lit("<baseline>").alias("val"),
        F.col("n").alias("n_match"),
        F.lit(0.0).alias("leaf_delta_match"),
        F.lit(0.0).alias("leaf_delta_rest"),
        F.lit(0.0).alias("sse_reduction_frac"),
        round6(F.sqrt(F.col("sse0") / F.col("nd")) / 100.0).alias("rmse"),
    )
    r1 = fin.select(
        F.lit(1).cast("long").alias("round"),
        F.col("bf").alias("feature"),
        F.col("bv").alias("val"),
        F.col("n1m").alias("n_match"),
        round6(F.col("gm") / 100.0).alias("leaf_delta_match"),
        round6(F.col("gr") / 100.0).alias("leaf_delta_rest"),
        round6(F.col("gain1") / F.col("sse0")).alias("sse_reduction_frac"),
        round6(
            F.sqrt((F.col("sse0") - F.col("gain1")) / F.col("nd")) / 100.0
        ).alias("rmse"),
    )
    r2 = fin.select(
        F.lit(2).cast("long").alias("round"),
        F.col("f2").alias("feature"),
        F.col("v2").alias("val"),
        F.col("n2m").alias("n_match"),
        round6((F.col("sum2") / F.col("n2md")) / 100.0).alias(
            "leaf_delta_match"
        ),
        round6(
            ((F.lit(0.0) - F.col("sum2")) / (F.col("nd") - F.col("n2md")))
            / 100.0
        ).alias("leaf_delta_rest"),
        round6(
            F.col("gain2") / (F.col("sse0") - F.col("gain1"))
        ).alias("sse_reduction_frac"),
        round6(
            F.sqrt(
                ((F.col("sse0") - F.col("gain1")) - F.col("gain2"))
                / F.col("nd")
            )
            / 100.0
        ).alias("rmse"),
    )
    return r0.unionAll(r1).unionAll(r2).coalesce(1).sortWithinPartitions("round")
