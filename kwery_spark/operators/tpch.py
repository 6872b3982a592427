"""Headline analytical queries (TPC-H-shaped, adapted to the corpus schema).

These are the flagship end-to-end queries (SURVEY.md §6 benchmark keys).
Scale notes per query are inline: each is a pure declarative DataFrame plan —
partial aggregation, broadcast of fixed-size dims, and top-k fusion all come
from Catalyst; nothing materializes on the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from kwery_spark.catalog import bucketed_db, bucketed_table, cbo_active, stats_db, table
from kwery_spark.registry import register


def _bucketed(spark: SparkSession, sf_dir: str) -> str | None:
    """Bucketed-layout path gate: engaged only when the session opted
    into cost-based planning AND the offline bucketed build for this
    corpus exists (bench prep runs catalog.build_bucketed). Everything
    else — the correctness gate, vanilla driver sessions — gets None and
    falls through to the stats/hand plans over raw files."""
    if not cbo_active(spark):
        return None
    # experiment kill-switch (tools/bench_conf.py A/B runs):
    # spark.kwery.bucketed=false measures the stats/hand plans with the
    # bucketed build present but unused
    if (spark.conf.get("spark.kwery.bucketed", "true") or "").lower() == "false":
        return None
    return bucketed_db(spark, sf_dir)


# Memoized spec-constant key lists (r12). The ASIA nation-key collect is
# the r7-sanctioned bounded-scalar collect (25-row spec-constant table),
# but re-collecting it on every query build costs 2-3 driver jobs —
# ~0.2 s of the ~1.0 s sf10 q5 run was asia_keys + the nation/region
# footer reads (job census: 9 jobs/run, 3 of them this). Same memo
# discipline as graph._SHARED: keyed on (applicationId, resolved corpus,
# nation+region file fingerprints) so a regenerated corpus or a new
# session can never be served a stale list; the value is ≤25 ints, never
# a DataFrame (the stage-skipping trap does not apply to plan-time
# literals).
_NATION_MEMO: dict[tuple, tuple] = {}


def _nation_rows(spark: SparkSession, sf_dir: str) -> list:
    """The 25 nation rows + the ASIA region key set, collected ONCE per
    (session, corpus). Returns (rows, asia_region_keys) where rows are
    (n_nationkey, n_name, n_regionkey) tuples sorted by key."""
    import os

    from kwery_spark.sources.scans import _corpus_fingerprint

    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        # BOTH source files: the memoized value includes the ASIA region
        # keys collected from region, so a region-file change with an
        # unchanged nation fingerprint must also miss (ADVICE r12)
        _corpus_fingerprint(sf_dir, "nation"),
        _corpus_fingerprint(sf_dir, "region"),
    )
    hit = _NATION_MEMO.get(key)
    if hit is None:
        rows = tuple(
            sorted(
                (r.n_nationkey, r.n_name, r.n_regionkey)
                for r in table(spark, sf_dir, "nation")
                .select("n_nationkey", "n_name", "n_regionkey")
                .collect()
            )
        )
        asia = tuple(
            sorted(
                r.r_regionkey
                for r in table(spark, sf_dir, "region")
                .filter(F.col("r_name") == "ASIA")
                .select("r_regionkey")
                .collect()
            )
        )
        hit = (rows, asia)
        _NATION_MEMO[key] = hit
        while len(_NATION_MEMO) > 8:
            _NATION_MEMO.pop(next(iter(_NATION_MEMO)))
    return hit


def _asia_nation_keys(spark: SparkSession, sf_dir: str) -> list[int]:
    rows, asia = _nation_rows(spark, sf_dir)
    return sorted(k for (k, _n, rk) in rows if rk in asia)


def _stats_sql(spark: SparkSession, sf_dir: str, sql_fmt: str) -> DataFrame | None:
    """Cost-based path: when the session has CBO enabled AND an ANALYZEd
    catalog database exists for this sf_dir (catalog.analyze_tables —
    bench.py bootstraps it), plan the query over the stats-backed catalog
    tables and let the optimizer pick join order and build sides from
    rowCount/NDV instead of our hand-ordering. Returns None when either
    ingredient is missing, in which case callers fall back to the
    hand-tuned DataFrame plan — heuristics when stats are absent, CBO
    when they exist, exactly the posture a long-lived deployment has.
    Measured at sf0.1: q5 0.59 s → 0.38 s (CBO floats the supplier join
    under lineitem ahead of customer), q3 0.36 s → 0.28 s."""
    if not cbo_active(spark):
        return None
    db = stats_db(spark, sf_dir)
    if db is None:
        return None
    return spark.sql(sql_fmt.format(db=db))


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        sum(l_quantity)                                        AS sum_qty,
        sum(l_extendedprice)                                   AS sum_base_price,
        sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
        sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
        avg(l_quantity)                                        AS avg_qty,
        avg(l_extendedprice)                                   AS avg_price,
        avg(l_discount)                                        AS avg_disc,
        count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): scan → filter → hash agg → sort.

    Scale: the filter and the 2-column grouping key push into the parquet
    scan (PushedFilters + column pruning); Spark's HashAggregate runs
    partial (map-side) then final after a 6-group shuffle — at 100 TB the
    shuffle carries only num_partitions x 6 pre-aggregated rows.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # The aggregate is <= |returnflag| x |linestatus| rows at ANY scale
        # factor, so sort it in one task via a narrow coalesce instead of a
        # range-partitioning exchange (saves a whole stage + sampling pass).
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l.l_orderkey,
        sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
        o.o_orderdate,
        o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): 3-way join + agg + top-10.

    Scale: both joins are equi-joins on the orderkey/custkey chain; the
    selective c_mktsegment and date filters sit below the joins (Catalyst
    pushes them to the scans), so the shuffle carries only qualifying rows.
    The final ORDER BY+LIMIT fuses to TakeOrderedAndProject — no global sort.
    Under an ANALYZEd catalog + CBO (bench path) the same query is planned
    from statistics instead — see _stats_sql.

    Bucketed path (bench prep step 3, catalog.build_bucketed): with
    orders+lineitem hash-bucketed on orderkey, the plan is rewritten
    with the aggregate PUSHED BELOW the joins — revenue per orderkey is
    computed first (the final GROUP BY's key set is orderkey plus
    columns functionally dependent on it, so per-orderkey sums before
    the joins are value-identical), and both that aggregation and the
    orders join run exchange-free on the bucket partitioning. The only
    shuffle left in the query is the custkey semi-join against the
    filtered customer list — at 100 TB that turns four fact-table
    exchanges into one small one, which is the whole point of paying
    for the bucketed layout offline.
    """
    bdb = _bucketed(spark, sf_dir)
    if bdb is not None:
        cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
        li = bucketed_table(spark, bdb, "lineitem").filter(F.col("l_shipdate") > cutoff)
        lagg = li.groupBy("l_orderkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        orders = bucketed_table(spark, bdb, "orders").filter(F.col("o_orderdate") < cutoff)
        # r9: the semi-join build side reads the persisted 3-column
        # customer projection when the optimized layout is active
        # (catalog.slim_customer) — same values, far less decode
        from kwery_spark.catalog import slim_customer

        cust = (
            slim_customer(spark, sf_dir)
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        return (
            lagg.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )
    stats = _stats_sql(
        spark,
        sf_dir,
        """
        SELECT l.l_orderkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM {db}.customer c
        JOIN {db}.orders o ON c.c_custkey = o.o_custkey
        JOIN {db}.lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
    )
    if stats is not None:
        return stats
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
    SELECT
        n.n_name,
        sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way star join + agg.

    Scale: the three dimension tables are pre-joined into ONE filtered
    broadcast side (supplier ⋈ nation ⋈ region, ASIA only) — the classic
    star-join prep: the region filter shrinks the broadcast payload
    before it ships, and the fact chain sees a single broadcast join
    instead of three. Only customer⋈orders⋈lineitem shuffles, on natural
    keys. The c_nationkey = s_nationkey residual rides on the l_suppkey
    equi-join. (Measured: ~8% faster than three separate dim broadcasts
    at sf0.1 with identical results.) Under an ANALYZEd catalog + CBO
    (bench path) join order comes from statistics instead — see
    _stats_sql; the optimizer floats supplier⋈nation⋈region under
    lineitem ahead of customer, worth another ~35% at sf0.1.

    Bucketed path (catalog.build_bucketed, bench prep): lineitem joins
    the broadcast ASIA dims first (a filter in disguise — broadcast
    hash join preserves the probe side's bucket partitioning), then
    meets the date-filtered orders on the shared orderkey bucketing
    with NO exchange. Only the residual customer join (custkey +
    nationkey match) shuffles, and by then the fact stream is pruned to
    ASIA-supplier lineitems inside 1996 orders — a few percent of the
    table. One small exchange instead of four full-table ones.
    """
    bdb = _bucketed(spark, sf_dir)
    if bdb is not None:
        # r12: nation and region are spec-CONSTANT (25/5 rows), so the
        # supplier dim build folds them in as literals instead of joins
        # — the ASIA filter becomes an In(s_nationkey) pushed into the
        # supplier parquet scan and n_name a literal CASE map, killing
        # the three 1-task AQE broadcast-materialization jobs the tiny
        # joins cost per run (job census: 9 -> ~4 jobs; the 25-row
        # collect itself is memoized per session+corpus, _nation_rows).
        nrows, _asia_regions = _nation_rows(spark, sf_dir)
        asia_keys = _asia_nation_keys(spark, sf_dir)
        # single-expr literal map: one py4j call instead of 10 F.lit
        # round trips (plan BUILD time is part of every timed run)
        map_sql = ", ".join(
            "{}, '{}'".format(k, n.replace("'", "''"))
            for k, n, _rk in nrows
            if k in set(asia_keys)
        )
        dims = (
            table(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey").isin(asia_keys))
            .select(
                "s_suppkey",
                "s_nationkey",
                F.expr(f"element_at(map({map_sql}), s_nationkey)").alias(
                    "n_name"
                ),
            )
        )
        li = bucketed_table(spark, bdb, "lineitem").join(
            broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey")
        )
        orders = bucketed_table(spark, bdb, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        ).select("o_orderkey", "o_custkey")
        # r9: served from the persisted customer projection (_SLIM_COLS;
        # catalog.slim_customer — the covering-projection parity note
        # there) when the optimized layout is active; raw scan otherwise.
        # Catalyst prunes the columns q5 doesn't reference at the scan.
        from kwery_spark.catalog import slim_customer

        cust = slim_customer(spark, sf_dir).select("c_custkey", "c_nationkey")
        # c_nationkey = s_nationkey + r_name='ASIA' implies c_nationkey is
        # one of the <=25 ASIA nation keys. nation is a spec-CONSTANT
        # 25-row table at every SF (TPC-H), so evaluating the key list
        # driver-side is a bounded-scalar collect (same class as the
        # sanctioned dedup loop counter, never data-sized) and turns the
        # residual into a literal In() pushed into the customer parquet
        # scan — row groups skip and the broadcast build shrinks 5x.
        # Measured sf10: 1.60 -> 0.98 s; the broadcast-JOIN form of the
        # same pruning measured SLOWER (2.38 s) because it cannot push.
        # r12: the list is memoized per session+corpus (_asia_nation_keys)
        # — re-collecting a spec constant cost 3 of q5's 9 jobs per run.
        cust = cust.filter(F.col("c_nationkey").isin(asia_keys))
        return (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                cust,
                (F.col("o_custkey") == F.col("c_custkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey")),
            )
            .groupBy("n_name")
            .agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "revenue"
                )
            )
            .coalesce(1)
            .sortWithinPartitions(F.col("revenue").desc())
        )
    stats = _stats_sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
        FROM {db}.customer c
        JOIN {db}.orders o   ON c.c_custkey = o.o_custkey
        JOIN {db}.lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN {db}.supplier s ON l.l_suppkey = s.s_suppkey
                            AND c.c_nationkey = s.s_nationkey
        JOIN {db}.nation n   ON s.s_nationkey = n.n_nationkey
        JOIN {db}.region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        """,
    )
    if stats is not None:
        # same ≤25-row single-task sort as the hand-tuned plan (an SQL
        # ORDER BY would add a range-exchange sampling job)
        return stats.coalesce(1).sortWithinPartitions(F.col("revenue").desc())
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            broadcast(dims),
            (li.l_suppkey == dims.s_suppkey) & (cust.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        # <= 25 nations at any SF: single-task sort, no range exchange.
        .coalesce(1)
        .sortWithinPartitions(F.col("revenue").desc())
    )
