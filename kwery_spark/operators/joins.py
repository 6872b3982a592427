"""Join operators (SURVEY.md §2.3): hash/broadcast/outer/semi/anti/cross/
theta, plus the three custom ops Spark lacks natively — range join (bucketed),
as-of join (union + window), and self-join.

Scale notes (100 TB discipline):
- equi-joins shuffle both sides on the key → SortMergeJoin/ShuffledHashJoin;
  AQE converts to broadcast when runtime stats allow.
- fixed-size dims (region 5, nation 25) get explicit broadcast() hints.
- non-equi joins degrade to BroadcastNestedLoopJoin: only ever run them with
  a provably-small broadcast side (join_theta) or convert to
  equi-prefix + residual via bucketing (join_range) so the plan stays a
  hash join at any scale.
- the as-of join avoids a per-key sort-merge against the full history by a
  union + event-time window (single shuffle on the join key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import broadcast

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "join_inner_hash",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderstatus, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 250000.0
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join on the fact chain; filter pushed below the join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_totalprice"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side (broadcast) join against fixed-size dims — no shuffle of the
    fact side at all; the plan is BroadcastHashJoin at any SF."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_multiway",
    oracle="""
    SELECT r.r_name, count(*) AS n_items, avg(l.l_quantity) AS avg_qty
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: the fact chain shuffles on its natural keys; the two
    fixed dims broadcast."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_items"), F.avg("l_quantity").alias("avg_qty"))
    )


@register(
    "join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, big.max_big_qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, max(l_quantity) AS max_big_qty
        FROM lineitem WHERE l_quantity > 48.0 GROUP BY l_orderkey
    ) big ON o.o_orderkey = big.l_orderkey
    WHERE o.o_orderkey <= 5000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: unmatched left rows survive with NULL padding.
    Aggregate-below-join keeps the nullable side small (scale: pre-agg
    before an outer join beats outer-join-then-agg on shuffle volume)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    big = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 48.0)
        .groupBy("l_orderkey")
        .agg(F.max("l_quantity").alias("max_big_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey, "left").select(
        "o_orderkey", "o_totalprice", "max_big_qty"
    )


@register(
    "join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, c.c_custkey, c.c_name
    FROM (SELECT * FROM orders WHERE o_totalprice > 350000.0) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 500
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every customer survives, order columns NULL-padded."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000.0)
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_orderstatus", "c_custkey", "c_name"
    )


@register(
    "join_full",
    oracle="""
    SELECT
        coalesce(a.o_custkey, b.o_custkey) AS custkey,
        a.n_1996, b.n_1997
    FROM (
        SELECT o_custkey, count(*) AS n_1996 FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
    ) a
    FULL JOIN (
        SELECT o_custkey, count(*) AS n_1997 FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_custkey
    ) b ON a.o_custkey = b.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two yearly activity aggregates — rows from
    either side survive (customers active only in one of the years)."""
    o = table(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = year_counts(1996, "n_1996").withColumnRenamed("o_custkey", "custkey_a")
    b = year_counts(1997, "n_1997").withColumnRenamed("o_custkey", "custkey_b")
    return a.join(b, a.custkey_a == b.custkey_b, "full").select(
        F.coalesce("custkey_a", "custkey_b").alias("custkey"), "n_1996", "n_1997"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): emits each matching left row once — the
    shuffle carries only the distinct keys of the right side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no big-ticket order.

    The right side is filtered (o_totalprice > 300k) so unmatched
    customers EXIST at every SF (3 / 30 / 308 rows at sf0.001/0.01/0.1)
    — r7 verdict flagged the unfiltered form as vacuous: every sf0.01
    customer has at least one order, so the anti-join returned 0 rows
    and the value-check had never compared a row."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name, concat(r.r_name, '/', n.n_name) AS pair
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two fixed-size dims (5 x 25) →
    BroadcastNestedLoopJoin. Only ever sane when one side is tiny."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(broadcast(n)).select(
        "r_name", "n_name", F.concat_ws("/", "r_name", "n_name").alias("pair")
    )


@register(
    "join_theta",
    oracle="""
    SELECT p.p_partkey, count(*) AS n_orders_above
    FROM (
        SELECT p_partkey, p_retailprice FROM part
        ORDER BY p_retailprice DESC, p_partkey LIMIT 50
    ) p
    JOIN orders o ON o.o_totalprice > p.p_retailprice * 150.0
    GROUP BY p.p_partkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join. The 50-row side is broadcast explicitly
    so the physical plan is BroadcastNestedLoopJoin with the SMALL side
    replicated — the only shape at which a theta join survives scale."""
    p = (
        table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(50)
    )
    o = table(spark, sf_dir, "orders")
    return (
        o.join(broadcast(p), o.o_totalprice > p.p_retailprice * 150.0)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders_above"))
    )


@register(
    "join_range",
    oracle="""
    SELECT e.event_id, count(c.event_id) AS n_clicks_10min
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: for each error event, count clicks in the next
    10 minutes.

    Scale: a naive time-range join is a nested loop. We add an equi-prefix
    by bucketing both sides to 10-minute epochs and joining bucket-to-
    {bucket, bucket+1} (every 10-min lookahead window spans at most two
    buckets), then apply the exact range residual. The plan becomes a hash
    join on (bucket) — shuffle-partitionable at any scale.
    """
    ev = table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / 600).cast("long")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("ts").alias("e_ts"), bucket.alias("e_b")
    )
    # replicate errors into their two candidate buckets
    err2 = err.withColumn("probe_b", F.explode(F.array(F.col("e_b"), F.col("e_b") + 1)))
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"), bucket.alias("c_b")
    )
    joined = err2.join(
        clk,
        (err2.probe_b == clk.c_b)
        & (clk.c_ts >= err2.e_ts)
        & (clk.c_ts < err2.e_ts + F.expr("INTERVAL 10 MINUTES")),
        "left",
    )
    # count clicks per error; left-join keeps zero-click errors (count(c_id)=0)
    return joined.groupBy(F.col("e_id").alias("event_id")).agg(
        F.count("c_id").alias("n_clicks_10min")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: list[str],
) -> DataFrame:
    """General as-of LEFT join: every left row, annotated with
    ``right_cols`` from the latest right row (per ``by`` group) whose
    ``right_on`` is <= the left row's ``left_on``; nulls when no such row.

    Spark has no native ASOF JOIN; this is the union+window formulation:
    tag both sides, union, and take ``last(<right struct>, ignorenulls)``
    over a per-group event-time window. One shuffle on the group key, no
    join at all — at 100 TB this beats a per-key sort-merge against full
    history because carried state is a single running struct. Ties
    (right_on == left_on) sort the right side first so they are visible,
    matching ASOF's <= semantics. Right rows whose (by, right_on) pair is
    duplicated are tie-broken arbitrarily — same as native ASOF engines.

    ``right_cols`` names must not collide with left's columns; the output
    schema is left's columns followed by ``right_cols``.
    """
    ldtypes = dict(left.dtypes)
    non_by = [c for c in left.columns if c not in by]
    rstruct = F.struct(*right_cols)
    rtype = right.select(rstruct.alias("__rv")).schema["__rv"].dataType
    l_tagged = left.select(
        *by,
        *non_by,
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtype).alias("__rv"),
    )
    r_tagged = right.select(
        *by,
        *[F.lit(None).cast(ldtypes[c]).alias(c) for c in non_by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        rstruct.alias("__rv"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col("__last").getField(c).alias(c) for c in right_cols],
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(v.ts AS TIMESTAMP) AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest view of the same user
    at-or-before its timestamp. Built on the reusable ``asof_join``
    (union + window, single shuffle); property-tested against DuckDB's
    native ASOF JOIN in tests/test_property.py."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("last_view_ts")
    )
    return asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="ts",
        right_cols=["last_view_ts"],
    )


_ASOF_TOL_US = 6 * 3600 * 1_000_000  # 6-hour max staleness


@register(
    "join_asof_tolerance",
    oracle=f"""
    SELECT event_id, user_id, purchase_ts,
           CASE WHEN fresh THEN lv END AS last_view_ts,
           CASE WHEN fresh
                THEN round((epoch_us(purchase_ts) - epoch_us(lv)) / 1000000.0, 6)
           END AS staleness_sec
    FROM (
        SELECT p.event_id, p.user_id,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               CAST(v.ts AS TIMESTAMP) AS lv,
               v.ts IS NOT NULL
                 AND epoch_us(CAST(v.ts AS TIMESTAMP))
                     >= epoch_us(CAST(p.ts AS TIMESTAMP)) - {_ASOF_TOL_US} AS fresh
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts)
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness (r9, VERDICT item 7): each
    purchase matched to the latest same-user view at-or-before its
    timestamp, but a match older than the 6-hour tolerance is discarded
    (NULL) — the feature-store default, where a stale feature is worse
    than no feature. Also emits the staleness in seconds for the fresh
    matches.

    Built on the same union+window ``asof_join`` (one shuffle, no join);
    the tolerance is a post-predicate on the matched event time, NOT a
    window-frame change, so the plan is identical to join_asof plus one
    projection. Staleness math in integer microseconds (unix_micros /
    epoch_us on both engines — the sub-second-arithmetic rule), one
    float division, rounded 6dp."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("last_view_ts")
    )
    j = asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="purchase_ts",
        right_on="ts",
        right_cols=["last_view_ts"],
    )
    fresh = F.col("last_view_ts").isNotNull() & (
        F.unix_micros("last_view_ts")
        >= F.unix_micros("purchase_ts") - F.lit(_ASOF_TOL_US)
    )
    return j.select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.when(fresh, F.col("last_view_ts")).alias("last_view_ts"),
        F.when(
            fresh,
            F.round(
                (F.unix_micros("purchase_ts") - F.unix_micros("last_view_ts"))
                / 1e6,
                6,
            ),
        ).alias("staleness_sec"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           CAST(min(CAST(v.ts AS TIMESTAMP)) AS TIMESTAMP) AS next_view_ts,
           round(CASE WHEN min(CAST(v.ts AS TIMESTAMP)) IS NOT NULL
                 THEN (epoch_us(min(CAST(v.ts AS TIMESTAMP)))
                       - epoch_us(CAST(p.ts AS TIMESTAMP))) / 1000000.0
                 END, 6) AS secs_to_next
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (r9): each purchase matched to the EARLIEST
    same-user view at-or-after its timestamp — time-to-next-event, the
    attribution/conversion-lag direction the backward family can't
    answer. Completes the as-of suite (backward, backward+tolerance,
    nearest, forward).

    Implementation: the same union+window ``asof_join`` run on NEGATED
    event time (integer microseconds) — forward-earliest on t is exactly
    backward-latest on -t, ties included on both sides of the mapping.
    Still one shuffle on the user key, no join. The oracle states the
    semantics directly (min over a per-purchase inequality join) rather
    than replaying the negation trick — DuckDB's group sizes at the gate
    SF make the quadratic form cheap, and the independent formulation is
    a stronger check than a mirrored one."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        (-F.unix_micros("ts")).alias("neg_t"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        (-F.unix_micros("ts")).alias("neg_t"),
        F.col("ts").alias("next_view_ts"),
    )
    j = asof_join(
        purchases,
        views,
        by=["user_id"],
        left_on="neg_t",
        right_on="neg_t",
        right_cols=["next_view_ts"],
    )
    return j.select(
        "event_id",
        "user_id",
        "purchase_ts",
        "next_view_ts",
        F.round(
            (F.unix_micros("next_view_ts") - F.unix_micros("purchase_ts")) / 1e6,
            6,
        ).alias("secs_to_next"),
    )


@register(
    "join_self",
    oracle="""
    SELECT o1.o_custkey AS custkey, count(*) AS n_pairs_30d
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderdate > o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_custkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: pairs of orders by the same customer within 30 days.
    Equi-join on custkey with a range residual — hash-joinable; the
    per-customer order count is small so the quadratic residual is bounded."""
    o1 = table(spark, sf_dir, "orders").alias("o1")
    o2 = table(spark, sf_dir, "orders").alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o2.o_orderdate") > F.col("o1.o_orderdate"))
            & (
                F.col("o2.o_orderdate")
                <= F.col("o1.o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs_30d"))
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS skew_key,
               value
        FROM events
    ),
    dim AS (
        SELECT DISTINCT user_id AS skew_key,
               CASE WHEN user_id % 5 = 0 THEN 'gold' ELSE 'std' END AS tier
        FROM events
        UNION
        SELECT 0, 'gold'
    )
    SELECT d.tier, count(*) AS n_events, CAST(sum(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM fact f JOIN dim d ON f.skew_key = d.skew_key
    GROUP BY d.tier
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under heavy key skew.

    A third of the fact rows are collapsed onto key 0 (synthesized skew —
    the corpus itself is uniform), which would make one shuffle partition
    ~500x its siblings. The salting pattern: fact rows get
    salt = pmod(xxhash64(event_id), 8); the dim side is replicated once
    per salt value; the join key becomes (skew_key, salt), spreading the
    hot key over 8 partitions. The oracle is the UNSALTED join — results
    are salting-invariant by construction, which is exactly the property
    that makes the rewrite safe at 100 TB. (Spark's AQE skew handling
    covers sort-merge cases automatically; explicit salting is the tool
    when AQE can't see the skew, e.g. pre-aggregation grouping.)
    """
    n_salts = 8
    ev = table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("user_id") % 3 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
        "value",
        F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).alias("salt"),
    )
    tier = F.when(F.col("skew_key") % 5 == 0, F.lit("gold")).otherwise(F.lit("std"))
    dim = (
        ev.select(F.col("user_id").alias("skew_key"))
        .distinct()
        .unionByName(ev.sparkSession.range(1).select(F.lit(0).cast("long").alias("skew_key")))
        .distinct()
        .select("skew_key", tier.alias("tier"))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return (
        fact.join(dim_salted, ["skew_key", "salt"])
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (
        SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS n_a
        FROM orders GROUP BY 1
    ),
    b AS (
        SELECT nullif(o_orderstatus, 'F') AS k, count(*) AS n_b
        FROM orders GROUP BY 1
    )
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics data-repair
    and change-capture joins need. Still a hash-partitionable equi-join
    (null-safe equality hashes NULL to a regular bucket), so unlike an
    OR-based null workaround it never degrades to nested-loop."""
    o = table(spark, sf_dir, "orders")
    a = (
        o.select(F.nullif("o_orderstatus", F.lit("P")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        o.select(F.nullif("o_orderstatus", F.lit("F")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"], "n_a", "n_b")


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS s,
               CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 DAY AS e
        FROM orders
    )
    SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           CAST(datediff('day',
                         greatest(a.s, b.s),
                         least(a.e, b.e)) AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.s < b.e AND b.s < a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: each order opens a 7-day validity
    window; find overlapping window pairs per customer. The equi-key
    (customer) carries the shuffle — the overlap predicate is a residual
    on an already-blocked pair space whose size is bounded by orders-per-
    customer (~10 at any TPC-H SF), so the quadratic term never scales
    with the corpus. For interval sets WITHOUT a natural block key, the
    join_range time-bucket rewrite applies (bucket by chunk, probe
    adjacent chunks)."""
    o = table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            F.datediff(
                F.least("a.e", "b.e").cast("date"),
                F.greatest("a.s", "b.s").cast("date"),
            ).cast("long").alias("overlap_days"),
        )
    )


@register(
    "join_hinted",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT)
               AS price_floor_sum
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'MACHINERY'
    GROUP BY o.o_orderpriority
    """,
)
def join_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join strategy HINT surface: force a shuffled hash join where the
    planner would default to sort-merge. Hints are the manual override
    for when statistics mislead the optimizer — SHJ skips both sort
    passes at the cost of building a per-partition hash map, the right
    trade when one side is modestly sized per partition but too big to
    broadcast. tests/test_plans.py locks that the hint actually lands
    (ShuffledHashJoin in the plan, no SortMergeJoin).

    Scale: same single co-partitioned shuffle as the default join —
    only the per-partition algorithm changes, which is exactly why the
    hint is safe to ship: it cannot change results or shuffle volume,
    only local CPU/memory shape."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
        .hint("shuffle_hash")
    )
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor("o_totalprice").cast("long")).alias("price_floor_sum"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS vts
        FROM events WHERE event_type = 'view'
    ),
    b AS (
        SELECT p.event_id, p.user_id, p.pts, v.vts AS bts
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND v.vts <= p.pts
    ),
    f AS (
        SELECT p.event_id, v.vts AS fts
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND v.vts >= p.pts
    ),
    chosen AS (
        SELECT b.event_id, b.user_id, b.pts,
               CASE
                   WHEN bts IS NULL AND fts IS NULL THEN NULL
                   WHEN fts IS NULL THEN bts
                   WHEN bts IS NULL THEN fts
                   WHEN epoch_us(pts) - epoch_us(bts)
                        <= epoch_us(fts) - epoch_us(pts) THEN bts
                   ELSE fts
               END AS nts
        FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id, pts AS purchase_ts, nts AS nearest_view_ts,
           CASE WHEN nts IS NULL THEN 'none'
                WHEN nts <= pts THEN 'before' ELSE 'after' END AS direction,
           CAST(abs(epoch_us(pts) - epoch_us(nts)) AS BIGINT) AS gap_us
    FROM chosen
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both-direction (nearest) as-of join: each purchase matched to the
    CLOSEST view of the same user in either time direction — the
    time-series workhorse behind sensor alignment and quote/trade
    matching when "latest before" alone loses the fresher later sample.
    Ties (equal gap, including an exactly-simultaneous view) resolve to
    the backward match, deterministically in both engines.

    Same union+window formulation as ``asof_join`` but BOTH running
    extremes come out of one frame: tag views 0 / purchases 1, union,
    and per user take last(view_ts) over the preceding frame (latest <=)
    plus first(view_ts) over the following frame (earliest >) — one
    shuffle on user_id, no join at all, versus DuckDB's two native ASOF
    passes. A view at exactly the purchase's timestamp sorts BEFORE the
    purchase (side 0 first), so the backward extreme sees it and wins
    the tie with gap 0 — matching the oracle's <=/>= pair, where the
    equal-gap CASE also picks the backward row. Only the matched
    timestamp is emitted, so duplicate view timestamps per user cannot
    make the pick nondeterministic. Gap arithmetic is unix_micros
    (sub-second ts — never second-truncated casts)."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    tagged = purchases.select(
        "user_id",
        "event_id",
        F.col("pts").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("timestamp").alias("__v"),
    ).unionByName(
        views.select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.col("vts").alias("__t"),
            F.lit(0).alias("__side"),
            F.col("vts").alias("__v"),
        )
    )
    base = Window.partitionBy("user_id").orderBy(
        F.col("__t").asc(), F.col("__side").asc()
    )
    bts = F.last("__v", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, 0)
    )
    fts = F.first("__v", ignorenulls=True).over(
        base.rowsBetween(0, Window.unboundedFollowing)
    )
    gap_b = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("bts"))
    gap_f = F.unix_micros(F.col("fts")) - F.unix_micros(F.col("__t"))
    nts = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None))
        .when(F.col("fts").isNull(), F.col("bts"))
        .when(F.col("bts").isNull(), F.col("fts"))
        .when(gap_b <= gap_f, F.col("bts"))
        .otherwise(F.col("fts"))
    )
    return (
        tagged.withColumn("bts", bts)
        .withColumn("fts", fts)
        .filter(F.col("__side") == 1)
        .withColumn("nts", nts)
        .select(
            "event_id",
            "user_id",
            F.col("__t").alias("purchase_ts"),
            F.col("nts").alias("nearest_view_ts"),
            F.when(F.col("nts").isNull(), "none")
            .when(F.col("nts") <= F.col("__t"), "before")
            .otherwise("after")
            .alias("direction"),
            F.abs(
                F.unix_micros(F.col("__t")) - F.unix_micros(F.col("nts"))
            ).alias("gap_us"),
        )
    )
