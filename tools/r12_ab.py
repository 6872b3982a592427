"""Round-12 fresh-process A/B harness for the scale-frontier keys
(q16 / q21 / LPA / q5). Each invocation is ONE fresh JVM running ONE
variant (the bench_conf discipline — in-session repeats overstate JIT
warmth); run it several times per variant for a best-of-N.

Usage: python tools/r12_ab.py --sf /root/repo/.data/sf10 [--conf k=v ...]
           [--partitions N] variant

Variants are registered in VARIANTS below; each is fn(spark, sf_dir) ->
DataFrame built FRESH (never a reused instance — stage-skipping rule).
Prints one line: {"variant":..., "sec":..., "rows":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402


def q16_v0(spark, sf_dir):
    from kwery_spark.registry import QUERIES

    return QUERIES["q16_supplier_part_counts"](spark, sf_dir)


def q16_shufjoin(spark, sf_dir):
    """No part broadcast, no useless pair-distinct: anti bad suppliers
    map-side, shuffle-join part on partkey, countDistinct on the group
    keys (one distinct shuffle instead of two + a 2M-row broadcast)."""
    from kwery_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    pairs = li.join(
        broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
    )
    return (
        pairs.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


def q16_bcast_nodist(spark, sf_dir):
    """Keep the part broadcast but drop the useless first distinct —
    isolates the broadcast-vs-shuffle-join question."""
    from kwery_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    pairs = li.join(
        broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
    )
    return (
        pairs.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


def q16_gid(spark, sf_dir):
    """bcast_nodist + dense-group-id contraction: the shuffle carries
    (gid int, suppkey) instead of (brand,type,size,suppkey) strings, and
    the broadcast build slims to (partkey, gid). Triples re-attached at
    the end from the 7k-row gid table."""
    from pyspark.sql import Window

    from kwery_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    triples = (
        part.select("p_brand", "p_type", "p_size")
        .distinct()
        .withColumn(
            "gid",
            F.row_number().over(
                Window.orderBy("p_brand", "p_type", "p_size")
            ),
        )
        .localCheckpoint(eager=True)
    )
    pmap = part.join(
        broadcast(triples), ["p_brand", "p_type", "p_size"]
    ).select("p_partkey", "gid")
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    pairs = li.join(
        broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
    )
    counted = (
        pairs.join(broadcast(pmap), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("gid")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
    return (
        counted.join(broadcast(triples), "gid")
        .select("p_brand", "p_type", "p_size", "supplier_cnt")
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


def q21_v0(spark, sf_dir):
    from kwery_spark.registry import QUERIES

    return QUERIES["q21_waiting_suppliers"](spark, sf_dir)


def q21_pairagg(spark, sf_dir):
    """Expand-free q21: aggregate per (orderkey, suppkey) first — max
    shipdate decides lateness — then per orderkey. Both aggregations are
    exchange-free over the join's orderkey partitioning (HashPartitioning
    on a subset of the grouping keys satisfies the distribution), so the
    ×3 Expand and its 540M-row shuffle disappear."""
    from kwery_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    per_pair = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            (
                F.max("l_shipdate")
                > F.min("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late")
        )
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.col("is_late").cast("long")).alias("n_late"),
            F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        per_order.join(broadcast(supp), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def lpa_v0(spark, sf_dir):
    from kwery_spark.registry import QUERIES

    return QUERIES["graph_label_propagation"](spark, sf_dir)


def q5_v0(spark, sf_dir):
    from kwery_spark.registry import QUERIES

    return QUERIES["q5_local_supplier"](spark, sf_dir)


VARIANTS = {
    "q16_v0": q16_v0,
    "q16_shufjoin": q16_shufjoin,
    "q16_bcast_nodist": q16_bcast_nodist,
    "q16_gid": q16_gid,
    "q21_v0": q21_v0,
    "q21_pairagg": q21_pairagg,
    "lpa_v0": lpa_v0,
    "q5_v0": q5_v0,
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/repo/.data/sf10"
    confs: list[tuple[str, str]] = []
    partitions = None
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--conf":
            k, v = args.pop(0).split("=", 1)
            confs.append((k, v))
        elif a == "--partitions":
            partitions = args.pop(0)
        else:
            names.append(a)

    from kwery_spark.session import builder

    b = builder("r12-ab")
    for k, v in confs:
        if k.startswith("spark.") and not k.startswith("spark.sql."):
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if partitions:
        spark.conf.set("spark.sql.shuffle.partitions", partitions)
    for k, v in confs:
        if k.startswith("spark.sql."):
            spark.conf.set(k, v)
    import kwery_spark.all_ops  # noqa: F401

    for name in names:
        # time from BUILD start: eager checkpoints inside operator
        # construction are real work (the sweep times the same span)
        t0 = time.perf_counter()
        df = VARIANTS[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "variant": name,
                    "sf": sf_dir,
                    "partitions": partitions,
                    "sec": round(dt, 2),
                    "rows": n,
                }
            ),
            flush=True,
        )




def _lpa_build_v2(spark, sf_dir):
    """Prototype r12 build: (a) repartition(c) BEFORE the groupBy so the
    pair aggregation reuses that exchange (HashPartitioning(c) satisfies
    groupBy(c,s)) instead of shuffling the 177M-pair table twice; (b) the
    degree caps via per-group sorted-slice aggregation (sort avg-degree
    lists per node) instead of full-partition window sorts."""
    from kwery_spark.catalog import table
    from kwery_spark.operators.graph import _ckpt

    k = 16
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = _ckpt(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .repartition("c")
        .groupBy("c", "s")
        .agg(F.count(F.lit(1)).alias("wt"))
        .sortWithinPartitions("c")
    )
    fwd = (
        w.groupBy("c")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("wt")).alias("nw"), F.col("s")))
                ),
                1,
                k,
            ).alias("top")
        )
        .select(F.col("c").alias("src"), F.explode("top").alias("t"))
        .select("src", F.col("t.s").alias("dst"))
    )
    rev = (
        w.groupBy("s")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("wt")).alias("nw"), F.col("c")))
                ),
                1,
                k,
            ).alias("top")
        )
        .select(F.col("s").alias("src"), F.explode("top").alias("t"))
        .select("src", F.col("t.c").alias("dst"))
    )
    capped = _ckpt(fwd.union(rev).repartition("src").sortWithinPartitions("src"))
    return w, capped


def lpa_v2(spark, sf_dir):
    """Full LPA on the v2 build (same 3 vote rounds)."""
    from pyspark.sql import Window

    from kwery_spark.operators.graph import _node_str

    _, edges = _lpa_build_v2(spark, sf_dir)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("label"))
    for _ in range(3):
        labels = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("label").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .select(_node_str(F.col("lbl")).alias("community"), "n_members")
        .orderBy(F.col("n_members").desc(), "community")
        .limit(20)
    )


VARIANTS["lpa_v2"] = lpa_v2


def lpa_v3(spark, sf_dir):
    """Fuse-only: repartition(c) before the pair groupBy (one fewer 177M
    exchange); caps stay as the original row_number windows."""
    from pyspark.sql import Window

    from kwery_spark.catalog import table
    from kwery_spark.operators.graph import _ckpt, _node_str

    k = 16
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    w = _ckpt(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .repartition("c")
        .groupBy("c", "s")
        .agg(F.count(F.lit(1)).alias("wt"))
        .sortWithinPartitions("c")
    )
    wc = Window.partitionBy("c").orderBy(F.col("wt").desc(), F.col("s"))
    ws = Window.partitionBy("s").orderBy(F.col("wt").desc(), F.col("c"))
    fwd = (
        w.withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= k)
        .select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    rev = (
        w.withColumn("rk", F.row_number().over(ws))
        .filter(F.col("rk") <= k)
        .select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    edges = _ckpt(fwd.union(rev).repartition("src").sortWithinPartitions("src"))
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    win = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("label"))
    for _ in range(3):
        labels = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.col("label").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .select(_node_str(F.col("lbl")).alias("community"), "n_members")
        .orderBy(F.col("n_members").desc(), "community")
        .limit(20)
    )


VARIANTS["lpa_v3"] = lpa_v3

if __name__ == "__main__":
    main()
