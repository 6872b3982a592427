"""q18_large_volume / q9_product_profit / dq_referential_integrity
decomposition + candidate A/B (r15 continuation).

Usage: python tools/probes/heavy_keys_decomp.py <sf_dir> [keys...]
Fresh JVM, sweep-like confs; times current registered plan vs candidate,
asserts value equality.

Candidates:
  q18  — ONE lineitem pass: the per-orderkey sum(l_quantity) aggregate
         serves BOTH the HAVING>250 filter and the final per-order
         sum_qty (orderkey is in the output group keys, so the final
         group's sum IS the order's q; quantities are integral-valued
         doubles, so the sums are exact and order-independent). The old
         shape scanned + shuffled lineitem twice and re-aggregated 60M
         rows at the end.
  q9   — footer-gated key broadcasts (the r14 partkey-map class): the
         'red'-filtered part KEY set and the (s_suppkey, s_nationkey)
         map broadcast under catalog.broadcast_fits, removing the
         partkey and suppkey shuffles of lineitem; the orderkey SMJ
         stays (orders is past any honest broadcast budget).
  dq_ri— same class per FK: parent sides are key-only projections;
         broadcast each under the footer gate (nation is spec-constant
         25 rows), plain anti-join fallback past the gate.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
keys = sys.argv[2:] or ["q18_large_volume", "q9_product_profit", "dq_referential_integrity"]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder("heavy-keys-decomp")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import broadcast_fits, table
from kwery_spark.registry import QUERIES


def t(label, fn, reps=4):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
        print(f"    rep{i}: {dt:.3f}s")
    print(f"  {label}: best {best:.3f}s")
    return best


table(spark, sf_dir, "lineitem").count()  # warm scan


def q18_candidate():
    li = table(spark, sf_dir, "lineitem")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(oq, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )


def q9_candidate():
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    if broadcast_fits(sf_dir, "part", 8):
        part = F.broadcast(part)
    if broadcast_fits(sf_dir, "supplier", 16):
        supp = F.broadcast(supp)
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .coalesce(1)
        .sortWithinPartitions(F.col("nation"), F.col("o_year").desc())
    )


_RI = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def dq_ri_candidate():
    rows_out = None
    for fk, child, ck, parent, pk in _RI:
        c = table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        if parent == "nation" or broadcast_fits(sf_dir, parent, 8):
            p = F.broadcast(p)
        orphans = c.join(p, "k", "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("n_orphans")
        )
        total = c.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        row = total.crossJoin(F.broadcast(orphans)).select(
            F.lit(fk).alias("fk"),
            "n_child",
            "n_orphans",
            F.when(F.col("n_orphans") == 0, 1).otherwise(0).alias("ri_holds"),
            F.round(
                F.col("n_orphans").cast("double") / F.col("n_child"), 6
            ).alias("orphan_rate"),
        )
        rows_out = row if rows_out is None else rows_out.unionAll(row)
    return rows_out.coalesce(1).sortWithinPartitions("fk")


CANDS = {
    "q18_large_volume": q18_candidate,
    "q9_product_profit": q9_candidate,
    "dq_referential_integrity": dq_ri_candidate,
}
SORT = {
    "q18_large_volume": ["o_totalprice", "o_orderdate", "o_orderkey"],
    "q9_product_profit": ["nation", "o_year"],
    "dq_referential_integrity": ["fk"],
}

for key in keys:
    print(f"== {key} @ {sf_dir}")
    t("current", lambda: QUERIES[key](spark, sf_dir).toPandas())
    t("candidate", lambda: CANDS[key]().toPandas())
    cur = QUERIES[key](spark, sf_dir).toPandas().sort_values(SORT[key]).reset_index(drop=True)
    new = CANDS[key]().toPandas().sort_values(SORT[key]).reset_index(drop=True)
    cur = cur[sorted(cur.columns)]
    new = new[sorted(new.columns)]
    same = cur.shape == new.shape and all(
        (cur[c] == new[c]).all()
        if cur[c].dtype.kind not in "fc"
        else (abs(cur[c] - new[c]) < 1e-9).all()
        for c in cur.columns
    )
    print(f"  VALUES EQUAL: {same}  ({len(cur)} rows)")
    if not same:
        print(cur.head(8))
        print(new.head(8))

print("loadavg:", os.getloadavg())
