"""q18_large_volume r16 candidate: push the ORDER BY + LIMIT 100 BELOW
the customer join (VERDICT r15 #6 asked for an A/B on the remaining
orders⋈oq exchanges; this candidate instead removes the OTHER join's
two exchanges outright).

Every ordering key (o_totalprice, o_orderdate, o_orderkey) is an
orders-side column, and the customer join is 1:1 total (o_custkey is an
enforced FK — dq_referential_integrity reports 0 orphans at every SF),
so top-100-then-join == join-then-top-100. The candidate takes the
top-100 qualifying orders FIRST (TakeOrderedAndProject — partial top-K
map-side, no exchange), then broadcast-joins the 100-row frame to
customer: customer is scanned but never shuffled, removing the custkey
SMJ's two exchanges. A terminal re-sort of <=100 rows restores the
output order contract.

Usage: python tools/probes/q18_limit_first.py <sf_dir>
Fresh JVM, sweep-like confs; value equality asserted.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder("q18-limit-first")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import table
from kwery_spark.registry import QUERIES


def t(label, fn, reps=4):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
        print(f"    rep{i}: {dt:.3f}s", flush=True)
    print(f"  {label}: best {best:.3f}s", flush=True)
    return best


def candidate():
    li = table(spark, sf_dir, "lineitem")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    top_orders = (
        orders.join(oq, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )
    return (
        cust.join(F.broadcast(top_orders), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )


table(spark, sf_dir, "lineitem").count()  # warm scan

print(f"== q18_large_volume @ {sf_dir}")
t("current  ", lambda: QUERIES["q18_large_volume"](spark, sf_dir).toPandas())
t("candidate", lambda: candidate().toPandas())
SORT = ["o_totalprice", "o_orderdate", "o_orderkey"]
cur = (
    QUERIES["q18_large_volume"](spark, sf_dir)
    .toPandas()
    .sort_values(SORT)
    .reset_index(drop=True)
)
new = candidate().toPandas().sort_values(SORT).reset_index(drop=True)
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
