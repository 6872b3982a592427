"""Dump q18_large_volume physical plans before/after the r16
limit-below-the-customer-join rewrite (plans/r16/). The 'before' arm is
the r15 shape inlined verbatim from the prior commit; 'after' is the
registered operator. Run at sf10 with sweep confs so the planner
thresholds bind like the graded runs.

Usage: python tools/probes/q18_plan_dump.py <sf_dir> <out_dir>
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sf_dir, out_dir = sys.argv[1], sys.argv[2]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder("q18-plan-dump")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import table
from kwery_spark.plans.inspect import formatted_plan
from kwery_spark.registry import QUERIES


def before():
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


os.makedirs(out_dir, exist_ok=True)
for name, df in (
    ("q18_large_volume_before", before()),
    ("q18_large_volume_after", QUERIES["q18_large_volume"](spark, sf_dir)),
):
    plan = formatted_plan(df)
    with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
        f.write(plan)
    print(f"{name}: Exchange={plan.count('Exchange')} "
          f"SMJ={plan.count('SortMergeJoin')} BHJ={plan.count('BroadcastHashJoin')}")
