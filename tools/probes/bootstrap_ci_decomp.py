"""events_bootstrap_ci decomposition + inline-aggregate candidate
(VERDICT r15 #4: re-earn the r13 'linear, no lever' closure note with a
fresh-JVM decomposition on the current box, or find the stage that
dominates).

Stages timed (noop sink, fresh frame per rep):
  scan    — bare (event_type, event_id, value) scan floor.
  md5     — explode(0..31) + the value-defining md5-derived Poisson
            count, reduced by ONE global sum (no (type,b) shuffle):
            isolates the 32x-per-row hash work from the aggregation.
  current — the registered operator.
  inline  — candidate: the 32 replicates as 64 INLINE aggregate
            expressions (sum(c_b*value), sum(c_b) per b) grouped by
            event_type only — same md5 count, same DECIMAL sums (order-
            independent ⇒ bit-identical), but no 32x exploded-row
            materialization through the partial aggregate; the (type,b)
            replicate rows are rebuilt by stacking the 1-row-per-type
            aggregate. Values asserted identical to current.

Usage: python tools/probes/bootstrap_ci_decomp.py <sf_dir>
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
    builder("bootstrap-decomp")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .config("spark.sql.files.minPartitionNum", "64")
    .config("spark.sql.files.openCostInBytes", str(128 << 10))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F
from pyspark.sql import Window

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import round6, table
from kwery_spark.operators.analytics import _POISSON1_CDF_CASE
from kwery_spark.registry import QUERIES


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, mk, reps=3):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter()
        noop(mk())
        dt = time.perf_counter() - t0
        best = min(best, dt) if i > 0 else best
        print(f"    rep{i}: {dt:.3f}s", flush=True)
    print(f"  {label}: best {best:.3f}s", flush=True)
    return best


U = (
    "CAST(conv(substring(md5(concat(cast(event_id AS string), '_', "
    "cast(b AS string))), 1, 8), 16, 10) AS BIGINT) / 4294967296.0"
)


def scan():
    return table(spark, sf_dir, "events").select("event_type", "event_id", "value")


def md5_only():
    reps = scan().withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31))))
    c = F.expr(_POISSON1_CDF_CASE.format(u=f"({U})"))
    return reps.select(c.alias("c")).groupBy().agg(F.sum("c"))


def inline():
    ev = scan()
    aggs = []
    for b in range(32):
        u = U.replace("cast(b AS string)", f"'{b}'")
        c = F.expr(_POISSON1_CDF_CASE.format(u=f"({u})"))
        aggs.append(
            F.sum(c * F.col("value").cast("decimal(18,2)")).alias(f"ws{b}")
        )
        aggs.append(F.sum(c).alias(f"wc{b}"))
    aggs.append(F.count(F.lit(1)).alias("n_events"))
    aggs.append(F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"))
    one = ev.groupBy("event_type").agg(*aggs)
    stacked = ", ".join(f"{b}, ws{b}, wc{b}" for b in range(32))
    boot = (
        one.select(
            "event_type",
            "n_events",
            "vsum",
            F.expr(f"stack(32, {stacked}) AS (b, wsum, wcnt)"),
        )
        .filter(F.col("wcnt") > 0)
        .withColumn("mean_b", F.col("wsum").cast("double") / F.col("wcnt"))
    )
    wr = Window.partitionBy("event_type").orderBy("mean_b", "b")
    wn = Window.partitionBy("event_type")
    ci = (
        boot.withColumn("rk", F.row_number().over(wr))
        .withColumn("nb", F.count(F.lit(1)).over(wn))
        .groupBy("event_type", "n_events", "vsum")
        .agg(
            F.max("nb").alias("n_reps"),
            round6(F.max(F.when(F.col("rk") == 2, F.col("mean_b")))).alias("ci_lo"),
            round6(
                F.max(F.when(F.col("rk") == F.col("nb") - 1, F.col("mean_b")))
            ).alias("ci_hi"),
        )
    )
    return ci.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        round6(F.col("vsum").cast("double") / F.col("n_events")).alias("mean_obs"),
        "n_reps",
        "ci_lo",
        "ci_hi",
    ).coalesce(1).sortWithinPartitions("event_type")


print(f"== events_bootstrap_ci decomposition @ {sf_dir}")
t("scan   ", scan)
t("md5    ", md5_only)
t("current", lambda: QUERIES["events_bootstrap_ci"](spark, sf_dir))
t("inline ", inline)

cur = QUERIES["events_bootstrap_ci"](spark, sf_dir).toPandas()
new = inline().toPandas()
cur = cur[sorted(cur.columns)].sort_values("event_type").reset_index(drop=True)
new = new[sorted(new.columns)].sort_values("event_type").reset_index(drop=True)
same = cur.shape == new.shape and all(
    (cur[c] == new[c]).all() for c in cur.columns
)
print(f"  VALUES EQUAL (exact): {same}  rows={len(cur)}")
if not same:
    print(cur)
    print(new)
print("loadavg:", os.getloadavg())
