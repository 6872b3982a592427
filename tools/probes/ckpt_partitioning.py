"""Does Dataset.checkpoint / localCheckpoint preserve outputPartitioning
and outputOrdering in THIS Spark (4.1.2), with and without AQE?

The r16 pair_weights arms A/B found `nosort` never losing, and a round-1
subtree dump showed `Scan ExistingRDD ... UnknownPartitioning(0)` under
the reliable checkpoint — which would make the stored sort AND the
claimed exchange-free downstream zips fiction. This probe decides it
empirically: build a repartition(c)+sortWithinPartitions(c) frame, snap
it four ways (checkpoint/localCheckpoint x AQE on/off), then plan a
groupBy(c) consumer and count Exchanges.

Usage: python tools/probes/ckpt_partitioning.py <sf_dir>
"""
import sys

sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
from kwery_spark.session import builder

spark = builder("ckpt-partitioning-probe").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir("/tmp/ckpt_probe")
import pyspark.sql.functions as F

from kwery_spark.catalog import table
from kwery_spark.plans.inspect import formatted_plan


def base():
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.withColumn("c", F.col("l_suppkey") * 2)
        .repartition("c")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("wt"))
        .sortWithinPartitions("c")
    )


for aqe in ("true", "false"):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    for kind in ("checkpoint", "localCheckpoint"):
        df = base()
        snap = df.checkpoint(eager=True) if kind == "checkpoint" else df.localCheckpoint(eager=True)
        # physical partitioning as captured by the LogicalRDD
        part = snap._jdf.queryExecution().executedPlan().outputPartitioning().toString()
        order = snap._jdf.queryExecution().executedPlan().outputOrdering().toString()
        consumer = snap.groupBy("c").agg(F.sum("wt").alias("x"))
        plan = formatted_plan(consumer)
        print(
            f"AQE={aqe} {kind:16s} partitioning={part[:60]:60s} "
            f"ordering={order[:40]:40s} consumerExchanges={plan.count('Exchange')}"
        )
