"""graph_pagerank per-round state A/B (VERDICT r15 #3): with the
bipartite half-step design in place, the remaining per-round levers are
(a) how the round state is checkpointed — localCheckpoint (current,
pins ~|C| rows in executor memory) vs _ckpt disk checkpoint — and
(b) whether the two half-updates can share ONE pass over the 176M-row
pair checkpoint per round (fused arm: both message sets emitted from a
single join stage via explode, one partially-aggregated groupBy(node)
on the disjoint even/odd id space, parity-split after).

The _pair_weights family build is paid ONCE up front (memoized in
_SHARED), then the arms alternate A/B/A/B on the warm artifact — the
same isolation the r12 LPA round A/B used: the build is identical in
every arm, so only round cost differs.

The fused arm REGROUPS float additions (per-node contribution sums see
a different add order), so its values are asserted equal to current
AFTER the 6dp output round — the absorption argument pagerank already
relies on across engines. If the assert fails the arm is dead on
arrival regardless of speed.

Usage: python tools/probes/pagerank_rounds_ab.py <sf_dir>
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
    builder("pagerank-rounds-ab")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .config("spark.sql.files.minPartitionNum", "64")
    .config("spark.sql.files.openCostInBytes", str(128 << 10))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.kwery.bucketed", "false")  # sweep protocol
import pyspark.sql.functions as F
from pyspark.sql.functions import broadcast

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import broadcast_fits
from kwery_spark.operators.graph import _D, _ckpt, _lckpt, _node_str, _pair_weights
from kwery_spark.registry import QUERIES

# pay the family build once, outside every timed arm
t0 = time.perf_counter()
_pair_weights(spark, sf_dir).count()
print(f"pair_weights build (untimed, shared): {time.perf_counter() - t0:.1f}s",
      flush=True)


def _prep():
    w = _pair_weights(spark, sf_dir)
    pairs = w.select("c", "s")
    degc = _lckpt(pairs.groupBy("c").agg(F.count(F.lit(1)).alias("degc")))
    degs = _lckpt(pairs.groupBy("s").agg(F.count(F.lit(1)).alias("degs")))
    nn = (
        degc.agg(F.count(F.lit(1)).alias("k"))
        .unionAll(degs.agg(F.count(F.lit(1)).alias("k")))
        .agg(F.sum("k").cast("double").alias("n"))
        .localCheckpoint(eager=True)
    )
    prc = degc.crossJoin(broadcast(nn)).select(
        "c", "degc", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    prs = degs.crossJoin(broadcast(nn)).select(
        "s", "degs", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    return pairs, degc, degs, nn, prc, prs


def current(ckpt):
    pairs, degc, degs, nn, prc, prs = _prep()
    small_s = broadcast_fits(sf_dir, "supplier", 16)
    for _ in range(3):
        c_msgs = pairs.join(prc, "c").select(
            "s", (F.col("pr") / F.col("degc")).alias("m")
        )
        contrib_s = c_msgs.groupBy("s").agg(F.sum("m").alias("contrib"))
        s_side = prs.select("s", (F.col("pr") / F.col("degs")).alias("m"))
        s_msgs = pairs.join(
            broadcast(s_side) if small_s else s_side, "s"
        ).select("c", "m")
        contrib_c = s_msgs.groupBy("c").agg(F.sum("m").alias("contrib"))
        prc = ckpt(
            degc.join(contrib_c, "c", "left")
            .crossJoin(broadcast(nn))
            .select(
                "c", "degc",
                (F.lit(1 - _D) / F.col("n")
                 + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
        )
        prs = ckpt(
            degs.join(contrib_s, "s", "left")
            .crossJoin(broadcast(nn))
            .select(
                "s", "degs",
                (F.lit(1 - _D) / F.col("n")
                 + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
        )
    return prc.select(
        _node_str(F.col("c")).alias("node"), F.round("pr", 6).alias("pagerank")
    ).unionAll(
        prs.select(
            _node_str(F.col("s")).alias("node"), F.round("pr", 6).alias("pagerank")
        )
    )


def fused():
    pairs, degc, degs, nn, prc, prs = _prep()
    small_s = broadcast_fits(sf_dir, "supplier", 16)
    for _ in range(3):
        s_side = prs.select(
            F.col("s").alias("s2"), (F.col("pr") / F.col("degs")).alias("ms")
        )
        both = (
            pairs.join(prc, "c")
            .join(
                broadcast(s_side) if small_s else s_side,
                F.col("s") == F.col("s2"),
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("s").alias("node"),
                            (F.col("pr") / F.col("degc")).alias("m"),
                        ),
                        F.struct(
                            F.col("c").alias("node"), F.col("ms").alias("m")
                        ),
                    )
                ).alias("x")
            )
            .select("x.node", "x.m")
        )
        contrib = both.groupBy("node").agg(F.sum("m").alias("contrib"))
        contrib = _lckpt(contrib)
        prc = (
            degc.join(
                contrib.filter(F.col("node") % 2 == 0).withColumnRenamed("node", "c"),
                "c", "left",
            )
            .crossJoin(broadcast(nn))
            .select(
                "c", "degc",
                (F.lit(1 - _D) / F.col("n")
                 + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
        )
        prc = _lckpt(prc)
        prs = (
            degs.join(
                contrib.filter(F.col("node") % 2 == 1).withColumnRenamed("node", "s"),
                "s", "left",
            )
            .crossJoin(broadcast(nn))
            .select(
                "s", "degs",
                (F.lit(1 - _D) / F.col("n")
                 + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("pr"),
            )
        )
        prs = _lckpt(prs)
    return prc.select(
        _node_str(F.col("c")).alias("node"), F.round("pr", 6).alias("pagerank")
    ).unionAll(
        prs.select(
            _node_str(F.col("s")).alias("node"), F.round("pr", 6).alias("pagerank")
        )
    )


def local_ck(df):
    # the committed round snapshot (capture-enabled localCheckpoint)
    return _lckpt(df)


ARMS = {
    "local(cur)": lambda: current(local_ck),
    "diskckpt  ": lambda: current(_ckpt),
    "fused     ": fused,
}

# alternating A/B/A/B so drift hits every arm equally
times = {k: [] for k in ARMS}
for rep in range(2):
    for name, fn in ARMS.items():
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"  rep{rep} {name}: {dt:.2f}s rows={n}", flush=True)
for name, ts in times.items():
    print(f"ARM {name}: {['%.2f' % x for x in ts]} best {min(ts):.2f}s")

# value check: fused vs current after the 6dp round
cur = current(local_ck).toPandas().sort_values("node").reset_index(drop=True)
fus = fused().toPandas().sort_values("node").reset_index(drop=True)
same = (cur["node"] == fus["node"]).all() and (
    cur["pagerank"] == fus["pagerank"]
).all()
print(f"FUSED VALUES EQUAL (post-round): {same}")
if not same:
    import numpy as np

    d = (cur["pagerank"] - fus["pagerank"]).abs()
    print("max abs diff:", d.max(), "n diff:", int((d > 0).sum()))
print("loadavg:", os.getloadavg())
