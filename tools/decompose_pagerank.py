"""Stage-timing decomposition of graph_pagerank (VERDICT r12 #5) —
build-vs-rounds split at a scaled corpus, mirroring the r12 LPA
decomposition protocol (fresh JVM, corpus-scaled shuffle partitions,
each component materialized once in dependency order so later timings
exclude earlier work).

Usage: python tools/decompose_pagerank.py [--sf /root/repo/.data/sf30]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kwery_spark.session import builder


def main() -> None:
    sf_dir = "/root/repo/.data/sf30"
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
    import pyarrow.parquet as pq

    rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
    spark = (
        builder("decompose-pagerank")
        .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as F
    from pyspark.sql.functions import broadcast

    from kwery_spark.operators import graph as G

    t0 = time.perf_counter()
    w = G._pair_weights(spark, sf_dir)
    t1 = time.perf_counter()
    print(f"_pair_weights build+ckpt: {t1 - t0:.1f}s")

    pairs = w.select("c", "s")
    degc = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("degc")).localCheckpoint(
        eager=True
    )
    t2 = time.perf_counter()
    print(f"degc ckpt (zip groupBy, {degc.count()} rows): {t2 - t1:.1f}s")
    degs = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("degs")).localCheckpoint(
        eager=True
    )
    t3 = time.perf_counter()
    print(f"degs ckpt (s shuffle, {degs.count()} rows): {t3 - t2:.1f}s")

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
    from kwery_spark.catalog import broadcast_fits

    small_s = broadcast_fits(sf_dir, "supplier", 16)
    t4 = time.perf_counter()
    for i in range(3):
        c_msgs = pairs.join(prc, "c").select(
            "s", (F.col("pr") / F.col("degc")).alias("m")
        )
        contrib_s = c_msgs.groupBy("s").agg(F.sum("m").alias("contrib"))
        s_side = prs.select("s", (F.col("pr") / F.col("degs")).alias("m"))
        s_msgs = pairs.join(broadcast(s_side) if small_s else s_side, "s").select(
            "c", "m"
        )
        contrib_c = s_msgs.groupBy("c").agg(F.sum("m").alias("contrib"))
        prc = (
            degc.join(contrib_c, "c", "left")
            .crossJoin(broadcast(nn))
            .select(
                "c",
                "degc",
                (
                    F.lit(1 - G._D) / F.col("n")
                    + F.lit(G._D) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        prs = (
            degs.join(contrib_s, "s", "left")
            .crossJoin(broadcast(nn))
            .select(
                "s",
                "degs",
                (
                    F.lit(1 - G._D) / F.col("n")
                    + F.lit(G._D) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        t5 = time.perf_counter()
        print(f"round {i + 1}: {t5 - t4:.1f}s")
        t4 = t5
    out = prc.select(
        G._node_str(F.col("c")).alias("node"), F.round("pr", 6).alias("pagerank")
    ).unionAll(
        prs.select(
            G._node_str(F.col("s")).alias("node"), F.round("pr", 6).alias("pagerank")
        )
    )
    n = len(out.toPandas())
    t6 = time.perf_counter()
    print(f"final union materialize ({n} rows): {t6 - t4:.1f}s")
    print(f"TOTAL: {t6 - t0:.1f}s")


if __name__ == "__main__":
    main()
