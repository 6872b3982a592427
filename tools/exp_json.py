"""fn_json parse-strategy experiment (r5, VERDICT item 1).

Fresh JVM per invocation; one variant per run so JIT/page-cache warmth
can't bleed between strategies.

Usage: python tools/exp_json.py VARIANT [--sf DIR]
  VARIANT in: from_json | variant | get_json_object | json_tuple | regexp
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kwery_spark.session import builder


def main() -> None:
    variant = sys.argv[1]
    sf_dir = "/root/repo/.data/sf3"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = builder("exp-json").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from kwery_spark.catalog import analyze_tables, optimize_layout, scan_splits, table

    optimize_layout(spark, sf_dir)
    analyze_tables(spark, sf_dir)
    import pyarrow.parquet as _pq

    rows = _pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
    spark.conf.set("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))

    def build():
        ev = table(spark, sf_dir, "events").select("event_type", "props")
        target = max(8, spark.sparkContext.defaultParallelism // 2)
        if scan_splits(sf_dir, "events") < target // 2:
            ev = ev.repartition(target)
        if variant == "from_json":
            k = F.from_json(F.col("props"), "k INT").getField("k")
        elif variant == "variant":
            k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
        elif variant == "get_json_object":
            k = F.get_json_object(F.col("props"), "$.k").cast("int")
        elif variant == "json_tuple":
            ev = ev.select("event_type", F.json_tuple(F.col("props"), "k").alias("ks"))
            k = F.col("ks").cast("int")
        elif variant == "regexp":
            k = F.regexp_extract(F.col("props"), r'"k"\s*:\s*(-?\d+)', 1).cast("int")
        else:
            raise SystemExit(f"unknown variant {variant}")
        return (
            ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.avg("k").alias("avg_k"),
                F.max("k").alias("max_k"),
                F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_high_k"),
            )
        )

    times = []
    for i in range(4):
        t0 = time.perf_counter()
        build().toPandas()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    print(json.dumps({variant: round(min(times), 3), "all": [round(t, 3) for t in times]}))


if __name__ == "__main__":
    main()
