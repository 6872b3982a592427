"""Config experiment harness: run a subset of headline keys under conf
overrides given as KEY=VALUE args, fresh JVM per invocation.

Usage: python tools/bench_conf.py [--sf DIR] [--prep] [--keys a,b] k=v ...

--sf DIR   bench against DIR instead of /root/testdata/sf0.1
--prep     run the bench.py offline prep first (optimize_layout +
           analyze_tables + CBO confs) so the experiment measures the
           same storage/catalog state as the real bench
--keys     comma-separated subset of the headline keys (faster A/Bs)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from kwery_spark.session import builder

KEYS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "win_row_number",
    "text_tokenize",
    "fn_json",
    "join_semi",
    "stream_tumbling",
    "sim_knn_bruteforce",
    "agg_grouping_sets",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    prep = False
    confs = []
    keys = KEYS
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--prep":
            prep = True
        elif a == "--keys":
            keys = args.pop(0).split(",")
        else:
            confs.append(a)
    b = builder("bench-conf")
    for arg in confs:
        k, v = arg.split("=", 1)
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import kwery_spark.all_ops  # noqa: F401
    from kwery_spark.registry import QUERIES

    if prep:
        from kwery_spark.catalog import (
            analyze_tables,
            build_bucketed,
            cache_tables,
            optimize_layout,
        )

        optimize_layout(spark, sf_dir)
        analyze_tables(spark, sf_dir)
        build_bucketed(spark, sf_dir)
        if (spark.conf.get("spark.kwery.cacheTables", "false") or "").lower() == "true":
            cache_tables(spark, sf_dir)
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        # mirror bench.py _prep: shuffle parallelism scales with corpus —
        # unless the experiment explicitly pins it on the command line
        import os as _os

        import pyarrow.parquet as _pq

        rows = _pq.ParquetFile(
            _os.path.join(sf_dir, "lineitem.parquet")
        ).metadata.num_rows
        if not any(a.startswith("spark.sql.shuffle.partitions=") for a in confs):
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000)))
            )
        if not any(a.startswith("spark.sql.files.maxPartitionBytes=") for a in confs):
            # mirror bench.py _prep: one split per 16 MB v3 row group
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024)
            )
        if not any(
            a.startswith("spark.sql.autoBroadcastJoinThreshold=") for a in confs
        ) and rows >= 15_000_000:
            # mirror bench.py _prep: stats exist post-ANALYZE; the 32 MB
            # lift is corpus-scaled (wins at sf3+/regresses sf1, r6)
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
            )
        if not any(a.startswith("spark.sql.adaptive.enabled=") for a in confs):
            # mirror bench.py _prep (r12): AQE off below 15M rows — the
            # per-stage job materialization is pure floor at small SFs
            spark.conf.set(
                "spark.sql.adaptive.enabled",
                "true" if rows >= 15_000_000 else "false",
            )
    out = {}
    for key in keys:
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).toPandas()  # Arrow path, same as bench.py
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        out[key] = round(min(times), 3)
    out["TOTAL"] = round(sum(out.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
