"""assoc_basket_rules orderkey-bucketed arm A/B (r15, VERDICT r14 #4).

Usage: python tools/probes/assoc_bucketed_ab.py <sf_dir> [reps]
Sweep confs; build_bucketed runs untimed first (offline-maintenance
class). Times the basket-build stage (the r14 decomposition's dominant
term) and the full key, alternating raw/bucketed arms; prints the
pre-checkpoint plan's Exchange count for both arms.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir, 'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('assoc-bkt-ab')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows // 500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16 << 20))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from kwery_spark.catalog import (broadcast_fits, build_bucketed, bucketed_db,
                                 bucketed_table, table)
import kwery_spark.all_ops
from kwery_spark.registry import QUERIES

t0 = time.perf_counter()
build_bucketed(spark, sf_dir)
print(f"bucketed build/probe (untimed prep): {time.perf_counter()-t0:.1f}s")


def sets_build(bucketed: bool):
    if bucketed:
        bdb = bucketed_db(spark, sf_dir)
        li = bucketed_table(spark, bdb, 'lineitem').select('l_orderkey', 'l_partkey')
    else:
        li = table(spark, sf_dir, 'lineitem').select('l_orderkey', 'l_partkey')
    part = table(spark, sf_dir, 'part').select('p_partkey', 'p_brand')
    part_side = F.broadcast(part) if broadcast_fits(sf_dir, 'part', 24) else part
    return (li.join(part_side, li.l_partkey == part.p_partkey)
        .groupBy('l_orderkey')
        .agg(F.array_sort(F.collect_set('p_brand')).alias('items'))
        .groupBy('items').agg(F.count(F.lit(1)).cast('long').alias('m')))

for arm in (False, True):
    df = sets_build(arm)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), 'formatted')
    import re
    n_ex = len(re.findall(r'^\(\d+\) Exchange$', plan, flags=re.MULTILINE))
    print(f"sets subtree ({'bucketed' if arm else 'raw'}): {n_ex} Exchange")

for rep in range(reps):
    for arm in (False, True):
        spark.conf.set('spark.kwery.bucketed', 'true' if arm else 'false')
        t0 = time.perf_counter()
        sets_build(arm).write.format('noop').mode('overwrite').save()
        dt = time.perf_counter() - t0
        print(f"rep{rep} basket build {'bucketed' if arm else 'raw':>8}: {dt:.2f}s")
for rep in range(reps):
    for arm in (False, True):
        spark.conf.set('spark.kwery.bucketed', 'true' if arm else 'false')
        t0 = time.perf_counter()
        QUERIES['assoc_basket_rules'](spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        print(f"rep{rep} full key {'bucketed' if arm else 'raw':>8}: {dt:.2f}s")
spark.conf.unset('spark.kwery.bucketed')
