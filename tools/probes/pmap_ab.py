import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir,'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('pmap-ab')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows//500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16<<20))
    .config('spark.sql.files.minPartitionNum', '64')
    .config('spark.sql.files.openCostInBytes', str(128<<10))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from pyspark.sql.functions import broadcast
from kwery_spark.catalog import table, broadcast_fits
print("broadcast_fits(part,24):", broadcast_fits(sf_dir, "part", 24))
li = table(spark, sf_dir, 'lineitem').select('l_orderkey','l_partkey')
part = table(spark, sf_dir, 'part').select('p_partkey','p_brand')
orders = table(spark, sf_dir, 'orders').select('o_orderkey','o_custkey')
for name in ('lineitem','part','orders'): table(spark, sf_dir, name).count()

def assoc_build(bc):
    p = broadcast(part) if bc else part
    return (li.join(p, li.l_partkey == part.p_partkey)
        .groupBy('l_orderkey').agg(F.array_sort(F.collect_set('p_brand')).alias('items'))
        .groupBy('items').agg(F.count(F.lit(1)).cast('long').alias('m')))

def rec_build(bc):
    p = broadcast(part) if bc else part
    j = (li.join(p, li.l_partkey==part.p_partkey)
           .join(orders, li.l_orderkey==orders.o_orderkey)
           .select(F.col('o_custkey').alias('u'), F.col('p_brand').alias('b'))
           .repartition('u'))
    ub = j.groupBy('u','b').agg(F.count(F.lit(1)).cast('long').alias('v'))
    return (ub.groupBy('u').agg(F.sort_array(F.collect_list(F.struct('b','v'))).alias('bv'))
        .groupBy('bv').agg(F.count(F.lit(1)).cast('long').alias('m')))

def t(label, fn, reps=2):
    best=9e9
    for i in range(reps):
        t0=time.perf_counter(); d=fn(); d.localCheckpoint(eager=True); dt=time.perf_counter()-t0
        best=min(best,dt)
    print(f"{label}: best {best:.1f}s", flush=True)

for r in range(2):
    t(f"rep{r} assoc shuffle-join", lambda: assoc_build(False))
    t(f"rep{r} assoc bcast-pmap  ", lambda: assoc_build(True))
for r in range(2):
    t(f"rep{r} rec shuffle-join", lambda: rec_build(False))
    t(f"rep{r} rec bcast-pmap  ", lambda: rec_build(True))
a = sorted(map(tuple, assoc_build(False).collect())); b = sorted(map(tuple, assoc_build(True).collect()))
print("assoc equal:", a==b)
c = sorted(map(tuple, rec_build(False).collect())); d = sorted(map(tuple, rec_build(True).collect()))
print("rec equal:", c==d)
