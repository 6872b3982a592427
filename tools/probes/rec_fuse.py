import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir,'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('rec-fuse')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows//500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16<<20))
    .config('spark.sql.files.minPartitionNum', '64')
    .config('spark.sql.files.openCostInBytes', str(128<<10))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from kwery_spark.catalog import table
li = table(spark, sf_dir, 'lineitem').select('l_orderkey','l_partkey')
part = table(spark, sf_dir, 'part').select('p_partkey','p_brand')
orders = table(spark, sf_dir, 'orders').select('o_orderkey','o_custkey')
for name in ('lineitem','part','orders'): table(spark, sf_dir, name).count()

def build(fused):
    j = (li.join(part, li.l_partkey==part.p_partkey)
           .join(orders, li.l_orderkey==orders.o_orderkey)
           .select(F.col('o_custkey').alias('u'), F.col('p_brand').alias('b')))
    if fused:
        j = j.repartition('u')
    ub = j.groupBy('u','b').agg(F.count(F.lit(1)).cast('long').alias('v'))
    return (ub.groupBy('u').agg(F.sort_array(F.collect_list(F.struct('b','v'))).alias('bv'))
        .groupBy('bv').agg(F.count(F.lit(1)).cast('long').alias('m')))

def t(label, fn, reps=3):
    best=9e9
    for i in range(reps):
        t0=time.perf_counter(); d=fn(); d.localCheckpoint(eager=True); dt=time.perf_counter()-t0
        best=min(best,dt)
    print(f"{label}: best {best:.1f}s")

# alternating
for r in range(2):
    t(f"rep{r} unfused", lambda: build(False))
    t(f"rep{r} fused", lambda: build(True))
# value equality
a = sorted(map(tuple, build(False).collect()))
b = sorted(map(tuple, build(True).collect()))
print("equal:", a==b)
