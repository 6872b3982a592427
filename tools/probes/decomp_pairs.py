import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir,'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('decomp-pairs')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows//500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16<<20))
    .config('spark.sql.files.minPartitionNum', '64')
    .config('spark.sql.files.openCostInBytes', str(128<<10))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from kwery_spark.catalog import table
import kwery_spark.all_ops
from kwery_spark.registry import QUERIES

def t(label, fn, reps=3):
    best=9e9
    for i in range(reps):
        t0=time.perf_counter(); fn(); dt=time.perf_counter()-t0
        best=min(best,dt)
    print(f"  {label}: best {best:.1f}s")
    return best

# warm the scans
for name in ('lineitem','part','orders'):
    table(spark, sf_dir, name).count()

# ---- assoc_basket_rules stages
li = table(spark, sf_dir, 'lineitem').select('l_orderkey','l_partkey')
part = table(spark, sf_dir, 'part').select('p_partkey','p_brand')
print("assoc_basket_rules:")
def sets_build():
    return (li.join(part, li.l_partkey == part.p_partkey)
        .groupBy('l_orderkey').agg(F.array_sort(F.collect_set('p_brand')).alias('items'))
        .groupBy('items').agg(F.count(F.lit(1)).cast('long').alias('m'))
        .localCheckpoint(eager=True))
t("stage1 join+basket+contract (ckpt)", sets_build)
# sub-decompose: join+basket agg only (count to materialize)
def join_basket():
    (li.join(part, li.l_partkey==part.p_partkey)
      .groupBy('l_orderkey').agg(F.array_sort(F.collect_set('p_brand')).alias('items'))
      .agg(F.count(F.lit(1))).collect())
t("  sub: join+collect_set only", join_basket)
def join_only():
    li.join(part, li.l_partkey==part.p_partkey).agg(F.count(F.lit(1))).collect()
t("  sub: join only", join_only)
sets = sets_build()
def rest():
    QUERIES_sets = sets
    n = sets.agg(F.sum('m').cast('long').alias('n_baskets'))
    item_n = (sets.select(F.explode('items').alias('item'),'m').groupBy('item')
        .agg(F.sum('m').cast('long').alias('n_item')))
    pair_n = (sets.select(F.explode('items').alias('antecedent'),'items','m')
        .select('antecedent',F.explode('items').alias('consequent'),'m')
        .filter(F.col('antecedent')!=F.col('consequent'))
        .groupBy('antecedent','consequent').agg(F.sum('m').cast('long').alias('n_ab')))
    ia = item_n.select(F.col('item').alias('antecedent'),F.col('n_item').alias('n_ante'))
    ic = item_n.select(F.col('item').alias('consequent'),F.col('n_item').alias('n_cons'))
    (pair_n.join(F.broadcast(ia),'antecedent').join(F.broadcast(ic),'consequent')
        .crossJoin(F.broadcast(n)).filter(F.col('n_ab')*100>=F.col('n_baskets'))
        .agg(F.count(F.lit(1))).collect())
t("stage2 explodes+rules (from ckpt)", rest)
t("full key", lambda: QUERIES['assoc_basket_rules'](spark, sf_dir).toPandas())

# ---- rec_item_item_cf stages
orders = table(spark, sf_dir, 'orders').select('o_orderkey','o_custkey')
print("rec_item_item_cf:")
def vecs_build():
    ub = (li.join(part, li.l_partkey==part.p_partkey)
        .join(orders, li.l_orderkey==orders.o_orderkey)
        .groupBy(F.col('o_custkey').alias('u'),F.col('p_brand').alias('b'))
        .agg(F.count(F.lit(1)).cast('long').alias('v')))
    return (ub.groupBy('u').agg(F.sort_array(F.collect_list(F.struct('b','v'))).alias('bv'))
        .groupBy('bv').agg(F.count(F.lit(1)).cast('long').alias('m'))
        .localCheckpoint(eager=True))
t("stage1 3way-join+ub+vecs (ckpt)", vecs_build)
def threeway():
    (li.join(part, li.l_partkey==part.p_partkey)
       .join(orders, li.l_orderkey==orders.o_orderkey)
       .agg(F.count(F.lit(1))).collect())
t("  sub: 3-way join only", threeway)
def ub_only():
    (li.join(part, li.l_partkey==part.p_partkey)
       .join(orders, li.l_orderkey==orders.o_orderkey)
       .groupBy(F.col('o_custkey').alias('u'),F.col('p_brand').alias('b'))
       .agg(F.count(F.lit(1)).cast('long').alias('v'))
       .agg(F.count(F.lit(1))).collect())
t("  sub: +groupBy(u,b)", ub_only)
vecs = vecs_build()
def rest2():
    n2 = (vecs.select(F.explode('bv').alias('a'),'m').groupBy(F.col('a.b').alias('b'))
        .agg(F.sum(F.col('m')*F.col('a.v')*F.col('a.v')).cast('long').alias('n2')))
    dot = (vecs.select(F.explode('bv').alias('a'),'bv','m')
        .select('a',F.explode('bv').alias('c'),'m')
        .filter(F.col('a.b')!=F.col('c.b'))
        .groupBy(F.col('a.b').alias('ba'),F.col('c.b').alias('bb'))
        .agg(F.sum(F.col('m')*F.col('a.v')*F.col('c.v')).cast('long').alias('dot')))
    nx = n2.select(F.col('b').alias('ba'),F.col('n2').alias('n2a'))
    dot.join(F.broadcast(nx),'ba').agg(F.count(F.lit(1))).collect()
t("stage2 explodes+cosine (from ckpt)", rest2)
t("full key", lambda: QUERIES['rec_item_item_cf'](spark, sf_dir).toPandas())
print("distinct baskets:", sets.count(), "distinct vecs:", vecs.count())
