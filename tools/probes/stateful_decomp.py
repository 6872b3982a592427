"""stream_stateful stage decomposition (r15, VERDICT r14 #3).

Usage: python tools/probes/stateful_decomp.py <sf_dir>

Splits the heaviest never-triaged registry key into:
  a) batch floor      — plain batch groupBy(user_id) agg over the same input
                        (JVM-only lower bound: scan + shuffle + agg)
  b) jvm streaming    — the same aggregate run as a streaming query to a
                        memory sink (adds micro-batch machinery + state
                        store, still no Python)
  c) the real key     — applyInPandasWithState (adds the Python boundary:
                        every row crosses as Arrow, one pandas DataFrame
                        yielded per user) + the final max-collapse

Sweep confs (shuffle partitions from lineitem rows, 16MB splits).
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir, 'lineitem.parquet')).metadata.num_rows
erows = pq.ParquetFile(os.path.join(sf_dir, 'events.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('stateful-decomp')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows // 500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16 << 20))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from kwery_spark.catalog import table
import kwery_spark.all_ops
from kwery_spark.registry import QUERIES
from kwery_spark.streaming.live import _events_stream, _run_to_memory


def t(label, fn, reps=3):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"    run {i}: {dt:.2f}s")
    print(f"  {label}: best {best:.2f}s")
    return best


ev = table(spark, sf_dir, 'events')
n_users = ev.select('user_id').distinct().count()
print(f"events rows={erows:,} distinct users={n_users:,}")

# a) batch floor
def batch_floor():
    (ev.select('user_id', 'value').groupBy('user_id')
       .agg(F.count(F.lit(1)).alias('n_events'),
            F.sum(F.col('value')).alias('total_value'))
       .write.format('noop').mode('overwrite').save())
t('a) batch groupBy floor (noop sink)', batch_floor)

# b) JVM streaming agg (no Python): same input stream, JVM sum
def jvm_stream():
    stream = _events_stream(spark, sf_dir).select('user_id', 'value')
    agg = stream.groupBy('user_id').agg(
        F.count(F.lit(1)).alias('n_events'),
        F.sum('value').alias('total_value'))
    result, _ = _run_to_memory(agg, 'update')
    result.groupBy('user_id').agg(
        F.max('n_events').alias('n_events'),
        F.max('total_value').alias('total_value')).count()
t('b) JVM streaming agg to memory sink', jvm_stream)

# c) the real key
t('c) full key (applyInPandasWithState)',
  lambda: QUERIES['stream_stateful'](spark, sf_dir).toPandas())

# micro-batch census: how many batches did availableNow split into?
stream = _events_stream(spark, sf_dir).select('user_id', 'value')
agg = stream.groupBy('user_id').agg(F.count(F.lit(1)).alias('n'))
res, q = _run_to_memory(agg, 'update')
print('lastProgress batchId:', (q.lastProgress or {}).get('batchId'),
      'numInputRows:', (q.lastProgress or {}).get('numInputRows'))
