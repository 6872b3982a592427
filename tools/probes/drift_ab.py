"""dedup_embedding / layout_zorder sf30 drift classification (r15, VERDICT r14 #2).

Usage: python tools/probes/drift_ab.py <sf_dir> [reps]
Fresh JVM, sweep confs (shuffle partitions from lineitem rows, 16MB splits,
minPartitionNum 64). Alternating timed reps of the two keys whose r13->r14
sweep rows moved >30% on identical semantics (dedup_embedding 14.3->21.1 s,
layout_zorder 8.2->11.0 s). The sweep protocol's own rule: sweep readings
alone are inadmissible — only this A/B classifies.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir, 'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('drift-ab')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows // 500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16 << 20))
    .config('spark.sql.files.minPartitionNum', '64')
    .config('spark.sql.files.openCostInBytes', str(128 << 10))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import kwery_spark.all_ops
from kwery_spark.registry import QUERIES

print('loadavg before:', os.getloadavg())
for rep in range(reps):
    for key in ('dedup_embedding', 'layout_zorder'):
        t0 = time.perf_counter()
        n = QUERIES[key](spark, sf_dir).count()  # sweep's timed action
        print(f"rep{rep} {key}: {time.perf_counter()-t0:.2f}s rows={n}")
print('loadavg after:', os.getloadavg())
