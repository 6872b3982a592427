"""_pair_weights build-design A/B (VERDICT r15 #2): the graph family's
cold build is the repo's largest single cold cost (~90 s at sf30).

Arms (one FRESH JVM per arm — run this script once per arm):
  current — the committed build (SMJ li⋈orders, repartition(c),
            groupBy, sortWithinPartitions(c), disk checkpoint).
  nosort  — same minus the sortWithinPartitions(c). The VERDICT's
            premise is that only LPA's window needs the sort; the
            counter-premise (code reading) is that pagerank's 3
            per-round zip joins on c elide their big-side Sort only
            because the checkpoint carries outputOrdering(c) — this arm
            measures who is right.
  shj     — current + SHUFFLE_HASH hint on the orders side of the
            orderkey join (skips sorting both join inputs on orderkey;
            per-partition hash build is |orders|/64 rows of 16 B).

Times the whole family sequence (build is paid by the first key;
_SHARED memoizes the rest) so family TOTAL — the graded quantity — is
what's compared.

Usage: python tools/probes/pair_weights_arms.py <sf_dir> <current|nosort|shj>
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sf_dir, arm = sys.argv[1], sys.argv[2]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder(f"pair-weights-{arm}")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .config("spark.sql.files.minPartitionNum", "64")
    .config("spark.sql.files.openCostInBytes", str(128 << 10))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.kwery.bucketed", "false")  # raw arm: the sweep protocol
if arm == "nocapture":
    # r16: disable the checkpoint partitioning/ordering capture (the
    # pre-r16 behavior, where every consumer re-exchanges) — see
    # graph._snap_captured / tools/probes/ckpt_partitioning.py
    spark.conf.set("spark.kwery.ckpt.capture", "false")
elif arm != "current":
    spark.conf.set("spark.kwery.pairweights.arm", arm)

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.registry import QUERIES

FAMILY = [
    "graph_pagerank",
    "graph_shortest_path",
    "graph_label_propagation",
    "graph_common_neighbors",
    "graph_degree_distribution",
]

total = 0.0
for key in FAMILY:
    t0 = time.perf_counter()
    n = QUERIES[key](spark, sf_dir).count()
    dt = time.perf_counter() - t0
    total += dt
    print(f"  {key}: {dt:.2f}s rows={n}", flush=True)
print(f"ARM {arm} @ {sf_dir}: family total {total:.2f}s")
print("loadavg:", os.getloadavg())
