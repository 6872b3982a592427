"""Write-audit-publish snapshot sink: transactional table semantics on
plain parquet (SURVEY §2.1 sink family; VERDICT r2 "What's missing" #3).

No Delta/Iceberg is available in this environment, so this implements the
protocol those formats are built on, directly over a directory layout:

    <root>/snapshots/v<N>/   immutable data directories (distributed
                             parquet writes — executors write, nothing
                             passes through the driver)
    <root>/_CURRENT          tiny pointer file naming the published
                             snapshot; swapped atomically (os.replace,
                             a single rename syscall)
    <root>/snapshots/v<N>/_MANIFEST.json
                             audit record: row count + committed schema

WRITE: a new version directory is written while readers keep resolving
the old pointer — a half-written snapshot is invisible by construction.
AUDIT: the staged directory is independently read back and its row count
compared against the expectation computed from the source; a failed
audit leaves the pointer untouched (the staged dir is quarantined, never
published). PUBLISH: one atomic pointer swap. Readers that resolved the
pointer before the swap keep a consistent view of the old snapshot
(snapshot isolation — pinned by tests/test_snapshot.py's concurrent
reader), and published versions remain addressable for time travel.

At 100 TB the data writes and audit scans are ordinary distributed jobs;
only the pointer/manifest metadata (bytes) is driver-side — the same
split Delta's _last_checkpoint / Iceberg's version-hint file makes.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register
from kwery_spark.sources.scans import SCRATCH


def snapshot_root(sf_dir: str) -> str:
    root = os.path.join(SCRATCH, "snapshot", os.path.basename(sf_dir.rstrip("/")))
    os.makedirs(root, exist_ok=True)
    return root


def current_version(root: str) -> int | None:
    """Resolve the published snapshot from the pointer file (None before
    the first publish)."""
    try:
        with open(os.path.join(root, "_CURRENT")) as f:
            return int(f.read().strip().lstrip("v"))
    except FileNotFoundError:
        return None


def snapshot_path(root: str, version: int) -> str:
    return os.path.join(root, "snapshots", f"v{version}")


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the published snapshot (or a pinned historical version —
    time travel: published directories are immutable and never edited)."""
    v = current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    return spark.read.parquet(snapshot_path(root, v))


def write_audit_publish(
    spark: SparkSession, df: DataFrame, root: str, version: int, expected_rows: int
) -> bool:
    """Stage version `version` of the table, audit it, and publish only
    if the audit passes. Returns True iff published. The audit re-reads
    the staged files (catching lost/duplicated writes, not just a
    mis-counted plan) and compares against the caller's independently
    computed expectation."""
    path = snapshot_path(root, version)
    df.write.mode("overwrite").parquet(path)
    audited = spark.read.parquet(path).count()
    if audited != expected_rows:
        # quarantine: staged dir stays for forensics, pointer untouched
        return False
    manifest = {"version": version, "rows": audited, "schema": df.schema.simpleString()}
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    tmp = os.path.join(root, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, os.path.join(root, "_CURRENT"))  # atomic publish
    return True


@register(
    "sink_snapshot",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_cust,
           CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS bal_floor_sum,
           CAST(2 AS BIGINT) AS snapshot_version
    FROM customer WHERE c_acctbal >= 0
    GROUP BY c_mktsegment
    """,
)
def sink_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-commit snapshot lifecycle, then a read through the pointer:

      v1  full customer table          — audit passes, published
      v2  negative balances deleted    — audit passes, published
      v3  deliberately short write     — audit FAILS, never published

    so the read-back must see exactly v2 (the oracle recomputes v2's
    state from the source; snapshot_version pins that the failed v3
    commit did not advance the pointer). Re-running is idempotent:
    staged dirs are overwritten, the pointer converges to v2 (a
    production writer would allocate fresh monotonic version numbers;
    the fixture reuses 1-3 so the oracle is deterministic)."""
    root = snapshot_root(sf_dir)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    n_full = cust.count()
    v2_df = cust.filter(F.col("c_acctbal") >= 0)
    ok1 = write_audit_publish(spark, cust, root, 1, n_full)
    ok2 = write_audit_publish(spark, v2_df, root, 2, v2_df.count())
    # v3 stages a partial table but claims the full count: audit refuses
    bad = cust.filter(F.col("c_custkey") % 7 == 0)
    ok3 = write_audit_publish(spark, bad, root, 3, n_full)
    assert ok1 and ok2 and not ok3, (ok1, ok2, ok3)
    version = current_version(root)
    return (
        read_snapshot(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.floor("c_acctbal").cast("long")).alias("bal_floor_sum"),
        )
        .withColumn("snapshot_version", F.lit(version).cast("long"))
    )
