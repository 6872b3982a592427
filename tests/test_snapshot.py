"""Snapshot-isolation properties of the write-audit-publish sink."""

from __future__ import annotations

import pyspark.sql.functions as F

from kwery_spark.catalog import table
from kwery_spark.registry import QUERIES, load_all
from kwery_spark.sources import snapshot as snap

load_all()


def test_concurrent_reader_keeps_its_snapshot(spark, sf_dir, tmp_path):
    """A reader that resolved the pointer before a publish keeps seeing
    its version's data after the publish — the isolation guarantee the
    atomic pointer swap exists for."""
    root = str(tmp_path / "snap")
    import os

    os.makedirs(root)
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    assert snap.write_audit_publish(spark, cust, root, 1, cust.count())
    # concurrent reader: binds to v1's resolved path NOW
    reader = snap.read_snapshot(spark, root)
    v1_rows = reader.count()
    # writer publishes v2 (half the table) while the reader is "running"
    v2 = cust.filter(F.col("c_custkey") % 2 == 0)
    assert snap.write_audit_publish(spark, v2, root, 2, v2.count())
    assert snap.current_version(root) == 2
    # the in-flight reader still sees v1, a fresh reader sees v2
    assert reader.count() == v1_rows
    assert snap.read_snapshot(spark, root).count() == v2.count() < v1_rows
    # time travel: v1 remains addressable after v2 is current
    assert snap.read_snapshot(spark, root, version=1).count() == v1_rows


def test_failed_audit_never_publishes(spark, sf_dir, tmp_path):
    """An audit mismatch must leave the pointer untouched — a broken
    write job cannot corrupt the published table."""
    root = str(tmp_path / "snap")
    import os

    os.makedirs(root)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    assert snap.write_audit_publish(spark, cust, root, 1, cust.count())
    short = cust.filter(F.col("c_custkey") % 3 == 0)
    assert not snap.write_audit_publish(spark, short, root, 2, cust.count())
    assert snap.current_version(root) == 1
    assert snap.read_snapshot(spark, root).count() == cust.count()


def test_sink_snapshot_rerun_idempotent(spark, sf_dir):
    first = sorted(map(tuple, QUERIES["sink_snapshot"](spark, sf_dir).collect()))
    second = sorted(map(tuple, QUERIES["sink_snapshot"](spark, sf_dir).collect()))
    assert first == second
