"""Transaction-log table (kwery_spark/sources/txnlog.py): multi-writer
CAS semantics, conflict detection, log replay, time travel.

The concurrency tests run two REAL writer threads against one table
(Spark job submission is thread-safe); the put-if-absent commit record
makes version claims race-free, which is exactly what these pin down.
"""

from __future__ import annotations

import json
import os
import sys
import threading

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, "/root/repo")

from kwery_spark.sources.txnlog import ConflictError, TxnLogTable


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "table")


def test_append_replace_replay(spark, root):
    t = TxnLogTable(root)
    v0 = t.commit(spark, spark.range(10).select(F.col("id")), "append")
    v1 = t.commit(spark, spark.range(10, 15).select(F.col("id")), "append")
    assert (v0, v1) == (0, 1)
    assert t.read(spark).count() == 15
    evens = t.read(spark, v1).filter(F.col("id") % 2 == 0)
    v2 = t.commit(spark, evens, "replace", base_version=v1)
    assert v2 == 2
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 2, 4, 6, 8, 10, 12, 14]
    # time travel: superseded versions stay addressable and immutable
    assert t.read(spark, 0).count() == 10
    assert t.read(spark, 1).count() == 15


def test_stale_replace_raises_and_claims_no_version(spark, root):
    t = TxnLogTable(root)
    t.commit(spark, spark.range(20), "append")
    snap = t.read(spark, 0)
    t.commit(spark, snap.filter("id < 10"), "replace", base_version=0)
    with pytest.raises(ConflictError):
        t.commit(spark, snap.filter("id >= 10"), "replace", base_version=0)
    assert t.latest_version() == 1  # the failed writer burned no version
    assert t.read(spark).count() == 10


def test_concurrent_appends_lose_nothing(spark, root):
    t = TxnLogTable(root)
    errors = []

    def writer(base: int):
        try:
            for k in range(3):
                t.commit(
                    spark, spark.range(base + k * 100, base + k * 100 + 10), "append"
                )
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(b,)) for b in (0, 1000)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    # 6 commits, contiguous unique versions 0..5 — the CAS never
    # double-claimed or skipped a version under the race
    log = sorted(os.listdir(os.path.join(root, "_log")))
    assert [int(e[:-5]) for e in log if e.endswith(".json")] == list(range(6))
    expected = sorted(
        v for b in (0, 1000) for k in range(3) for v in range(b + k * 100, b + k * 100 + 10)
    )
    assert sorted(r.id for r in t.read(spark).collect()) == expected


def test_concurrent_replace_exactly_one_wins(spark, root):
    t = TxnLogTable(root)
    t.commit(spark, spark.range(100), "append")
    base = t.latest_version()
    snap = t.read(spark, base)
    outcomes = {}
    barrier = threading.Barrier(2)

    def writer(name: str, pred: str):
        df = snap.filter(pred)
        df.count()  # stage the compute before racing on the commit
        barrier.wait()
        try:
            outcomes[name] = t.commit(spark, df, "replace", base_version=base)
        except ConflictError:
            outcomes[name] = "conflict"

    threads = [
        threading.Thread(target=writer, args=("a", "id < 50")),
        threading.Thread(target=writer, args=("b", "id >= 50")),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(outcomes.values(), key=str) in ([1, "conflict"], ["conflict", 1])
    winner_rows = t.read(spark).count()
    assert winner_rows == 50  # exactly one rewrite applied, atomically


def test_commit_records_are_auditable(spark, root):
    t = TxnLogTable(root)
    t.commit(spark, spark.range(7), "append")
    v1 = t.commit(spark, spark.range(3), "append")
    t.commit(spark, t.read(spark, v1).filter("id = 0"), "replace", base_version=v1)
    with open(os.path.join(root, "_log", "00000002.json")) as f:
        rec = json.load(f)
    assert rec["operation"] == "replace"
    assert rec["base_version"] == 1
    assert rec["rows"] == 2  # audited count of id=0 from both appends
    assert len(rec["remove"]) == 2 and len(rec["add"]) == 1


def test_random_commit_sequences_replay_correctly(spark, tmp_path):
    """Property-style check over deterministic pseudo-random commit
    sequences: after any interleaving of appends and replaces, log
    replay must equal applying the same operations to a model set in
    commit order, at EVERY historical version (time travel included)."""
    import hashlib

    for seed in ("a", "b"):
        root = str(tmp_path / f"t_{seed}")
        t = TxnLogTable(root)
        model_history = []
        model = set()
        # deterministic op sequence derived from the seed (no RNG)
        ops = [
            ("append" if int(hashlib.md5(f"{seed}{i}".encode()).hexdigest(), 16) % 3
             else "replace")
            for i in range(6)
        ]
        for i, op in enumerate(ops):
            lo, hi = i * 20, i * 20 + 10
            batch = set(range(lo, hi))
            if op == "append":
                t.commit(spark, spark.range(lo, hi), "append")
                model |= batch
            else:
                base = t.latest_version()
                if base is None:
                    t.commit(spark, spark.range(lo, hi), "append")
                    model |= batch
                else:
                    kept = t.read(spark, base).filter("id % 2 = 0")
                    t.commit(spark, kept, "replace", base_version=base)
                    model = {x for x in model if x % 2 == 0}
            model_history.append(set(model))
        for v, expected in enumerate(model_history):
            got = {r.id for r in t.read(spark, v).collect()}
            assert got == expected, (seed, v)


def test_checkpoint_resume_and_time_travel_safety(spark, root):
    """live_dirs resumes from the newest checkpoint <= the requested
    version; a pinned version BELOW every checkpoint must fall back to
    full replay (never read future state); checkpoint content equals
    the full fold."""
    t = TxnLogTable(root)
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    t.commit(spark, df.filter(F.col("id") < 5), "append")          # v0
    t.commit(spark, df.filter(F.col("id") >= 5), "append")         # v1
    base = t.latest_version()
    t.commit(spark, t.read(spark, base).filter(F.col("id") != 3),
             "replace", base_version=base)                          # v2
    assert t.write_checkpoint() == 2
    t.commit(spark, df.filter(F.col("id") == 3), "append")         # v3

    # checkpoint-path snapshot: resumed at v2, replayed only v3
    dirs, cp_used, n_tail = t.snapshot_dirs()
    assert cp_used == 2 and n_tail == 1
    # equals the checkpoint-free full fold
    full = []
    for i in range(t.latest_version() + 1):
        e = t.entry(i)
        full = [d for d in full if d not in set(e.get("remove", []))]
        full.extend(e.get("add", []))
    assert dirs == full
    # values: v2 dropped id=3, v3 re-added it
    got = sorted(r.id for r in t.read(spark).collect())
    assert got == list(range(10))
    # time travel BELOW the checkpoint ignores it entirely
    d1, cp1, n1 = t.snapshot_dirs(1)
    assert cp1 is None and n1 == 2
    assert sorted(r.id for r in t.read(spark, 1).collect()) == list(range(10))
    # time travel AT the checkpoint uses it with an empty tail
    d2, cp2, n2 = t.snapshot_dirs(2)
    assert cp2 == 2 and n2 == 0
    assert 3 not in {r.id for r in t.read(spark, 2).collect()}
    # checkpoint files never masquerade as commit records
    assert t.latest_version() == 3
