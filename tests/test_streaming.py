"""Streaming semantics tests (SURVEY.md §5.5):

1. availableNow streaming result ≡ batch-form result on the same data
2. watermark actually drops late rows across micro-batches
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from kwery_spark.streaming.live import SCRATCH, _events_stream
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

NS = 1_000_000_000

# Schema of the crafted fixtures below: ts as plain int64 nanoseconds
# (the live corpus source probes the file's own footer schema instead —
# kwery_spark/streaming/live.py:_events_stream)
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    qs = entrymod.queries()
    streamed = qs["stream_watermark"](spark, sf_dir)  # streaming tumbling count
    batch = (
        qs["stream_tumbling"](spark, sf_dir)
        .select("window_start", "event_type", "n_events")
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_stateful_counts_equal_batch(spark, sf_dir):
    from kwery_spark.catalog import table

    streamed = entrymod.queries()["stream_stateful"](spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in streamed.collect()}
    want = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    assert got == want


def _write_batch(path: str, name: str, rows: list[tuple[int, str]]):
    """rows: (epoch_seconds, event_type); ts stored as int64 nanos."""
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [s * NS for s, _ in rows],
            "user_id": [1] * len(rows),
            "event_type": [t for _, t in rows],
            "value": [1.0] * len(rows),
            "props": ['{"k": 1}'] * len(rows),
        }
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["ts"] = df["ts"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df.to_parquet(os.path.join(path, name), index=False)


def test_watermark_drops_late_rows(spark):
    """Micro-batches via maxFilesPerTrigger=1: batch 0 advances event time
    2h past the hour-0 window; batch 1 lets the watermark take effect and
    finalize (emit+evict) hour-0; the very late event in batch 2 must then
    be DROPPED. (Measured Spark semantics: late rows are discarded from
    the first batch after the window's state was finalized at a batch
    boundary — one batch later than the naive reading of the docs.)"""
    import time

    base = os.path.join(SCRATCH, f"late_{uuid.uuid4().hex[:8]}")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    os.makedirs(src)
    h = 3600
    t0 = 1_700_000_000 - (1_700_000_000 % h)  # aligned hour
    _write_batch(src, "a_batch1.parquet", [(t0, "click"), (t0 + 60, "click"), (t0 + 2 * h, "click")])
    time.sleep(1.1)  # distinct mtimes → deterministic file->batch order
    _write_batch(src, "b_batch2.parquet", [(t0 + 2 * h + 60, "click")])
    time.sleep(1.1)
    _write_batch(src, "c_batch3.parquet", [(t0 + 120, "click")])

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    counted = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("wstart"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )
    shutil.rmtree(base, ignore_errors=True)
    # hour-0 was emitted with 2 events — the late 3rd was dropped
    assert [(r["wstart"], r["n"]) for r in rows if r["wstart"] == t0] == [(t0, 2)], rows
    assert dropped == 1, (dropped, rows)


def test_checkpoint_incremental_across_runs(spark):
    """Exactly-once incremental ingest: run 1 (availableNow) processes
    file A into a foreachBatch parquet sink; file B arrives; run 2 with
    the SAME checkpoint processes ONLY B (no reprocessing of A), and the
    summed sink equals the batch ground truth over A+B."""
    import time

    base = os.path.join(SCRATCH, f"incr_{uuid.uuid4().hex[:8]}")
    src, ckpt, out = (os.path.join(base, d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)
    t0 = 1_700_000_000
    _write_batch(src, "a.parquet", [(t0, "view"), (t0 + 60, "view"), (t0 + 120, "click")])

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(src)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

        def write_batch(batch_df, batch_id):
            (
                batch_df.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n_partial"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out)
            )

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sum(p.get("numInputRows", 0) for p in q.recentProgress)

    rows_run1 = run_once()
    time.sleep(1.1)
    _write_batch(src, "b.parquet", [(t0 + 180, "view"), (t0 + 240, "purchase")])
    rows_run2 = run_once()

    assert rows_run1 == 3, rows_run1
    assert rows_run2 == 2, rows_run2  # ONLY the new file — no reprocessing
    # dedupe partials per (batch_id, event_type) like stream_foreach_batch,
    # then totals must equal the batch ground truth over A+B
    got = {
        r["event_type"]: r["n"]
        for r in (
            spark.read.parquet(out)
            .groupBy("batch_id", "event_type")
            .agg(F.max("n_partial").alias("n_partial"))
            .groupBy("event_type")
            .agg(F.sum("n_partial").alias("n"))
            .collect()
        )
    }
    shutil.rmtree(base, ignore_errors=True)
    assert got == {"view": 3, "click": 1, "purchase": 1}, got


def test_stateful_api_probe_recorded(spark, sf_dir):
    """stream_stateful must pick its API by capability probe and record
    the verdict (VERDICT r2 item 6): transformWithStateInPandas where
    the environment supports it, applyInPandasWithState otherwise. The
    key must be green on whichever path the probe selects."""
    from kwery_spark.registry import QUERIES, load_all
    from kwery_spark.streaming import live

    load_all()
    rows = QUERIES["stream_stateful"](spark, sf_dir).collect()
    assert rows, "stream_stateful returned no rows"
    assert live.TWS_PROBE.get("available") in (True, False)
    assert live.TWS_PROBE.get("reason")
    if not live.tws_available():
        # this sandbox: the TWS state server needs google.protobuf
        assert "import failed" in str(live.TWS_PROBE["reason"])


def test_rate_source_processing_time_trigger(spark):
    """Unbounded-source demo (VERDICT r3 "what's missing" #5): a rate
    source ticking under a processingTime trigger — the long-running
    production shape, vs the availableNow batch-replay used by the
    oracle-checked keys. Asserts real rows flow (monotone values, no
    gaps) and the query stops cleanly."""
    import time as _time
    import uuid as _uuid

    name = f"rate_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        # bounded partitions: on local[8] the default (defaultParallelism)
        # would let the stream occupy every task slot and starve the
        # monitoring count() jobs below — the same slot-budget math a real
        # cluster does when colocating streams with batch queries
        .option("numPartitions", "2")
        .load()
        .selectExpr("value", "value % 5 AS bucket")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 20
        rows = []
        while _time.time() < deadline:
            rows = spark.table(name).collect()
            if len(rows) >= 20:
                break
            _time.sleep(0.25)
        assert len(rows) >= 20, f"only {len(rows)} rows after 20s"
        values = sorted(r.value for r in rows)
        assert values == list(range(values[0], values[0] + len(values))), (
            "rate stream should deliver a gapless monotone sequence"
        )
        assert all(r.bucket == r.value % 5 for r in rows)
    finally:
        q.stop()


def test_continuous_trigger_probe(spark):
    """Continuous processing (trigger(continuous=...)) capability probe:
    epoch-based record-at-a-time execution supports only map-like plans
    and specific sinks. If this Spark build accepts the combination, we
    require rows to flow; if it rejects it (AnalysisException about
    continuous mode), that is a recorded, expected outcome — the demo
    documents the boundary instead of pretending it away."""
    import time as _time
    import uuid as _uuid

    import pytest as _pytest

    name = f"cont_{_uuid.uuid4().hex[:8]}"
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "50")
            # continuous-mode tasks run FOREVER, one per partition: cap
            # them so monitoring jobs keep free slots (without this the
            # epoch tasks pin all local cores and the count() deadlocks)
            .option("numPartitions", "2")
            .load()
            .selectExpr("value * 2 AS doubled")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(continuous="1 second")
            .start()
        )
    except Exception as e:
        _pytest.skip(f"continuous mode rejected at start: {type(e).__name__}: {e}")
    try:
        deadline = _time.time() + 20
        n = 0
        while _time.time() < deadline:
            if q.exception() is not None:
                _pytest.skip(f"continuous mode unsupported: {q.exception()}")
            n = spark.table(name).count()
            if n >= 10:
                break
            _time.sleep(0.25)
        assert n >= 10, f"continuous query produced only {n} rows in 20s"
    finally:
        q.stop()


def test_stream_asof_join_equals_batch(spark, sf_dir):
    # the as-of enrichment run as a REAL keyed-state streaming query
    # (applyInPandasWithState: one state row per user holding the last
    # view timestamp) must agree hour-for-hour with the batch-form
    # union+window operator
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("tag"),
        )
    )

    def update(key, pdfs, state):
        last = state.get[0] if state.exists else None
        if last is not None and last < 0:
            last = None
        rows = pd.concat(list(pdfs)).sort_values(["us", "tag", "event_id"])
        hours, matched, lags = [], [], []
        for r in rows.itertuples():
            if r.tag == 0:
                if last is None or r.us > last:
                    last = r.us
            else:
                hours.append(r.us - r.us % 3_600_000_000)
                matched.append(1 if last is not None else 0)
                lags.append(r.us - last if last is not None else 0)
        state.update((int(last) if last is not None else -1,))
        out = pd.DataFrame(
            {
                "purchase_hour_us": pd.Series(hours, dtype="int64"),
                "matched": pd.Series(matched, dtype="int32"),
                "lag_us": pd.Series(lags, dtype="int64"),
            }
        )
        yield out

    enriched = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "purchase_hour_us long, matched int, lag_us long",
        "last long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    from kwery_spark.streaming.live import _run_to_memory

    result, _ = _run_to_memory(enriched, "append")
    streamed = {
        r["purchase_hour_us"]: (
            r["n"],
            r["m"],
            round(r["lag_sum"] / r["m"] / 1e6, 6) if r["m"] else -1.0,
        )
        for r in result.groupBy("purchase_hour_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("matched").alias("m"),
            F.sum(F.when(F.col("matched") == 1, F.col("lag_us")).otherwise(0))
            .alias("lag_sum"),
        )
        .collect()
    }
    batch = {
        int(r["purchase_hour"].timestamp() * 1e6): (
            r["n_purchases"],
            r["n_matched"],
            r["avg_lag_sec"],
        )
        for r in entrymod.queries()["stream_asof_join"](spark, sf_dir).collect()
    }
    # counts match exactly; the avg re-derivation differs only in Python
    # round() (banker's) vs Spark round() (half-up) at the 6th decimal
    assert streamed.keys() == batch.keys()
    for h in batch:
        assert streamed[h][:2] == batch[h][:2], h
        assert abs(streamed[h][2] - batch[h][2]) <= 2e-6, h
