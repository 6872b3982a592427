"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementation lives in the ``kwery_spark`` package; this module
just exposes its registry.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kwery_spark import registry

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return registry.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def _family(key: str) -> str:
    head = key.split("_", 1)[0]
    # q1..q22 are all the TPC-H suite — rotate them as one family.
    return "tpch" if head[:1] == "q" and head[1:].isdigit() else head


# Keys whose registered CONTRACT changed in a given round AFTER they had
# already earned a green driver row: their historical row no longer
# attests the current output, so they rotate to the FRONT of the sample
# window until a CORRECTNESS file from >= that round shows them green
# again. r11: dedup_minhash AND dedup_simhash moved to the
# banded-summary schema; sim_maxsim's maxsim_score switched from a
# rounded float sum to exact DECIMAL multiplicity expansion cast back
# to double; events_funnel_windowed tightened to strict lower bounds;
# scan_parquet_bloom's staging path was rekeyed.
_REVERIFY_FROM_ROUND = {
    "dedup_minhash": 11,
    "dedup_simhash": 11,
    "sim_maxsim": 11,
    "events_funnel_windowed": 11,
    "scan_parquet_bloom": 11,
    # r13 rewrites: adaptive-grid kNN + round6 straightness (geo),
    # bipartite pagerank/BFS, shared-shuffle dq_expectations, gated
    # q16 broadcast — values claimed identical (oracle-green at
    # sf0.001/sf0.01), but the historical driver rows attest the OLD
    # plans, so each re-earns its row on the driver's own session.
    "geo_knn_join": 13,
    "geo_trajectory_stats": 13,
    "graph_pagerank": 13,
    "graph_shortest_path": 13,
    "dq_expectations": 13,
    "q16_supplier_part_counts": 13,
    # r13 post-gate contraction rewrites (commits ffa53f3/f07282d landed
    # after the rotation commit): iterations/encodes now contract to
    # distinct weighted vectors — values oracle-green at
    # sf0.001/sf0.01/sf1/sf3 on the new plans, but the cumulative driver
    # rows (r2/r7-era) attest the pre-contraction plans. Re-earn.
    "ml_kmeans": 14,
    "ml_kmeans_silhouette": 14,
    "ann_pq": 14,
    "ann_ivfpq": 14,
    # r14: sim_knn_bruteforce's query vector became a memoized plan-time
    # literal (broadcast-build job removed); scores bit-identical by
    # construction, but the plan changed, so it re-earns its row.
    "sim_knn_bruteforce": 14,
    # r14: rec_item_item_cf gained the repartition(u) shuffle fuse AND
    # (with assoc_basket_rules) the footer-gated partkey->brand map
    # broadcast; values oracle-green at sf0.01 on the new plans, but the
    # historical driver rows attest the old plans. Re-earn.
    "rec_item_item_cf": 14,
    "assoc_basket_rules": 14,
    # r15: text_bm25 rewritten to the single-scan per-doc-profile shape
    # (one exploded aggregation + checkpointed profile + 1-row stats
    # broadcast — VERDICT r14 #1); values probe-asserted identical and
    # oracle-green at sf0.001/sf0.01/sf1, but the plan changed, so it
    # re-earns its driver row.
    "text_bm25": 15,
    # _pair_weights gained the orderkey-bucketed zipper arm (raw arm
    # unchanged and the driver session has no bucketed layout, so the
    # graph keys' plans are identical there) — no re-front needed beyond
    # graph_pagerank/graph_shortest_path already rotating at 13.
    # r15 continuation: the three text keys below gained gated
    # distinct-text contraction arms (and rake's raw arm itself was
    # rewritten to the single-scan phrase-count checkpoint) — arms
    # value-locked in tests/test_r15_ops.py, oracle-green at
    # sf0.001/sf0.01 (raw) and sf1 (contracted), but the plans changed,
    # so each re-earns its driver row.
    "text_tfidf": 15,
    "text_rake_keywords": 15,
    "text_pmi_cooccurrence": 15,
    # r15 continuation batch 2: q18 now computes sum_qty from the same
    # per-orderkey aggregate as the HAVING (one lineitem pass,
    # bit-identical integral-double sums); q9 and dq_referential_
    # integrity gained footer-gated key broadcasts (q9: 'red' part key
    # set + supplier map; dq_ri: per-FK parent keys under byte AND
    # child:parent ratio >= 6 gates). Oracle green at sf0.001/sf0.01/
    # sf1; plans changed, so each re-earns its driver row.
    "q18_large_volume": 15,
    "q9_product_profit": 15,
    "dq_referential_integrity": 15,
}


def _rotation_order(keys: list[str]) -> list[str]:
    """Order keys so external verification coverage grows every round.

    The driver samples the FIRST 50 entries of ``queries()`` for its
    CORRECTNESS check; in registration order that window never moved, so
    after 4 rounds only 81/227 keys had externally-produced rows. This
    reorders deterministically: keys with no row in any committed
    CORRECTNESS_r*.json come first, round-robin-interleaved across
    operator families (windows, streaming, udf, sinks, tpch, ...) so one
    sample window spans many families; already-verified keys follow in
    registration order. Each round's new CORRECTNESS file advances the
    rotation automatically. Falls back to registration order if the logs
    are unreadable (fresh checkout).
    """
    seen: set[str] = set()
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
            rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        except Exception:
            continue
        # a key counts as externally verified only once it has a GREEN
        # driver row — a sampled-but-failed key (r6: agg_skew_twophase
        # hash mismatch, since fixed) must rotate back into the window to
        # re-earn its row rather than fall to the back of the order.
        # A contract-changed key (_REVERIFY_FROM_ROUND) only counts from
        # rows produced at or after the change round.
        for k, v in rows.items():
            if rnd < _REVERIFY_FROM_ROUND.get(k, 0):
                continue
            if not isinstance(v, dict) or (
                v.get("hash_match")
                and v.get("rows_match")
                and v.get("schema_match")
            ):
                seen.add(k)
    unseen = [k for k in keys if k not in seen]
    fams: dict[str, list[str]] = {}
    for k in unseen:
        fams.setdefault(_family(k), []).append(k)
    interleaved: list[str] = []
    buckets = list(fams.values())
    i = 0
    while any(buckets):
        for b in buckets:
            if i < len(b):
                interleaved.append(b[i])
        i += 1
        if i > max(len(b) for b in buckets):
            break
    return interleaved + [k for k in keys if k in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    order = _rotation_order(list(registry.QUERIES))
    return {k: registry.QUERIES[k] for k in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checkable query key."""
    return dict(registry.ORACLES)
