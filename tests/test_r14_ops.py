"""Round-14 invariants: the clone-factor contraction gate (VERDICT r13
item 3 — both arms of the distinct-vector contraction must be
value-identical and the auto gate must pick the arm the measured clone
factor prescribes), and the sim_knn query-vector literal (the memoized
1-row lookup must match a fresh collect and the plan must carry no
join)."""

from __future__ import annotations

import pytest

import kwery_spark.all_ops  # noqa: F401 — populate registry
from kwery_spark.operators import similarity as S
from kwery_spark.registry import QUERIES

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

CONTRACTED_KEYS = ["ml_kmeans", "ml_kmeans_silhouette", "ann_pq", "ann_ivfpq"]


@pytest.mark.parametrize("key", CONTRACTED_KEYS)
def test_contraction_arms_value_identical(spark, key):
    """Forced-on (distinct-vector contraction) and forced-off
    (row-expanded) arms must produce the SAME rows at sf0.01 — the
    gate may only ever change the plan, never a value.

    ADVICE r14: float columns compare within 1e-9, not exactly — the
    contracted arm's groupBy(v) shuffle reorders centroid-sum addends,
    so a pre-round double can differ by ulps between arms; a
    tie-adjacent value under round(...,6) could then flake on exact
    tuple equality (the stream_asof_join r9 ulp-lottery class). Integer
    and string columns stay exact."""
    outs = {}
    for mode in ("on", "off"):
        spark.conf.set("spark.kwery.contract", mode)
        try:
            outs[mode] = sorted(map(tuple, QUERIES[key](spark, SF01).collect()))
        finally:
            spark.conf.unset("spark.kwery.contract")
    assert len(outs["on"]) == len(outs["off"])
    for ra, rb in zip(outs["on"], outs["off"]):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert abs(va - vb) <= 1e-9, (ra, rb)
            else:
                assert va == vb, (ra, rb)


def test_clone_gate_auto_tracks_measured_factor(spark):
    """The gate's documented contract: contraction fires iff the
    measured clone factor >= CONTRACT_MIN_CLONE (2.0). The raw corpus
    is all-distinct (factor ~1) -> row-expanded; the conf override
    forces either arm regardless."""
    factor = S._clone_factor(spark, SF01)
    assert factor < S.CONTRACT_MIN_CLONE  # 500/500 distinct vectors
    assert S._use_contraction(spark, SF01) is False
    for mode, want in (("on", True), ("off", False)):
        spark.conf.set("spark.kwery.contract", mode)
        try:
            assert S._use_contraction(spark, SF01) is want
        finally:
            spark.conf.unset("spark.kwery.contract")


def test_clone_factor_memoized_single_job(spark):
    """The factor probe is the sanctioned bounded plan-time class: one
    single-scalar aggregate job on first use, zero jobs on a memo hit."""
    S._clone_factor(spark, SF001)  # prime
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup())
    S._clone_factor(spark, SF001)
    assert set(st.getJobIdsForGroup()) == before  # memo hit: no job


def test_parquet_rows_recurses_and_fails_loudly(tmp_path):
    """ADVICE r13 (catalog.py): parquet_rows is a plan-time literal
    source — a partitioned (nested) layout must count fully, and an
    empty dataset dir must raise, never return a silent 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kwery_spark.catalog import parquet_rows

    ds = tmp_path / "t.parquet" / "k=1"
    ds.mkdir(parents=True)
    pq.write_table(pa.table({"a": [1, 2, 3]}), ds / "part-0.parquet")
    (tmp_path / "t.parquet" / "_SUCCESS").write_text("")
    assert parquet_rows(str(tmp_path), "t") == 3
    (tmp_path / "empty.parquet").mkdir()
    with pytest.raises(ValueError, match="no .parquet data files"):
        parquet_rows(str(tmp_path), "empty")


def test_broadcast_fits_bound():
    """The byte-derived gate: 16-byte rows disengage at ~11M rows
    (512 MB / 48 B), keeping every measured green point (<=6M rows)
    on the broadcast arm."""
    from kwery_spark import catalog

    bound = catalog.BROADCAST_BUDGET_BYTES // (16 * catalog._HASHED_RELATION_OVERHEAD)
    assert 6_000_000 < bound < 20_000_000


def test_pair_weights_bucketed_zipper_value_identical(spark):
    """r14: _pair_weights zips off the orderkey-bucketed layout when it
    exists (exchange-free join feed, sf30 build 58.7 -> 42.1 s) — the
    rows must be IDENTICAL to the raw-scan arm, and the kill switch
    must force the raw arm."""
    from kwery_spark.catalog import build_bucketed
    from kwery_spark.operators import graph

    build_bucketed(spark, SF001)  # idempotent; seconds at sf0.001
    graph._SHARED.clear()
    try:
        bucketed = sorted(
            map(tuple, graph._pair_weights(spark, SF001).collect())
        )
        graph._SHARED.clear()
        spark.conf.set("spark.kwery.bucketed", "false")
        try:
            raw = sorted(map(tuple, graph._pair_weights(spark, SF001).collect()))
        finally:
            spark.conf.unset("spark.kwery.bucketed")
        assert bucketed == raw and len(raw) > 0
    finally:
        graph._SHARED.clear()


def test_purchase_edges_degree_variant_correct(spark):
    """ADVICE r13 (graph.py): _purchase_edges(with_degree=True) lost its
    last registry consumer in the r13 pagerank rewrite — keep the
    engine-API path honest with a direct check: srcdeg must equal the
    brute-force out-degree of the bidirected graph derived from
    _pair_weights, and the edges_deg->edges reuse path must drop the
    column without changing the edge set."""
    from pyspark.sql import functions as F

    from kwery_spark.operators import graph

    graph._SHARED.clear()
    try:
        deg = graph._purchase_edges(spark, SF001, with_degree=True)
        w = graph._pair_weights(spark, SF001).select("c", "s")
        base = w.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        bidir = base.union(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        expect = {
            (r.src, r.dst, r.n)
            for r in bidir.withColumn(
                "n", F.count(F.lit(1)).over(__import__("pyspark").sql.Window.partitionBy("src"))
            ).collect()
        }
        got = {(r.src, r.dst, r.srcdeg) for r in deg.collect()}
        assert got == expect
        # reuse path: a plain-edges request served from the deg build
        plain = graph._purchase_edges(spark, SF001)
        assert "srcdeg" not in plain.columns
        assert {(r.src, r.dst) for r in plain.collect()} == {
            (s, d) for (s, d, _n) in expect
        }
    finally:
        graph._SHARED.clear()


def test_query_vec_matches_collect_and_plan_is_joinless(spark):
    """sim_knn_bruteforce r14: the memoized query vector equals a fresh
    per-run lookup, and the physical plan is scan->project->top-k with
    no join or exchange (the removed broadcast-build job must not come
    back)."""
    from pyspark.sql import functions as F

    qv = S._query_vec(spark, SF001, 0)
    fresh = tuple(
        float(x)
        for x in S._vecs(spark, SF001)
        .filter(F.col("vec_id") == 0)
        .first()
        .v
    )
    assert qv == fresh and len(qv) == 64
    from kwery_spark.plans.inspect import formatted_plan

    plan = formatted_plan(QUERIES["sim_knn_bruteforce"](spark, SF001))
    assert "Join" not in plan and "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("key", ["assoc_basket_rules", "rec_item_item_cf"])
def test_partkey_map_broadcast_gate_fires(spark, key):
    """r14: assoc/rec broadcast the partkey->brand map under the footer
    byte gate (the q16 pmap pattern — sf30 A/B: assoc basket build
    28.9-30.8 -> 21.3-22.2 s, rec vecs build 34.8/40.9 -> 30.6/39.3 s,
    values equal). On the tiny test corpus the gate is engaged, so the
    physical plan must carry a BroadcastHashJoin on the part side — the
    lineitem partkey exchange must not exist."""
    from kwery_spark.catalog import broadcast_fits

    assert broadcast_fits(SF001, "part", 24)
    plan = (
        QUERIES[key](spark, SF001)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
