"""Round-12 operator tests: the two new geo keys (local-recompute
oracles beyond the DuckDB gate) and the r12 plan locks on the rewritten
scale-frontier queries (q17 single-scan, geo_knn hash-aggregable
argmin). All deterministic — md5-derived coordinates, fixed corpus."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

import kwery_spark.all_ops  # noqa: F401 — populate registry
from kwery_spark.plans import inspect
from kwery_spark.registry import QUERIES

SF001 = "/root/testdata/sf0.001"


def _coord(tag: str, key: int, mod: int, shift: float) -> float:
    h = int(hashlib.md5(f"{tag}:{key}".encode()).hexdigest()[:12], 16) % mod
    return h / 10000.0 - shift


def _pt(tag_prefix: str, key: int) -> tuple[float, float]:
    return (
        _coord(tag_prefix + "lat", key, 1200000, 60.0),
        _coord(tag_prefix + "lon", key, 3600000, 180.0),
    )


def test_geo_knn_matches_local_bruteforce(spark):
    """The registered bounded-kNN result must equal a local brute-force
    recomputation restricted to the same 3x3 cell neighborhood."""
    custs = pq.read_table(f"{SF001}/customer.parquet", columns=["c_custkey"])[
        "c_custkey"
    ].to_pylist()
    supps = pq.read_table(f"{SF001}/supplier.parquet", columns=["s_suppkey"])[
        "s_suppkey"
    ].to_pylist()
    from kwery_spark.operators.geo import knn_cell_width

    w = knn_cell_width(len(custs))  # r13 density-adaptive grid (= 5.0 here)
    cpts = {c: _pt("c", c) for c in custs}
    cells: dict[tuple[int, int], list[int]] = {}
    for c, (la, lo) in cpts.items():
        cells.setdefault((math.floor(la / w), math.floor(lo / w)), []).append(c)
    best = []
    for s in supps:
        sla, slo = _pt("s", s)
        ci, cj = math.floor(sla / w), math.floor(slo / w)
        nn = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for c in cells.get((ci + di, cj + dj), ()):
                    cla, clo = cpts[c]
                    d2 = (sla - cla) ** 2 + (slo - clo) ** 2
                    if nn is None or (d2, c) < nn:
                        nn = (d2, c)
        if nn is not None:
            best.append((nn[0], s, nn[1]))
    want = sorted(best)[:20]
    got = QUERIES["geo_knn_join"](spark, SF001).collect()
    assert len(got) == len(want)
    for r, (d2, s, c) in zip(got, want):
        assert (r.s_suppkey, r.c_custkey) == (s, c)
        assert abs(r.dist - round(math.sqrt(d2), 6)) < 1e-9


def test_geo_knn_plan_streams_the_candidates(spark):
    """Scale lock: the per-supplier min(d2) must be a HashAggregate (a
    SortAggregate map-side-sorts the |S| x density candidate stream —
    the struct-min form timed out at sf10), and the grid join must be
    an equi-join, never a cartesian."""
    df = QUERIES["geo_knn_join"](spark, SF001)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "SortAggregate" not in plan, plan


def test_geo_trajectory_matches_local_recompute(spark):
    """Path length / displacement / straightness recomputed locally with
    the same round6->DECIMAL step algebra."""
    tbl = pq.read_table(
        f"{SF001}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    rows = sorted(
        zip(
            tbl["user_id"].to_pylist(),
            tbl["ts"].to_pylist(),
            tbl["event_id"].to_pylist(),
        )
    )
    by_user: dict[int, list[tuple[float, float]]] = {}
    for u, _ts, e in rows:
        by_user.setdefault(u, []).append(_pt("e", e))
    want = {}
    for u, pts in by_user.items():
        steps = [
            round(
                math.sqrt(
                    (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                ),
                6,
            )
            for a, b in zip(pts, pts[1:])
        ]
        # exact decimal sum: integer micro-units
        path = sum(int(round(s * 1e6)) for s in steps) / 1e6
        net = round(
            math.sqrt(
                (pts[-1][0] - pts[0][0]) ** 2 + (pts[-1][1] - pts[0][1]) ** 2
            ),
            6,
        )
        want[u] = (len(pts), path, net)
    got = QUERIES["geo_trajectory_stats"](spark, SF001).collect()
    assert 0 < len(got) <= 20
    top = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[: len(got)]
    for r, (u, (n, path, net)) in zip(got, top):
        assert r.user_id == u
        assert r.n_points == n
        assert abs(r.path_len - path) < 1e-9
        assert abs(r.net_disp - net) < 1e-9
        if path > 0:
            assert abs(r.straightness - round(net / path, 6)) < 1e-9


def test_q17_single_lineitem_scan(spark):
    """r12 lock: the window form must scan lineitem exactly once — the
    r11 two-leg form re-ran the scan+semi per alias (r8 lesson)."""
    df = QUERIES["q17_small_quantity"](spark, SF001)
    plan = inspect.formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Expand" not in plan, plan


def test_q21_pair_factoring_values(spark):
    """The r12 expand-free q21 must agree with a direct local recompute
    of the per-order distinct-supplier algebra on the tiny corpus."""
    li = pq.read_table(
        f"{SF001}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = pq.read_table(
        f"{SF001}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )
    od = {
        k: d
        for k, d, s in zip(
            orders["o_orderkey"].to_pylist(),
            orders["o_orderdate"].to_pylist(),
            orders["o_orderstatus"].to_pylist(),
        )
        if s == "F"
    }
    import datetime

    per = {}
    for k, s, ship in zip(
        li["l_orderkey"].to_pylist(),
        li["l_suppkey"].to_pylist(),
        li["l_shipdate"].to_pylist(),
    ):
        if k not in od:
            continue
        late = ship > od[k] + datetime.timedelta(days=60)
        supp, lateset = per.setdefault(k, (set(), set()))
        supp.add(s)
        if late:
            lateset.add(s)
    waits: dict[int, int] = {}
    for k, (supp, lateset) in per.items():
        if len(supp) > 1 and len(lateset) == 1:
            w = next(iter(lateset))
            waits[w] = waits.get(w, 0) + 1
    snames = dict(
        zip(
            pq.read_table(f"{SF001}/supplier.parquet")["s_suppkey"].to_pylist(),
            pq.read_table(f"{SF001}/supplier.parquet")["s_name"].to_pylist(),
        )
    )
    by_name: dict[str, int] = {}
    for k, n in waits.items():
        by_name[snames[k]] = by_name.get(snames[k], 0) + n
    want = sorted(by_name.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = QUERIES["q21_waiting_suppliers"](spark, SF001).collect()
    assert [(r.s_name, r.numwait) for r in got] == want
