"""Tests for the LLM-data-pipeline operators (dedup / similarity /
multimodal / UDF surface) that the oracle gate can't fully pin down:
LSH recall, SimHash-vs-Jaccard agreement, IVF recall, and the fake
decoder's exact feature values. Everything here is deterministic (seeded
hashes, fixed corpus), so assertions are exact-bound, not statistical.
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq
import pytest

import kwery_spark.all_ops  # noqa: F401 — populate registry
from kwery_spark.registry import QUERIES


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_minhash_pairs_all_verified(spark, sf001):
    from kwery_spark.operators.dedup import _minhash_doc_pairs

    rows = _minhash_doc_pairs(spark, sf001).collect()
    assert len(rows) > 5000  # corpus has built-in near-dups
    assert all(r.jaccard >= 0.9 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_minhash_summary_matches_expansion(spark, sf001):
    """The registered banded summary (r11 contract) must agree with the
    full doc-pair expansion it summarizes: per-band pair counts computed
    ANALYTICALLY from multiplicities equal the materialized counts, and
    each band's exemplar is the lexicographically smallest pair."""
    import math

    from kwery_spark.operators.dedup import _minhash_doc_pairs

    pairs = _minhash_doc_pairs(spark, sf001).collect()
    want: dict[int, list] = {}
    for p in pairs:
        band = math.floor(p.jaccard * 1000)
        ent = want.setdefault(band, [0, (1 << 62, 1 << 62)])
        ent[0] += 1
        ent[1] = min(ent[1], (p.doc_a, p.doc_b))
    got = QUERIES["dedup_minhash"](spark, sf001).collect()
    assert {r.jband for r in got} == set(want)
    for r in got:
        assert r.n_pairs == want[r.jband][0], (r.jband, r.n_pairs, want[r.jband][0])
        assert (r.ex_doc_a, r.ex_doc_b) == want[r.jband][1], r


def test_simhash_agrees_with_jaccard(spark, sf001):
    """Low-Hamming SimHash pairs should overwhelmingly be real near-dups:
    a majority of them must appear in the exact Jaccard>=0.9 pair set.
    (Consumes the full expansion — the registered key is the banded
    summary since r11.)"""
    from kwery_spark.operators.dedup import _minhash_doc_pairs, _simhash_doc_pairs

    jac = {(r.doc_a, r.doc_b) for r in _minhash_doc_pairs(spark, sf001).collect()}
    sim = {(r.doc_a, r.doc_b) for r in _simhash_doc_pairs(spark, sf001).collect()}
    assert len(sim) > 1000
    assert len(jac & sim) / len(sim) > 0.4


def test_simhash_summary_matches_full_expansion(spark, sf001):
    """The registered banded summary (r11 contract) must agree with the
    materialized doc-pair expansion band by band: pair counts, the
    lexicographic min exemplar per Hamming band (the dedup_minhash
    cross-check, applied to simhash), AND n_units — the distinct
    content-pair count, re-derived here by joining the expansion's doc
    ids back to their content keys (r11 ADVICE: n_units is the one
    column whose Spark formulation — row count of the union'd unit
    frames — differs structurally from the oracle's
    count(DISTINCT ck_lo||ck_hi), so it needs its own cross-check)."""
    from kwery_spark.operators.dedup import (
        _simhash_content_graph,
        _simhash_doc_pairs,
    )

    pairs = _simhash_doc_pairs(spark, sf001).collect()
    ck = {
        r.doc_id: r.ckey
        for r in _simhash_content_graph(spark, sf001)[0].collect()
    }
    want: dict[int, list] = {}
    for p in pairs:
        ent = want.setdefault(p.hamming, [0, (1 << 62, 1 << 62), set()])
        ent[0] += 1
        ent[1] = min(ent[1], (p.doc_a, p.doc_b))
        ca, cb = ck[p.doc_a], ck[p.doc_b]
        ent[2].add((min(ca, cb), max(ca, cb)))
    got = QUERIES["dedup_simhash"](spark, sf001).collect()
    assert {r.hamming for r in got} == set(want)
    for r in got:
        assert r.n_pairs == want[r.hamming][0], (r.hamming, r.n_pairs)
        assert (r.ex_doc_a, r.ex_doc_b) == want[r.hamming][1], r
        assert r.n_units == len(want[r.hamming][2]), (r.hamming, r.n_units)


def test_ann_ivf_recall_vs_bruteforce(spark, sf001):
    """IVF with nprobe=4 of 8 cells must recover >=4 of brute force's
    top-5 for the shared query vector (vec_id=0). Deterministic plan —
    observed recall is 5/5; threshold leaves headroom only for parameter
    tweaks, not randomness."""
    bf = [
        r.vec_id
        for r in QUERIES["sim_knn_bruteforce"](spark, sf001).collect()
        if r.vec_id != 0
    ][:5]
    ivf = QUERIES["ann_ivf"](spark, sf001).collect()
    got = {r.neighbor_id for r in ivf if r.query_id == 0}
    assert len(set(bf) & got) >= 4


def test_mm_decode_features_exact(spark, sf001):
    """The REAL encode→decode round-trip (PNG inflate+filter
    reconstruction / WAV chunk walk) must land features that match an
    independent local recomputation over the source bytes byte-for-byte
    (sha256 + 16-bin histogram + mean)."""
    out = {r.doc_id: r for r in QUERIES["mm_decode_features"](spark, sf001).collect()}
    tbl = pq.read_table(f"{sf001}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    assert set(out) == set(docs)
    for doc_id in list(docs)[:25]:
        payload = docs[doc_id].encode()
        r = out[doc_id]
        assert r.content_sha256 == hashlib.sha256(payload).hexdigest()
        hist = [0] * 16
        for b in payload:
            hist[b >> 4] += 1
        assert r.hist_csv == ",".join(str(n) for n in hist)
        assert r.mean_byte == pytest.approx(sum(payload) / len(payload))


def test_mm_frame_sample_counts(spark, sf001):
    """Every wav asset yields ceil(len/256) frames, indices contiguous."""
    rows = QUERIES["mm_frame_sample"](spark, sf001).collect()
    tbl = pq.read_table(f"{sf001}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        assert doc_id % 3 == 2  # wav = doc_id % 3 == 2
        n = (len(docs[doc_id].encode()) - 1) // 256 + 1
        assert sorted(idxs) == list(range(n))


def test_udf_surface_registered():
    for key in (
        "udf_python",
        "udf_pandas_scalar",
        "udaf_pandas_agg",
        "udf_grouped_map",
        "udf_map_batches",
        "udtf_python",
    ):
        assert key in QUERIES


def test_dedup_clusters_are_consistent(spark, sf001):
    """Every cluster member must reach its component root through the
    pair graph; component = min member; all pair endpoints clustered."""
    from kwery_spark.operators.dedup import _minhash_doc_pairs

    pairs = _minhash_doc_pairs(spark, sf001).collect()
    comp = {r.doc_id: r.component for r in QUERIES["dedup_clusters"](spark, sf001).collect()}
    # both endpoints of every near-dup pair share a component
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b], (p.doc_a, p.doc_b)
    # the component id is the minimum doc_id of its members
    import collections

    members = collections.defaultdict(list)
    for d, c in comp.items():
        members[c].append(d)
    for c, ds in members.items():
        assert c == min(ds)


def test_kmeans_clusters_quality(spark, sf001):
    rows = QUERIES["ml_kmeans"](spark, sf001).collect()
    assert len(rows) > 0
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(8)) and len(clusters) >= 4
    # cosine to own centroid should beat the corpus-wide mean pair sim by a
    # clear margin (deterministic given fixed seeds/iterations)
    avg_sim = sum(r.sim for r in rows) / len(rows)
    assert avg_sim > 0.1, avg_sim


def test_ann_lsh_structure_and_recall(spark, sf001):
    """LSH-ANN structural invariants + deterministic recall floor. The
    op's docstring records why recall trails IVF on this near-orthogonal
    corpus; the floor here pins the measured deterministic value."""
    rows = QUERIES["ann_lsh"](spark, sf001).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) <= {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert len(rs) <= 5
        assert sorted(r.rnk for r in rs) == list(range(1, len(rs) + 1))
        assert all(r.neighbor_id != q for r in rs)
    bf = [
        r.vec_id
        for r in QUERIES["sim_knn_bruteforce"](spark, sf001).collect()
        if r.vec_id != 0
    ][:5]
    got = {r.neighbor_id for r in by_q.get(0, [])}
    assert len(set(bf) & got) >= 2  # measured 3/5, deterministic


def test_pagerank_is_a_distribution(spark, sf_dir):
    """PageRank must conserve mass: ranks positive, summing to ~1 (the
    bidirected graph has no dangling nodes to leak mass through)."""
    rows = QUERIES["graph_pagerank"](spark, sf_dir).collect()
    assert rows
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3, total
    assert all(r.pagerank > 0 for r in rows)


def test_pq_codes_and_error_sane(spark, sf_dir):
    """PQ encode: every code in [0,16), one code per subspace, and the
    mean reconstruction error must beat the trivial all-zeros codebook
    (for unit vectors that baseline MSE is 1/64 per dimension-share =
    mean squared norm / 64)."""
    rows = QUERIES["ann_pq"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 8 and all(0 <= c < 16 for c in codes)
        assert r.mse >= 0
    avg_mse = sum(r.mse for r in rows) / len(rows)
    # all-zero reconstruction of a unit vector has MSE 1/64 per dim pair
    assert avg_mse < 1.0 / 64, avg_mse


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    """The IVF→PQ-ADC→rerank stack must recover most of the true top-5:
    per query, ≥3 of the exact brute-force top-5 (the compression +
    coarse probe trade recall for the memory/scan shape; the rerank
    stage keeps what survives candidate generation exact)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from kwery_spark.operators.similarity import _vecs, dot

    got = {}
    for r in QUERIES["ann_ivfpq"](spark, sf_dir).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    vecs = _vecs(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "vec_id")
    truth = {}
    for r in (
        vecs.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot("v", "qv").alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    ):
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(got) == set(truth)
    for qid in truth:
        overlap = len(got[qid] & truth[qid])
        assert overlap >= 3, (qid, got[qid], truth[qid])


def test_embedding_pca_invariants(spark, sf001):
    """Power iteration must emit a unit-norm component with a positive
    eigenvalue, canonical sign, and an explained ratio in (0, 1]."""
    rows = sorted(QUERIES["embedding_pca"](spark, sf001).collect(), key=lambda r: r.idx)
    assert len(rows) == 64 and [r.idx for r in rows] == list(range(64))
    norm = sum(r.loading ** 2 for r in rows) ** 0.5
    assert abs(norm - 1.0) < 1e-4, norm
    assert rows[0].loading >= 0  # sign canonicalization
    lam, ratio = rows[0].eigenvalue, rows[0].explained_ratio
    assert lam > 0 and 0 < ratio <= 1
    assert all(r.eigenvalue == lam and r.explained_ratio == ratio for r in rows)
