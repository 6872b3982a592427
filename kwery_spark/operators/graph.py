"""Graph operators over relational data (SURVEY §2.12 extensions).

Connected components already lives in dedup.dedup_clusters (min-label
propagation to fixpoint); this module adds PageRank — the canonical
iterative-graph workload — over the purchase graph derived from the
corpus: customer c and supplier s are linked when c bought from s
(lineitem ⋈ orders), materialized as two directed edges so every node
has in- and out-links (no dangling-mass handling needed).

Scale notes: edges come from one equi-join + distinct; each PageRank
iteration is one join (rank → edges) + one groupBy(dst) shuffle —
the standard Pregel-on-relational decomposition. Rank state lives in a
DataFrame (never on the driver); lineage is truncated per round with
localCheckpoint, like ml_kmeans. A fixed 3-iteration unroll keeps the
op deterministic and lets the oracle replay every round as a CTE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from kwery_spark.catalog import table
from kwery_spark.registry import register

_D = 0.85  # damping


def _pagerank_oracle(iters: int = 3) -> str:
    sql = """
    WITH base AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT src, dst FROM base UNION SELECT dst, src FROM base),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
    p{i} AS (
        SELECT n.node,
               0.15 / (SELECT n FROM nn)
                 + 0.85 * coalesce(s.contrib, 0) AS pr
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum(p.pr / d.outdeg) AS contrib
            FROM e JOIN p{i - 1} p ON p.node = e.src
                   JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s USING (node))"""
    sql += f"""
    SELECT node, round(pr, 6) AS pagerank FROM p{iters}
    """
    return sql


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) on the bidirected
    customer↔supplier purchase graph. Deterministic: fixed iteration
    count, uniform init, float sums whose ulp-level order noise is
    absorbed by the final 6dp round (same argument as ml_kmeans)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = (
        base.union(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # pre-join outdeg onto edges once: each iteration then only joins rank
    ew = edges.join(deg, "src").localCheckpoint(eager=True)
    pr = nodes.crossJoin(broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(3):
        contrib = (
            ew.join(pr, ew.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1 - _D) / F.col("n")
                    + F.lit(_D) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))
