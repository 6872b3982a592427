"""Recommendation operators — item-item collaborative filtering, the
classic Amazon-style "customers who bought X also bought Y" family
(Linden/Smith/York 2003), expressed over the purchase corpus.

Items are part brands (spec-fixed 25-value domain), users are customers,
and the rating is the implicit purchase count — so the item-item
similarity space is at most 25x24 = 600 directed cells regardless of
corpus size, the same content-cardinality bound the assoc rules use.
Pair contributions are generated map-side from each user's collected
brand vector (<=25 entries), never via a row-level self-join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kwery_spark.catalog import broadcast_fits, table
from kwery_spark.registry import register


@register(
    "rec_item_item_cf",
    oracle="""
    WITH ub AS (
        SELECT o.o_custkey AS u, p.p_brand AS b,
               CAST(count(*) AS BIGINT) AS v
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, p.p_brand
    ),
    n2 AS (
        SELECT b, CAST(sum(v * v) AS BIGINT) AS n2 FROM ub GROUP BY b
    ),
    dt AS (
        SELECT a.b AS ba, c.b AS bb, CAST(sum(a.v * c.v) AS BIGINT) AS dot
        FROM ub a JOIN ub c ON a.u = c.u AND a.b <> c.b
        GROUP BY a.b, c.b
    ),
    cs AS (
        SELECT ba, bb, dot,
               CAST(dot AS DOUBLE)
                   / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
                   AS cosine
        FROM dt JOIN n2 x ON dt.ba = x.b JOIN n2 y ON dt.bb = y.b
    ),
    r AS (
        SELECT *, row_number() OVER (
            PARTITION BY ba ORDER BY cosine DESC, bb
        ) AS rk FROM cs
    )
    SELECT ba AS brand, bb AS similar_brand, dot,
           round(cosine, 6) AS cosine, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 5
    ORDER BY brand, rk
    """,
)
def rec_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity between
    brand purchase-count vectors over the customer dimension, emitting
    each brand's top-5 "also bought" neighbors.

    Exactness: the user-brand ratings are integer lineitem counts, so
    dot products and squared norms are exact BIGINTs; the cosine is one
    double division of an exact integer by a product of two IEEE-exact
    sqrts — bit-identical across engines — and ranking breaks exact
    ties on the neighbor brand.

    Scale: the rating matrix is one shuffle (custkey, brand); pair
    contributions explode map-side from each user's <=25-entry brand
    vector (the assoc_basket_rules pattern — never a row-level
    self-join on a content key) and fold into <=600 similarity cells;
    norms are a 25-row broadcast; the top-5 window partitions by brand
    over <=24 rows. Every data-scale stage is linear in lineitem."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r14 (the q16 pmap pattern, same gate as assoc_basket_rules): the
    # partkey->brand map is linear in part cardinality — broadcast it
    # while the estimated build fits the byte budget (plan-time footer
    # gate), removing the first of lineitem's three exchanges (partkey
    # SMJ -> orderkey SMJ -> repartition(u)). Measured fresh-JVM
    # alternating A/B, sweep confs, sf30: vecs build 34.8/40.9 ->
    # 30.6/39.3 s (both alternating reps favor the broadcast arm;
    # later-rep drift is the documented session GC effect), values
    # equal. Past the gate the plain join degrades instead of OOMing.
    part_side = (
        F.broadcast(part) if broadcast_fits(sf_dir, "part", 24) else part
    )
    # r14 fuse (the _pair_weights r12 pattern, VERDICT r13 item 5): one
    # explicit repartition(u) serves BOTH aggregations — hash(u)
    # satisfies groupBy(u, b)'s clustered distribution (same u -> same
    # partition) AND groupBy(u)'s, so the old shape's second shuffle
    # (the 15M-row (u,b) table re-exchanged on u for the collect_list)
    # vanishes. The map-side partial agg the direct groupBy(u,b) had is
    # worth less than the shuffle it leaves behind: measured alternating
    # same-session A/B, sweep confs — sf10 12.2-13.3 -> 10.4-11.4 s,
    # sf30 49.9-51.0 -> 31.0-40.4 s for the vecs build, values equal.
    ub = (
        li.join(part_side, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("p_brand").alias("b"))
        .repartition("u")
        .groupBy("u", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    # r8 contraction (exact algebra, oracle unchanged): the pair
    # contributions sum identically over DISTINCT brand vectors weighted
    # by how many users share them — the corpus upscale clones users, so
    # the O(|vector|^2) double explode was paying 10x at sf10 (sweep
    # 68.8 s -> see BASELINE.md). collect_list is canonicalized with
    # sort_array before grouping (the sorted-collect determinism rule).
    vecs = (
        ub.groupBy("u")
        .agg(F.sort_array(F.collect_list(F.struct("b", "v"))).alias("bv"))
        .groupBy("bv")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
        .localCheckpoint(eager=True)
    )
    n2 = (
        vecs.select(F.explode("bv").alias("a"), "m")
        .groupBy(F.col("a.b").alias("b"))
        .agg(F.sum(F.col("m") * F.col("a.v") * F.col("a.v")).cast("long").alias("n2"))
    )
    dot = (
        vecs.select(F.explode("bv").alias("a"), "bv", "m")
        .select("a", F.explode("bv").alias("c"), "m")
        .filter(F.col("a.b") != F.col("c.b"))
        .groupBy(
            F.col("a.b").alias("ba"), F.col("c.b").alias("bb")
        )
        .agg(
            F.sum(F.col("m") * F.col("a.v") * F.col("c.v"))
            .cast("long")
            .alias("dot")
        )
    )
    nx = n2.select(F.col("b").alias("ba"), F.col("n2").alias("n2a"))
    ny = n2.select(F.col("b").alias("bb"), F.col("n2").alias("n2b"))
    cs = (
        dot.join(F.broadcast(nx), "ba")
        .join(F.broadcast(ny), "bb")
        .select(
            "ba",
            "bb",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("ba").orderBy(F.desc("cosine"), "bb")
    return (
        cs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("ba").alias("brand"),
            F.col("bb").alias("similar_brand"),
            "dot",
            F.round("cosine", 6).alias("cosine"),
            "rk",
        )
        .coalesce(1)
        .sortWithinPartitions("brand", "rk")
    )
