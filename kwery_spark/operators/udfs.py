"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Demonstrates every Python-extension point Spark offers — row-at-a-time
UDF, Arrow-vectorized pandas UDF, grouped-agg UDAF, grouped-map
applyInPandas, partition-wise mapInPandas, and a Python UDTF with a
LATERAL join — each paired with a pure-SQL oracle re-expressing the same
function.

Oracle-determinism discipline: every float computation here is either
per-row IEEE arithmetic (identical in pandas and DuckDB) or an exact sum
of integral-valued doubles followed by a single division, so results are
bitwise-stable regardless of accumulation order — no rounding slop needed
beyond the harness's 6-significant-digit normalization.

Scale notes: Python UDFs are the slow path (per-row pickling); the pandas
variants move data as Arrow batches and are the only acceptable form on a
hot path. All six run fully distributed — the Python workers execute
per-partition, nothing funnels through the driver.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udf, udtf

from kwery_spark.catalog import table
from kwery_spark.registry import register


@register(
    "udf_python",
    oracle="""
    SELECT o_orderkey,
           CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS price_bucket
    FROM orders
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDFs: parse the numeric priority out of
    '1-URGENT'-style strings and bucket the order price. Registered via
    F.udf; fine for cold paths, never for 100 TB hot loops (each row round-
    trips the Python worker) — the vectorized twin is udf_pandas_scalar."""

    @udf("int")
    def priority_num(p: str) -> int:
        return int(p.split("-", 1)[0])

    @udf("string")
    def price_bucket(total: float) -> str:
        if total >= 200000:
            return "high"
        if total >= 50000:
            return "mid"
        return "low"

    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        priority_num("o_orderpriority").alias("priority_num"),
        price_bucket("o_totalprice").alias("price_bucket"),
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF computing the TPC-H charge
    expression. Per-row IEEE double ops vectorized over the whole Arrow
    batch — the 10-100x-faster replacement for row-at-a-time UDFs."""

    @pandas_udf("double")
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "udaf_pandas_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CASE WHEN count(*) > 2
                THEN (sum(l_quantity) - min(l_quantity) - max(l_quantity))
                       / (count(*) - 2)
                ELSE NULL END AS trimmed_mean_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: min/max-trimmed mean of l_quantity.
    l_quantity is integral-valued, so the sum is exact in double and the
    single final division is order-independent — safe under the value-hash
    oracle. Groups of ≤2 rows have no interior after trimming → NULL (in
    both engines), so the pattern stays safe under finer grouping keys.
    Spark runs this as partial Arrow batches per group."""

    @pandas_udf("double")
    def trimmed_mean(q: pd.Series) -> float | None:
        if q.count() <= 2:
            return None
        return float((q.sum() - q.min() - q.max()) / (q.count() - 2))

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        trimmed_mean("l_quantity").alias("trimmed_mean_qty")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           (o_totalprice - min(o_totalprice) OVER (PARTITION BY o_orderpriority))
             / (max(o_totalprice) OVER (PARTITION BY o_orderpriority)
                - min(o_totalprice) OVER (PARTITION BY o_orderpriority)) AS scaled
    FROM orders
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-priority min-max normalization of
    order totals. Each group arrives as one pandas frame (watch group
    cardinality at scale — a mega-group must fit a worker); arithmetic is
    subtract + one division, so it matches the SQL window-form oracle
    exactly."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "scaled": (pdf["o_totalprice"] - lo) / (hi - lo),
            }
        )

    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").applyInPandas(
        scale, "o_orderkey long, o_orderpriority string, scaled double"
    )


@register(
    "udf_map_batches",
    oracle="""
    SELECT c_custkey, md5(c_name) AS name_md5,
           CAST(length(c_name) AS INTEGER) AS name_len
    FROM customer
    """,
)
def udf_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise mapInPandas: stream Arrow batches through Python,
    emitting an md5 content hash per row (hashlib and DuckDB md5 agree
    byte-for-byte). This is the plumbing shape every multimodal decode op
    uses — see operators/multimodal.py."""

    def hash_batch(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "name_md5": [
                        hashlib.md5(n.encode()).hexdigest() for n in pdf["c_name"]
                    ],
                    "name_len": pdf["c_name"].str.len().astype("int32"),
                }
            )

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return cust.mapInPandas(
        hash_batch, "c_custkey long, name_md5 string, name_len int"
    )


@register(
    "udtf_python",
    oracle="""
    SELECT p_partkey,
           unnest(str_split(p_name, ' ')) AS word,
           CAST(unnest(range(1, len(str_split(p_name, ' ')) + 1)) AS INTEGER)
               AS pos
    FROM part
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark >= 3.5): one input row -> n output rows, joined
    LATERAL so each part key fans out to its name's words with positions —
    the UDTF twin of posexplode."""

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, name: str):
            for i, w in enumerate(name.split(" "), start=1):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, t.word, t.pos
        FROM part_v, LATERAL split_words(p_name) t
        """
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3, 20)) AS priority_word,
           CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_decile_10k
    FROM orders
    WHERE o_orderkey <= 5000
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 3.5+/4 `useArrow=True`): scalar
    Python semantics with Arrow-batched transfer — the drop-in upgrade
    path for legacy row UDFs that can't be rewritten to pandas_udf
    wholesale. Same per-row function body as udf_python's style, but the
    serialization boundary is columnar; on a 100 TB hot path you still
    prefer built-in expressions (the oracle shows these are expressible
    relationally — the key exists to cover the UDF execution surface)."""

    @udf("string", useArrow=True)
    def priority_word(p: str) -> str:
        return p.split("-", 1)[1].upper() if "-" in p else p.upper()

    @udf("long", useArrow=True)
    def price_decile(x: float) -> int:
        return int(x // 10000)

    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 5000)
        .select(
            "o_orderkey",
            priority_word("o_orderpriority").alias("priority_word"),
            price_decile("o_totalprice").alias("price_decile_10k"),
        )
    )
