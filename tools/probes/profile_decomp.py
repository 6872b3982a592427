"""profile_table decomposition (VERDICT r15 #4: re-earn the r13
'linear, no lever' note with a fresh-JVM decomposition, or find the
dominant stage).

Stages timed (noop sink, fresh frame per rep):
  scan     — bare 6-column orders scan floor.
  nodist   — the same single-pass aggregate minus the 6 exact
             countDistincts (nulls/min/max only): isolates the expand
             ×7 + two-phase distinct machinery.
  dist1    — countDistinct(o_orderkey) alone (the 45M-distinct PK is
             the worst column).
  current  — the registered operator.
(A restructure candidate is only designed if the decomposition shows
the distinct machinery dominating ABOVE dist1's single-column floor —
the floor itself is the exact-distinct lower bound.)

Usage: python tools/probes/profile_decomp.py <sf_dir>
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder("profile-decomp")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .config("spark.sql.files.minPartitionNum", "64")
    .config("spark.sql.files.openCostInBytes", str(128 << 10))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import table
from kwery_spark.registry import QUERIES

COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, mk, reps=3):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter()
        noop(mk())
        dt = time.perf_counter() - t0
        best = min(best, dt) if i > 0 else best
        print(f"    rep{i}: {dt:.3f}s", flush=True)
    print(f"  {label}: best {best:.3f}s", flush=True)
    return best


def scan():
    return table(spark, sf_dir, "orders").select(*COLS)


def nodist():
    o = scan()
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name in COLS:
        aggs += [
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"{name}__n"),
            F.min(name).alias(f"{name}__mn"),
            F.max(name).alias(f"{name}__mx"),
        ]
    return o.agg(*aggs)


def dist1():
    return scan().agg(F.countDistinct("o_orderkey"))


def old_expand():
    """The pre-r16 registered shape, inlined verbatim: all 6 exact
    countDistincts in ONE aggregate (Catalyst plans an Expand x7)."""
    o = table(spark, sf_dir, "orders")
    dec = "decimal(18,2)"

    def _fmt(col, typ, agg):
        c = agg(col)
        if typ == "double":
            return F.round(c, 2).cast(dec).cast("string")
        if typ == "timestamp":
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        return c.cast("string")

    types = {f.name: f.dataType.simpleString() for f in o.schema.fields}
    cols = [(name, types[name]) for name in COLS]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, typ in cols:
        aggs += [
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"{name}__nulls"),
            F.countDistinct(name).alias(f"{name}__distinct"),
            _fmt(name, typ, F.min).alias(f"{name}__min"),
            _fmt(name, typ, F.max).alias(f"{name}__max"),
        ]
    one = o.agg(*aggs)
    stack = ", ".join(
        f"'{name}', {name}__nulls, {name}__distinct, {name}__min, {name}__max"
        for name, _ in cols
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack}) AS "
                "(col_name, n_nulls, n_distinct, min_val, max_val)"
            ),
        )
        .select(
            "col_name",
            F.col("n_rows").cast("long"),
            F.col("n_nulls").cast("long"),
            F.col("n_distinct").cast("long"),
            "min_val",
            "max_val",
        )
        .coalesce(1)
        .sortWithinPartitions("col_name")
    )


print(f"== profile_table decomposition @ {sf_dir}")
t("scan   ", scan)
t("nodist ", nodist)
t("dist1  ", dist1)
t("old    ", old_expand)
t("current", lambda: QUERIES["profile_table"](spark, sf_dir))
old_rows = sorted(map(tuple, old_expand().collect()))
new_rows = sorted(map(tuple, QUERIES["profile_table"](spark, sf_dir).collect()))
print("VALUES EQUAL (exact):", old_rows == new_rows, " rows=", len(new_rows))
print("loadavg:", os.getloadavg())
