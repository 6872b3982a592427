"""Table access for the testdata corpus (TESTDATA.md / FIXTURES.md).

``table(spark, sf_dir, name)`` returns a lazily-scanned DataFrame straight
off the parquet file — no caching, no materialization — so Catalyst can push
filters and prune columns into the vectorized parquet reader per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are small at EVERY scale factor (region: 5 rows,
# nation: 25 rows — fixed by the TPC-H-style generator). These are always
# safe to broadcast regardless of SF; other tables scale with SF and are
# left to AQE / autoBroadcastJoinThreshold.
ALWAYS_SMALL = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql entry)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
