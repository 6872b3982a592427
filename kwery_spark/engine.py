"""Public entry point: the engine facade a reference user switches to.

Three ways in (SURVEY.md §3):
  1. SQL strings      — ``Engine(sf_dir).sql("SELECT ...")`` over the
                        pre-registered corpus views
  2. DataFrame builder — ``engine.table("lineitem").filter(...).agg(...)``
  3. Named operators   — ``engine.run("dedup_minhash")`` executes any
                        registered key (323 as of round 14 — the live count
                        is ``len(engine.operators())``; this docstring
                        number is CI-asserted against the registry in
                        tests/test_doc_counts.py, so it cannot rot)

The facade owns no execution machinery: it binds a SparkSession, registers
the ten corpus tables as temp views once, and hands everything to
Catalyst. One Engine per (session, sf_dir); cheap to construct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kwery_spark import registry
from kwery_spark.catalog import TABLES, register_views, table
from kwery_spark.session import get_spark


class Engine:
    """Query engine bound to a corpus directory."""

    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.sf_dir = sf_dir
        self.spark = spark or get_spark()
        registry.load_all()
        register_views(self.spark, sf_dir)

    def sql(self, text: str) -> DataFrame:
        """Run ANSI SQL against the corpus views (parse/analyze/optimize/
        execute all inside Spark SQL — one Py4J hop)."""
        return self.spark.sql(text)

    def table(self, name: str) -> DataFrame:
        """DataFrame handle for one of the corpus tables (lazy scan)."""
        return table(self.spark, self.sf_dir, name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def operators(self) -> list[str]:
        """Names of every packaged operator (SURVEY.md §2 keys)."""
        return sorted(registry.QUERIES)

    def run(self, key: str) -> DataFrame:
        """Execute a packaged operator by registry key."""
        try:
            fn = registry.QUERIES[key]
        except KeyError:
            raise KeyError(
                f"unknown operator {key!r}; see Engine.operators()"
            ) from None
        return fn(self.spark, self.sf_dir)
