"""kwery_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine (``igorwwwwwwwwwwwwwwwwwwww/kwery``; checkout empty this
session — see SURVEY.md §0). Every operator is a composable function
``(SparkSession, sf_dir) -> DataFrame``: we declare logical plans with the
DataFrame/SQL API and let Catalyst + Tungsten choose the physical strategy.

Layout
------
- ``session``    SparkSession builder tuned for local test runs (scale-aware
                 knobs documented for cluster use).
- ``catalog``    parquet table loaders + temp-view registration.
- ``registry``   the (name -> query fn, name -> oracle SQL) registry that
                 ``__spark_entry__`` exposes to the driver.
- ``sources/``   scans, file-format ingest, sinks (SURVEY.md §2.1).
- ``operators/`` relational operators: project/filter, joins (incl. as-of,
                 range, theta), aggregates, windows, sorts/top-k, set ops,
                 dedup / similarity / text analysis, UDF surface
                 (SURVEY.md §2.2–2.7, §2.10, §2.11).
- ``functions/`` scalar function families (SURVEY.md §2.8).
- ``streaming/`` event-time windowing, watermarks, stateful ops
                 (SURVEY.md §2.9) — batch-equivalent forms plus true
                 Structured Streaming demos.
- ``plans/``     plan inspection helpers (pushdown / broadcast / codegen
                 assertions used by tests).
"""

__version__ = "0.1.0"
