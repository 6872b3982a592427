"""Query/oracle registry backing ``__spark_entry__``.

Every operator module registers its named queries here with the
``@register`` decorator. ``oracle`` is the DuckDB-SQL equivalent the driver
runs side-by-side (SURVEY.md §5.2); pass ``oracle=None`` for genuinely
non-SQL-expressible operators (the driver then records a rows-only check).

Column-name discipline (driver contract): the comparison sorts columns by
name before hashing values, so every computed column must carry the same
alias in the Spark query and the oracle SQL.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# NOTE on plan caching: reusing the same DataFrame object across repeated
# executions was tried and REJECTED for benchmarking — Spark silently reuses
# the prior run's shuffle map outputs for an identical physical-plan
# instance (stage skipping), so timed re-runs would measure only the final
# stage while DuckDB re-executes fully. Queries are rebuilt per call; only
# the table *scan plans* are cached (kwery_spark.catalog), which carries no
# materialized state.


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from kwery_spark import all_ops  # noqa: F401
