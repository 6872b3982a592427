"""Physical-plan inspection helpers (SURVEY.md §4 reliance checklist).

The engine's 100 TB story rests on Catalyst doing specific things:
pushing filters into parquet row-groups, pruning columns at the reader,
broadcasting small join sides, fusing ORDER BY+LIMIT to
TakeOrderedAndProject, and running pipelines inside WholeStageCodegen.
These helpers let tests lock in that reliance so a refactor that silently
de-optimizes a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text of the dataframe's physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet reader will actually materialize
    (ReadSchema of the first scan in the plan)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [f.split(":")[0] for f in schema.split(",") if f]
    return []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_wholestage_codegen(df: DataFrame) -> bool:
    """True if the EXECUTED plan ran whole-stage-codegen'd pipelines.

    Under AQE the pre-execution plan is a bare AdaptiveSparkPlan with no
    codegen info, so this executes the query (cheap at test SF) and reads
    the final plan's ``*(n)`` codegen-stage markers."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return "*(" in final


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan —
    the metric to minimize when reviewing an operator for scale."""
    import re

    plan = formatted_plan(df)
    # count detail headers "(n) Exchange" so tree + detail lines aren't
    # double-counted; broadcast exchanges move no shuffle data.
    return len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.MULTILINE))
