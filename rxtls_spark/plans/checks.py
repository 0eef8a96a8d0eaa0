"""Physical-plan inspection helpers — make plan quality testable.

The scale contract (SURVEY §4) is about plan *shape*: broadcast joins
for lookup enrichment (never a shuffle of the page stream), filters
and column pruning pushed into the parquet scan, bounded exchange
count, whole-stage codegen on the JVM stages.  These helpers expose
the executed plan as a string so tests can assert those properties
instead of hoping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (excludes broadcast
    exchanges — those are the cheap kind we *want* for lookups).
    Uses simple mode: formatted mode splits node names from their
    arguments, which breaks pattern matching."""
    plan = plan_string(df, mode="simple")
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", plan))


def shuffle_join_kinds(df: DataFrame) -> list[str]:
    """Join strategies in the plan that shuffle or explode the big side."""
    plan = plan_string(df, mode="simple")
    return [
        kind
        for kind in ("SortMergeJoin", "ShuffledHashJoin",
                     "CartesianProduct", "BroadcastNestedLoopJoin")
        if kind in plan
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def has_shuffle_join(df: DataFrame) -> bool:
    p = plan_string(df)
    return "SortMergeJoin" in p or "ShuffledHashJoin" in p


def pushed_filters(df: DataFrame) -> list[str]:
    plan = plan_string(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    plan = plan_string(df)
    cols: set[str] = set()
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen stages; simple mode marks them as
    ``*(N)`` node prefixes.  AQE only materializes codegen in the final
    plan, so the query is executed first by default."""
    if execute:
        df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", plan_string(df, mode="simple"))))
