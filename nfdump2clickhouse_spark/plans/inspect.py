"""Helpers to read a DataFrame's physical plan as text and assert the
optimizations the 100 TB design depends on."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def get_plan(df: DataFrame, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = get_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (pruning check)."""
    plan = get_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in get_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in get_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in get_plan(df)


def unpartitioned_window_specs(df: DataFrame) -> list[str]:
    """Window specs with an ORDER BY but NO partition columns — the
    whole-input-through-one-task shape that deadlocks at 100 TB.

    Catalyst prints each window expression as
    ``windowspecdefinition(part..., sort ASC/DESC..., frame)``; if the
    FIRST argument is already a sort spec, the partition list is empty."""
    plan = get_plan(df, "extended")
    out = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first = m.group(1).split(",")[0]
        if " ASC" in first or " DESC" in first:
            out.append(m.group(0))
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial+final hash aggregation split (map-side combine)."""
    plan = get_plan(df)
    return len(re.findall(r"HashAggregate", plan)) >= 2 or "partial_" in plan
