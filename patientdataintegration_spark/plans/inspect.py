"""Physical-plan inspection helpers — the engine's "did Catalyst do
what we designed for?" feedback loop (SURVEY.md §4.2).

Used by tests and by developers after adding an operator: assert the
plan has the shape you want (broadcast where intended, filters pushed
into the parquet scan, no accidental extra shuffles) instead of
guessing. At 100 TB the difference between ONE shuffle and two is
the benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (AQE may later coalesce them, but each is a full shuffle
    boundary). BroadcastExchange is NOT counted — broadcasts move
    one small side, not the data. Counts the formatted-plan detail
    headers `(N) Exchange` so each operator is counted exactly once."""
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan — empty means
    the filter did NOT reach the data source."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — verifies column pruning (a scan
    reading all columns for a 2-column projection is wrong)."""
    plan = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]
