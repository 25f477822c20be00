"""Physical-plan inspection helpers (the scale-quality gate).

The 100 TB story rests on plan properties, not code intentions: filters
must reach the parquet scan, small dimensions must broadcast, hot paths
must stay inside whole-stage codegen, and no row-at-a-time Python may
appear in relational operators. These helpers make those properties
assertable in tests (tests/test_plans.py) so a regression in plan shape
fails CI the same way a wrong result would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scan_pushed_filters(df: DataFrame) -> str:
    """The PushedFilters sections of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in scan_pushed_filters(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def uses_python_udf(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def _split_top_level(s: str) -> list[str]:
    """Split a struct body on commas at bracket depth 0 (decimal(p,s) and
    nested struct/map/array types carry commas of their own)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the first parquet scan (pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1]
            if inner.endswith(">"):
                inner = inner[:-1]
            return [c.split(":")[0] for c in _split_top_level(inner) if c]
    return []
