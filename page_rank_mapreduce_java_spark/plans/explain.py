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


# Logical nodes that collapse cardinality: a global window ABOVE one of
# these sees aggregate/limit-sized input, not the raw table (e.g. the
# per-partition-count prefix sum inside operators/ranking.py).
_CARDINALITY_SINKS = frozenset({"Aggregate", "GlobalLimit", "LocalLimit"})


def _jchildren(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def _leaf_paths(node) -> list[str]:
    try:
        paths = node.relation().location().rootPaths()
        return [paths.apply(i).toString() for i in range(paths.length())]
    except Exception:
        return []


def _subtree_scans_table(node, table_names: frozenset[str]) -> bool:
    name = node.getClass().getSimpleName()
    if name in _CARDINALITY_SINKS:
        return False
    for p in _leaf_paths(node):
        if any(f"{t}.parquet" in p for t in table_names):
            return True
    return any(_subtree_scans_table(c, table_names) for c in _jchildren(node))


def unpartitioned_fact_windows(df: DataFrame, fact_tables: frozenset[str]) -> list[str]:
    """Window operators with an EMPTY partition spec whose input subtree
    reads a fact-table scan with no intervening aggregate/limit — i.e. a
    whole-fact-table single-task window, the VERDICT-r1 scale hazard.
    Returns one description string per offender (empty list = clean)."""
    offenders: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            if _subtree_scans_table(node, fact_tables):
                offenders.append(node.nodeName() + ": " + node.argString(120))
        for c in _jchildren(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return offenders


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
