"""Lineage management for iterative dataflow (SURVEY.md §4.3 hazard #1).

Each PageRank iteration derives the next rank vector from the previous one;
without cutting lineage the logical plan doubles per iteration and the
driver eventually dies on plan explosion. ``localCheckpoint(eager=True)``
materializes the partitions on executors and truncates the plan. On a real
cluster with fault-tolerance requirements, swap for ``checkpoint()`` against
a reliable FS every ~5 iterations; local runs don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Block lifecycle: a localCheckpoint's blocks are freed by the
    ContextCleaner once the DataFrame becomes unreachable. Iterative loops
    rebind their state variable each superstep, so the previous vector's
    blocks are reclaimed asynchronously — peak storage is ~2 state vectors
    plus the persisted edge relation, not O(iterations)."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
