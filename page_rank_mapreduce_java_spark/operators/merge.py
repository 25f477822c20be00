"""MERGE INTO / upsert emulation (CDC ingestion without a table format).

Spark core has no MERGE; transactional table formats (Delta/Iceberg) add
it. The relational emulation — anti-join + union, with SCD2 history as a
window over validity ranges — covers the batch-CDC need and swaps
one-for-one for `MERGE INTO` when a lakehouse format is on the cluster.

FINAL (round 3): Delta/Iceberg are not installable in this offline
environment (no Python modules, no extension jars shipped with pyspark,
no network), so this emulation IS the repo's MERGE surface — a documented
boundary, not a TODO. What the emulation does NOT give you: snapshot
isolation between concurrent writers, conflict detection, and time
travel; those require the format's transaction log.

Scale: one shuffle on the merge key for the join, one for the union's
dedup window. Updates should be small relative to target → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert: rows from ``updates`` replace same-key rows in ``target``;
    unmatched update rows are inserted. Column sets must match.

    Precondition: ``updates`` must be key-unique — duplicate keys within
    one batch pass through verbatim (there is no version to arbitrate).
    Dedup upstream with ``merge_scd2``-style windowing when the batch may
    carry multiple versions of a key."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def merge_scd2(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """SCD2-style merge: keep full history, flag the latest version per key
    (``is_current``). ``version_col`` must be monotonically increasing
    (e.g. an event time or batch id). Equal versions are broken by
    ``tiebreak`` columns (descending); without them the choice among tied
    versions is arbitrary — supply unique versions or a tiebreak."""
    history = target.unionByName(updates)
    order = [F.desc(version_col)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return history.withColumn(
        "is_current", (F.row_number().over(w) == 1).cast("long")
    )
