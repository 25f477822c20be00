"""The engine's money-exactness convention, in ONE place.

Exact integer cents (``round(x·100)`` as BIGINT) make every money/value
aggregate order-independent and bit-identical across engines — the
foundation of the DuckDB oracle checks. Both the Spark Column and the SQL
rendering live here so the convention cannot drift between modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CENTS_SQL_TEMPLATE = "CAST(round({c} * 100, 0) AS BIGINT)"


def cents(col: str | Column) -> Column:
    """HALF_UP integer cents of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(col: str) -> str:
    """DuckDB rendering of ``cents`` (round half-away-from-zero — equal to
    Spark's HALF_UP for the positive and negative case alike)."""
    return CENTS_SQL_TEMPLATE.format(c=col)
