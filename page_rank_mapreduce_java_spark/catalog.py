"""Table catalog for the driver-generated parquet corpus (TESTDATA.md).

All production reads use explicit parquet scans (columnar, predicate
pushdown + column pruning via Catalyst). No schema inference is involved:
parquet carries its schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _require_conf(spark: SparkSession, key: str, want: str) -> None:
    """Idempotently pin a runtime SQLConf the catalog's semantics depend on.

    ``get_spark`` sets these at build; a foreign driver session may not
    have. Setting is unavoidable (plans evaluate lazily, so a
    restore-after-read would silently change results at execution time),
    but a *conflicting* caller value is overridden loudly, never silently.
    """
    try:
        have = spark.conf.get(key)
    except Exception:
        have = None
    if have == want:
        return
    if have is not None and have != want:
        import warnings

        warnings.warn(
            f"catalog.load_table overrides {key}={have!r} with {want!r} "
            "for oracle-parity semantics (UTC rendering / nanos decoding); "
            "use a separate SparkSession if you need a different value",
            stacklevel=3,
        )
    spark.conf.set(key, want)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Date/window rendering must be UTC to match the (naive) oracle
    # timestamps regardless of what session the harness hands us.
    _require_conf(spark, "spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects outright. Enable the nanos-as-long escape hatch, read
        # the raw nanos, and convert to a µs timestamp (generated values
        # are µs-resolution, so this is lossless).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        _require_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # Integer division: epoch-ns (~1.7e18) exceeds double's 53-bit
            # exact range, so `/ 1000` would corrupt ~12% of values by 1 µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # Spark 4.1 reads parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ
            # (µs-truncated — lossless here, values are µs-resolution),
            # bypassing nanosAsLong. Cast to the session-TZ timestamp (UTC)
            # so ts keeps the same LTZ type contract every downstream query
            # was written against (unix_micros etc. reject NTZ).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
