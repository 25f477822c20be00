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


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects outright. Enable the nanos-as-long escape hatch on
        # whatever session we're given (it's a runtime SQLConf — the
        # driver harness may not have set it), read the raw nanos, and
        # convert to a µs timestamp (generated values are µs-resolution,
        # so this is lossless).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Date/window rendering must be UTC to match the (naive) oracle
        # timestamps regardless of what session the harness hands us.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # Integer division: epoch-ns (~1.7e18) exceeds double's 53-bit
            # exact range, so `/ 1000` would corrupt ~12% of values by 1 µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every corpus table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
