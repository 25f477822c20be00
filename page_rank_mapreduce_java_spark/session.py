"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N] (single JVM); the configs below are chosen
so the same code is correct and fast on a real multi-executor cluster:
AQE handles runtime re-planning (partition coalescing, skew joins), shuffle
partitions default to core count locally but would be sized to cluster
parallelism in a deploy, and Arrow is enabled for the (rare) Pandas-UDF
paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "page_rank_mapreduce_java_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults target local[$SPARK_GRAFT_CPUS]; on a cluster, pass
    ``master=None`` with an externally-configured spark-submit and these
    settings still apply (they are scale-independent).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Override knob for the partition-invariance sweeps (round-7
        # VERDICT #6): rerun the whole registry under adversarial
        # partition counts without touching thread parallelism.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE (round-7 sf10 smoke): a blanket high AQE
        # initialPartitionNum was A/B-measured here and REJECTED — it
        # cleared the rec_item_item_topk pair-sort OOM at 100× but
        # regressed the sf0.1 headline set (dedup_clusters +62%,
        # text_unigram_nll +49%: iterative/small shuffles pay 8× task
        # overhead that AQE coalescing doesn't claw back). Volume-
        # proportional partitioning lives at the heavy operators instead
        # (graph/pagerank.py links sizing, recommend.py pair shuffle).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Parquet TIMESTAMP(NANOS) (events.ts) is unsupported by the Spark
        # reader; read as raw nanos and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin ANSI mode to Spark 4's default explicitly: the exact-integer
        # oracle contract (string→BIGINT casts in hash parity expressions,
        # overflow-as-error) was certified under ANSI semantics and must
        # not drift if a deployment flips the global default (ADVICE r10).
        .config("spark.sql.ansi.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
