"""Table maintenance: schema evolution, small-file compaction, file stats.

At 100 TB the storage layout is an operator in its own right: streaming
and per-iteration sinks (writers.write_iteration) produce many small
files, and long-lived tables gain columns over time. This module covers
the three maintenance moves a production pipeline runs on a cadence:

- ``read_parquet_evolving``: schema-merged scan across footer versions
  (old files surface NULL for columns they predate).
- ``append_parquet``: additive-schema append — the write side of
  evolution.
- ``compact_parquet``: rewrite a fragmented dataset at a target
  in-memory partition size, atomically (write-temp → swap via the
  Hadoop FileSystem API, so readers never observe a half-written
  table and the operation works on any Hadoop FS: local/HDFS/s3a).
- ``parquet_file_stats``: driver-side file census (count, bytes,
  small-file ratio) to decide WHEN to compact — metadata-only, no
  data scan.

No counterpart in the reference (it leaves one text part-file per
reducer forever); this is engine infrastructure, not a query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Scan a parquet dataset whose files were written under different
    schema versions. ``mergeSchema`` unions the footers: columns absent
    from older files read as NULL. Costs one footer read per file at
    planning time — acceptable for evolved tables, which is why it is
    not the default ``read_parquet``."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def append_parquet(df: DataFrame, path: str) -> None:
    """Additive-schema append: new files may carry MORE columns than the
    existing ones (read back with ``read_parquet_evolving``). Removing or
    retyping a column is NOT evolution — do that through a full rewrite
    (``compact_parquet`` on the transformed frame)."""
    df.write.mode("append").parquet(path)


@dataclass
class FileStats:
    num_files: int
    total_bytes: int
    small_files: int  # files under the small_bytes threshold
    max_file_bytes: int

    @property
    def small_ratio(self) -> float:
        return self.small_files / self.num_files if self.num_files else 0.0


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def parquet_file_stats(
    spark: SparkSession, path: str, small_bytes: int = 32 * 1024 * 1024
) -> FileStats:
    """File census via the FileSystem API — one namenode listing, zero
    data read. The compaction trigger in a real pipeline is
    ``stats.small_ratio > threshold``, checked per table per cadence."""
    fs, jpath, _ = _hadoop_fs(spark, path)
    it = fs.listFiles(jpath, True)
    n = total = small = mx = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        size = st.getLen()
        n += 1
        total += size
        mx = max(mx, size)
        if size < small_bytes:
            small += 1
    return FileStats(num_files=n, total_bytes=total, small_files=small, max_file_bytes=mx)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> FileStats:
    """Rewrite ``path`` with ~``target_partition_bytes`` of input per
    output file, atomically.

    Partition count comes from the CURRENT on-disk byte size (a metadata
    listing), not a row count — so the rewrite itself never scans twice.
    The new copy lands in a sibling temp dir; the swap is two FS renames,
    each atomic per-directory on HDFS/local FS (on S3 the rename is a
    copy — pair this with a manifest commit there). The swap as a WHOLE
    is not atomic: between the two renames the table path briefly does
    not exist, so a reader that PLANS in that window fails with
    path-not-found (readers that planned earlier keep reading the
    renamed-away files, Spark's usual snapshot-at-plan semantics), and a
    crash between the renames strands the data at ``<path>._compact_old``
    — recover by renaming that directory back over ``path``.
    ``recover_compaction`` below does exactly that; run it (or check for
    a leftover ``._compact_old``) at pipeline startup. True no-gap swaps
    need a transactional table format, which is out of scope here (see
    operators/merge.py).

    The source is read with ``mergeSchema`` (read_parquet_evolving):
    compaction is the documented follow-up to ``append_parquet``'s
    additive-schema appends, and a plain read would take the schema of
    one arbitrary footer and silently drop columns present only in newer
    files.
    """
    stats = parquet_file_stats(spark, path)
    parts = max(1, -(-stats.total_bytes // target_partition_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # repartition (round-robin, no key): even output sizes regardless of
    # the input's key distribution — this is layout maintenance, any
    # bucketing/sort contract should use write_bucketed instead.
    read_parquet_evolving(spark, path).repartition(parts).write.mode(
        "overwrite"
    ).parquet(tmp)

    fs, jpath, jvm = _hadoop_fs(spark, path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(jold, True)
    if not fs.rename(jpath, jold):
        raise IOError(f"compact_parquet: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        # roll back so the table is never left missing
        fs.rename(jold, jpath)
        raise IOError(f"compact_parquet: could not promote {tmp}")
    fs.delete(jold, True)
    return parquet_file_stats(spark, path)


def recover_compaction(spark: SparkSession, path: str) -> bool:
    """Startup check for a compaction that crashed between its two swap
    renames (table stranded at ``<path>._compact_old`` while ``path`` is
    missing). Returns True if a recovery rename was performed. Safe to
    run unconditionally on a cadence: it only acts when the table path is
    absent AND the old copy exists, so a healthy or mid-write table is
    never touched."""
    fs, jpath, jvm = _hadoop_fs(spark, path)
    jold = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._compact_old")
    if fs.exists(jold) and not fs.exists(jpath):
        if not fs.rename(jold, jpath):
            raise IOError(f"recover_compaction: could not restore {path}")
        return True
    return False
