"""Storage layout for scale: bucketing (co-located joins) and date
partitioning (partition-pruned scans).

The two physical-layout levers a 100 TB deployment leans on:

- ``write_bucketed``: hash-bucket a table on its join key at write time.
  Two tables bucketed the same way join with ZERO exchange — the shuffle
  happened once, at ingest, instead of on every query. This is the Spark
  analog of the reference's Cassandra partition-key layout
  (cassandra.go:349): key-aligned storage so reads never re-shuffle.
- ``write_date_partitioned``: directory-partition by a date column (the
  logfile table's file_date, mirroring the Cassandra partition key) so
  time-bounded queries scan only matching partitions (PartitionFilters in
  the plan, not data filters).

Bucketed tables go through the session catalog (``saveAsTable``) because
bucket metadata lives there; plain parquet paths can't carry it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)


def write_date_partitioned(df: DataFrame, path: str, date_col: str = "file_date") -> None:
    df.write.mode("overwrite").partitionBy(date_col).parquet(path)


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], num_files: int = 8
) -> None:
    """Cluster rows by ``sort_cols`` inside each output file (third layout
    lever, after bucketing and partitioning): parquet stores min/max stats
    per row group, and a range-sorted file gives every row group a NARROW,
    disjoint min/max band — so a point or range predicate on the sort key
    skips whole row groups at scan time (and whole FILES once AQE/stats
    kick in), without any directory structure.

    repartitionByRange + sortWithinPartitions: the range exchange makes the
    per-FILE ranges disjoint across the dataset (a global sort's layout at
    a fraction of the cost — no final merge), and the in-partition sort
    orders rows inside each file so row groups inherit tight bands. This is
    the parquet analog of the reference's Cassandra clustering columns
    (file_time/folder/pack/name after the partition key, cassandra.go:349):
    range-ordered storage beneath the partition."""
    (
        df.repartitionByRange(max(num_files, 1), *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_bucket: str,
    y_bucket: str,
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Fourth layout lever: Z-order (Morton) clustering for MULTI-column
    skipping. ``write_sorted`` gives one column tight per-file bands; when
    queries filter on either of two columns, interleaving the bits of both
    bucket columns (each pre-bucketed to [0, 2^bits)) and range-writing on
    the interleaved key bounds every file in BOTH dimensions — so parquet
    min/max stats prune on x-only, y-only, and x∧y predicates alike. A
    real deployment derives the buckets by range-ranking the raw values
    (preserving locality); the Morton expression itself is pure integer
    codegen (plans/sampling.py layout_zorder_stats is the query twin)."""
    from log_agent_spark.plans.sampling import _zvalue_spark
    from pyspark.sql import functions as F

    z = _zvalue_spark(F.col(x_bucket), F.col(y_bucket), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(max(num_files, 1), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a parquet directory's small files toward ``target_file_bytes``.

    Streaming micro-batch sinks accrete small files (one per trigger per
    partition); at scale that degrades every later scan (footer/open cost
    per file — the reason openCostInBytes exists). Rewrite through a
    staging dir sized by current bytes / target. Returns the new file count.

    A transactional table format would do this as OPTIMIZE; on plain
    parquet the staging swap is the portable equivalent.
    """
    import glob
    import shutil

    files = [f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    staging = path.rstrip("/") + "__compact"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def retention_prune(
    spark: SparkSession, path: str, date_col: str, cutoff: str
) -> list[str]:
    """Drop partitions older than ``cutoff`` (exclusive) from a
    date-partitioned table — the log-retention operation (the reference
    relies on Cassandra TTL/compaction for this; a parquet lake does it by
    deleting partition directories, an O(#partitions) metadata operation
    that never reads data). Returns the dropped partition values.

    Uses the Hadoop FileSystem API so it works on any supported FS; only
    directory names are examined.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    dropped: list[str] = []
    prefix = f"{date_col}="
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue
        value = name[len(prefix):]
        if value < cutoff:  # ISO dates compare lexicographically
            fs.delete(status.getPath(), True)
            dropped.append(value)
    return sorted(dropped)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    force_sort_merge: bool = True,
) -> DataFrame:
    """Join two same-bucketed catalog tables — planned without Exchange.

    ``force_sort_merge`` hints both sides to merge-join: if the planner
    picks broadcast instead it also disables the bucketed scan, discarding
    the co-location the tables paid for at write time.
    """
    l = spark.table(left_table)
    r = spark.table(right_table)
    if force_sort_merge:
        l, r = l.hint("merge"), r.hint("merge")
    return l.join(r, on=on)
