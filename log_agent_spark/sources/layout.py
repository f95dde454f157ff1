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
