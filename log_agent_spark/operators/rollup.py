"""Incremental rollup maintenance — the materialized-view pattern a 100 TB
event store needs: a persistent day-partitioned aggregate that is updated by
recomputing ONLY the partitions a new batch of facts touches, not the table.

Mechanism: dynamic partition overwrite (`partitionOverwriteMode=dynamic`) —
the write replaces exactly the partitions present in its output and leaves
every other partition's files untouched. Combined with additive aggregates
(sum/count; avg derived at read time as sum/count) the update is:

    affected days  = distinct day in the delta
    new partitions = re-agg( existing rollup rows for those days ∪ delta partials )
    write          = dynamic overwrite of those partitions only

This is the batch analog of a streaming `update`-mode aggregation sink, and
the engine's answer to the reference's "upsert on primary-key collision"
semantics (cassandra.go:212) at aggregate granularity: late facts for a day
fold into that day's partition without touching any other. Exactly-once
requires each delta batch be applied once — in a streaming `foreachBatch`
that is the checkpointed batchId (T4/K8 parity); a raw replay of the same
delta double-counts, by construction of additive merges.

Scale: work is O(delta + size of affected partitions); a day of late data
re-aggregates one partition, never the table. The read side prunes on the
day partition column as usual.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def aggregate_partials(
    facts: DataFrame, day_col: str, key_cols: list[str], value_col: str
) -> DataFrame:
    """facts → additive partials per (day, keys): (sum_value, n_events)."""
    return facts.groupBy(day_col, *key_cols).agg(
        F.sum(value_col).alias("sum_value"),
        F.count("*").alias("n_events"),
    )


def merge_rollup(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    day_col: str,
    key_cols: list[str],
    value_col: str,
) -> None:
    """Fold a batch of raw facts into the persistent rollup at ``path``."""
    partials = aggregate_partials(delta, day_col, key_cols, value_col)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        affected = partials.select(day_col).distinct()
        # only the touched days participate in the re-aggregation
        old = existing.join(F.broadcast(affected), day_col)
        partials = (
            old.unionByName(partials)
            .groupBy(day_col, *key_cols)
            .agg(
                F.sum("sum_value").alias("sum_value"),
                F.sum("n_events").alias("n_events"),
            )
        )
    (
        partials.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(day_col)
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The rollup with derived (non-additive) metrics materialized at read."""
    r = spark.read.parquet(path)
    return r.withColumn(
        "avg_value", F.col("sum_value") / F.col("n_events")
    )
