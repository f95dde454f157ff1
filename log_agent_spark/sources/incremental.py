"""Incremental (exactly-once-ish) ingest state (SURVEY.md §2.1 S2, §2.3 T4).

The reference keeps a BadgerDB map of path → processed-mtime; its polling
source re-walks the tree and forwards only files whose mtime changed
(watchdog/watcher/fspolling.go:33-87), committing state only after every
sink succeeded (watchdog/watchdog.go:429-436).

Spark-first form: the state is a parquet table of (path, mtime); the "what
changed" decision is a LEFT ANTI join of the current listing against it —
a broadcast-able join at typical state sizes, hash-shuffle otherwise. The
commit is a whole-table overwrite written only after sink success (K8
ordering preserved by the caller — see sinks/multi.py).

At-least-once + idempotent keyed upsert sinks ⇒ effectively-once, the same
contract the reference relies on (cassandra.go:212).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.schemas import STATE_SCHEMA


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Load the (path, mtime) state table; empty if never committed."""
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return spark.read.schema(STATE_SCHEMA).parquet(state_dir)
    return spark.createDataFrame([], STATE_SCHEMA)


def delta_since(listing: DataFrame, state: DataFrame) -> DataFrame:
    """Files that are new OR whose mtime differs from the recorded one —
    fspolling.go:44-59's isSaved check as an anti-join.

    ``listing`` needs (path, mtime) columns (extra columns pass through).
    """
    return (
        listing.join(
            F.broadcast(state.withColumnRenamed("mtime", "seen_mtime")),
            on="path",
            how="left",
        )
        .filter(F.col("seen_mtime").isNull() | (F.col("mtime") != F.col("seen_mtime")))
        .drop("seen_mtime")
    )


def commit_state(listing: DataFrame, state_dir: str) -> None:
    """K8 post-success commit: record the processed (path, mtime) set.

    Caller MUST invoke this only after all sinks succeeded
    (watchdog.go:429-436 ordering).
    """
    (
        listing.select("path", "mtime")
        .dropDuplicates(["path"])
        .write.mode("overwrite")
        .parquet(state_dir)
    )
