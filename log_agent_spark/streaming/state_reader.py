"""Checkpoint state introspection — the Spark-native analog of reading the
reference's BadgerDB state store directly.

The reference keeps its incremental-processing state (path → gob(mtime)) in
an embedded KV store that operators can open and inspect offline
(watchdog/watchdog.go:58-74 opens it; watchdog/watcher/fspolling.go:71-87
reads it). Spark's analog is the streaming checkpoint's state store, and
Spark 4 exposes it as a READABLE DATA SOURCE: ``spark.read.format
("statestore")`` over a checkpoint location returns the keyed state of any
stateful operator as a DataFrame — queryable with the full relational layer
(the reference needs custom Go code for the same inspection).

Scale: the state source reads the store's own partitioned files; a 10^9-key
debounce state scans in parallel like any other table and never touches the
running query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_operator_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
) -> DataFrame:
    """Keyed state of a stateful operator from a streaming checkpoint.

    Returns the raw (key struct, value struct, partition_id) rows; callers
    flatten with ``select("key.*", "value.*")``.
    """
    reader = spark.read.format("statestore").option("path", checkpoint_dir)
    if operator_id:
        reader = reader.option("operatorId", str(operator_id))
    if batch_id is not None:
        reader = reader.option("batchId", str(batch_id))
    return reader.load()


def read_debounce_state(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """In-flight debounce (T1) state: one row per key still inside its
    quiescence window — (path, op, biz, root_path, ts_us, mod_time_us,
    timeout_ms), exactly the reference's per-path pending-event map
    (sync.Map of channels + armed timer, watchdog.go:193-251) made
    queryable. applyInPandasWithState wraps the user state struct as
    value.groupState and adds the armed processing-time timer as
    value.timeoutTimestamp (epoch ms)."""
    from pyspark.sql import functions as F

    return read_operator_state(spark, checkpoint_dir).select(
        "key.*",
        "value.groupState.*",
        F.col("value.timeoutTimestamp").alias("timeout_ms"),
    )
