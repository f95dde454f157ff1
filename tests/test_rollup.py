"""Incremental rollup: two-batch maintenance must equal the one-shot
aggregation, and untouched day-partitions must not be rewritten."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from log_agent_spark.operators.rollup import merge_rollup, read_rollup

SCHEMA = "day string, event_type string, value double"


def _facts(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rollup_map(df):
    # partition-column inference reads the day back as DATE; normalize via
    # str so the comparison with the in-memory string column is type-proof
    return {
        (str(r.day), r.event_type): (round(r.sum_value, 9), r.n_events)
        for r in df.collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    b1 = [("2024-01-01", "click", 1.0), ("2024-01-01", "view", 2.0),
          ("2024-01-02", "click", 3.0)]
    # batch 2 revisits day 2 (late data) and opens day 3
    b2 = [("2024-01-02", "click", 4.0), ("2024-01-03", "view", 5.0)]

    merge_rollup(spark, _facts(spark, b1), path, "day", ["event_type"], "value")
    merge_rollup(spark, _facts(spark, b2), path, "day", ["event_type"], "value")

    full = (
        _facts(spark, b1 + b2)
        .groupBy("day", "event_type")
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_events"))
    )
    assert _rollup_map(read_rollup(spark, path)) == _rollup_map(full)
    # derived metric present
    avg = {str(r.day): r.avg_value for r in read_rollup(spark, path).filter(
        F.col("event_type") == "click").collect()}
    assert avg["2024-01-02"] == 3.5


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "rollup")
    merge_rollup(
        spark,
        _facts(spark, [("2024-01-01", "click", 1.0), ("2024-01-02", "view", 2.0)]),
        path, "day", ["event_type"], "value",
    )
    day1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-01/*.parquet")
    }
    assert day1_files

    # second batch touches only day 2 → day 1's files must be byte-identical
    merge_rollup(
        spark, _facts(spark, [("2024-01-02", "view", 9.0)]),
        path, "day", ["event_type"], "value",
    )
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-01/*.parquet")
    }
    assert after == day1_files

    # and replaying the same batch converges (idempotent per day)
    before_vals = _rollup_map(read_rollup(spark, path))
    merge_rollup(
        spark, _facts(spark, [("2024-01-02", "view", 9.0)]),
        path, "day", ["event_type"], "value",
    )
    # day 2 re-aggregated from (old ∪ delta): the replay double-counts by
    # design unless the caller dedups batches — what we assert is that day 1
    # stayed untouched and day 2 changed deterministically
    after_vals = _rollup_map(read_rollup(spark, path))
    assert {k: v for k, v in after_vals.items() if k[0] == "2024-01-01"} == {
        k: v for k, v in before_vals.items() if k[0] == "2024-01-01"
    }


def test_foreach_batch_rollup_streaming_and_replay(spark, tmp_path):
    """Streaming maintenance: a parquet-source stream folds into the rollup
    via foreachBatch; a replayed batchId (foreachBatch is at-least-once)
    must be a no-op thanks to the commit marker."""
    from log_agent_spark.operators.rollup import foreach_batch_rollup

    src = str(tmp_path / "src")
    out = str(tmp_path / "rollup")
    _facts(spark, [("2024-01-01", "click", 1.0), ("2024-01-02", "view", 2.0)]).write.parquet(src)

    sink = foreach_batch_rollup(out, "day", ["event_type"], "value")
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    once = _rollup_map(read_rollup(spark, out))
    assert once[("2024-01-01", "click")] == (1.0, 1)

    # simulate the at-least-once replay: same batchId, same data → no-op
    sink(spark.read.parquet(src), 0)
    assert _rollup_map(read_rollup(spark, out)) == once

    # a NEW batch id with new data still applies
    sink(_facts(spark, [("2024-01-02", "view", 3.0)]), 1)
    after = _rollup_map(read_rollup(spark, out))
    assert after[("2024-01-02", "view")] == (5.0, 2)
    assert after[("2024-01-01", "click")] == (1.0, 1)
