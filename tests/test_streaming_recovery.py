"""Checkpoint restart = the reference's crash-recovery story (T4 + K8:
Badger mtime state committed after sink success, fspolling re-emitting the
rest). Spark-native form: file-source offsets + file-sink manifest in the
checkpoint — a restarted query must pick up exactly the unprocessed files,
emitting every input row exactly once across the restart."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

SCHEMA = StructType([StructField("id", LongType())])


def _run_until_drained(spark, src, out, ckpt, expect_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream.withColumn("doubled", F.col("id") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.schema(
                    StructType(SCHEMA.fields + [StructField("doubled", LongType())])
                ).parquet(out).count() >= expect_rows:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(1)
    finally:
        q.stop()


def test_restart_processes_each_row_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(i,) for i in range(10)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    _run_until_drained(spark, src, out, ckpt, expect_rows=10)

    # second life: 10 more rows land while the query is down
    spark.createDataFrame([(i,) for i in range(100, 110)], SCHEMA).write.mode(
        "append"
    ).parquet(src)
    _run_until_drained(spark, src, out, ckpt, expect_rows=20)

    got = spark.read.parquet(out)
    ids = sorted(r.id for r in got.collect())
    assert ids == list(range(10)) + list(range(100, 110)), ids
    assert got.filter(F.col("doubled") != F.col("id") * 2).count() == 0
