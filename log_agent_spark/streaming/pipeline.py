"""Live streaming pipeline wiring (SURVEY.md §3.2, §7 Phase 3-4).

The reference's hot path — source → debounce → micro-batch + dedup →
process → multi-sink → state commit — as one Structured Streaming query:

    readStream (file events)
      → debounce_stream (T1, processing-time state)
      → foreachBatch:
            keep-latest dedup within the batch (T3)
            enrich/transform (M1-M10, same plan as batch ingest)
            MultiSink fan-out (K6 priority order, fail-fast)
        # checkpoint commit AFTER foreachBatch success = K8 ordering, free

Rate limiting (T6 backpressure) = maxFilesPerTrigger; the 200 ms batch tick
(T2, watchdog.go:164) = processingTime trigger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window as W

from log_agent_spark.sinks.multi import MultiSink
from log_agent_spark.streaming.debounce import debounce_stream

MICRO_BATCH_TICK = "200 milliseconds"  # watchdog.go:164


def keep_latest_per_path(batch: DataFrame) -> DataFrame:
    """T3 intra-batch dedup (watchdog.go:314-326): newest event per path."""
    w = W.partitionBy("path").orderBy(F.desc("ts"))
    return batch.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


def run_event_pipeline(
    events: DataFrame,
    multi_sink: MultiSink,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    validate: Callable[[DataFrame], DataFrame] | None = None,
    dead_letter: Callable[[DataFrame], None] | None = None,
    debounce_ms: int | None = 3000,
    checkpoint_dir: str | None = None,
    trigger: str = MICRO_BATCH_TICK,
) -> StreamingQuery:
    """Start the standing pipeline over a streaming event DataFrame.

    ``transform`` is the per-biz plugin hook (P4: Transform) applied inside
    each micro-batch; identity when None (the SPI plugin precedent,
    plugins/SPI.go:1-11). ``validate`` returns a DataFrame with a boolean
    ``_valid`` column (P4 CheckFile, plugin.go:84-98); rows failing it go to
    ``dead_letter`` instead of the sink chain — the Spark-native form of the
    reference's abort-record-on-error + Handle404Error paths
    (watchdog.go:394-409).
    """
    stream = events
    if debounce_ms:  # T7: debounce=0 bypasses T1 (watchdog.go:157-161)
        stream = debounce_stream(stream, debounce_ms)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = keep_latest_per_path(batch)
        flagged = None
        if validate is not None:
            flagged = validate(batch).persist()  # one materialization, 2 branches
            quarantined = flagged.filter(~F.col("_valid")).drop("_valid")
            if dead_letter is not None:
                dead_letter(quarantined)
            batch = flagged.filter(F.col("_valid")).drop("_valid")
        try:
            if transform is not None:
                batch = transform(batch)
            multi_sink(batch, epoch_id)
        finally:
            if flagged is not None:
                flagged.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .outputMode("append")
        .trigger(processingTime=trigger)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
