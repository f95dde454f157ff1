"""Kafka sink (K1, watchdog/handler/kafka.go:112-160,407-412).

Producer parity mapping (reference → Spark kafka sink options):
- sync producer, acks=all (WaitForAll)   → kafka.acks=all
- 10 retries / 1 s backoff              → kafka.retries=10,
                                          kafka.retry.backoff.ms=1000
- max message 10 MB                      → kafka.max.request.size=10000000
- hash partitioner on key                → default partitioner over the
                                           ``key`` column (same contract)

The spark-sql-kafka connector jar is not in this image, so ``kafka_sink``
raises a clear error unless the package is available; the envelope/key
construction (the part with byte-compat requirements) lives in
functions/envelope.py and is fully tested without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from log_agent_spark.functions.envelope import to_kafka_records
from log_agent_spark.sinks.multi import Sink

PRODUCER_OPTIONS = {
    "kafka.acks": "all",              # kafka.go:135 WaitForAll
    "kafka.retries": "10",            # kafka.go:139
    "kafka.retry.backoff.ms": "1000", # kafka.go:140
    "kafka.max.request.size": "10000000",  # kafka.go:138
    "kafka.compression.type": "none", # kafka.go:137 (no producer compression)
}


def kafka_sink(bootstrap_servers: str, topic: str, priority: int = 10) -> Sink:
    def _write(df: DataFrame) -> None:
        records = to_kafka_records(df)
        writer = (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
        )
        for k, v in PRODUCER_OPTIONS.items():
            writer = writer.option(k, v)
        try:
            writer.save()
        except Exception as exc:  # connector jar absent in this image
            raise RuntimeError(
                "Kafka sink requires the spark-sql-kafka connector on the "
                "classpath (add --packages org.apache.spark:spark-sql-kafka-0-10_2.13)."
            ) from exc

    return Sink(name="kafka", write=_write, priority=priority)
