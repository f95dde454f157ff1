"""RabbitMQ sink — faithful parity with the reference's STUB (K5).

The reference's RabbitmqAdapter is intentionally unimplemented: Handle()
only debug-logs the filepath/op and returns nil, Rollback() is a no-op,
and the config struct is empty
(/root/reference/watchdog/handler/rabbitmq.go:25-33; its own TODO reads
"how to standardize the message struct"). This module mirrors exactly
that surface so a MultiSink pipeline configured with a rabbitmq entry
behaves identically: records flow through, get logged, nothing is sent.

A real implementation would serialize `to_kafka_records`-style envelopes
through `pika` in a `foreachBatch` — deliberately NOT done here, matching
the reference's scope.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from log_agent_spark.sinks.multi import Sink

logger = logging.getLogger(__name__)


def rabbitmq_sink(name: str = "rabbitmq", priority: int = 0) -> Sink:
    """A Sink whose write is the reference's debug-log-and-succeed stub."""

    def _write(df: DataFrame) -> None:
        # rabbitmq.go:27: logger.Debugf per record; one debug line per
        # batch here. df.count() is a FULL Spark job — only pay it when
        # debug logging is actually enabled, else the "no-op" stub costs a
        # materialization pass per batch the reference stub never does.
        if logger.isEnabledFor(logging.DEBUG):
            logger.debug(
                "[RabbitmqAdapter] batch of %d rows (stub, not sent)",
                df.count(),
            )

    return Sink(name=name, write=_write, priority=priority)
