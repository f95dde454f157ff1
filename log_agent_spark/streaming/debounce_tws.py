"""Per-key debounce (T1) on the transformWithStateInPandas API.

Same semantics as streaming/debounce.py (watchdog/watchdog.go:193-251:
every event RESETS the key's timer; when it finally fires, emit ONLY the
last event seen), expressed on Spark 4's arbitrary-stateful-processing API
instead of applyInPandasWithState. What the new API buys at scale:

- **Explicit timers** (register/delete) instead of one implicit per-key
  timeout — the reference's "stop the old timer, arm a new one" loop
  (watchdog.go:229-246) maps 1:1 onto deleteTimer/registerTimer.
- **Composable typed state** (value/list/map states per key, TTL support)
  rather than a single state tuple.
- **RocksDB-backed by default** (the API requires the RocksDB provider):
  state spills to executor-local disk + changelog checkpoints, so a
  100 M-key debounce fleet doesn't live in executor heap.

The module is the modern twin of debounce.py, kept side by side the way
the reference keeps fsnotify (live) and fspolling (backfill) sources —
callers choose per workload (streaming/metrics.py::use_rocksdb_state flips
the provider the API needs).

RUNTIME DEPENDENCY: the transformWithState Python runner speaks protobuf
to the JVM state server, so ``google.protobuf`` must be importable in the
Python workers (standard pyspark[connect]-class environments have it;
this build container lacks a pip protobuf, so ``compat.ensure_protobuf``
falls back to the container's bundled pure-Python runtime). The
applyInPandasWithState twin in debounce.py has no such dependency and is
the default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from log_agent_spark.streaming.debounce import (
    DEBOUNCED_SCHEMA,
    DEFAULT_DEBOUNCE_MS,
    _to_us,
)

# The TWS runner's wire protocol needs protobuf in the Python workers;
# ensure_protobuf() falls back to the container's bundled pure-Python
# runtime (and extends PYTHONPATH for workers) when pip's is absent.
from log_agent_spark.compat import ensure_protobuf

HAS_TWS_DEPS = ensure_protobuf()

_VALUE_SCHEMA = "op string, biz string, root_path string, ts_us long, mod_time_us long"
_TIMER_SCHEMA = "expiry_ms long"


class DebounceProcessor(StatefulProcessor):
    """Keep-latest value state + a reset-on-event processing-time timer."""

    def __init__(self, debounce_ms: int = DEFAULT_DEBOUNCE_MS):
        self._debounce_ms = debounce_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._last = handle.getValueState("last_event", _VALUE_SCHEMA)
        # armed-timer bookkeeping: registerTimer does not replace previous
        # timers, so the reset semantic needs the old expiry to delete
        self._armed = handle.getValueState("armed_timer", _TIMER_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        last = None
        for pdf in rows:
            if len(pdf):
                pdf = pdf.sort_values("ts", kind="stable")
                last = pdf.iloc[-1]
        if last is not None:
            self._last.update(
                (
                    last["op"],
                    last["biz"],
                    last["root_path"],
                    _to_us(last["ts"]),
                    _to_us(last["mod_time"]),
                )
            )
        # reset-on-event (watchdog.go:229-246): drop the old timer, arm anew
        if self._armed.exists():
            self._handle.deleteTimer(self._armed.get()[0])
        expiry = timerValues.getCurrentProcessingTimeInMs() + self._debounce_ms
        self._handle.registerTimer(expiry)
        self._armed.update((expiry,))
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._last.exists():
            return
        op, biz, root_path, ts_us, mod_us = self._last.get()
        self._last.clear()
        self._armed.clear()
        yield pd.DataFrame(
            [
                {
                    "path": key[0],
                    "op": op,
                    "biz": biz,
                    "root_path": root_path,
                    "ts": pd.Timestamp(ts_us, unit="us"),
                    "mod_time": (
                        pd.Timestamp(mod_us, unit="us") if mod_us is not None else pd.NaT
                    ),
                }
            ]
        )

    def close(self) -> None:
        pass


def debounce_stream_tws(
    events: DataFrame, debounce_ms: int = DEFAULT_DEBOUNCE_MS
) -> DataFrame:
    """events (EVENT_SCHEMA, streaming) → debounced stream; requires the
    RocksDB state store provider (use_rocksdb_state)."""
    return events.groupBy("path").transformWithStateInPandas(
        DebounceProcessor(debounce_ms),
        outputStructType=DEBOUNCED_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
