"""Per-key debounce — the reference's core stateful operator (T1).

Reference semantics (watchdog/watchdog.go:193-251): per file path, every
arriving event RESETS a timer (default 3000 ms); when the timer finally
fires — i.e. the key has been quiet for a full window — emit ONLY the last
event seen for that key. An event storm collapses to one record.

Spark-first mapping: ``applyInPandasWithState`` with
``GroupStateTimeout.ProcessingTimeTimeout``:
- each micro-batch with data for a key: keep the latest event in state and
  re-arm the timeout at (now + debounce_ms)  → "timer reset on every event"
- a timed-out invocation (no new data for the key within the window): emit
  the stored event and clear state           → "fire with the last event"

State is one row per in-flight key — the same footprint as the reference's
sync.Map of channels, but partitioned across executors and checkpointed.

The batch/SQL-checkable equivalent (sessionize + keep-last) lives in
plans/events.py; this module is the live processing-time form.

Driving note: use an explicit trigger interval and poll the sink —
``processAllAvailable()`` can block indefinitely because pending
processing-time timers keep scheduling (empty) timer batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_DEBOUNCE_MS = 3000  # plugins/plugin.go:122, conf/logagent.ini:17

# state: the last event seen for the key (epoch micros + payload columns)
_STATE_SCHEMA = StructType(
    [
        StructField("op", StringType()),
        StructField("biz", StringType()),
        StructField("root_path", StringType()),
        StructField("ts_us", LongType()),
        StructField("mod_time_us", LongType()),
    ]
)

DEBOUNCED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("op", StringType()),
        StructField("biz", StringType()),
        StructField("root_path", StringType()),
        StructField("ts", TimestampType()),
        StructField("mod_time", TimestampType()),
    ]
)


def _to_us(v: Any) -> int | None:
    if v is None or pd.isna(v):
        return None
    return int(pd.Timestamp(v).value // 1000)


def make_debounce_fn(debounce_ms: int = DEFAULT_DEBOUNCE_MS):
    """Build the per-key state function (picklable closure)."""

    def debounce_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (path,) = key
        if state.hasTimedOut:
            # quiet for a full window → emit the stored last event (T1 fire)
            if state.exists:
                op, biz, root_path, ts_us, mod_us = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "path": path,
                            "op": op,
                            "biz": biz,
                            "root_path": root_path,
                            "ts": pd.Timestamp(ts_us, unit="us"),
                            "mod_time": (
                                pd.Timestamp(mod_us, unit="us")
                                if mod_us is not None
                                else pd.NaT
                            ),
                        }
                    ]
                )
            return

        last = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # keep-latest within the batch: max (ts, arrival order)
            pdf = pdf.sort_values("ts", kind="stable")
            last = pdf.iloc[-1]
        if last is not None:
            state.update(
                (
                    last["op"],
                    last["biz"],
                    last["root_path"],
                    _to_us(last["ts"]),
                    _to_us(last["mod_time"]),
                )
            )
        # re-arm: every event resets the quiescence timer (watchdog.go:229-246)
        state.setTimeoutDuration(debounce_ms)
        return

    return debounce_fn


def debounce_stream(events: DataFrame, debounce_ms: int = DEFAULT_DEBOUNCE_MS) -> DataFrame:
    """events: streaming DataFrame with EVENT_SCHEMA columns → debounced
    stream (one row per key per quiescence window)."""
    return events.groupBy("path").applyInPandasWithState(
        make_debounce_fn(debounce_ms),
        outputStructType=DEBOUNCED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
