"""Streaming per-key anomaly detection — Welford z-score state.

The live twin of the batch detectors (anomaly_zscore / events_seasonal
anomaly): per event_type, maintain running count/mean/M2 (Welford's
online algorithm — numerically stable, mergeable-free single-writer form)
in ``applyInPandasWithState``; every arriving value is scored against the
state AS OF ITS ARRIVAL (rows folded in event-time order within each
micro-batch), so a monitor flags the spike the moment it lands instead of
at the end of a batch window.

Semantics, exactly:

- rows within a micro-batch are processed in ascending ``ts`` order
  (deterministic across retries — the batch's content is fixed by the
  checkpointed offsets, and the sort is total with the value tiebreak);
- a row's z-score uses the state BEFORE the row is folded in, so the
  first ``min_n`` rows of a key are never flagged (no variance yet);
- state is three doubles + a count per key — bounded by key cardinality,
  checkpointed, and survives restart like every stateful operator here.

The reference has no analog (its pipeline forwards, never scores); this
is the monitoring layer a 100 TB ingest runs on its own volume signals.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)

SCORED_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

DEFAULT_Z_THRESHOLD = 3.0
DEFAULT_MIN_N = 5  # don't flag before the estimate has any support


def make_zscore_fn(threshold: float = DEFAULT_Z_THRESHOLD, min_n: int = DEFAULT_MIN_N):
    """Picklable per-key state function."""

    def zscore_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "value"], kind="mergesort")
        out = {"ts": [], "value": [], "z": [], "is_anomaly": []}
        for ts, v in zip(rows["ts"], rows["value"]):
            v = float(v)
            if n >= min_n and m2 > 0.0:
                sd = math.sqrt(m2 / (n - 1))
                z = (v - mean) / sd
            else:
                z = 0.0
            out["ts"].append(ts)
            out["value"].append(v)
            out["z"].append(z)
            out["is_anomaly"].append(abs(z) > threshold)
            # Welford fold AFTER scoring: the row never judges itself
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "event_type": etype,
                "ts": out["ts"],
                "value": out["value"],
                "z": out["z"],
                "is_anomaly": out["is_anomaly"],
            }
        )

    return zscore_fn


def zscore_stream(
    events: DataFrame,
    threshold: float = DEFAULT_Z_THRESHOLD,
    min_n: int = DEFAULT_MIN_N,
) -> DataFrame:
    """events: streaming DF with (event_type, ts, value) → scored stream."""
    return (
        events.select("event_type", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            make_zscore_fn(threshold, min_n),
            outputStructType=SCORED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
