"""Event-time streaming analytics the reference lacks (SURVEY.md §2.7
"Watermarks / late data" and "Tumbling/sliding windows" — absent in the
reference, Spark built-ins here): sliding-window aggregation, stream-stream
interval joins, and watermarked streaming dedup.

Scale notes: all three are Spark's native stateful operators — state lives
in the executor state store (RocksDB-backed on a real cluster), partitioned
by grouping/join key, and watermarks bound state size. Nothing here holds
per-key state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 minute",
    slide: str = "30 seconds",
    watermark: str = "10 seconds",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Overlapping-window counts: each event lands in duration/slide
    windows. Output: (w_start, w_end, *extra_keys, n)."""
    keys = [F.window(F.col(ts_col), duration, slide).alias("w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            *(extra_keys or []),
            "n",
        )
    )


def session_collapse(
    events: DataFrame,
    key_col: str = "path",
    ts_col: str = "ts",
    gap: str = "3 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Event-time session windows per key: a burst of events with no gap
    larger than ``gap`` collapses to one row carrying the burst's last
    event time and count.

    This is the DECLARATIVE twin of the T1 debounce (watchdog.go:193-251):
    same quiescence-window semantics, but driven by event time + watermark
    instead of processing-time timers — the form to prefer when events
    carry their own timestamps, because late data is handled exactly and
    state is evicted by watermark, not wall clock. The exact
    processing-time port lives in streaming/debounce.py.

    Output: (key, session_start, session_end, last_ts, n_events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.max(ts_col).alias("last_ts"), F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "last_ts",
            "n_events",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "30 seconds",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: same key, right event within
    [left_ts, left_ts + tolerance]. Watermarks on BOTH sides + the interval
    condition let Spark evict join state (unbounded otherwise).

    ``how='left_outer'`` adds the null-padded row for a left event whose
    match never arrived — emitted only once the watermark has passed
    left_ts + tolerance (i.e., once the engine can PROVE no match is
    coming; until then the row sits in evictable state). That is the
    streaming form of the reference's 404/dead-letter branch
    (watchdog.go:394-397): events that never found their counterpart
    surface as explicit rows instead of vanishing.

    Columns from ``right`` are suffixed ``_r``.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{c}_r") for c in rw.columns])
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts))
        & (
            F.col(f"{right_ts}_r")
            <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        )
    )
    return lw.join(rw, cond, how)


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the streaming form of the
    reference's per-record metadata/business enrichment (M1-M4,
    watchdog.go:328-385, plugins/BSI.go:23-57): each micro-batch joins
    against the CURRENT snapshot of a batch dimension table.

    The static side is re-resolved every micro-batch, so a dimension
    stored as parquet/Delta picks up slowly-changing updates without
    restarting the query. Stream-static joins are stateless (no
    watermark needed — only the stream side progresses), and Spark
    broadcasts the dim side when it's under the autoBroadcast threshold:
    at 100 TB of stream the dimension moves once per batch, the stream
    never shuffles."""
    return stream.join(F.broadcast(dim), key, how)


def dedup_events_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Watermarked exactly-once-per-key dedup: duplicates arriving within
    the watermark horizon are dropped; state for keys older than the
    watermark is evicted (the streaming analog of the reference's
    cross-run mtime dedup, fspolling.go:71-87 — but event-time bounded)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
