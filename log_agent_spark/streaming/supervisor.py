"""Streaming query supervision — the reference's watcher guard (S4),
Spark-idiomatic.

The reference runs a goroutine that health-checks each fsnotify watcher
and restarts it when the watched mount dies
(/root/reference/watchdog/watcher/fsnotify.go:69-96,
``realTimeMonitGuard``: 20 s sleep loop, ``os.Stat`` probe of the
monitored path, close-Done + re-``go realTimeMonit`` restart on the
reset flag). Round 1 scoped this out as
"checkpoint restart replaces it"; this module closes the gap properly:
the *mechanism* (detect death → restart → resume from prior progress) is
ported, with Spark's checkpoint supplying the resume-exactly-where-it-died
half that the reference gets from BadgerDB state.

``supervise()`` wraps a query factory: start, await, on failure restart
with linear backoff up to ``max_restarts``. Because every restart begins
from the same checkpointLocation, a failed micro-batch replays and the
sink sees each batch at least once (exactly-once end-to-end when the sink
is the idempotent upsert, sinks/upsert.py — K7/K8 semantics).

Scale note: supervision is a driver-side control loop around query
lifecycle — no data movement; at cluster scale the same loop is what a
production job runner (or Spark's own `StreamingQueryManager` retry
policy) executes.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery


def supervise(
    start_query: Callable[[], StreamingQuery],
    max_restarts: int = 3,
    backoff_s: float = 0.5,
    on_restart: Callable[[int, Exception], None] | None = None,
    should_stop: Callable[[], bool] | None = None,
) -> tuple[StreamingQuery | None, int]:
    """Run a streaming query to termination, restarting on failure.

    ``start_query`` must create a FRESH query each call with the same
    checkpointLocation (so a restart resumes, not recomputes). Returns
    ``(final_query, n_restarts)`` after a clean termination; re-raises
    the last failure once ``max_restarts`` is exhausted. Start-time
    failures (e.g. a transiently unreachable checkpoint dir) count as
    restarts too — the guard's job is to outlast transient faults, not
    only crashes of an already-running query.

    ``should_stop``: optional shutdown witness checked before every
    (re)start and during backoff; when it turns true the loop returns
    ``(None, restarts)`` without starting another query — the hook that
    lets an owner stop the guard without racing its restart loop.
    """
    restarts = 0
    while True:
        if should_stop is not None and should_stop():
            return None, restarts
        try:
            q = start_query()
            q.awaitTermination()
            return q, restarts
        except Exception as exc:  # noqa: BLE001 — start failures included
            restarts += 1
            if restarts > max_restarts:
                raise
            if on_restart is not None:
                on_restart(restarts, exc)
            # linear backoff (the reference probes on a fixed 20 s
            # cadence, fsnotify.go:74); interruptible so a shutdown
            # request isn't held hostage by the sleep
            deadline = time.time() + backoff_s * restarts
            while time.time() < deadline:
                if should_stop is not None and should_stop():
                    return None, restarts
                time.sleep(min(0.05, backoff_s))
