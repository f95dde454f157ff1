"""Priority-ordered, fail-fast multi-sink fan-out (SURVEY.md §2.5 K6-K8).

The reference registers N sinks per pipeline, sorts them by priority
descending (watchdog.go:93-102), runs them SERIALLY per record, aborts on
the first failure (watchdog.go:412-427), and commits incremental state only
after all succeeded (watchdog.go:429-436).

Spark-first form: a ``foreachBatch``-shaped executor over a batch DataFrame.
Rollback (K7 — stub in the reference) is replaced by the Spark-native
contract: idempotent keyed upserts + replay from checkpoint/state, so a
failed batch simply re-runs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(order=True)
class Sink:
    """A named sink with reference-style priority (higher runs first)."""

    sort_key: int = field(init=False, repr=False)
    name: str = field(compare=False)
    write: Callable[[DataFrame], None] = field(compare=False)
    priority: int = field(compare=False, default=0)

    def __post_init__(self) -> None:
        self.sort_key = -self.priority


class MultiSink:
    """Serial, priority-ordered, fail-fast executor (K6) with a post-success
    commit hook (K8)."""

    def __init__(self, sinks: list[Sink], on_success: Callable[[DataFrame], None] | None = None):
        self.sinks = sorted(sinks)  # priority desc (watchdog.go:98)
        self.on_success = on_success

    def __call__(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        if not batch.isStreaming:
            batch = batch.persist()  # one materialization, N sink reads
        try:
            for sink in self.sinks:
                # first error propagates and aborts remaining sinks
                # (watchdog.go:412-427 fail-fast contract)
                sink.write(batch)
            if self.on_success is not None:
                self.on_success(batch)  # K8: state commit AFTER sinks
        finally:
            if not batch.isStreaming:
                batch.unpersist()


def console_sink(name: str = "console", priority: int = 0, n: int = 20) -> Sink:
    """K4 (console.go:31-35): log rows at debug level."""

    def _write(df: DataFrame) -> None:
        df.show(n=n, truncate=80)

    return Sink(name=name, write=_write, priority=priority)
