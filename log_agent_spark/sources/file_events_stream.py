"""Custom streaming source for filesystem events — S1/S2 as a Spark 4
Python DataSource (SURVEY.md §7 "whole-file binary streaming source").

The reference's watchers (inotify `watcher/fsnotify.go:27-65`, mtime-diff
polling `watcher/fspolling.go:33-87`) become a `SimpleDataSourceStreamReader`
whose OFFSET is the `(path → mtime_ns)` snapshot — exactly the state the
reference keeps in BadgerDB (`watchdog.go:429-436`), except checkpointed by
Spark, which also gives deterministic replay (`readBetweenOffsets`) instead
of the reference's hand-rolled commit.

Per micro-batch: walk the tree (bounded depth, include/ignore regex — F1,
F2, F5), diff the stat snapshot against the offset, and emit one event row
per new (CREATE) or modified (WRITE) file, matching the op filter the
reference applies at its source (`watcher/fsnotify.go:50-54`).

Scale note: the snapshot-in-offset design is right for the per-biz watch
trees this models (thousands of files); a 10^9-file deployment would move
the snapshot into an operator-state store and keep only a high-water mark
in the offset. The downstream plan (debounce → enrich → sinks) is
unchanged either way.

Usage:
    spark.dataSource.register(FileEventsDataSource)
    events = (spark.readStream.format("file_events")
              .option("path", root).option("pattern", r"\\.log$").load())
"""

from __future__ import annotations

import datetime as dt
import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FILE_EVENT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("op", StringType(), False),  # CREATE | WRITE
        StructField("size", LongType(), True),
        StructField("mod_time", TimestampType(), True),
    ]
)


def _walk(root: str, pattern: str | None, ignore: str | None, max_depth: int) -> dict[str, tuple[int, int]]:
    """path → (mtime_ns, size) snapshot with F1/F2/F5 filters applied."""
    pat = re.compile(pattern) if pattern else None
    ign = re.compile(ignore) if ignore else None
    snap: dict[str, tuple[int, int]] = {}
    root = root.rstrip("/")
    for dirpath, dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        depth = 0 if rel == "." else rel.count(os.sep) + 1
        if max_depth and depth >= max_depth:  # F5 fsnotify.go:174-179
            dirnames[:] = []
            continue
        if ign and ign.search(dirpath):  # prune during walk, fsnotify.go:163-165
            dirnames[:] = []
            continue
        for name in filenames:
            p = os.path.join(dirpath, name)
            if pat and not pat.search(p):  # F1
                continue
            if ign and ign.search(p):  # F2
                continue
            try:
                st = os.stat(p)
            except OSError:  # raced remove — Handle404 analog
                continue
            snap[p] = (st.st_mtime_ns, st.st_size)
    return snap


def _diff(start: dict, end: dict) -> list[tuple]:
    rows = []
    for p, (mtime_ns, size) in sorted(end.items()):
        prev = start.get(p)
        if prev is not None and prev[0] == mtime_ns:
            continue  # unchanged — fspolling.go:71-87 isSaved
        op = "CREATE" if prev is None else "WRITE"  # fsnotify op filter :50-54
        rows.append(
            (p, op, size, dt.datetime.fromtimestamp(mtime_ns / 1e9, dt.timezone.utc).replace(tzinfo=None))
        )
    return rows


class FileEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        self.pattern = options.get("pattern")
        self.ignore = options.get("ignore")
        self.max_depth = int(options.get("max_nesting_level", 0))

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _snapshot(self) -> dict[str, tuple[int, int]]:
        return _walk(self.root, self.pattern, self.ignore, self.max_depth)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        prev = {p: tuple(v) for p, v in start.get("files", {}).items()}
        snap = self._snapshot()
        rows = _diff(prev, snap)
        next_offset = {"files": {p: list(v) for p, v in snap.items()}}
        return iter(rows), next_offset

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay after failure: same diff, from offsets alone
        prev = {p: tuple(v) for p, v in start.get("files", {}).items()}
        curr = {p: tuple(v) for p, v in end.get("files", {}).items()}
        return iter(_diff(prev, curr))


class FileEventsDataSource(DataSource):
    """spark.readStream.format("file_events") — filesystem event source."""

    @classmethod
    def name(cls) -> str:
        return "file_events"

    def schema(self) -> StructType:
        return FILE_EVENT_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> FileEventsStreamReader:
        return FileEventsStreamReader(self.options)
