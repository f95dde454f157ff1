"""The custom file_events streaming DataSource: CREATE on new files, WRITE
on modification, unchanged files silent, filters applied at the source."""

from __future__ import annotations

import os
import time
import uuid

from log_agent_spark.sources.file_events_stream import (
    FileEventsDataSource,
    _diff,
    _walk,
)


# ---------------------------------------------------------------------------
# pure snapshot/diff logic
# ---------------------------------------------------------------------------
def test_walk_filters(tmp_path):
    root = tmp_path / "tree"
    (root / "deep/deeper").mkdir(parents=True)
    (root / "a.log").write_bytes(b"x")
    (root / "b.tmp").write_bytes(b"x")
    (root / "deep" / "c.log").write_bytes(b"x")
    (root / "deep/deeper" / "d.log").write_bytes(b"x")

    snap = _walk(str(root), pattern=r"\.log$", ignore=None, max_depth=0)
    assert {os.path.basename(p) for p in snap} == {"a.log", "c.log", "d.log"}
    snap = _walk(str(root), pattern=r"\.log$", ignore=r"deeper", max_depth=0)
    assert {os.path.basename(p) for p in snap} == {"a.log", "c.log"}
    snap = _walk(str(root), pattern=None, ignore=None, max_depth=1)
    assert {os.path.basename(p) for p in snap} == {"a.log", "b.tmp"}


def test_diff_ops():
    start = {"/a": (100, 1), "/b": (200, 2)}
    end = {"/a": (100, 1), "/b": (300, 5), "/c": (50, 3)}
    rows = _diff(start, end)
    by_path = {r[0]: r for r in rows}
    assert set(by_path) == {"/b", "/c"}  # /a unchanged → silent
    assert by_path["/b"][1] == "WRITE"
    assert by_path["/c"][1] == "CREATE"


# ---------------------------------------------------------------------------
# end-to-end through Structured Streaming
# ---------------------------------------------------------------------------
def test_stream_emits_create_then_write(spark, tmp_path):
    root = tmp_path / "watched"
    root.mkdir()
    (root / "first.log").write_bytes(b"v1")

    spark.dataSource.register(FileEventsDataSource)
    table = f"fev_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("file_events")
        .option("path", str(root))
        .option("pattern", r"\.log$")
        .load()
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        def rows():
            return [
                (r.path, r.op, r.size)
                for r in spark.sql(f"SELECT * FROM {table} ORDER BY mod_time").collect()
            ]

        deadline = time.time() + 120
        while time.time() < deadline and len(rows()) < 1:
            time.sleep(1)
        assert rows() == [(str(root / "first.log"), "CREATE", 2)]

        # modify the file (bump mtime) + add a new one and a non-matching one
        time.sleep(0.05)
        (root / "first.log").write_bytes(b"v2-longer")
        (root / "second.log").write_bytes(b"x")
        (root / "noise.tmp").write_bytes(b"x")

        deadline = time.time() + 120
        while time.time() < deadline and len(rows()) < 3:
            time.sleep(1)
        got = rows()
        assert (str(root / "first.log"), "WRITE", 9) in got
        assert (str(root / "second.log"), "CREATE", 1) in got
        assert all("noise.tmp" not in p for p, _, _ in got)  # F1 at the source
        assert len(got) == 3  # no duplicate emissions for unchanged files
    finally:
        q.stop()
