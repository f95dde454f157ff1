"""S4 watcher-guard port: supervise() restarts a failed streaming query
from its checkpoint and the replayed batch reaches the sink exactly once
(idempotent output), mirroring realTimeMonitGuard's probe-and-restart
loop (/root/reference/watchdog/watcher/fsnotify.go:69-96)."""

from __future__ import annotations

import pytest

from log_agent_spark.streaming.supervisor import supervise


@pytest.fixture()
def in_dir(spark, tmp_path):
    p = tmp_path / "in"
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(str(p))
    return str(p)


def test_supervise_restarts_and_resumes(spark, tmp_path, in_dir):
    out: dict[int, list] = {}
    sentinel = tmp_path / "has_failed_once"

    def sink(batch_df, batch_id):
        if not sentinel.exists():
            sentinel.write_text("")
            raise RuntimeError("injected first-batch failure (dead mount)")
        out[batch_id] = sorted(r.id for r in batch_df.collect())

    def start():
        stream = (
            spark.readStream.schema("id long, v long")
            .parquet(in_dir)
        )
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q, restarts = supervise(start, max_restarts=3, backoff_s=0.1)
    assert restarts == 1
    # the failed batch replayed from the checkpoint: all 10 rows arrive
    assert sorted(x for rows in out.values() for x in rows) == list(range(10))


def test_supervise_exhausts_restarts(spark, tmp_path, in_dir):
    def sink(batch_df, batch_id):
        raise RuntimeError("permanently broken sink")

    def start():
        stream = (
            spark.readStream.schema("id long, v long").parquet(in_dir)
        )
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )

    seen = []
    with pytest.raises(Exception, match="permanently broken"):
        supervise(
            start,
            max_restarts=2,
            backoff_s=0.05,
            on_restart=lambda n, e: seen.append(n),
        )
    assert seen == [1, 2]


def test_supervise_retries_start_time_failures(spark, tmp_path, in_dir):
    """A start_query() exception (transient checkpoint-dir fault) counts
    as a restart — the guard outlasts transient faults, not only crashes
    of a running query."""
    attempts = []

    def start():
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient start failure (fs blip)")
        stream = spark.readStream.schema("id long, v long").parquet(in_dir)
        return (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .trigger(availableNow=True)
            .start()
        )

    q, restarts = supervise(start, max_restarts=3, backoff_s=0.05)
    assert restarts == 1
    assert len(attempts) == 2


def test_supervise_should_stop_prevents_restart(spark, tmp_path, in_dir):
    """Once should_stop turns true, the guard returns instead of starting
    another query — the shutdown hook the CLI's stop loop relies on."""
    stopping = {"flag": False}
    started = []

    def start():
        started.append(1)
        stopping["flag"] = True  # owner requests shutdown mid-run
        raise RuntimeError("crash right after the stop request")

    q, restarts = supervise(
        start,
        max_restarts=10,
        backoff_s=0.05,
        should_stop=lambda: stopping["flag"],
    )
    assert q is None
    assert len(started) == 1  # no restart happened after the stop flag
