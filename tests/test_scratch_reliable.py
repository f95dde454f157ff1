"""Cluster-safe checkpointing (VERDICT r8 item 3): when a checkpoint dir
is configured, ``scratch.pin_checkpoint`` must switch from executor-local
``localCheckpoint`` (fast, NOT preemption-safe — truncated lineage cannot
be recomputed after an executor loss) to reliable ``checkpoint()`` against
that dir, with identical results. Local[-] default stays localCheckpoint.
"""

from __future__ import annotations

import contextlib

from log_agent_spark import scratch

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def _checkpoint_dir(spark, path):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "fixture session must start unset"
    sc.setCheckpointDir(str(path))
    try:
        yield
    finally:
        # Option(null) resets the scala-side checkpointDir to None
        sc._jsc.setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def test_pin_checkpoint_reliable_mode_writes_checkpoint_files(spark, tmp_path):
    df = spark.range(64).selectExpr("id", "id * 2 AS v")
    # default mode: no checkpoint dir → localCheckpoint, dir stays empty
    out_local = scratch.pin_checkpoint(df)
    assert out_local.count() == 64
    assert not any(tmp_path.rglob("*"))
    with _checkpoint_dir(spark, tmp_path):
        out_rel = scratch.pin_checkpoint(df)
        assert sorted(r.v for r in out_rel.collect()) == sorted(
            r.v for r in out_local.collect()
        )
        # evidence the RELIABLE path ran: RDD checkpoint files on disk
        assert any(p.is_file() for p in tmp_path.rglob("*"))


def test_graph_family_identical_under_reliable_checkpoint(spark, tmp_path):
    """The iterative queries (k-core: per-round pin_checkpoint in the peel
    loop) must return byte-identical results in reliable mode."""
    from log_agent_spark.operators import graph

    base = sorted(map(tuple, graph.QUERIES["graph_kcore"](spark, SF).collect()))
    with _checkpoint_dir(spark, tmp_path):
        rel = sorted(
            map(tuple, graph.QUERIES["graph_kcore"](spark, SF).collect())
        )
    assert rel == base and len(base) > 0
