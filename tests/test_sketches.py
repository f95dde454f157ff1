"""Sketch aggregates: bounded error vs exact answers (no cross-engine
oracle exists for HLL/KLL internals, so the gate is an error bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.plans.events import q_approx_sketches
from log_agent_spark.sources.tables import load_table


def test_approx_sketches_error_bounds(spark, sf_dir):
    # flattened shape: one row per (event_type, q)
    rows = q_approx_sketches(spark, sf_dir).collect()
    approx: dict[str, dict] = {}
    for r in rows:
        rec = approx.setdefault(
            r.event_type,
            {"approx_users": r.approx_users, "n_rows": r.n_rows, "pcts": {}},
        )
        assert rec["approx_users"] == r.approx_users  # repeated per q
        assert rec["n_rows"] == r.n_rows
        rec["pcts"][r.q] = r.value_pct
    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.sort_array(F.collect_list("value")).alias("vals"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rec = approx[k]
        assert rec["n_rows"] == exact[k].n
        # HLL at rsd=0.02: allow 3x the target rsd for tiny fixture counts
        rel = abs(rec["approx_users"] - exact[k].users) / max(exact[k].users, 1)
        assert rel <= 0.06, (k, rec["approx_users"], exact[k].users)
        # percentile_approx returns a group member whose RANK is within the
        # accuracy bound of the target percentile (it never interpolates)
        vals, n = exact[k].vals, exact[k].n
        assert set(rec["pcts"]) == {0.5, 0.95, 0.99}
        for p, a in rec["pcts"].items():
            assert a in vals, (k, a)
            rank = vals.index(a) + 1
            assert abs(rank / n - p) <= 0.02 + 1 / n, (k, p, rank / n)
