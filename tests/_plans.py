"""Shared plan-inspection helpers for tests (plain module, not conftest:
importing conftest as a library re-executes it as a second module
instance and depends on pytest's import mode)."""

from __future__ import annotations


def body_plan(fn, spark, sf) -> str:
    """Executed-plan text of a query's BODY — for pinned_query-wrapped
    queries the wrapper's return value is just a readback scan of the
    materialized result, so plan assertions must unwrap. Releases any
    storage the unwrapped body pins (outside its wrapper nothing else
    will)."""
    from log_agent_spark.scratch import _persistent_ids, _release_new

    before = _persistent_ids(spark)
    try:
        df = getattr(fn, "__wrapped__", fn)(spark, sf)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        _release_new(spark, before)
