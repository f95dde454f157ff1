"""Engine-wide plan lint: invariants every declared query's physical plan
must satisfy, regardless of operator family. Catches the silent
scale-killers a refactor can introduce anywhere:

1. an unkeyed join planned as a true CartesianProduct (O(n*m) without a
   broadcast bound);
2. an UNPARTITIONED window over data-scaled input — `W.orderBy(...)`
   plans as `Exchange SinglePartition` + one sorting task, the shape
   VERDICT r1 flagged in customer_rfm / pareto / zipf. Unpartitioned
   windows are allowed only when their input is bounded by construction
   (the ranking helper's P-row offset table, a post-limit k-row frame, a
   calendar-bounded series, a fixed histogram) — every allowance is
   explicit below with its bound.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# Unpartitioned-window allowances: query -> why the window input is
# BOUNDED (does not grow with the data).
UNPARTITIONED_WINDOW_OK = {
    # operators/ranking.py offset tables: ≤ spark.sql.shuffle.partitions
    # rows, marked by the __rank_pid column (matched structurally below).
    "sample_weighted_reservoir": "rank over k=100 rows post TakeOrdered",
    "events_session_paths": "rank over k=20 rows post TakeOrdered",
    "text_pmi_top_pairs": "rank over k=50 rows post TakeOrdered",
    "events_quantile_sketch_report": "cum over fixed 128-bucket histogram",
    "order_backlog": "running sum over calendar months (~decades = O(100))",
    "revenue_seasonality": "lag over calendar (year, month) series",
    "skew_key_profile": "cum over count-of-counts histogram (distinct "
    "multiplicities, O(100) rows at any scale)",
    "events_slo_burn_rate": "RANGE(-5h,0) over the hourly rollup — "
    "calendar-bounded (O(hours) rows regardless of event volume)",
}


@pytest.fixture(scope="module")
def plans(spark):
    # body plans via the shared helper: pinned_query-wrapped queries
    # return a readback scan; the lint must see the BODY's distributed
    # plan, and any storage the unwrapped bodies pin is released per call
    from tests._plans import body_plan

    return {
        name: body_plan(fn, spark, SF)
        for name, fn in entrymod.queries().items()
    }


def test_no_cartesian_product_anywhere(plans):
    # Broadcast cross joins of one-row stats/total tables are fine
    # (BroadcastNestedLoopJoin is bounded by the broadcast side); the
    # lint rejects only the unbounded CartesianProduct operator.
    bad = {n: "CartesianProduct" for n, p in plans.items() if "CartesianProduct" in p}
    assert not bad, bad


def _unpartitioned_windows(plan: str):
    """Yield Window nodes with an empty partitionSpec.

    WindowExec prints ``Window [exprs], [partitionSpec], [orderSpec]``;
    with no partitioning the middle group is absent and the single
    remaining spec is the ordering (contains ASC/DESC).
    """
    for line in plan.splitlines():
        ls = line.strip()
        i = ls.find("Window [")
        if i < 0 or "windowspecdefinition" not in ls:
            continue
        node = ls[i:]
        specs = node.split("], [")[1:]
        if not specs:
            continue
        last = specs[-1]
        if len(specs) == 1 and (" ASC" in last or " DESC" in last):
            yield node


def test_no_unpartitioned_window_over_unbounded_input(plans):
    bad = {}
    for name, plan in plans.items():
        for node in _unpartitioned_windows(plan):
            if "__rank_pid" in node:
                continue  # ranking helper's P-row offsets window
            if name in UNPARTITIONED_WINDOW_OK:
                continue
            bad.setdefault(name, node[:100])
    assert not bad, bad
