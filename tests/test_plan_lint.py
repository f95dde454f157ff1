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
3. a broadcast HINT forced onto a RAW scan of a table that grows with
   the data (the r9 sweep's policy, mechanized): hints survive into the
   optimized logical plan as ``Join ... Hint=(strategy=broadcast)``, so
   this is the one place forced-vs-AQE-chosen broadcasts are
   distinguishable. The lint flags hinted sides whose subtree scans a
   growing base table with NO Aggregate/Limit bound; every remaining
   site is allowlisted with its disposition.
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
def all_plans(spark):
    # ONE body build per query yields both plan strings: the executed
    # physical plan (lints 1-2) and the optimized logical plan, where
    # join hints are still visible (lint 3). pinned_query-wrapped queries
    # return a readback scan, so unwrap to the BODY's distributed plan;
    # any storage the unwrapped bodies pin is released per call.
    from log_agent_spark.scratch import _persistent_ids, _release_new

    execp: dict[str, str] = {}
    optp: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        before = _persistent_ids(spark)
        try:
            df = getattr(fn, "__wrapped__", fn)(spark, SF)
            qe = df._jdf.queryExecution()
            optp[name] = qe.optimizedPlan().toString()
            execp[name] = qe.executedPlan().toString()
        finally:
            _release_new(spark, before)
    return execp, optp


@pytest.fixture(scope="module")
def plans(all_plans):
    return all_plans[0]


@pytest.fixture(scope="module")
def opt_plans(all_plans):
    return all_plans[1]


# Row-at-a-time Python allowances: query -> why the pickled-row path is
# the POINT of the query rather than an accident, with its input bound.
ROW_PYTHON_OK = {
    # §2.7 UDAF/UDTF surface: a Python UDTF necessarily plans as
    # BatchEvalPythonUDTF — this query EXISTS to exercise that extension
    # point, and its input is hard-bounded (doc_id < 50) so the slow path
    # never sees data-scaled rows. The hot-path splitters are the
    # built-in split/explode (complex_types.py docstring).
    "text_udtf_words": "UDTF surface demo, input bounded to 50 docs",
}


def test_no_row_at_a_time_python_udf(plans):
    """Mechanizes the per-round manual audit: Python on the datapath must
    be Arrow-batched (ArrowEvalPython / MapInPandas / MapInArrow /
    FlatMapGroupsInPandas — 10-100x the row-at-a-time throughput). A
    plain ``F.udf`` (or UDTF) plans as BatchEvalPython* (pickled row
    pipes); none is allowed in any registered query's physical plan
    outside the explicit bounded-input allowances above."""
    bad = {
        n: "BatchEvalPython"
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in ROW_PYTHON_OK
    }
    assert not bad, sorted(bad)
    stale = [n for n in ROW_PYTHON_OK if "BatchEvalPython" not in plans[n]]
    assert not stale, f"allowance no longer needed: {stale}"


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


# ---------------------------------------------------------------------------
# Lint 3: no broadcast HINT forced onto a raw scan of a growing table.
# ---------------------------------------------------------------------------

# Column-name signatures identifying the growing base tables' Relations in
# optimized-plan text (nation/region are constant-size and deliberately
# absent — hinting those is the policy's GOOD case).
GROWING_RELATION_SIGS = {
    "lineitem": "l_orderkey#",
    "orders": "o_orderkey#",
    "customer": "c_custkey#",
    "part": "p_partkey#",
    "partsupp": "ps_partkey#",
    "supplier": "s_suppkey#",
    "events": "event_id#",
    "documents": "doc_id#",
    "embeddings": "emb#",
}
# An Aggregate or Limit between the hint and the scan bounds the broadcast
# side (k-row stats, top-k, codebooks): exempt. Filters do NOT bound — a
# filtered slice of a growing table still grows with sf.
_BOUNDING_OPS = ("Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate")

# Known hinted raw growing-dim sites, each with its disposition. EMPTY
# since the r10 sweep dropped the last 11 (the classic TPC-H part/supplier
# dim hints in tpch_extra/tpch_partsupp — hint removal never changes
# values; AQE still picks BHJ at fixture scale, pinned by
# tests/test_broadcast_hint_sweep.py on final adaptive plans). A NEW name
# appearing in the lint's output without a disposition here is exactly
# what this lint exists to catch. Aggregated/derived build sides the lint
# cannot see get bcast.maybe_broadcast count guards instead (e.g.
# dedup_incremental's prior-corpus hash set).
FORCED_BROADCAST_ALLOWLIST: dict[str, str] = {}


def _op_offset(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def forced_growing_broadcasts(opt_plan: str):
    """Yield (table, join_line) for every broadcast-HINTED join side whose
    subtree scans a growing base table raw (no Aggregate/Limit bound).
    Pure text parser over TreeNode.generateTreeString output."""
    lines = opt_plan.splitlines()
    for idx, line in enumerate(lines):
        if "strategy=broadcast" not in line or "Join" not in line:
            continue
        d = _op_offset(line)
        sub = []
        for j in range(idx + 1, len(lines)):
            if _op_offset(lines[j]) <= d and lines[j].strip():
                break
            sub.append(lines[j])
        child_idx = [k for k, l in enumerate(sub) if _op_offset(l) == d + 3]
        if not child_idx:
            continue
        right_start = None
        for k in child_idx:
            if sub[k][d : d + 2] == "+-":
                right_start = k
        left_sub = sub[:right_start] if right_start is not None else sub
        right_sub = sub[right_start:] if right_start is not None else []
        sides = []
        if "leftHint=(strategy=broadcast" in line:
            sides.append(left_sub)
        if "rightHint=(strategy=broadcast" in line:
            sides.append(right_sub)
        for side in sides:
            text = "\n".join(side)
            if any(b in text for b in _BOUNDING_OPS):
                continue
            for table, sig in GROWING_RELATION_SIGS.items():
                if any("Relation" in l and sig in l for l in side):
                    yield table, line.strip()[:120]
                    break


def test_forced_broadcast_parser_on_canned_plan():
    """Pure parser check: hinted raw dim flagged; aggregate-bounded side
    and unhinted joins not."""
    plan = "\n".join(
        [
            "Aggregate [x], [x]",
            "+- Join Inner, (l_partkey#1L = p_partkey#2L), rightHint=(strategy=broadcast)",
            "   :- Join Inner, (a#3 = b#4)",
            "   :  :- Relation [l_orderkey#0L,l_partkey#1L] parquet",
            "   :  +- Aggregate [c_custkey#9L], [c_custkey#9L]",
            "   :     +- Relation [c_custkey#9L] parquet",
            "   +- Filter isnotnull(p_partkey#2L)",
            "      +- Relation [p_partkey#2L,p_name#5] parquet",
        ]
    )
    assert list(forced_growing_broadcasts(plan)) == [
        ("part", plan.splitlines()[1].strip()[:120])
    ]
    # aggregate-bounded hinted side: exempt
    bounded = plan.replace(
        "   +- Filter isnotnull(p_partkey#2L)",
        "   +- Aggregate [p_partkey#2L], [p_partkey#2L]",
    )
    assert list(forced_growing_broadcasts(bounded)) == []


def test_no_forced_broadcast_of_growing_table(opt_plans):
    bad = {}
    for name, plan in opt_plans.items():
        found = list(forced_growing_broadcasts(plan))
        if found and name not in FORCED_BROADCAST_ALLOWLIST:
            bad[name] = found
    assert not bad, bad
    # the allowlist must not go stale: every allowlisted name still hints
    stale = [
        n
        for n in FORCED_BROADCAST_ALLOWLIST
        if not list(forced_growing_broadcasts(opt_plans[n]))
    ]
    assert not stale, f"allowlist entries with no remaining hint: {stale}"
