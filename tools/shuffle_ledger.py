"""Generate SHUFFLES.md — a per-query ledger of plan-shape counts
(shuffle exchanges, broadcast exchanges, reused exchanges, join
strategies) over every registered query's BODY plan at sf0.001.

Why a committed artifact: "did this refactor add a shuffle?" is the
first scale question every round asks (a new Exchange that's noise at
sf0.1 is the bottleneck at 100 TB), and plan strings are too big to
diff. One row of counts per query IS diffable: a +1 in the shuffle
column on an untouched query is a regression the bench may not see at
fixture scale. Regenerate after plan-affecting changes:

    python tools/shuffle_ledger.py

Counting notes:
- `shuffle` counts ``Exchange hashpartitioning/rangepartitioning/...``
  operators, NOT ``ReusedExchange`` (a reuse is the optimization working)
  and NOT ``BroadcastExchange`` (counted separately — broadcasts move
  bounded data).
- counts come from the UNEXECUTED physical plan: AQE may downgrade a
  sort-merge join to broadcast at runtime (fewer effective shuffles),
  so these are upper bounds — stable ones, which is what a diff needs.
- pinned_query-wrapped queries are unwrapped to their body's plan.
- `BNLJ` counts BroadcastNestedLoopJoin NODES in the plan TEXT, which
  double-counts a cross join whose subtree fans out (plan text repeats
  unreused subtrees). Audited r10 (VERDICT r9 stretch 7): every BNLJ in
  the ledger is a `BuildRight, Cross` broadcast of a BOUNDED frame —
  1-row stats/total scalars (customer_rfm's asof date + the ranking
  helper's per-ntile totals account for its 13), the 16-row IVF
  centroid table (the ann_* families), or a P-row offsets table — so a
  high BNLJ count signals subtree fan-out, not an unbounded nested
  loop. An UNBOUNDED cross join would appear as CartesianProduct, which
  the plan lint pins at 0.
- `single_part` counts ``Exchange SinglePartition`` nodes — the
  signature of a global aggregate, an unpartitioned window, or a
  sort-into-one. Audited r10 across all 251 plans by extracting the
  CHILD node of every such exchange: 109 sit directly on HashAggregate
  and 3 on ObjectHashAggregate — partial-aggregation exchanges that
  carry ONE ROW PER UPSTREAM PARTITION, bounded by the cluster, never
  the data. The only 2 non-aggregate children are `corpus_drift_psi`
  (the 10-bin PSI spine, `spark.range(_PSI_BINS)`) and
  `revenue_seasonality` (the per-(year, month) revenue series — lag
  windows over a CALENDAR-bounded frame, ≤ ~84 rows at any sf). A RISE
  in this column on an untouched query fails the gate exactly like
  `shuffle`: a new unpartitioned window over a data-scaled frame is the
  100 TB single-task failure mode, and the fixture bench cannot see it.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_LEDGER_SF", "/root/testdata/sf0.001")
OUT = os.path.join(REPO, "SHUFFLES.md")

COUNTERS = [
    # column, regex over plan text. The exchange counters are evaluated
    # per-line with ReusedExchange lines EXCLUDED (see _count): a reused
    # exchange renders as "ReusedExchange [cols], Exchange SinglePartition,
    # ..." — the Exchange text there describes the reuse TARGET, not a new
    # exchange, and counting it would make a pure static-reuse optimization
    # look like a plan regression to the gate.
    ("shuffle", re.compile(r"\bExchange (hash|range|SinglePartition|RoundRobin|rebalance)", re.I)),
    ("bcast", re.compile(r"\bBroadcastExchange\b")),
    ("reused", re.compile(r"\bReusedExchange\b")),
    ("BHJ", re.compile(r"\bBroadcastHashJoin\b")),
    ("SMJ", re.compile(r"\bSortMergeJoin\b")),
    ("BNLJ", re.compile(r"\bBroadcastNestedLoopJoin\b")),
    ("cartesian", re.compile(r"\bCartesianProduct\b")),
    ("topk", re.compile(r"\bTakeOrderedAndProject\b")),
    ("pyarrow", re.compile(r"\b(MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow)\b")),
    # Exchange SinglePartition moves EVERYTHING to one task — the
    # plan-shape signature of an unpartitioned window / global
    # sort-into-single / 1-row aggregate. Counted separately (it is also
    # inside `shuffle`) because boundedness is the whole question: on a
    # 1-row/k-row aggregate it is free; on a data-scaled frame it is the
    # 100 TB failure mode. The gate fails any RISE per query, same as
    # `shuffle`.
    ("single_part", re.compile(r"\bExchange SinglePartition\b")),
]


# exchange-node columns whose regex can also match the reuse-target text
# inside a "ReusedExchange [...], Exchange ..." line — those lines are a
# reuse, not a new exchange, and must not count
_EXCHANGE_COLS = {"shuffle", "bcast", "single_part"}


def _count(col: str, rx: re.Pattern, plan: str) -> int:
    if col not in _EXCHANGE_COLS:
        return len(rx.findall(plan))
    return sum(
        len(rx.findall(line))
        for line in plan.splitlines()
        if "ReusedExchange" not in line
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from log_agent_spark.scratch import _persistent_ids, _release_new
    from log_agent_spark.session import get_spark

    spark = get_spark("shuffle_ledger")
    rows = []
    for name, fn in entrymod.queries().items():
        before = _persistent_ids(spark)
        try:
            df = getattr(fn, "__wrapped__", fn)(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            _release_new(spark, before)
        counts = {col: _count(col, rx, plan) for col, rx in COUNTERS}
        rows.append((name, counts))

    rows.sort(key=lambda r: (-r[1]["shuffle"], r[0]))
    lines = [
        "# SHUFFLES — per-query plan-shape ledger (sf0.001, unexecuted physical plans)",
        "",
        "Generated by `python tools/shuffle_ledger.py`; see its docstring for",
        "counting rules. Diff this file after any refactor: a +1 in the",
        "`shuffle` column on an untouched query is a scale regression the",
        "fixture bench may not show. AQE can only LOWER the effective counts",
        "at runtime (SMJ→BHJ downgrade), so these are stable upper bounds.",
        "Sorted by shuffle count descending.",
        "",
        "| query | shuffle | bcast | reused | BHJ | SMJ | BNLJ | cartesian | topk | pyarrow | single_part |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, c in rows:
        lines.append(
            f"| `{name}` | {c['shuffle']} | {c['bcast']} | {c['reused']} |"
            f" {c['BHJ']} | {c['SMJ']} | {c['BNLJ']} | {c['cartesian']} |"
            f" {c['topk']} | {c['pyarrow']} | {c['single_part']} |"
        )
    total = sum(c["shuffle"] for _, c in rows)
    lines += [
        "",
        f"Totals: {total} shuffle exchanges across {len(rows)} queries; "
        f"{sum(c['cartesian'] for _, c in rows)} CartesianProduct (lint-enforced 0).",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote SHUFFLES.md ({len(rows)} queries, {total} shuffles)")


if __name__ == "__main__":
    main()
