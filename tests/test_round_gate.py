"""The round gate's shuffle-ledger diff (VERDICT r9 item 4): SHUFFLES.md
counts are stable upper bounds (AQE can only lower them at runtime), so a
shuffle-count INCREASE on any already-ledgered query is a plan regression
the gate must trip on mechanically — these tests pin the pure comparison
the `shuffles` step runs, including that a synthetic +1 trips it and that
the non-regression shapes (decrease, new query, removed query) do not."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "round_gate",
    os.path.join(os.path.dirname(__file__), "..", "tools", "round_gate.py"),
)
round_gate = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(round_gate)  # type: ignore[union-attr]

_HEADER = (
    "# SHUFFLES — per-query plan-shape ledger\n\n"
    "| query | shuffle | bcast | reused | BHJ | SMJ | BNLJ | cartesian | topk | pyarrow | single_part |\n"
    "|---|---|---|---|---|---|---|---|---|---|---|\n"
)


def _ledger(rows: dict[str, int], single: dict[str, int] | None = None) -> str:
    single = single or {}
    body = "".join(
        f"| `{name}` | {n} | 0 | 0 | 1 | 0 | 0 | 0 | 0 | 0 |"
        f" {single.get(name, 0)} |\n"
        for name, n in rows.items()
    )
    return _HEADER + body + "\nTotals: x shuffle exchanges across y queries.\n"


def test_parse_extracts_query_to_shuffle_map():
    text = _ledger({"q01_pricing_summary": 3, "dedup_exact": 1})
    assert round_gate.parse_shuffle_ledger(text) == {
        "q01_pricing_summary": 3,
        "dedup_exact": 1,
    }


def test_synthetic_plus_one_trips_the_gate():
    committed = _ledger({"a": 2, "b": 5})
    fresh = _ledger({"a": 2, "b": 6})
    assert round_gate.risen_shuffles(committed, fresh) == {"b": (5, 6)}


def test_decrease_new_and_removed_queries_do_not_trip():
    committed = _ledger({"a": 2, "b": 5, "gone": 7})
    fresh = _ledger({"a": 1, "b": 5, "brand_new": 99})
    assert round_gate.risen_shuffles(committed, fresh) == {}


def test_parse_tolerates_prose_and_malformed_rows():
    text = _HEADER + "| `ok` | 4 | 0 | 0 | 1 | 0 | 0 | 0 | 0 | 0 |\n" + (
        "| `broken` | not-a-number | ... |\n| not a table row\nplain prose |\n"
    )
    assert round_gate.parse_shuffle_ledger(text) == {"ok": 4}


def test_single_part_plus_one_trips_the_gate():
    """A new Exchange SinglePartition on an untouched query (e.g. an
    unpartitioned window creeping into a refactor) must trip the gate
    even when the total shuffle count is unchanged."""
    committed = _ledger({"a": 2, "b": 5}, single={"b": 1})
    fresh = _ledger({"a": 2, "b": 5}, single={"b": 2})
    assert round_gate.risen_shuffles(committed, fresh) == {}
    assert round_gate.risen_shuffles(committed, fresh, "single_part") == {
        "b": (1, 2)
    }


def test_single_part_diff_skips_pre_column_committed_ledger():
    """Diffing against a committed ledger from before the single_part
    column existed must not trip (no prior to compare) — the first
    regenerated ledger simply becomes the prior."""
    old_header = (
        "# SHUFFLES — per-query plan-shape ledger\n\n"
        "| query | shuffle | bcast | reused | BHJ | SMJ | BNLJ | cartesian | topk | pyarrow |\n"
        "|---|---|---|---|---|---|---|---|---|---|\n"
        "| `a` | 2 | 0 | 0 | 1 | 0 | 0 | 0 | 0 | 0 |\n"
    )
    fresh = _ledger({"a": 3}, single={"a": 3})
    assert round_gate.risen_shuffles(old_header, fresh, "single_part") == {}
    # the shuffle column still diffs across the format change — a real
    # rise (2 -> 3) must be detected even though the fresh ledger has an
    # extra column the committed one lacks
    assert round_gate.risen_shuffles(old_header, fresh, "shuffle") == {
        "a": (2, 3)
    }


def test_committed_shuffles_md_parses_nonempty():
    """The real committed ledger must stay parseable by the gate's reader
    (a format change in tools/shuffle_ledger.py without updating the
    parser would silently turn the gate into a no-op)."""
    path = os.path.join(os.path.dirname(__file__), "..", "SHUFFLES.md")
    with open(path) as f:
        parsed = round_gate.parse_shuffle_ledger(f.read())
    assert len(parsed) >= 200, len(parsed)
    assert all(isinstance(v, int) and v >= 0 for v in parsed.values())
