"""Emit COVERAGE.json: per-query cumulative driver-verification ledger.

The round driver hash-checks only the first ~50 ``queries()`` entries per
round, so driver-level hard signal accumulates across rounds as the window
rotates (VERDICT r2 item 5). This tool folds every ``CORRECTNESS_r*.json``
into one map so the rotation provably converges on all queries:

  query -> {status, round}

  status: "green"       — rows+schema+hash all matched in some round
          "hash-fail"   — rows/schema matched but the value hash did not
          "shape-fail"  — row count or schema diverged
          "rows-only"   — driver recorded a weaker rows-only check
          "error"       — most recent driver attempt errored
          "unverified"  — never inside any round's driver window yet

Latest-round signal wins for a query checked in multiple rounds (fixes
land in later rounds). Regenerate whenever the window rotates or queries
are added:

    python tools/make_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def classify(rec: dict) -> str:
    if rec.get("err"):
        return "error"
    if rec.get("rows_match") is False or rec.get("schema_match") is False:
        return "shape-fail"
    if rec.get("hash_match") is True:
        return "green"
    if rec.get("hash_match") is False:
        return "hash-fail"
    # no error and no match verdicts: the driver's weaker rows-only check
    return "rows-only"


def main() -> None:
    import __spark_entry__ as entrymod

    all_queries = list(entrymod.queries())
    window = list(entrymod.DRIVER_WINDOW)

    ledger: dict[str, dict] = {
        q: {"status": "unverified", "round": None} for q in all_queries
    }
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    stale: dict[str, int] = {}
    for path in rounds:
        rno = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        data = json.load(open(path))
        for q, rec in data.items():
            if q not in ledger:
                # renamed/removed since that round — report separately
                # instead of polluting the live ledger and summary counts
                stale[q] = rno
                continue
            ledger[q] = {"status": classify(rec), "round": rno}

    counts: dict[str, int] = {}
    for rec in ledger.values():
        counts[rec["status"]] = counts.get(rec["status"], 0) + 1

    out = {
        "note": (
            "Cumulative driver-verification ledger. The driver checks only "
            "the first ~50 queries() entries per round; __spark_entry__ "
            "rotates the window each round until every query has hard "
            "driver signal. 'green' = rows+schema+value-hash matched the "
            "DuckDB oracle in that round."
        ),
        "rounds_seen": [os.path.basename(p) for p in rounds],
        "current_window": window,
        "summary": counts,
        "stale_names": stale,
        "queries": ledger,
    }
    path = os.path.join(REPO, "COVERAGE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"wrote {path}: {counts}")


if __name__ == "__main__":
    main()
