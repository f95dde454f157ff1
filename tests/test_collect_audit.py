"""Mechanized driver-materialization audit (the per-round manual check):
every ``.collect()`` / ``.toPandas()`` / ``.toLocalIterator()`` in the
engine source must be a known, bounded, adjudicated site — an operator
that iterates a data-scaled frame on the driver isn't distributed. 1-row
scalar reads (``agg(...).first()``) are a separate, benign class and are
not audited here.

Adding a new materialization site = add it to the allowlist WITH its
boundedness argument, or the audit fails.
"""

from __future__ import annotations

import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "log_agent_spark")

# (relative path, substring that must appear on the flagged line) -> why bounded
ALLOWED = {
    ("sinks/upsert.py", "incoming.select(partition_col).distinct().collect()"):
        "distinct partition VALUES of one micro-batch — bounded by the "
        "partition-key cardinality (dates), never by row count",
    ("sinks/filecopy.py", "df.toLocalIterator()"):
        "K3 driver-side file-copy form streams one partition at a time "
        "(never the whole frame in memory); the executor-side DataSource "
        "twin (filecopy_datasource.py) is the scale path",
    ("__main__.py", 'live.select("path").distinct().collect()'):
        "CLI convenience listing of WATCHED PATHS (config-scale, not "
        "data-scale)",
}

_PATTERN = re.compile(r"\.collect\(\)|\.toPandas\(\)|\.toLocalIterator\(\)")


def _source_files():
    for dirpath, _dirs, files in os.walk(ROOT):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def test_every_driver_materialization_is_allowlisted():
    hits = []
    for path in _source_files():
        rel = os.path.relpath(path, ROOT)
        with open(path) as fh:
            for lineno, line in enumerate(fh, 1):
                stripped = line.strip()
                if stripped.startswith("#") or not _PATTERN.search(line):
                    continue
                if not any(
                    rel == arel and snippet in line
                    for (arel, snippet) in ALLOWED
                ):
                    hits.append(f"{rel}:{lineno}: {stripped[:100]}")
    assert not hits, (
        "unadjudicated driver-side materialization site(s) — add to "
        f"ALLOWED with a boundedness argument:\n" + "\n".join(hits)
    )


def test_allowlist_is_not_stale():
    stale = []
    for (rel, snippet), _why in ALLOWED.items():
        path = os.path.join(ROOT, rel)
        with open(path) as fh:
            if snippet not in fh.read():
                stale.append(f"{rel}: {snippet}")
    assert not stale, f"allowlisted sites no longer in source: {stale}"
