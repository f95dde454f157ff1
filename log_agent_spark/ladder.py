"""Corpus-size granularity ladders (shared by the bucketed candidate
generators).

A candidate join over a CONSTANT bucket space is quadratic the moment the
data outgrows it (VERDICT r7 class: SemDeDup cells, SAX words, pHash
width, cosine sign buckets). The shared pattern: an eager count picks the
index granularity off a (max_rows, value) ladder whose FLOOR rung covers
every driver-checked fixture, so the static DuckDB oracles stay strict
mirrors there while larger corpora get finer buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

Ladder = Sequence[tuple[float, int]]


def pick_rung(n: int, ladder: Ladder) -> int:
    """Value of the first rung whose row cap covers ``n``.

    The ladder must be ordered by ascending cap and end with an
    unbounded rung (cap = inf) — validated here so a malformed ladder
    fails loudly at the call site instead of silently picking a wrong
    granularity.
    """
    caps = [cap for cap, _ in ladder]
    if caps != sorted(caps) or caps[-1] != float("inf"):
        raise ValueError(f"malformed ladder (ascending caps ending in inf): {ladder}")
    return next(v for cap, v in ladder if n <= cap)


def is_floor(value: int, ladder: Ladder) -> bool:
    """True iff ``value`` is the ladder's floor (first-rung) granularity."""
    return value == ladder[0][1]
