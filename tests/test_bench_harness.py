"""Bench-harness unit tests (no Spark session needed).

The bench's noise gate has two triggers: intra-run attempt disagreement
(best-of-3 escalation, round 3 verdict) and the cross-run SCALING.md
prior (round 4: a steal window spanning BOTH attempts makes them agree,
so only an out-of-process reference can catch it). These tests pin the
prior parser's contract so a SCALING.md format drift fails loudly here
instead of silently disabling the gate.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_scaling_priors_parse_headline_queries():
    priors = bench._scaling_priors()
    # Every headline query that predates the last SCALING.md regen must
    # have a prior; a near-empty dict means the table format drifted and
    # the cross-run gate is silently off.
    covered = [q for q in bench.HEADLINE if q in priors]
    assert len(covered) >= 150, (len(covered), len(bench.HEADLINE))
    # Values are seconds at sf0.1: positive, and sane for local[32].
    for q in covered:
        assert 0.0 < priors[q] < 120.0, (q, priors[q])


def test_scaling_priors_missing_file(tmp_path, monkeypatch):
    # A missing SCALING.md must degrade to "no priors", not crash the bench.
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._scaling_priors() == {}


def test_canary_verdict_quiet_run_passes():
    c = {"start": 0.71, "mid": 0.74, "end": 0.70}
    assert bench._canary_verdict(c) == []
    assert c["spread"] == round(0.74 / 0.70, 3)
    assert c["vs_baseline"] == round(0.70 / bench.CANARY_BASELINE_SEC, 3)


def test_mc_canary_is_report_only():
    """The multicore canary annotates mc_spread but NEVER contaminates
    (gating waits for quiet-vs-contended calibration history), and the
    verdict stays correct when the mc keys are absent (bench_full and
    older callers pass scalar-only dicts)."""
    c = {
        "start": 0.71, "mid": 0.72, "end": 0.70,
        "mc_start": 0.9, "mc_mid": 2.7, "mc_end": 0.95,  # wild mc swing
    }
    assert bench._canary_verdict(c) == []
    assert c["mc_spread"] == 3.0
    scalar_only = {"start": 0.71, "mid": 0.72, "end": 0.70}
    assert bench._canary_verdict(scalar_only) == []
    assert "mc_spread" not in scalar_only


def test_canary_verdict_flags_mid_run_steal():
    # steal begins mid-run: end sample inflated, spread gate fires
    c = {"start": 0.71, "mid": 0.72, "end": 1.05}
    findings = bench._canary_verdict(c)
    assert len(findings) == 1 and "spread" in findings[0]


def test_canary_verdict_flags_whole_run_steal():
    # the r6 mode: a steal window outlasting the run inflates ALL samples
    # uniformly — spread stays flat, only the absolute gate can catch it
    c = {"start": 1.4, "mid": 1.45, "end": 1.42}
    findings = bench._canary_verdict(c)
    assert len(findings) == 1 and "baseline" in findings[0]


def test_canary_sample_is_sane():
    # one real sample: positive, sub-30s, and plausibly near baseline on
    # any host this repo runs on (very loose — this is a smoke bound, the
    # tight comparison lives in the bench gates themselves)
    t = bench._canary_sample()
    assert 0.05 < t < 30.0, t
