"""tools/oracle_check.py gate hygiene (VERDICT r7 item 2).

Found live by the round-7 judge: ``oracle_check.py --help`` printed
ALL PASS in seconds because unknown positional names filtered every
query out and an empty selection counted zero failures — a green mirror
step that checked nothing, sitting in the round gate's path. The
unknown-name rejection happens BEFORE the Spark session starts, so these
subprocess probes stay cheap.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_unknown_query_name_exits_nonzero():
    res = _run("no_such_query")
    assert res.returncode != 0, res.stdout
    assert "no_such_query" in res.stdout
    assert "ALL PASS" not in res.stdout


def test_help_flag_is_not_a_vacuous_pass():
    res = _run("--help")
    assert res.returncode != 0, res.stdout
    assert "ALL PASS" not in res.stdout


def test_typo_alongside_valid_name_still_fails():
    # a scripted gate invocation with one renamed query must go loud,
    # not silently check the surviving subset
    res = _run("q01_pricing_summary", "q01_pricing_sumary")
    assert res.returncode != 0, res.stdout
    assert "q01_pricing_sumary" in res.stdout
