"""COVERAGE.md must stay in sync with the live registry (VERDICT r2 #3):
the generator fails when a registry query is unmapped, and this test fails
when the committed document drifts from the generator's output."""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_up_to_date():
    r = subprocess.run(
        [sys.executable, "tools/gen_coverage.py", "--check"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, f"stale or invalid COVERAGE.md:\n{r.stdout}\n{r.stderr}"
