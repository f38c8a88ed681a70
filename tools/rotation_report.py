"""Driver-verification rotation report: which registry queries have green
CORRECTNESS rows, which are still unchecked, and what the next round's
capped verification prefix will contain.

Run: python tools/rotation_report.py [cap]   (default cap 50)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from etl_pipeline_old_spark.registry import (  # noqa: E402
    QUERIES,
    _ensure_loaded,
    _ordered_names,
    _verification_priority,
)


def main() -> None:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    _ensure_loaded()
    # the EXACT classification the rotation uses (so the forecast cannot
    # drift from registry._verification_priority): count > 0 == "the driver
    # has a usable row for it" (incl. rows-only checks of oracle-less
    # entries while they stayed oracle-less)
    green = {n: c for n, c in _verification_priority().items() if c > 0}

    order = _ordered_names()
    unchecked = [n for n in order if n not in green]
    print(f"registry: {len(QUERIES)}  driver-verified: {len(green)}  "
          f"never-verified: {len(unchecked)}")
    print(f"\nnext round's first {cap} (the driver's capped prefix):")
    for n in order[:cap]:
        mark = "verified×%d" % green[n] if n in green else "unverified"
        print(f"  {n}  [{mark}]")
    rounds_left = (len(unchecked) + cap - 1) // cap
    print(f"\nfull green coverage in ~{rounds_left} more round(s) at cap {cap}")


if __name__ == "__main__":
    main()
