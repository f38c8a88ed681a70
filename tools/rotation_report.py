"""Driver-verification rotation report: which registry queries have green
CORRECTNESS rows, which are still unchecked, and what the next round's
capped verification prefix will contain.

Run: python tools/rotation_report.py [cap]   (default cap 50)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, ".")

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded, _ordered_names  # noqa: E402


def main() -> None:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    _ensure_loaded()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: dict[str, int] = {}
    err: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err"):
                err.setdefault(name, str(row["err"]).splitlines()[0][:60])
            else:
                green[name] = green.get(name, 0) + 1

    order = _ordered_names()
    unchecked = [n for n in order if n not in green]
    print(f"registry: {len(QUERIES)}  driver-green: {len(green)}  "
          f"never-green: {len(unchecked)}  err-rows-seen: {len(err)}")
    print(f"\nnext round's first {cap} (the driver's capped prefix):")
    for n in order[:cap]:
        mark = "green×%d" % green[n] if n in green else (
            "ERR: " + err[n] if n in err else "new")
        print(f"  {n}  [{mark}]")
    rounds_left = (len(unchecked) + cap - 1) // cap
    print(f"\nfull green coverage in ~{rounds_left} more round(s) at cap {cap}")


if __name__ == "__main__":
    main()
