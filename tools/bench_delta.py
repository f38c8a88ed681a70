"""Round-over-round bench comparison: per-query ratios between the two
most recent BENCH_r*.json files (or any two passed as arguments).

Run: python tools/bench_delta.py [OLD.json NEW.json]

Prints one line per query — ratio, old, new — sorted worst-first, plus
added/removed queries and the common-subset totals. Ratios above
REGRESSION_BAR are flagged; use this to decide what to profile before
writing the round's SCALE/BENCH notes.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REGRESSION_BAR = 1.5


def _load_queries(path: str) -> dict[str, float]:
    """Accept either bench.py's raw one-line JSON or the driver's wrapper
    (a dict whose 'tail' field embeds the bench line in captured stdout)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    for line in reversed(doc.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    raise SystemExit(f"{path}: no bench JSON line found")


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        runs = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
        if len(runs) < 2:
            print("need two BENCH_r*.json files (or pass two paths)")
            return 1
        old_path, new_path = runs[-2], runs[-1]

    old = _load_queries(old_path)
    new = _load_queries(new_path)

    common = sorted(set(old) & set(new))
    rows = sorted(
        ((new[q] / old[q] if old[q] else float("inf"), q) for q in common),
        reverse=True,
    )
    print(f"# {os.path.basename(old_path)} -> {os.path.basename(new_path)}")
    for ratio, q in rows:
        flag = "  <-- REGRESSION" if ratio > REGRESSION_BAR else ""
        print(f"{ratio:6.2f}x  {old[q]:7.2f}s -> {new[q]:7.2f}s  {q}{flag}")
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    print(
        f"common subset ({len(common)} queries): "
        f"{t_old:.1f}s -> {t_new:.1f}s ({t_new / t_old:.2f}x)"
    )
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): " + ", ".join(f"{q} {new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    return 0


if __name__ == "__main__":
    sys.exit(main())
