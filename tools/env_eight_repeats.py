"""Back-to-back repeat check for the environment-sensitive eight.

The eight registry queries that touch stateful backends outside plain
parquet reads — Derby (JDBC), the Spark warehouse (saveAsTable), and
streaming checkpoints — are the ones a foreign driver session could
flake on. This runs each one N times back-to-back inside a single
driver-shaped session (ANSI-on + non-UTC tz) and asserts the row count
is identical across repeats, printing a per-query verdict.

Run: python tools/env_eight_repeats.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EIGHT = [
    "federated_three_source_join",   # live Derby JDBC roundtrip
    "layout_bucketed_join",          # warehouse saveAsTable + bucketed scan
    "catalog_analyze_stats",         # warehouse ANALYZE TABLE
    "layout_compaction_execute",     # warehouse rewrite, file counting
    "stream_restart_resume",         # checkpoint restart
    "stream_stream_left_outer",      # watermarked stream-stream join
    "state_store_inspect",           # state-store reader over a checkpoint
    "state_metadata_audit",          # state-metadata reader over a checkpoint
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "Asia/Yekaterinburg")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    flakes: list[str] = []
    for name in EIGHT:
        counts: list[int] = []
        walls: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            counts.append(qs[name](spark, sf_dir).count())
            walls.append(time.time() - t0)
        stable = len(set(counts)) == 1
        if not stable:
            flakes.append(name)
        print(
            f"{name}: rows={counts} walls={[round(w, 1) for w in walls]} "
            f"{'STABLE' if stable else 'FLAKE'}",
            flush=True,
        )
    print(f"FLAKES: {flakes}")
    return 1 if flakes else 0


if __name__ == "__main__":
    raise SystemExit(main())
