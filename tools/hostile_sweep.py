"""Run EVERY registry query under a driver-shaped hostile session.

The external verify driver builds its own SparkSession (unknown confs —
exercised here as ANSI-on + non-UTC timezone) and calls the
__spark_entry__ surface. This sweep is the pre-flight for the driver's
CORRECTNESS pass: it proves each query at least EXECUTES under a foreign
session (the parity suite checks values, but with the repo's own session).

Run: python tools/hostile_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    fails: list[str] = []
    t00 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            status = f"ok rows={n}"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            fails.append(name)
            status = "FAIL: " + str(ex).splitlines()[0][:160]
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"TOTAL {time.time() - t00:.0f}s FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
