"""Scan-parallelism probe for the own-codec lake readers (r14 verdict #7).

Question: does the ranged-scan task count track the WORK-UNIT count
(parquet row groups / ORC shards), so a 100 TB estate fans out instead of
serializing behind a local constant? r15 replaced the hard ``min(n, 32)``
caps with session-scaled ``scan_partitions`` — this probe stages k-fold
inflated inputs and records (units, scan partitions, wall seconds).

Usage: python tools/lake_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_pipeline_old_spark.catalog import table_path
    from etl_pipeline_old_spark.operators.parquet_data import read_row_group
    from etl_pipeline_old_spark.operators.parquet_meta import (
        parse_file_meta,
        read_footer_tail,
    )
    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded
    from etl_pipeline_old_spark.session import get_spark, scan_partitions
    from etl_pipeline_old_spark.workdir import run_dir

    _ensure_loaded()
    spark = get_spark("lake_scale_probe")
    QUERIES["p1_project"].fn(spark, sf_dir).count()
    src = table_path(sf_dir, "documents")

    print("== lake_parquet_native_read: k-fold sharded documents lake ==")
    print("k | files(=row groups) | scan partitions | wall s")
    for k in (1, 4, 16):
        fake_sf = run_dir(f"lakeprobe_k{k}", sf_dir)
        docs_dir = os.path.join(fake_sf, "documents.parquet")
        os.makedirs(docs_dir)
        for i in range(k):
            shutil.copy(src, os.path.join(docs_dir, f"part-{i:04d}.parquet"))
        # warm once, then time
        QUERIES["lake_parquet_native_read"].fn(spark, fake_sf).count()
        t0 = time.perf_counter()
        df = QUERIES["lake_parquet_native_read"].fn(spark, fake_sf)
        n = df.count()
        wall = time.perf_counter() - t0
        # reproduce the planning pass to report units/partitions
        files = sorted(
            os.path.join(docs_dir, f)
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
        units = sum(
            len(parse_file_meta(read_footer_tail(f))["row_groups"]) for f in files
        )
        parts = scan_partitions(spark, units)
        print(f"{k} | {units} | {parts} | {wall:.2f}  (rows={n})")

    print()
    print("== scan_partitions formula at cluster parallelisms ==")
    par = spark.sparkContext.defaultParallelism
    print(f"session parallelism={par}")
    for units in (4, 64, 1024, 1_000_000):
        print(f"units={units:>9}: partitions={scan_partitions(spark, units)}"
              f"  (old r14 cap: {min(max(units, 1), 32)})")
    spark.stop()


if __name__ == "__main__":
    main()
