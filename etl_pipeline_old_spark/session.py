"""SparkSession factory.

Reference equivalent: the per-process pandas "session" set up at the top of
every extractor/notebook (``/root/reference/run.py:8-9`` sets ``ETL_ROOT``;
each notebook re-reads CSVs). Here a single SparkSession owns the whole
pipeline so Catalyst can fuse the chain (SURVEY.md §3.1).

Scale notes
-----------
- ``spark.sql.adaptive.enabled``: AQE re-plans joins/skew at runtime — the
  knob that makes the same code survive a 100 TB input.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster this should be ~2-3x total executor cores (or left to
  AQE coalescing).
- ``spark.sql.session.timeZone=UTC``: the reference treats naive timestamps
  as UTC (SURVEY.md §1.2); pinning UTC also aligns Spark TIMESTAMP with
  DuckDB's UTC-naive timestamps for the differential oracle.
- ``spark.sql.legacy.parquet.nanosAsLong``: earlier driver testdata stored
  ``events.ts`` as parquet TIMESTAMP(NANOS,false), which Spark 4 otherwise
  refuses to read; the catalog converts the long back to a timestamp. Current
  testdata stores it as TIMESTAMP(MICROS,false) (→ TIMESTAMP_NTZ under the
  default NTZ inference); :func:`~.catalog.restore_ts` normalizes either
  shape to a UTC TIMESTAMP, so both generations of testdata stay readable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that queries depend on regardless of who built the session.  Applied
# both at build time and defensively (via ensure_session_confs) when we are
# handed a foreign session, e.g. the driver's.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Spark's 200 default drowns small/medium local runs in empty tasks;
    # AQE coalescing keeps this safe for large inputs too
    "spark.sql.shuffle.partitions": "32",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "etl_pipeline_old_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a cluster the
    master/memory settings come from spark-submit and only the SQL confs
    below matter.
    """
    n = cpus or default_parallelism()
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs this engine's plans assume on an existing session.

    All four confs are dynamic SQL confs, so setting them on a session we did
    not build (the verify driver's) is safe and takes effect for subsequent
    plans.
    """
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # read-only conf on some builds — plans degrade gracefully
    return spark
