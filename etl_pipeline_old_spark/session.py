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
    # Implicit streaming checkpoints (memory-sink queries that pass no
    # checkpointLocation) land on the process scratch root — RAM-backed
    # when /dev/shm exists (workdir._pick_base) — instead of
    # java.io.tmpdir: takes the disk out of each micro-batch's WAL +
    # state-store writes (r15, guide §6). Only set when the session has
    # no value, so an operator-provided location always wins. Unlike
    # engine temp checkpoints these are not deleted at query stop; they
    # are per-run-unique (uuid query names), tiny at local scale, and
    # the scratch root is atexit-removed/reaped.
    try:
        if spark.conf.get("spark.sql.streaming.checkpointLocation", None) is None:
            from .workdir import cache_root

            spark.conf.set(
                "spark.sql.streaming.checkpointLocation",
                os.path.join(cache_root(), "stream_chk"),
            )
    except Exception:
        pass
    return spark


from contextlib import contextmanager  # noqa: E402


@contextmanager
def no_data_batches_disabled(spark: SparkSession):
    """Skip the watermark-advance no-data micro-batch for queries whose
    RESULT provably cannot depend on it (guide §1.2 — don't compute what
    you throw away):

    - COMPLETE-mode aggregations: every data batch re-emits the full
      state, so the final table after the last data batch already is the
      answer; the no-data batch re-scans the state and rewrites the sink
      with the identical rows.
    - INNER stream-stream joins: matches are emitted in the batch where
      both sides have arrived; the no-data batch only evicts state.

    NOT safe for append-mode windowed aggregations (they emit only
    watermark-closed windows — the no-data batch IS the closure) or
    outer stream-stream joins (outer rows emit on watermark passage);
    those queries keep the default.

    The conf is snapshotted by MicroBatchExecution at query start, so
    wrapping just the ``.start()`` is sufficient and the session value is
    restored for whatever query comes next.
    """
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def scan_partitions(spark: SparkSession, n_units: int | None = None) -> int:
    """Task count for an own-codec ranged scan (parquet row groups, ORC
    stripes, zstd frames, archive shards...).

    r14 verdict #7: these scans carried a hard ``min(n, 32)`` cap — a
    local-core-count constant that would serialize a 100 TB estate's
    millions of work units behind 32 tasks. The fan-out now scales with
    the session (4× its parallelism, so the unit-to-task packing still
    amortizes scheduling while the tail stays short), bounded by the
    unit count when known. Local behavior at the driver's bench core
    counts is unchanged: at 32 cores the bound is 128 and every sf0.1
    unit count is far below it; at the 8-core probe max(32, 32) = 32 —
    exactly the old cap.
    """
    par = spark.sparkContext.defaultParallelism
    cap = max(4 * par, 32)
    if n_units is None:
        return cap
    return max(1, min(n_units, cap))
