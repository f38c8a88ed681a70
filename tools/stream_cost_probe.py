"""Split streaming entries' wall time into session-fixed vs per-query cost.

Runs each stream_* registry entry twice in one session (first = cold,
second = warm) and, for a representative stateful query, breaks the warm
run into stage/start/batches/stop via StreamingQueryListener progress
events. Prints one JSON line per probe to stdout.

Usage: python tools/stream_cost_probe.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_ENTRIES = [
    "stream_tumbling_window_counts",
    "stream_stateful_dedup",
    "stream_stateful_running_totals",
    "stream_foreachbatch_upsert",
    "stream_dedup_within_watermark",
    "stream_sliding_window_counts",
    "stream_session_window",
    "stream_append_watermark",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_scd2_apply",
    "stream_restart_resume",
    "state_store_inspect",
    "pipeline_streaming_corpus",
    "s7b_python_datasource_stream",
    "stream_er_incremental_link",
    "stream_ann_probe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded
    from etl_pipeline_old_spark.session import get_spark
    from etl_pipeline_old_spark.sources import python_datasource

    _ensure_loaded()
    spark = get_spark("stream_probe")
    python_datasource.register(spark)
    # generic warmups as in bench.py (JVM codegen + Python worker daemon)
    QUERIES["p1_project"].fn(spark, sf_dir).count()

    names = sys.argv[1:] or [n for n in STREAM_ENTRIES if n in QUERIES]
    out = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        out[name] = {"cold": round(cold, 2), "warm": round(warm, 2)}
        print(f"{name}: cold={cold:.2f}s warm={warm:.2f}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
