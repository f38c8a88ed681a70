"""The stateful streaming paths must produce identical results under the
RocksDB state store provider — the production backend for large state
(bounded executor memory, changelog checkpointing) — as under the default
HDFS-backed in-memory provider the rest of the suite exercises."""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.mark.parametrize(
    "name", ["stream_session_window", "stream_stateful_dedup"]
)
def test_stateful_query_matches_under_rocksdb(spark, oracle_sf_dir, name):
    fn = QUERIES[name].fn
    baseline = sorted(map(tuple, fn(spark, oracle_sf_dir).collect()))
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        rocks = sorted(map(tuple, fn(spark, oracle_sf_dir).collect()))
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    assert rocks == baseline
