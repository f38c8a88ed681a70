"""Live JDBC round-trip against embedded Derby (ships with Spark for the
Hive metastore) — exercises the S4-S6 source builders and the K4/K5 JDBC
sinks against a REAL database instead of only asserting generated SQL.

Reference behaviors covered: full-table pull (fetch_pluginsdb_plugin.py
COPY loop), incremental predicate pull (fetch_asterisk_cdr.py WHERE
uniqueid > max), chunked append + idempotent re-run.
"""

from __future__ import annotations

import pytest

from etl_pipeline_old_spark.sinks.incremental import jdbc_incremental_append
from etl_pipeline_old_spark.sources.jdbc import (
    incremental_subquery,
    jdbc_incremental_scan,
    jdbc_scan,
)

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
PROPS = {"driver": DRIVER}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(100)],
        "id bigint, name string, score bigint",
    )
    df.write.mode("overwrite").option("driver", DRIVER).jdbc(derby_url, "people")
    return df


def test_full_scan_roundtrip(spark, derby_url, seeded):
    got = jdbc_scan(spark, derby_url, "people", PROPS)
    assert got.count() == 100
    assert {r["id"] for r in got.select("id").collect()} == set(range(100))


def test_partitioned_parallel_scan(spark, derby_url, seeded):
    got = jdbc_scan(
        spark,
        derby_url,
        "people",
        PROPS,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 100


def test_incremental_predicate_pushdown(spark, derby_url, seeded):
    # the predicate lives INSIDE the dbtable subquery → evaluated DB-side
    sub = incremental_subquery("people", "id", 89)
    assert sub == "(SELECT * FROM people WHERE \"id\" > 89) t"
    got = jdbc_incremental_scan(spark, derby_url, "people", "id", 89, PROPS)
    assert got.count() == 10
    assert {r["id"] for r in got.collect()} == set(range(90, 100))


def test_filter_pushdown_in_plan(spark, derby_url, seeded):
    # Catalyst pushes DataFrame filters into the JDBC source
    got = jdbc_scan(spark, derby_url, "people", PROPS).filter("score >= 900")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "score" in plan
    assert got.count() == 10


def test_jdbc_incremental_append_idempotent(spark, derby_url, seeded):
    base = spark.createDataFrame(
        [(i, i * 100) for i in range(50)], "uid bigint, metric bigint"
    )
    base.write.mode("overwrite").option("driver", DRIVER).jdbc(derby_url, "cdr")

    # second batch overlaps [40, 50) — only 50..59 must be appended
    batch = spark.createDataFrame(
        [(i, i * 100) for i in range(40, 60)], "uid bigint, metric bigint"
    )
    jdbc_incremental_append(spark, batch, derby_url, "cdr", "uid", PROPS)
    after = jdbc_scan(spark, derby_url, "cdr", PROPS)
    assert after.count() == 60
    assert after.groupBy("uid").count().filter("count > 1").count() == 0

    # re-running the same batch appends nothing (idempotent under the
    # monotone watermark — the reference's fetch_asterisk_cdr contract)
    jdbc_incremental_append(spark, batch, derby_url, "cdr", "uid", PROPS)
    assert jdbc_scan(spark, derby_url, "cdr", PROPS).count() == 60
