"""Behavioral checks for the approx/advanced operators that can't be
value-hash-checked across engines (sketch results are engine-specific)."""

from __future__ import annotations

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()


def test_approx_count_distinct_bounded_error(spark, oracle_sf_dir):
    r = QUERIES["a8_approx_count_distinct"].fn(spark, oracle_sf_dir).first()
    assert r["approx_within_5pct"], "HLL++ rsd=0.02 must be within 5% of exact"
    assert r["n_parts_exact"] > 0


def test_percentile_approx_bounded_error(spark, oracle_sf_dir):
    r = QUERIES["a10_percentile_approx"].fn(spark, oracle_sf_dir).first()
    assert r["approx_within_1"], "GK sketch median must be within 1.0 of exact"


def test_asof_join_self_match(spark, oracle_sf_dir):
    # a signup event's as-of match is itself (>= semantics)
    from etl_pipeline_old_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, oracle_sf_dir, "events")
    signups = {
        r["event_id"]: r["us"]
        for r in ev.filter(F.col("event_type") == "signup")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    out = {
        r["event_id"]: r["last_signup_us"]
        for r in QUERIES["asof_join_last_signup"].fn(spark, oracle_sf_dir).collect()
    }
    checked = 0
    for eid, us in list(signups.items())[:50]:
        assert out[eid] == us, f"signup {eid} must as-of match itself"
        checked += 1
    assert checked > 0


def test_salted_join_equals_plain(spark, oracle_sf_dir):
    plain = QUERIES["j1_dim_enrich"].fn(spark, oracle_sf_dir)
    salted = QUERIES["join_salted_skew"].fn(spark, oracle_sf_dir)
    assert salted.count() == plain.count()
