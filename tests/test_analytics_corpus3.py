"""Behavioral invariants for the round-3 analytics + curation operators
(value parity with DuckDB is covered by test_oracle_parity; these pin the
semantics that parity alone wouldn't catch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()


def test_funnel_stage_counts_monotone(spark, oracle_sf_dir):
    r = QUERIES["events_funnel"].fn(spark, oracle_sf_dir).first()
    assert r["n_signup"] >= r["n_click_after"] >= r["n_purchase_after"]
    assert r["n_purchase_after"] > 0, "24h window must not be vacuous"
    assert r["n_click_after"] < r["n_signup"], "window must be discriminative"


def test_retention_cohort_day0_equals_cohort_size(spark, oracle_sf_dir):
    """Every user is active on their own first-seen day, so offset-0 rows
    must sum to the number of distinct users."""
    from etl_pipeline_old_spark.catalog import load_table

    out = QUERIES["events_retention_cohorts"].fn(spark, oracle_sf_dir)
    day0 = (
        out.filter(F.col("day_offset") == 0).agg(F.sum("n_users")).first()[0]
    )
    n_users = (
        load_table(spark, oracle_sf_dir, "events").select("user_id").distinct().count()
    )
    assert day0 == n_users


def test_rate_anomaly_zscores_standardized(spark, oracle_sf_dir):
    """Flags must agree with the emitted z-scores, and full-window rows
    only (first ANOM_WINDOW hours are never emitted)."""
    from etl_pipeline_old_spark.queries.analytics import ANOM_WINDOW, ANOM_Z

    rows = QUERIES["events_rate_anomaly"].fn(spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert r["is_anomaly"] == (abs(r["zscore"]) > ANOM_Z)
    hours = sorted(r["hour_start"] for r in rows)
    total_hours = (hours[-1] - hours[0]).total_seconds() / 3600 + 1
    assert len(rows) <= total_hours  # the warm-up prefix is withheld
    assert any(r["is_anomaly"] for r in rows) or len(rows) > ANOM_WINDOW


def test_semantic_dedup_drop_rule(spark, oracle_sf_dir):
    """dup_of must point at a smaller, KEPT-or-dropped id (the keep-min
    rule uses raw ids, so dup_of < vec_id always), and kept <=> no dup_of."""
    rows = QUERIES["dedup_semantic"].fn(spark, oracle_sf_dir).collect()
    dropped = [r for r in rows if not r["kept"]]
    assert dropped, "tau must not be vacuous at sf0.01"
    for r in rows:
        assert r["kept"] == (r["dup_of"] is None)
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]


def test_gopher_pass_is_conjunction(spark, oracle_sf_dir):
    rows = QUERIES["corpus_gopher_rules"].fn(spark, oracle_sf_dir).collect()
    n_pass = 0
    for r in rows:
        expected = (
            r["word_count_ok"]
            and r["mean_word_len_ok"]
            and r["alpha_ratio_ok"]
            and r["stopwords_ok"]
            and r["hash_ratio_ok"]
            and r["ellipsis_ratio_ok"]
        )
        assert r["gopher_pass"] == expected
        n_pass += int(r["gopher_pass"])
    assert 0 < n_pass < len(rows), "rule set must discriminate on this corpus"


def test_dsir_weights_favor_target_domain(spark, oracle_sf_dir):
    """English docs (the target domain) must average a higher importance
    weight than the rest — the defining property of the estimator."""
    from etl_pipeline_old_spark.catalog import load_table

    out = QUERIES["corpus_dsir_weights"].fn(spark, oracle_sf_dir)
    docs = load_table(spark, oracle_sf_dir, "documents").select("doc_id", "lang")
    j = out.join(docs, "doc_id")
    avg = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logratio").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_mix_weights_rebalance_toward_uniform(spark, oracle_sf_dir):
    rows = QUERIES["corpus_mix_weights"].fn(spark, oracle_sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    fair = total / len(rows)
    for r in rows:
        if r["n_docs"] <= fair:
            assert r["sample_weight"] == 1.0
        else:
            assert r["sample_weight"] < 1.0
            assert abs(r["sample_weight"] * r["n_docs"] - fair) < 1.0
