"""Behavioral invariants for the round-3 time-series/CDC and corpus-part-4
operators (value parity with DuckDB is covered by test_oracle_parity; these
pin the semantics that parity alone wouldn't catch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_old_spark.catalog import load_table
from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()


def test_cdc_compact_drops_tombstoned_keys(spark, oracle_sf_dir):
    """Keys whose LAST change is a delete disappear; surviving keys carry
    the payload of their final non-ordering-dependent change."""
    ev = load_table(spark, oracle_sf_dir, "events")
    last_op = (
        ev.groupBy("user_id")
        .agg(F.max_by("event_type", "event_id").alias("t"))
        .collect()
    )
    tombstoned = {r["user_id"] for r in last_op if r["t"] == "error"}
    out = QUERIES["cdc_changelog_compact"].fn(spark, oracle_sf_dir).collect()
    out_keys = {r["user_id"] for r in out}
    assert out_keys.isdisjoint(tombstoned)
    assert out_keys | tombstoned == {r["user_id"] for r in last_op}
    # n_changes counts ALL changelog rows for the key, not just upserts
    total = dict(
        (r["user_id"], r["n"])
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    )
    for r in out:
        assert r["n_changes"] == total[r["user_id"]]


def test_gapfill_is_dense_and_ffilled(spark, oracle_sf_dir):
    """Per user: one row per day between first and last active day (no
    holes, no extras); gap rows carry the previous day's value; the first
    day is never a gap."""
    rows = QUERIES["ts_gapfill_ffill"].fn(spark, oracle_sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    saw_gap = False
    for series in by_user.values():
        series.sort(key=lambda r: r["day"])
        days = [r["day"] for r in series]
        assert days == list(range(days[0], days[-1] + 1)), "series must be dense"
        assert not series[0]["is_gap"], "bounds come from observed days"
        prev = None
        for r in series:
            if r["is_gap"]:
                saw_gap = True
                assert r["value_ffill"] == prev, "gap rows carry the last value"
            prev = r["value_ffill"]
    assert saw_gap, "sf0.01 must actually contain gaps or the op is vacuous"


def test_ohlc_bounds_and_bar_width(spark, oracle_sf_dir):
    from etl_pipeline_old_spark.queries.timeseries import _BAR_US

    ev = load_table(spark, oracle_sf_dir, "events")
    n_raw = ev.count()
    rows = QUERIES["ts_resample_ohlc"].fn(spark, oracle_sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == n_raw
    for r in rows:
        assert r["low_v"] <= min(r["open_v"], r["close_v"])
        assert r["high_v"] >= max(r["open_v"], r["close_v"])
        if r["n_events"] == 1:
            assert r["open_v"] == r["close_v"] == r["high_v"] == r["low_v"]
    # bars are 6h: a user active all month produces ~4 bars/day
    us = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    n_possible_bars = us[1] // _BAR_US - us[0] // _BAR_US + 1
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], set()).add(r["bar"])
        assert us[0] // _BAR_US <= r["bar"] <= us[1] // _BAR_US
    assert max(len(b) for b in per_user.values()) <= n_possible_bars


def test_unigram_logprob_orders_by_typicality(spark, oracle_sf_dir):
    """Scores are negative log-probs averaged per doc; a doc made of the
    corpus's most frequent tokens must outscore one full of rare tokens —
    checked via correlation with mean token frequency, plus bounds."""
    out = QUERIES["corpus_unigram_logprob"].fn(spark, oracle_sf_dir)
    d = load_table(spark, oracle_sf_dir, "documents")
    rows = out.collect()
    assert len(rows) == d.count()
    assert all(r["avg_logprob"] < 0 for r in rows)
    # token counts conserved: sum over docs == total token count
    from etl_pipeline_old_spark.operators import dedup as DD

    n_tok = DD.shingle_sets(d, "text", "doc_id", n=1, distinct=False).count()
    assert sum(r["n_tokens"] for r in rows) == n_tok


def test_boilerplate_ngrams_doc_frequency(spark, oracle_sf_dir):
    """n_docs counts DISTINCT documents (set semantics): no gram can
    exceed the corpus document count, and every reported gram really
    occurs in that many docs' normalized text."""
    from etl_pipeline_old_spark.queries.corpus4 import BOILERPLATE_MIN_DOCS

    d = load_table(spark, oracle_sf_dir, "documents")
    n_docs_total = d.count()
    rows = QUERIES["corpus_boilerplate_ngrams"].fn(spark, oracle_sf_dir).collect()
    assert rows, "threshold must not be vacuous at sf0.01"
    docs = [
        (r["doc_id"], " ".join(r["text"].lower().split()))
        for r in d.select("doc_id", "text").collect()
    ]
    import random

    rnd = random.Random(7)
    for r in rnd.sample(rows, min(10, len(rows))):
        assert BOILERPLATE_MIN_DOCS <= r["n_docs"] <= n_docs_total
        hits = sum(1 for _, t in docs if f" {r['gram']} " in f" {t} ")
        assert hits == r["n_docs"]


def test_hard_negatives_exclude_same_label(spark, oracle_sf_dir):
    emb = load_table(spark, oracle_sf_dir, "embeddings")
    labels = dict((r["vec_id"], r["label"]) for r in emb.select("vec_id", "label").collect())
    rows = QUERIES["ann_hard_negatives"].fn(spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
    # vs the unconstrained top-k: hard negatives can never score higher
    # than the same query's best unconstrained neighbor
    topk = {}
    for r in QUERIES["ann_cosine_topk"].fn(spark, oracle_sf_dir).collect():
        if r["rank"] == 1:
            topk[r["query_id"]] = r["cos_sim"]
    for r in rows:
        if r["rank"] == 1:
            assert r["cos_sim"] <= topk[r["query_id"]]


def test_zvalue_locality_beats_concatenation(spark, oracle_sf_dir):
    """The whole point of the z curve: neighbors in z are close in BOTH
    dims. Median per-step |dx|+|dy| along the z-sorted order must be far
    below the same measure along an (x-major, y) concatenated sort, which
    teleports across y on every x boundary — and the interleave must be
    invertible (z decodes back to (x, y))."""
    rows = QUERIES["zorder_zvalue"].fn(spark, oracle_sf_dir).collect()

    def decode(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(32):
            if i % 2 == 0:
                x |= ((z >> i) & 1) << (i // 2)
            else:
                y |= ((z >> i) & 1) << (i // 2)
        return x, y

    for r in rows[:50]:
        assert decode(r["z"]) == (r["x"], r["y"])

    def mean_step(seq):
        steps = [
            abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
            for a, b in zip(seq, seq[1:])
        ]
        steps.sort()
        return steps[len(steps) // 2]

    by_z = sorted(rows, key=lambda r: r["z"])
    by_concat = sorted(rows, key=lambda r: (r["x"], r["y"]))
    assert mean_step(by_z) < mean_step(by_concat)


def test_dq_suite_clean_on_generated_data(spark, oracle_sf_dir):
    """The generated TPC-H-ish data satisfies every expectation."""
    rows = QUERIES["dq_check_suite"].fn(spark, oracle_sf_dir).collect()
    assert len(rows) == 6
    assert all(r["passed"] and r["n_violations"] == 0 for r in rows)


def test_dq_suite_flags_injected_violations(spark, oracle_sf_dir, tmp_path):
    """Each check must actually fire: corrupt a copy of the tables with
    one violation per expectation and assert the exact counts."""
    o = load_table(spark, oracle_sf_dir, "orders").limit(100).cache()
    li = (
        load_table(spark, oracle_sf_dir, "lineitem")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .cache()
    )
    first = o.first()
    bad_o = o.unionByName(
        spark.createDataFrame(
            [
                # duplicate PK + bad status (counts for both checks)
                (first["o_orderkey"], 1, "X", 1.0, first["o_orderdate"], "1-URGENT"),
                # null custkey
                (10**9, None, "O", 1.0, first["o_orderdate"], "1-URGENT"),
            ],
            o.schema,
        )
    )
    li_first = li.first()
    bad_li = li.unionByName(
        spark.createDataFrame(
            [
                # orphan orderkey + out-of-range quantity + non-positive price
                (
                    10**9 + 7,
                    li_first["l_partkey"],
                    li_first["l_suppkey"],
                    1,
                    999.0,
                    -5.0,
                    0.0,
                    0.0,
                    "N",
                    "O",
                    li_first["l_shipdate"],
                )
            ],
            li.schema,
        )
    )
    sf = str(tmp_path / "corrupted")
    import os

    os.makedirs(sf, exist_ok=True)
    bad_o.coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    bad_li.coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    got = {
        r["check_name"]: r["n_violations"]
        for r in QUERIES["dq_check_suite"].fn(spark, sf).collect()
    }
    assert got["orders_pk_unique"] == 1
    assert got["orders_custkey_not_null"] == 1
    assert got["orders_status_domain"] == 1
    assert got["lineitem_qty_range"] == 1
    assert got["lineitem_price_positive"] == 1
    assert got["lineitem_fk_orders"] == 1


def test_incremental_merge_covers_every_user_once(spark, oracle_sf_dir):
    out = QUERIES["incremental_agg_merge"].fn(spark, oracle_sf_dir)
    ev = load_table(spark, oracle_sf_dir, "events")
    assert out.count() == ev.select("user_id").distinct().count()
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()


def test_pagerank_mass_and_structure(spark, oracle_sf_dir):
    """Rank mass sums to 1 (teleport + dangling redistribution conserve
    it), every rank >= the teleport floor, and rank is non-uniform on a
    non-regular graph."""
    rows = QUERIES["graph_pagerank"].fn(spark, oracle_sf_dir).collect()
    from etl_pipeline_old_spark.queries.quality_inc import PR_DAMPING

    n = len(rows)
    assert n > 1
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    floor = (1.0 - PR_DAMPING) / n
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    assert len({r["pagerank"] for r in rows}) > 1
