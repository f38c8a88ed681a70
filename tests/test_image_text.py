"""Cross-modal (image, text) pair capstone tests: the typed WARC walk
routes mixed media by content type, dead links drop out of the pair
corpus, pixel-identical images under different URIs collapse via the
average hash, and the plan broadcasts the image pool with no cartesian
product. Value parity vs DuckDB is covered by test_oracle_parity."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_pipeline_old_spark.operators.warc import (
    encode_warc_shard,
    iter_warc_responses_typed,
)
from etl_pipeline_old_spark.queries.image_text import (
    _IMG_CONTENT_MOD,
    _IMG_POOL,
    _pair_imgs_frame,
    _stage_pair_warc_shards,
    pipeline_image_text_pairs,
)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_typed_walk_routes_mixed_media():
    shard = encode_warc_shard(
        [
            ("https://e.com/articles/1", b"<html>page</html>", 200),
            ("https://img.e.com/a.png", b"\x89PNGfake", 200, "image/png"),
            ("https://img.e.com/b.gif", b"<html>gone</html>", 404),
        ],
        shard_id=3,
    )
    out = list(iter_warc_responses_typed(shard))
    assert out == [
        ("https://e.com/articles/1", 200, "text/html", b"<html>page</html>"),
        ("https://img.e.com/a.png", 200, "image/png", b"\x89PNGfake"),
        ("https://img.e.com/b.gif", 404, "text/html", b"<html>gone</html>"),
    ]


def test_image_pool_dead_links_absent_and_content_dups_collide(spark, sf_dir):
    path = _stage_pair_warc_shards(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("content")
    )
    imgs = {r["uri"]: r["ahash"] for r in _pair_imgs_frame(bf).collect()}
    iids = sorted(int(u.rsplit("/", 1)[1].split(".")[0]) for u in imgs)
    # dead slots (iid % 13 == 5) were staged as 404s: the image branch
    # must not surface them
    assert all(iid % 13 != 5 for iid in iids)
    # slots iid and iid+_IMG_CONTENT_MOD share pixel content under
    # different URIs: their REAL decoded rasters must hash identically
    # (this is what the aHash dedup collapses), while slots with
    # different content keys must not all collide
    by_iid = {
        int(u.rsplit("/", 1)[1].split(".")[0]): h for u, h in imgs.items()
    }
    twins = [
        (i, i + _IMG_CONTENT_MOD)
        for i in range(_IMG_CONTENT_MOD)
        if i in by_iid and i + _IMG_CONTENT_MOD in by_iid
    ]
    assert twins, "fixture must contain at least one content twin"
    assert all(by_iid[a] == by_iid[b] for a, b in twins)
    assert len(set(by_iid.values())) > 1


def test_pairs_output_shows_dedup_and_dead_link_effects(spark, sf_dir):
    rows = pipeline_image_text_pairs(spark, sf_dir).collect()
    assert rows
    # the canonical table collapses content twins: somewhere the corpus
    # must hold more distinct URIs than distinct hashes
    assert any(r["n_images"] > r["n_unique_images"] for r in rows)
    # every pair counts at most once per page-image reference and the
    # caption always carries the ' #k' figure token
    total_pairs = sum(r["n_pairs"] for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_refs = docs.select(
        F.sum(1 + F.col("doc_id") % 2).alias("n")
    ).collect()[0]["n"]
    # dead links (iid % 13 == 5) must make pairs strictly fewer than
    # page-image references
    assert 0 < total_pairs < n_refs


def test_pairs_plan_broadcasts_pool_no_cartesian(spark, sf_dir):
    plan = _plan_of(pipeline_image_text_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    import re

    # formatted plans print each node in the tree AND the detail section;
    # count the numbered detail headers only
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2
    # no row-at-a-time Python: the only Python is the Arrow kernels
    assert "BatchEvalPython" not in plan


def test_bucketed_pairs_plan_never_broadcasts_and_equals_capstone(spark, sf_dir):
    """The LAION-scale variant's plan lock (r8 verdict #1): the image
    pool grows linearly with the crawl, so NOTHING in this plan may be
    broadcast — the bronze-pool join must be a merge join whose pool
    side reads the URI-bucketed scan with no Exchange, the canonical
    table joins shuffle-side, and the output must equal the broadcast
    capstone row-for-row."""
    import re

    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.queries.image_text import (
        POOL_BUCKETS,
        _pair_pages_frame,
        pipeline_image_text_pairs_bucketed,
    )
    from etl_pipeline_old_spark.workdir import table_name

    # value equality vs the broadcast capstone (same oracle, same rows)
    base = sorted(
        tuple(r) for r in pipeline_image_text_pairs(spark, sf_dir).collect()
    )
    bucketed = sorted(
        tuple(r)
        for r in pipeline_image_text_pairs_bucketed(spark, sf_dir).collect()
    )
    assert bucketed == base

    # plan lock on the pre-materialization join tree (the query itself
    # returns an eager localCheckpoint, which hides the join plan)
    path = _stage_pair_warc_shards(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("content")
    )
    bronze = (
        _pair_pages_frame(bf)
        .groupBy("lang", F.col("img_uri").alias("uri"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.size(F.split("caption", " "))).alias("cap_words"),
        )
    )
    t = table_name("img_pool_plan_lock")
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (
            _pair_imgs_frame(bf)
            .repartition(POOL_BUCKETS, "uri")
            .write.mode("overwrite")
            .bucketBy(POOL_BUCKETS, "uri")
            .sortBy("uri")
            .saveAsTable(t)
        )
        pool = spark.table(t)
        canon = pool.groupBy("ahash").agg(F.min("uri").alias("canon_uri"))
        joined = bronze.join(pool.hint("merge"), "uri").join(
            canon.hint("merge"), "ahash"
        )
        out = joined.groupBy("lang", "fmt").agg(F.sum("n").alias("n_pairs"))
        plan = _plan_of(out)
        assert "BroadcastHashJoin" not in plan  # nothing broadcast, ever
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 2
        # the pool side of the uri join reads the bucketed layout (only a
        # pool scan can be bucketed here; Spark >= 3.3 would print
        # 'Bucketed: false (disabled by query planner)' if the bucket set
        # didn't cover the join keys)
        assert "Bucketed: true" in plan
        assert "BatchEvalPython" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_pairs_hash_equals_batch(spark, sf_dir):
    """The streaming ingest must accumulate to EXACTLY the batch result
    under micro-batching (per-shard record independence makes this
    exact for any trigger size)."""
    from etl_pipeline_old_spark.queries.image_text import (
        stream_image_text_pairs,
    )

    batch = sorted(
        tuple(r) for r in pipeline_image_text_pairs(spark, sf_dir).collect()
    )
    streamed = sorted(
        tuple(r) for r in stream_image_text_pairs(spark, sf_dir).collect()
    )
    assert streamed == batch


def test_stream_stream_join_hash_equals_batch(spark, sf_dir):
    """The genuine two-feed stream-stream join (out-of-order arrival,
    watermarks covering the disorder bound, sentinel-closed left outer)
    must drain to EXACTLY the batch capstone stats — late images matched
    waiting captions, dead-link candidates emitted null-padded and were
    filtered batch-side."""
    from etl_pipeline_old_spark.queries.image_text import (
        stream_image_text_join,
    )

    batch = sorted(
        tuple(r) for r in pipeline_image_text_pairs(spark, sf_dir).collect()
    )
    streamed = sorted(
        tuple(r) for r in stream_image_text_join(spark, sf_dir).collect()
    )
    assert streamed == batch


def test_near_dedup_finds_perturbed_twins_only(spark, sf_dir):
    """Every near-dup pair must link content twins (slots 20 apart in
    the pool), at least one pair must have Hamming > 0 (the case exact
    dedup cannot catch), and unrelated images (different content keys,
    ~32-bit expected distance) must never pair."""
    from etl_pipeline_old_spark.queries.image_text import (
        _IMG_CONTENT_MOD,
        image_text_near_dedup,
    )

    rows = image_text_near_dedup(spark, sf_dir).collect()
    assert rows

    def iid(uri: str) -> int:
        return int(uri.rsplit("/", 1)[1].split(".")[0])

    for r in rows:
        a, b = iid(r["uri_a"]), iid(r["uri_b"])
        assert abs(a - b) == _IMG_CONTENT_MOD, (a, b)
        assert 0 <= r["hamming"] <= 3
        assert r["n_captions_a"] > 0 and r["n_captions_b"] > 0
    assert any(r["hamming"] > 0 for r in rows)


def test_quarantine_keeps_healthy_pairs_and_isolates_torn(spark, sf_dir):
    """One header-corrupted image must cost exactly its own pairs: the
    quarantine output accounts healthy and torn slots per format, every
    format retains healthy slots, and pairs lost stay a strict subset
    of the corpus."""
    from etl_pipeline_old_spark.queries.image_text import (
        image_text_ingest_quarantine,
    )

    rows = {r["ext"]: r for r in image_text_ingest_quarantine(
        spark, sf_dir
    ).collect()}
    assert set(rows) == {"png", "gif", "bmp", "tiff"}
    assert all(r["n_ok"] > 0 for r in rows.values())
    assert sum(r["n_corrupt"] for r in rows.values()) > 0
    for r in rows.values():
        if r["n_corrupt"] == 0:
            assert r["n_pairs_lost"] == 0
        else:
            assert r["n_pairs_lost"] > 0


def test_incremental_split_is_nondegenerate(spark, sf_dir):
    """The base/delta file split must leave BOTH sides non-empty (a
    degenerate split would make merge == recompute vacuous); the merged
    result must equal the batch capstone row-for-row."""
    import os

    from etl_pipeline_old_spark.queries.image_text import (
        _stage_pair_warc_shards,
        pipeline_image_text_pairs_incremental,
    )

    feed = _stage_pair_warc_shards(spark, sf_dir)
    files = sorted(f for f in os.listdir(feed) if f.endswith(".warc.gz"))
    base = [f for f in files if int(f.split(".")[0]) % 5 != 4]
    delta = [f for f in files if int(f.split(".")[0]) % 5 == 4]
    assert base and delta

    merged = sorted(
        tuple(r)
        for r in pipeline_image_text_pairs_incremental(spark, sf_dir).collect()
    )
    full = sorted(
        tuple(r) for r in pipeline_image_text_pairs(spark, sf_dir).collect()
    )
    assert merged == full


def test_family_plans_no_cartesian_no_row_python(spark, sf_dir):
    """Every cross-modal family member must stay candidate-bounded (no
    cartesian/nested-loop joins) and keep Python inside Arrow kernels
    (no row-at-a-time BatchEvalPython)."""
    from etl_pipeline_old_spark.queries.image_text import (
        image_text_ingest_quarantine,
        image_text_near_dedup,
        multimodal_webdataset_export,
        pipeline_image_text_pairs_incremental,
    )

    for fn in (
        image_text_near_dedup,
        image_text_ingest_quarantine,
        pipeline_image_text_pairs_incremental,
        multimodal_webdataset_export,
    ):
        plan = _plan_of(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__


def test_incremental_merge_joins_all_shuffle_side(spark, sf_dir):
    """r8 verdict #1 + r9 verdict #3 follow-through: EVERY join in the
    incremental refresh must be shuffle-side — the merge's canonical
    join (crawl-growing canon table) AND the per-dump partials' pool
    joins. A real Common Crawl dump is ~3B fetches, so 'one dump's
    pool is broadcastable' only holds if the ingest unit is a small
    slice — the shuffle shape is safe regardless of dump sizing."""
    from etl_pipeline_old_spark.queries.image_text import (
        pipeline_image_text_pairs_incremental,
    )

    plan = _plan_of(pipeline_image_text_pairs_incremental(spark, sf_dir))
    assert "SortMergeJoin" in plan  # canon + partial-pool joins, merge-hinted
    assert "BroadcastHashJoin" not in plan  # nothing crawl- or dump-sized
