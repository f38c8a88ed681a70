"""Bench harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric":..., "value":..., "unit":"sec", "queries":{...}, "sf":...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "pipeline_logs",
    "j10_snowflake_chain",
    "window_argmax",
    "a4_groupby_sum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_fingerprint",
    "workdays_diff_sql",
    # r4 verdict #4 settlement: measured HERE (mid-suite, warm codegen) so
    # the number is comparable to its r1 baseline, which was recorded
    # mid-suite; the r2 move to suite-head put the session's one-time
    # window/shuffle codegen compile inside ITS measurement (r3 driver
    # 2.79s first-run vs 0.90s second-run, same session, identical plan:
    # one Exchange, two Window nodes, agg reuses the partitioning). The
    # cold number stays visible as sessionization_cold below.
    "sessionization",
    "stream_tumbling_window_counts",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders",
    "asof_join_last_signup",
    "range_join_neighbor_counts",
    "grouped_map_zscore",
    # iterative / stateful / end-to-end paths (r1 verdict #8): regressions in
    # connected components, the capstone corpus pipeline, ANN recall, and
    # stateful streaming must be visible round-over-round
    "dedup_clusters",
    "pipeline_training_corpus",
    "ann_lsh_recall_at_10",
    "stream_stateful_dedup",
    # r2 verdict #7: track the orchestrator path and the biggest-join TPC-H
    # shape round-over-round
    "run_full_pipeline",
    "tpch_q21_waiting_suppliers",
    # r3: the two heaviest new curation ops (intra-cluster pairwise;
    # two gram-bucket aggregates + broadcast)
    "dedup_semantic",
    "corpus_dsir_weights",
    # r3 second wave: iterative graph ranking, the corpus-wide LM scoring
    # join, and the CDC compaction single-shuffle path
    "graph_pagerank",
    "corpus_unigram_logprob",
    "cdc_changelog_compact",
    # r3 fourth wave: the gram-window span-dedup reconstruction path and
    # the incremental delta-vs-base LSH probe (corpus-refresh shape)
    "dedup_span_reconstruct",
    "dedup_incremental_probe",
    # r3 fifth wave: sketch-serving and the streaming corpus capstone
    "sketch_hll_partitioned_union",
    "pipeline_streaming_corpus",
    # r3 third wave: the partitioned-write+pruned-read layout path and the
    # four-table-join triangle graph — both dominated by real multi-stage
    # work, so perf drift is meaningful round-over-round
    "k7_partitioned_write_prune",
    "graph_triangle_count",
    # r3 final wave: the compressed-vector ANN path, the heaviest text-LM
    # scoring join, the CMS sketch build+probe, and the deterministic
    # prefix-filter similarity join (the exact counterpart to MinHash-LSH,
    # so their relative cost stays visible round-over-round)
    "ann_pq_binary_topk",
    "corpus_bigram_perplexity",
    "sketch_cms_event_counts",
    "dedup_prefix_filter_join",
    # r3 late wave: entity resolution end-to-end (blocking self-join +
    # scoring + iterative components + golden-record agg in one plan),
    # and the log-rounds CC beside min-label dedup_clusters so the two
    # algorithms' cost stays comparable round-over-round
    "er_golden_record",
    "dedup_clusters_star",
    # r4: C4-style line-level dedup (window-by-span + single doc-level
    # reassembly agg) and the BPE pair-count tokenizer inner loop
    # (vocabulary-sized explode)
    "dedup_line_level",
    "corpus_bpe_pair_counts",
    # r4: the RAG retrieval capstone (chunk -> embed -> LSH probe -> rerank)
    "pipeline_rag_retrieval",
    # r4: the incremental corpus-refresh capstone (delta-scaled work only)
    "pipeline_corpus_refresh",
    # r4 final wave: the statestore batch-reader inspection path (stream
    # drain + state scan) and the JL-projection recall harness (projection
    # + both brute-force searches)
    "state_store_inspect",
    "embed_projection_recall",
    # r4 final wave: the partitioned-write + runtime-pruned-read path
    # (dynamicpruningexpression in the fact scan) and the no-broadcast
    # shuffle join with an injected bloom runtime filter
    "k9_dpp_partitioned_join",
    "join_runtime_bloom_filter",
    # r4 (verdict task 2): the flagship scripts-notebook composition —
    # four broadcast joins + codegen scalar chain, zero fact shuffles
    # (plan-locked in tests/test_plans.py)
    "pipeline_scripts",
    # r5 (verdict task 3): the executed bucketed-bronze dedup path — band
    # the signatures, write the (band,bkey)-bucketed table, zero-Exchange
    # candidate self-join, verify. Its cost vs dedup_minhash_lsh above is
    # the materialize-the-index premium, tracked round-over-round.
    "dedup_bucketed_bronze",
    # r7: the multimodal ingest sentinel — executor-side staging of one
    # real PNG per document + binaryFile scan + Arrow-kernel decode (all
    # five color types, all five filters). Tracks the binary-blob ingest
    # path (file staging I/O + Arrow decode throughput) round-over-round.
    "multimodal_png_ingest",
    # r7: the web-corpus sentinel — .warc.gz shard staging via
    # applyInPandas, gzip-member record walk in an Arrow kernel, JVM
    # regexp HTML extraction, lang-ID, final groupBy. Tracks the
    # crawl-ingest path (container parse + regex-chain throughput)
    # round-over-round.
    "pipeline_web_corpus",
    # r8: the cross-modal sentinel — mixed-media WARC walk, four-codec
    # image decode + aHash in an Arrow kernel, broadcast URI join,
    # canonical-hash dedup. Tracks the LAION-shape pairing path.
    "pipeline_image_text_pairs",
    # r9: the LAION-scale variant — same corpus, but page bronze +
    # URI-bucketed pool table + merge joins, nothing broadcast. Tracks
    # the bucketed-pool write + zero-Exchange join path against its
    # broadcast sibling above.
    "pipeline_image_text_pairs_bucketed",
    # r9: the document-corpus sentinel — PDF staging, structural ISO
    # 32000 parse in an Arrow kernel, then the JVM-side lang-ID +
    # dedup-accounting pipeline into a two-phase distinct aggregate.
    # Tracks the document-ingest path (object/xref parse + inflate
    # throughput) round-over-round.
    "pipeline_document_corpus",
    # r10: the video-text sentinel — WebDataset tar shards, EBML probe +
    # VTT coverage + permille gate in ONE map-side Arrow kernel, clip
    # rows into the final per-(lang, codec) aggregate; nothing joins,
    # nothing broadcasts. Tracks the container+caption pairing path.
    "pipeline_video_text_pairs",
    # r11: the CID-PDF sentinel — Type0/Identity-H documents whose text
    # rides as 2-byte CID codes, recovered through the embedded
    # ToUnicode CMap (codespace-aware splitting + bfchar/bfrange maps).
    # Tracks the modern-PDF extraction path beside its simple-font
    # sibling pipeline_document_corpus above.
    "pipeline_pdf_cid_extract",
    # r11b: the encrypted-document sentinel — AESV2/AESV3 standard-
    # handler PDFs decrypted by the own FIPS-197 AES (R6's iterated
    # SHA-2 KDF lru_cached per worker). Tracks the decrypt-throughput
    # path; a cipher or cache regression shows up here first.
    "pipeline_pdf_aes_extract",
    # r11b: the OOXML sentinel — DOCX packages through the own ZIP
    # reader + ElementTree run reassembly. Tracks the office-document
    # ingest path beside the PDF sentinels.
    "pipeline_docx_extract",
    # r11b: the code-filter sentinel — pure-JVM higher-order-expression
    # quality signals over staged source files, zero Exchanges. The
    # archetypal 100 TB one-scan filter pass; a regression here means
    # Python or a shuffle crept into the hot path.
    "pipeline_code_corpus",
    # r11b: the heterogeneous-bucket sentinel — five document formats
    # through one extension-dispatched kernel, byte-exact each. Tracks
    # the whole document-ingest surface in one number.
    "pipeline_document_corpus_mixed",
    # r12: the modern-PDF sentinel — xref STREAMS + ObjStm packing +
    # /Prev incremental chains (the post-2005 default shape). Tracks
    # the compressed-cross-reference parse path beside its classic,
    # CID, and AES siblings above.
    "pipeline_pdf_xrefstream_extract",
    # r12: the lossless-WebP sentinel — the own VP8L entropy+transform
    # decode in a per-record Python kernel. Tracks the #2 crawl image
    # format's decode throughput; a codec regression shows up here.
    "multimodal_webp_lossless_ingest",
    # r12: the six-shape PDF capstone — one reader dispatching on
    # trailer form, font type, and security handler. Tracks the whole
    # PDF surface in one number beside pipeline_document_corpus_mixed.
    "pipeline_pdf_corpus_mixed",
    # r14: the own-stack parquet sentinel — the REAL snappy testdata
    # decoded end-to-end in pure Python (footer Thrift -> page headers
    # -> snappy -> PLAIN/dictionary), one range-read task per row
    # group. Tracks the lake-audit path's decode throughput.
    "lake_parquet_native_read",
    # r14: the ORC ingest sentinel — the second columnar format through
    # the own RLEv2/stripe codec, zlib/none/snappy shards. Tracks the
    # Hive-handover ingest path beside the parquet sentinel above.
    "multimodal_orc_ingest",
    # r14: the table-format sentinel — Iceberg manifest-tree resolution
    # (own Avro codec) + three snapshot scans with manifest-claim
    # cross-checks. Tracks the metadata-driven planning path.
    "lake_iceberg_time_travel",
    # r14b: the own-zstd sentinel — .tar.zst WebDataset shards through
    # the RFC 8878 decoder (libzstd frames one way, own raw frames the
    # other). Tracks the modern-corpus decompression path.
    "multimodal_zstd_shards_ingest",
    # r14b: the Delta sentinel — relational JSON-log replay with
    # per-version stats-vs-scan double checks. Tracks the second
    # table-format planning path beside Iceberg.
    "lake_delta_time_travel",
    # r14b: the codec-matrix sentinel — SNAPPY/GZIP/ZSTD/LZ4_RAW/
    # UNCOMPRESSED parquet files through the own stack in one query.
    # Tracks the whole own-codec decode surface in one number.
    "lake_parquet_codec_matrix",
]


def main() -> None:
    # environment signal: load BEFORE our own executors start — the 1-min
    # value is what the box was doing without us (r5 verdict #4); the
    # end-of-run stamp below is dominated by our own local[32] work
    load_start = os.getloadavg()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded
    from etl_pipeline_old_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("bench")
    # the core count is part of a record's identity (the driver benches at
    # more than one): stamp it, and never let a record at one count seed
    # med_vs_prev for a run at another (r14 — an 8-core local validation
    # run would otherwise silently become the 32-core round baseline).
    # $SPARK_GRAFT_CPUS is authoritative when set; otherwise stamp the
    # session's ACTUAL parallelism, not os.cpu_count() — a local[8] session
    # on a 32-core host must not stamp 32 (r14 ADVICE).
    cpus = int(
        os.environ.get("SPARK_GRAFT_CPUS", 0)
    ) or spark.sparkContext.defaultParallelism

    names = [n for n in HEADLINE if n in QUERIES]
    # warm the JVM/codegen path with a cheap NON-headline query so no
    # headline entry absorbs generic session-start cost
    QUERIES["p1_project"].fn(spark, sf_dir).count()
    # warm the Python/Arrow worker daemon too: it is session infrastructure
    # (like the JVM), and without this the first pandas-UDF query in the
    # suite pays the one-time daemon spawn inside ITS measurement
    # (grouped_map_zscore read 4.5s cold vs 1.6s warm at sf0.1)
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    # no type hints: `from __future__ import annotations` stringifies them,
    # which the pandas-UDF hint inference can't evaluate here
    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(32, numPartitions=32).select(_warm("id")).count()

    # warm the shuffle + window + aggregate codegen path: the FIRST
    # Exchange/Sort/Window query in a session pays ~1.5-2s of one-time
    # Janino compilation and shuffle-system init. sessionization is pinned
    # first-in-suite (r2 verdict #4), so without this warmup that session
    # cost lands inside ITS measurement — root cause of the r2/r3
    # "regression" (r3 driver 2.79s first-run vs 0.90s second-run in the
    # same session; plan audited: one Exchange, two Window nodes, no
    # re-shuffle before the agg). A 10k-row range query touches exactly
    # those generic codegen paths; it shares no data with any query.
    from pyspark.sql import Window as _W  # noqa: PLC0415
    from pyspark.sql import functions as _F  # noqa: PLC0415

    _wdf = spark.range(10_000, numPartitions=8).withColumn("g", _F.col("id") % 16)
    _w = _W.partitionBy("g").orderBy("id")
    (
        _wdf.select(
            "g",
            _F.lag("id").over(_w).alias("lagged"),
            _F.sum("id").over(_w.rowsBetween(_W.unboundedPreceding, 0)).alias("run"),
        )
        .groupBy("g")
        .count()
        .count()
    )

    # warm the streaming engine the same way: the first streaming query in
    # a session pays one-time costs (state-store/offset-log init, the
    # Python STREAMING DataSource worker path) that are session
    # infrastructure, not per-query work (pipeline_streaming_corpus read
    # ~20s cold vs ~5s warm at sf0.1). The feed is 32 one-row pages (r14;
    # previously one 2-row page): a 1-partition warm batch only spins up
    # ONE datasource worker, so the first streaming headline entry still
    # absorbed the other ~31 workers' ramp inside ITS measurement
    # (measured ~0.9 s of pipeline_streaming_corpus's first batch). Same
    # contract as the pandas-UDF warmup above, which already uses 32
    # partitions for exactly this reason.
    import shutil
    import tempfile

    from etl_pipeline_old_spark.sources import python_datasource

    python_datasource.register(spark)
    warm_dir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    try:
        spark.createDataFrame(
            [(i, "a") for i in range(32)], "doc_id long, text string"
        ).repartition(32).write.mode("overwrite").json(os.path.join(warm_dir, "feed"))
        wq = (
            spark.readStream.format("paged_json")
            .schema("doc_id long, text string")
            .option("path", os.path.join(warm_dir, "feed"))
            .load()
            .writeStream.foreachBatch(lambda df, _id: df.count())
            .option("checkpointLocation", os.path.join(warm_dir, "chk"))
            .start()
        )
        try:
            wq.processAllAvailable()
        finally:
            wq.stop()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    # r11 verdict #6: the media sentinels used to fold one-time fixture
    # construction (staging one rendered/encrypted file per document —
    # e.g. AES-encrypting 5,000 PDFs) into their headline numbers, so the
    # suite's most expensive entry mostly measured fixture writes
    # (pipeline_pdf_aes_extract 9.9-10.7s first-run vs ~1.9s steady per
    # the scale probe). Staging is marker-idempotent per process
    # (_stage_media_files), so pre-running each such sentinel ONCE here
    # makes the timed loop below measure the RECURRING plan — the number
    # that tracks scale — while the one-time cost stays visible in the
    # full record as components["staging"]. r12 resets these entries'
    # history to steady state (noted in BENCH_WATCH.md).
    PRESTAGE = [
        "multimodal_png_ingest",
        "pipeline_web_corpus",
        "pipeline_image_text_pairs",
        "pipeline_image_text_pairs_bucketed",
        "pipeline_document_corpus",
        "pipeline_video_text_pairs",
        "pipeline_pdf_cid_extract",
        "pipeline_pdf_aes_extract",
        "pipeline_docx_extract",
        "pipeline_code_corpus",
        "pipeline_document_corpus_mixed",
        "pipeline_pdf_xrefstream_extract",
        "multimodal_webp_lossless_ingest",
        "pipeline_pdf_corpus_mixed",
        # r14 lake sentinels: staging = ORC shard writes / Iceberg
        # table commits (the parquet sentinel reads the testdata as-is)
        "multimodal_orc_ingest",
        "lake_iceberg_time_travel",
        "multimodal_zstd_shards_ingest",
        "lake_delta_time_travel",
        "lake_parquet_codec_matrix",
    ]
    staging: dict[str, float] = {}
    for name in PRESTAGE:
        if name in QUERIES:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            staging[name] = round(time.perf_counter() - t0, 2)
    print("bench staging (first-run incl. fixture construction): "
          + json.dumps(staging, sort_keys=True), file=sys.stderr)

    timings: dict[str, float] = {}
    t_total = time.perf_counter()
    # cold-start probe (r3 verdict #2/#4): the same sessionization plan,
    # executed FIRST, so the per-query compile + first-shuffle cost stays
    # visible round-over-round under its own name while the tracked
    # "sessionization" entry below measures warm, r1-comparable work
    t0 = time.perf_counter()
    QUERIES["sessionization"].fn(spark, sf_dir).count()
    timings["sessionization_cold"] = round(time.perf_counter() - t0, 3)
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.count()  # full execution, no result transfer to driver
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_total, 3)

    # per-dataset attribution for the orchestrator entry (r4 verdict #4):
    # stderr, so stdout keeps the one-JSON-line contract. Datasets build in
    # parallel threads, so these overlap — they attribute the ratio to a
    # sink, they don't sum to the run_full_pipeline wall time.
    from etl_pipeline_old_spark.plans.orchestrator import LAST_TIMINGS

    if "run_full_pipeline" in timings and LAST_TIMINGS:
        print(
            "run_full_pipeline datasets (overlapping thread seconds): "
            + json.dumps(LAST_TIMINGS, sort_keys=True),
            file=sys.stderr,
        )

    # Host-load context (r5 verdict #4): this box carries EXTERNAL load
    # (loadavg ~5 observed with nothing of ours running), which uniformly
    # inflates timings ~1.1-1.3x. loadavg_start (captured before the
    # session came up) is the clean environment signal; this end-of-run
    # stamp is dominated by our own executors but its 5/15-min horizons
    # bound what the box carried during the run. Together with uptime
    # they let BENCH_WATCH.md separate environment drift from plan
    # regressions without a side-channel.
    # component attribution for the corpus-refresh capstone (r6 verdict
    # #3): its headline number folds a one-time bronze-index build into
    # the recurring refresh cost; the components make the amortized
    # (probe-only) number visible without a side-channel.
    from etl_pipeline_old_spark.queries import extras4

    components = (
        {"pipeline_corpus_refresh": dict(extras4.LAST_TIMINGS)}
        if "pipeline_corpus_refresh" in timings and extras4.LAST_TIMINGS
        else {}
    )
    if staging:
        components["staging"] = staging

    load1, load5, load15 = os.getloadavg()
    try:
        with open("/proc/uptime") as fh:
            uptime_s = float(fh.read().split()[0])
    except OSError:
        uptime_s = None
    # The driver wrapper keeps only the LAST ~2000 bytes of stdout. The
    # r7-era defense (compact separators, metadata-drops-first) stopped
    # working at r11: 76 timing entries alone exceed the cap, so
    # BENCH_r11.json came back parsed:null (r11 verdict #2). New contract:
    # stdout ends with a COMPACT line that is always under the cap — suite
    # wall, environment, the top-N slowest timings, and a median-vs-prev
    # ratio — while the FULL per-query dict goes to (a) stderr, (b)
    # BENCH_FULL_LAST.json at the repo root, and (c) an append-only
    # BENCH_HISTORY.jsonl so round-over-round per-query adjudication
    # (tools/bench_delta.py) keeps its complete history.
    root = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(root, "BENCH_FULL_LAST.json")

    # median ratio vs the PREVIOUS full record (common keys), computed
    # before we overwrite it — the one-number round-over-round signal the
    # driver record keeps even though it no longer carries every timing.
    med_vs_prev = None
    try:
        with open(full_path, encoding="utf-8") as fh:
            prev = json.load(fh)
        # only comparable at the same scale factor AND core count (a local
        # sf0.001 smoke run or an 8-core scaling probe must not poison the
        # driver's sf0.1/full-core round-over-round signal). Records from
        # before the cpus stamp carry None and are treated as INCOMPARABLE:
        # one transition round without a med_vs_prev beats seeding it from
        # a record at an unknown core count (r14 ADVICE).
        prev_q = (
            prev.get("queries", {})
            if prev.get("sf") == sf and prev.get("cpus") == cpus
            else {}
        )
        ratios = sorted(
            timings[k] / prev_q[k]
            for k in timings
            if k in prev_q and prev_q[k] and prev_q[k] > 0
        )
        if ratios:
            med_vs_prev = round(ratios[len(ratios) // 2], 2)
    except (OSError, ValueError, KeyError):
        pass

    full_doc = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "n_headline": len(names),
        "loadavg_start": [round(v, 2) for v in load_start],
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        "uptime_s": round(uptime_s) if uptime_s is not None else None,
        "components": components,
        "med_vs_prev": med_vs_prev,
        "queries": timings,
    }
    print("bench full: " + json.dumps(full_doc), file=sys.stderr)
    try:
        with open(full_path, "w", encoding="utf-8") as fh:
            json.dump(full_doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
        with open(os.path.join(root, "BENCH_HISTORY.jsonl"), "a",
                  encoding="utf-8") as fh:
            fh.write(json.dumps({**full_doc, "ts": round(time.time())},
                                separators=(",", ":")) + "\n")
    except OSError as exc:  # read-only checkout: stderr copy still has it
        print(f"bench full file write failed: {exc}", file=sys.stderr)

    doc = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        # n_headline counts suite entries; "queries" below is as many of
        # them as fit under the driver's ~2000-byte stdout tail cap,
        # slowest first — a strict superset of the old top-10 (additions
        # only). r14 verdict #2: with only the top-10 visible, the driver's
        # cross-core scaling probe could sample nothing but job-overhead-
        # bound dedup/graph entries and concluded the core count was
        # ignored; filling the line to the cap (~50+ entries, everything
        # over ~0.5 s, i.e. every CPU-bound kernel) makes that probe
        # representative. Full dict: BENCH_FULL_LAST.json/stderr; rest_s
        # is the summed wall of the entries that did not fit.
        "n_headline": len(names),
        "loadavg_start": [round(v, 1) for v in load_start],
        "loadavg": [round(load1, 1), round(load5, 1), round(load15, 1)],
        "uptime_s": round(uptime_s) if uptime_s is not None else None,
        "med_vs_prev": med_vs_prev,
        "rest_s": 0.0,
        "full": "BENCH_FULL_LAST.json",
        "queries": {},
    }
    shown: dict[str, float] = {}
    doc["queries"] = shown
    for q in sorted(timings, key=lambda q: timings[q], reverse=True):
        shown[q] = round(timings[q], 2)
        doc["rest_s"] = round(sum(v for k, v in timings.items() if k not in shown), 2)
        if len(json.dumps(doc, separators=(",", ":"))) > 1870:
            # over the cap: drop this entry and keep trying the faster ones
            # (names vary in length, so a shorter-named entry may still fit)
            del shown[q]
    doc["rest_s"] = round(sum(v for k, v in timings.items() if k not in shown), 2)
    line = json.dumps(doc, separators=(",", ":"))
    # safety net: the fill loop keeps the line under the cap by
    # construction, but if a future edit inflates the fixed fields the
    # shrink order still protects the timings.
    for drop in ("full", "uptime_s", "loadavg", "med_vs_prev", "loadavg_start"):
        if len(line) <= 1900:
            break
        print(f"bench line over tail cap; {drop} -> stderr only", file=sys.stderr)
        doc.pop(drop, None)
        line = json.dumps(doc, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
