"""Memory-pressure probe for the heavy dedup family (r6 verdict #6) plus
the binary-ingest families (r7 verdict #6: PNG decode over large binary
Arrow rows, WARC shard blobs held per batch — pressure shapes the dedup
sort/agg state never exercises).

The 128 GiB sandbox never pressures local mode; a 100 TB cluster will. This
probe runs the heaviest queries under a deliberately SMALL session —
``spark.driver.memory=2g`` (which in local mode is the entire heap every
task thread shares) with ``spark.sql.shuffle.partitions`` raised so
per-partition state stays spillable — against the sf0.1 documents table
inflated k=4, and records wall time plus the executor spill metrics from
Spark's status REST API. The claim under test: the plans DEGRADE TO SPILL,
never OOM. An OOM here is a finding to fix with persist-level or
partitioning changes, not an environment excuse.

Results are written into SCALE_PROBE.md between the memory-pressure
markers; tools/scale_probe.py preserves that block when it regenerates the
rest of the file.

Run: python tools/memory_pressure_probe.py   (takes a few minutes)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY_QUERIES = (
    "dedup_prefix_filter_join",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "pipeline_corpus_refresh",
    # r7 verdict #6: the two new heavy families pressure memory
    # differently — large BINARY rows inside Arrow batches (one real PNG
    # per doc through the decode kernel) and whole gzip shard blobs held
    # per batch during the WARC record walk — not sort/agg state
    "multimodal_png_ingest",
    "pipeline_web_corpus",
    # r8 verdict #1: the LAION-scale cross-modal plan — bucketed pool
    # join + shuffle-side canon, nothing broadcast; under a small heap
    # the mixed-media decode batches and the SMJ sorts are the pressure
    "pipeline_image_text_pairs_bucketed",
    # r9: the document-corpus capstone — whole-PDF blobs held per Arrow
    # batch through the structural parse, then the distinct-norm
    # aggregate carrying full normalized texts as keys (the widest agg
    # state in the repo)
    "pipeline_document_corpus",
)
K = 4
DRIVER_MEM = "2g"
CPUS = 16
SHUFFLE_PARTS = 128

MARK_START = "<!-- memory-pressure:start -->"
MARK_END = "<!-- memory-pressure:end -->"


def spill_totals(ui_url: str, app_id: str) -> tuple[int, int]:
    """Sum (memoryBytesSpilled, diskBytesSpilled) over all completed
    stages via the public status REST API."""
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def human(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n}"


def splice_block(block: str) -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_PROBE.md")
    text = open(path, encoding="utf-8").read() if os.path.exists(path) else ""
    if MARK_START in text and MARK_END in text:
        pre = text[: text.index(MARK_START)]
        post = text[text.index(MARK_END) + len(MARK_END) :]
        text = pre + MARK_START + "\n" + block + "\n" + MARK_END + post
    else:
        text = text.rstrip("\n") + "\n\n" + MARK_START + "\n" + block + "\n" + MARK_END + "\n"
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def main() -> int:
    from pyspark.sql import SparkSession

    from tools.scale_probe import ID_OFFSET

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.sql.shuffle.partitions", str(SHUFFLE_PARTS))
        .config("spark.ui.enabled", "true")  # the status REST API is the spill source
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.catalog import load_table
    from etl_pipeline_old_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()

    # stage the inflated corpus as an on-disk sf-dir (all documents columns
    # kept: the quality gate reads lang/n_chars metadata too)
    stage = tempfile.mkdtemp(prefix="mem_pressure_sf_")
    try:
        d = load_table(spark, sf_dir, "documents")
        copies = [
            d.select(
                (F.col("doc_id") + i * ID_OFFSET).alias("doc_id"),
                F.concat_ws(" ", "text", F.lit(f"copytoken{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(K)
        ]
        infl = copies[0]
        for c in copies[1:]:
            infl = infl.unionByName(c)
        infl.write.mode("overwrite").parquet(os.path.join(stage, "documents.parquet"))
        n_docs = spark.read.parquet(os.path.join(stage, "documents.parquet")).count()
        print(f"staged k={K} corpus: {n_docs} docs, heap {DRIVER_MEM}, "
              f"local[{CPUS}], shuffle.partitions={SHUFFLE_PARTS}", flush=True)

        rows = []
        oom = []
        for name in HEAVY_QUERIES:
            m0, d0 = spill_totals(ui_url, app_id)
            t0 = time.perf_counter()
            try:
                n = QUERIES[name].fn(spark, stage).count()
                wall = time.perf_counter() - t0
                m1, d1 = spill_totals(ui_url, app_id)
                rows.append((name, n, wall, m1 - m0, d1 - d0))
                print(
                    f"{name}: rows={n} wall={wall:.1f}s "
                    f"spill mem={human(m1 - m0)} disk={human(d1 - d0)}",
                    flush=True,
                )
            except Exception as ex:  # noqa: BLE001 — an OOM IS the finding
                oom.append((name, str(ex).splitlines()[0][:200]))
                print(f"{name}: FAILED {oom[-1][1]}", flush=True)

        block_lines = [
            "",
            "## Memory-pressure probe: heavy dedup + binary ingest under a 2 GiB heap (r6 #6, r7 #6)",
            "",
            f"`tools/memory_pressure_probe.py`: sf0.1 documents inflated k={K} "
            f"({n_docs} docs), session `local[{CPUS}]` with "
            f"`spark.driver.memory={DRIVER_MEM}` (the ENTIRE heap all task "
            f"threads share in local mode — 64x less than the sandbox default) "
            f"and `spark.sql.shuffle.partitions={SHUFFLE_PARTS}` so "
            "per-partition sort/agg state stays spillable. Spill totals are "
            "per-query deltas of the status-store stage metrics.",
            "",
            "| query | rows | wall | memoryBytesSpilled | diskBytesSpilled |",
            "|---|---|---|---|---|",
            *[
                f"| {n} | {r} | {w:.1f}s | {human(ms)} | {human(ds)} |"
                for n, r, w, ms, ds in rows
            ],
        ]
        if oom:
            block_lines += [
                "",
                "**FAILURES (findings to fix):**",
                *[f"- {n}: {e}" for n, e in oom],
            ]
        else:
            total_spill = sum(ms + ds for *_, ms, ds in rows)
            block_lines += [
                "",
                f"All {len(rows)} completed without OOM — the "
                "plans degrade gracefully under a 64x-smaller heap"
                + (
                    f", spilling {human(total_spill)} across the suite"
                    if total_spill
                    else ", without even needing to spill (external sorters "
                    "stayed under their per-thread budgets at this scale; "
                    "the raised partition count keeps each sorter's slice "
                    "bounded, which is the property that matters at 100 TB)"
                )
                + ". Walls are NOT comparable to the bench numbers (different "
                "heap, CPU count, and partitioning).",
            ]
        splice_block("\n".join(block_lines))
        print("SCALE_PROBE.md memory-pressure block updated")
        return 1 if oom else 0
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
