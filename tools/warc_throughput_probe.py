"""WARC ingest throughput probe: shard-size sensitivity of the crawl
ingest path (r7 web-corpus family).

The 100 TB question for a container-format ingest is whether throughput
is governed by total bytes (good — the decode streams) or by per-file
constants (bad — small shards would dominate at fleet scale, and CC-size
1 GiB shards would starve parallelism). This probe stages the SAME sf0.1
corpus at three shards-per-file granularities, runs the full parse +
HTML-extraction pipeline over each (after a warmup pass so Python worker
startup and codegen don't land on the first measured row), and reports
wall + MB/s. Measured shape: per-file constants dominate at tiny shards
and amortize away as shards grow — the quantified case for compacting
crawl output before ingest.

Writes a marker block into SCALE_PROBE.md that tools/scale_probe.py
preserves when it regenerates the file. Run standalone, idle, never
concurrently with bench/scale measurements.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARK_START = "<!-- warc-throughput:start -->"
MARK_END = "<!-- warc-throughput:end -->"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GRANULARITIES = (10, 25, 100)  # docs per shard


def _upsert_block(block: str) -> None:
    path = "SCALE_PROBE.md"
    text = open(path, encoding="utf-8").read() if os.path.exists(path) else ""
    if MARK_START in text and MARK_END in text:
        pre = text[: text.index(MARK_START)]
        post = text[text.index(MARK_END) + len(MARK_END) :]
        text = pre + MARK_START + "\n" + block + "\n" + MARK_END + post
    else:
        text = text.rstrip("\n") + "\n\n" + MARK_START + "\n" + block + "\n" + MARK_END + "\n"
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


def main() -> None:
    from pyspark.sql import functions as F

    from etl_pipeline_old_spark.queries import web_corpus as wc
    from etl_pipeline_old_spark.session import get_spark

    spark = get_spark("warc-throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    orig = wc._WARC_DOCS_PER_SHARD
    try:
        # warmup: stage + ingest once so Python worker startup and codegen
        # compile are paid before any measured row
        wc._WARC_DOCS_PER_SHARD = 50
        warm = wc._stage_shard_files(
            spark, SF_DIR, "warc_probe_warm", wc._build_clean_shard
        )
        wc._parse_warc_frame(
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.warc.gz")
            .load(warm)
            .select("content")
        ).agg(F.count("*")).collect()

        for n in GRANULARITIES:
            wc._WARC_DOCS_PER_SHARD = n
            t0 = time.monotonic()
            path = wc._stage_shard_files(
                spark, SF_DIR, f"warc_probe_{n}", wc._build_clean_shard
            )
            stage_s = time.monotonic() - t0
            n_files, n_bytes = 0, 0
            for fn in os.listdir(path):
                if fn.endswith(".warc.gz"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(path, fn))
            bf = (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.warc.gz")
                .load(path)
                .select("content")
            )
            t0 = time.monotonic()
            out = wc._parse_warc_frame(bf).agg(
                F.count("*").alias("docs"),
                F.sum(F.length("extracted")).alias("chars"),
            ).collect()[0]
            ingest_s = time.monotonic() - t0
            mbs = n_bytes / 1e6 / ingest_s
            rows.append((n, n_files, n_bytes, stage_s, ingest_s, mbs, out.docs))
            print(
                f"docs/shard={n}: {n_files} files, {n_bytes/1e6:.1f} MB, "
                f"stage {stage_s:.1f}s, ingest {ingest_s:.1f}s, {mbs:.1f} MB/s, "
                f"{out.docs} docs"
            )
    finally:
        wc._WARC_DOCS_PER_SHARD = orig

    load1 = os.getloadavg()[0]
    block = "\n".join(
        [
            "",
            "## WARC ingest throughput vs shard granularity (r7 web family)",
            "",
            f"`tools/warc_throughput_probe.py`: the sf0.1 corpus ({rows[0][6]} "
            "docs) staged as real .warc.gz shards at three docs-per-shard "
            "granularities, then the FULL ingest (gzip member walk, record "
            "parse, JVM HTML extraction) timed over each. "
            f"Start load {load1:.2f}.",
            "",
            "| docs/shard | files | staged MB | stage wall | ingest wall | MB/s |",
            "|---|---|---|---|---|---|",
        ]
        + [
            f"| {n} | {nf} | {nb/1e6:.1f} | {ss:.1f}s | {ing:.1f}s | {mbs:.1f} |"
            for n, nf, nb, ss, ing, mbs, _ in rows
        ]
        + [
            "",
            "Reading: at tiny shards the per-FILE constant (file open, gzip "
            "stream init, one listing entry, one Arrow row per blob) "
            "dominates — throughput climbs as shards grow and the constant "
            "amortizes, flattening toward the decode-bound ceiling. This is "
            "exactly why Common Crawl ships ~1 GiB shards: big enough that "
            "bytes govern, while binaryFile's file-granular splits (one "
            "shard per task minimum) still feed a 1000-executor fleet from "
            "~90k shards/crawl. Operational rule the numbers support: "
            "compact crawl output to >=100 docs/shard before ingest; never "
            "ingest per-page files.",
        ]
    )
    _upsert_block(block)
    print("SCALE_PROBE.md block updated")
    spark.stop()


if __name__ == "__main__":
    main()
