"""Run EVERY registry query under a driver-shaped hostile session.

The external verify driver builds its own SparkSession (unknown confs —
exercised here as ANSI-on + non-UTC timezone) and calls the
__spark_entry__ surface. This sweep is the pre-flight for the driver's
CORRECTNESS pass: it proves each query at least EXECUTES under a foreign
session (the parity suite checks values, but with the repo's own session).

Run: python tools/hostile_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
     python tools/hostile_sweep.py --repeat [sf_dir]
       runs only the disk-touching queries (warehouse / checkpoint /
       cache_root writers), TWICE back-to-back in one session, and
       asserts the two result hashes are identical — catching scratch-dir
       leakage and non-idempotent staging that a single pass hides
       (r6 verdict #5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every registry query that writes to disk (staged lakes, saveAsTable
# warehouses, streaming checkpoints, JDBC databases, staged image files)
# before reading its answer back. Each must be IDEMPOTENT: a second
# invocation in the same session must return byte-identical values, or
# an operator re-running a failed pipeline stage gets silently different
# answers.
REPEAT_QUERIES = (
    # erasure pair + DV compaction + small-file compaction (staged lakes)
    "layout_erasure_cow",
    "layout_erasure_dv",
    "layout_dv_compaction",
    "layout_compaction_execute",
    # bronze pair + the capstone that routes through the bronze index
    "dedup_bucketed_bronze",
    "dedup_bronze_delta_probe",
    "pipeline_corpus_refresh",
    # JDBC roundtrips (Derby database under cache_root)
    "s4_jdbc_roundtrip",
    "s6_jdbc_parallel_pull",
    # streaming checkpoint/restart paths
    "stream_restart_resume",
    # partitioned/bucketed lake writers
    "k7_partitioned_write_prune",
    "k8_dynamic_partition_overwrite",
    "k9_dpp_partitioned_join",
    "layout_bucketed_join",
    # format roundtrips + staged image files
    "s12_orc_roundtrip",
    "s13_xml_roundtrip",
    "multimodal_ppm_ingest",
    "multimodal_png_ingest",
    "stream_png_ingest",
    "multimodal_wav_ingest",
    "multimodal_audio_features",
    "multimodal_y4m_frames",
    "multimodal_ingest_quarantine",
    "layout_snapshot_log",
    "multimodal_jpeg_ingest",
    "multimodal_png_advanced",
    "multimodal_gif_bmp_ingest",
    "multimodal_tiff_ingest",
    "multimodal_g711_ingest",
    "warc_web_ingest",
    "pipeline_web_corpus",
    "warc_ingest_quarantine",
    "stream_warc_ingest",
    "multimodal_audio_resample",
    "multimodal_video_motion",
    "pipeline_web_corpus_incremental",
    # r8: cross-modal staged crawls + streaming targets + progressive JPEG
    "pipeline_image_text_pairs",
    "stream_image_text_pairs",
    "image_text_near_dedup",
    "image_text_ingest_quarantine",
    "pipeline_image_text_pairs_incremental",
    "multimodal_jpeg_progressive",
    "multimodal_webdataset_ingest",
    "multimodal_webdataset_export",
    "multimodal_adpcm_ingest",
    # r9: the LAION-scale bucketed variant (writes the pool table)
    "pipeline_image_text_pairs_bucketed",
    # r9: staged .flac media files
    "multimodal_flac_ingest",
    # r9: two staged streaming feeds + memory sink
    "stream_image_text_join",
    # r9: staged audio-text tar shards
    "multimodal_webdataset_audio",
    # r9: staged container/metadata surfaces (mp4, mp3, exif jpeg, ogg,
    # zip shards) — all marker-file idempotent media stagers
    "multimodal_mp4_probe",
    "multimodal_mp3_probe",
    "multimodal_exif_gps_scrub",
    "multimodal_ogg_probe",
    "multimodal_zip_shards",
    # r9: staged .pdf documents (+ the capstone sharing the staging)
    "pipeline_pdf_extract",
    "pipeline_document_corpus",
    # r9: staged .webm containers
    "multimodal_webm_probe",
    # r9: staged .vtt caption sidecars (+ the alignment join sharing
    # both stagings)
    "multimodal_vtt_captions",
    "multimodal_caption_coverage",
    # r9: the PDF operational trio (corrupt staging, stream target+chk,
    # shared pdf_files staging)
    "pdf_ingest_quarantine",
    "stream_pdf_ingest",
    "pipeline_document_corpus_incremental",
)


def repeat_mode(spark, sf_dir: str) -> int:
    """Run each disk-touching query twice in one session; fail on any
    hash drift between the passes."""
    import hashlib

    import __spark_entry__ as entry
    from tests.oracle_utils import _rowset

    qs = entry.queries()
    names = [n for n in REPEAT_QUERIES if n in qs]
    missing = [n for n in REPEAT_QUERIES if n not in qs]
    if missing:
        print(f"WARNING: not in registry: {missing}")
    fails: list[str] = []
    t00 = time.time()
    for i, name in enumerate(names):
        hashes, times, rows_n = [], [], []
        err = None
        for _ in range(2):
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                rows = df.collect()
                h = hashlib.md5(
                    repr(_rowset(list(map(str.lower, df.columns)), rows)).encode()
                ).hexdigest()
            except Exception as ex:  # noqa: BLE001 — report, don't abort
                err = str(ex).splitlines()[0][:160]
                break
            hashes.append(h)
            rows_n.append(len(rows))
            times.append(time.time() - t0)
        if err is not None:
            fails.append(name)
            status = "FAIL: " + err
        elif hashes[0] != hashes[1]:
            fails.append(name)
            status = (
                f"NON-IDEMPOTENT: pass1 {hashes[0][:12]} ({rows_n[0]} rows) "
                f"!= pass2 {hashes[1][:12]} ({rows_n[1]} rows)"
            )
        else:
            status = (
                f"ok rows={rows_n[0]} hash={hashes[0][:12]} "
                f"({times[0]:.1f}s / {times[1]:.1f}s)"
            )
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
    print(f"TOTAL {time.time() - t00:.0f}s FAILURES: {fails}")
    return 1 if fails else 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--repeat"]
    do_repeat = "--repeat" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "Asia/Yekaterinburg")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if do_repeat:
        return repeat_mode(spark, sf_dir)
    import __spark_entry__ as entry

    qs = entry.queries()
    fails: list[str] = []
    t00 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            status = f"ok rows={n}"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            fails.append(name)
            status = "FAIL: " + str(ex).splitlines()[0][:160]
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"TOTAL {time.time() - t00:.0f}s FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
