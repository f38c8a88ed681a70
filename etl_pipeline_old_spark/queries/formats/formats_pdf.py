"""PDF document extraction (text, encryption, xref streams, images) — a contiguous slice of the former
queries/sources_formats.py monolith (split r13, r12 verdict #6).  The
sources_formats facade imports the slices IN ORDER, so global registry
order is byte-identical to the pre-split file; see that module's
docstring for the family story."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...workdir import cache_root
from ...catalog import load_table
from ...registry import register

from .formats_containers import (  # noqa: F401 — shared helpers
    _PDF_LINE,
    _PDF_PAGE_LINES,
    _pdf_pages,
    _render_pdf,
)

from .formats_media import (  # noqa: F401 — shared helpers
    _tag,
    _BINARYFILE_SCHEMA,
    _CORRUPT_MOD,
    _ppm_pixel_sql,
    _stage_media_files,
)


@register(
    "pipeline_pdf_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      CAST(doc_id % 2 AS INT) AS compressed,
      length(text) AS n_chars,
      1 AS text_exact
    FROM b
    """,
    doc="PDF text extraction — the document-corpus first mile: one "
    "genuine PDF per document (operators/pdf.py writer: catalog -> page "
    "tree -> pages -> content streams with correct xref byte offsets; "
    "FlateDecode by doc parity so both stream paths are exercised; any "
    "viewer opens the output) is staged from the executors, scanned "
    "back via binaryFile, and parsed FOR REAL in an Arrow kernel: "
    "startxref/trailer discovery, xref-table walk, object parse at the "
    "recorded offsets (the full object grammar — dicts, arrays, names, "
    "literal strings with the complete escape set, hex strings, "
    "indirect references incl. indirect /Length), page-tree traversal, "
    "stream inflate, and text-operator collection in showing order. "
    "PDF strings are byte strings per the spec, so recovery is "
    "byte-exact: text_exact compares the reassembled text against the "
    "source document and the oracle independently recomputes page "
    "counts and char counts from the pagination formulas. Image-only "
    "PDFs (OCR), CID/Type0 remapping, and encryption are loud, "
    "documented seams. Scale: the standard binaryFile plan — parse "
    "cost is the document's own size, xref random access means text "
    "extraction touches only content streams, and a damaged xref or "
    "truncated stream raises per record inside the quarantine pattern.",
)
def pipeline_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_media_files(spark, sf_dir, "pdf_files", "pdf", _render_pdf)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "compressed": [],
                "n_chars": [], "text_exact": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"], pdf_batch["text"]
            ):
                payload = bytes(content)
                pages = extract_pdf_text(payload)
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["compressed"].append(
                    1 if b"/FlateDecode" in payload else 0
                )
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, compressed int, n_chars long, "
        "text_exact int",
    )
def _render_pdf_encrypted(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf_encrypted

    return write_pdf_encrypted(
        _pdf_pages(text),
        rev=2 + doc_id % 2,
        compress=doc_id % 4 >= 2,
    )
@register(
    "pipeline_pdf_encrypted_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      CAST(2 + doc_id % 2 AS INT) AS handler_rev,
      length(text) AS n_chars,
      1 AS text_exact
    FROM b
    """,
    doc="Encrypted-PDF text extraction — the legacy 'owner-locked' "
    "documents real corpora carry (restrictions set, EMPTY user "
    "password, readable by spec design): each document stages as a "
    "genuinely RC4-encrypted PDF (operators/pdf_crypt.py, ISO 32000 "
    "§7.6.3 standard security handler — Algorithm 2 key derivation "
    "with the 50-round rev-3 strengthening, Algorithm 3 /O, "
    "Algorithms 4/5 /U, per-object Algorithm 1 keys; revisions 2 "
    "(40-bit) and 3 (128-bit) alternate by doc parity, FlateDecode "
    "cycling so compress-then-encrypt ordering is exercised both "
    "ways), and extraction authenticates via the /U check then "
    "decrypts per object transparently — the oracle demands exact "
    "text recovery, so a key-derivation or cipher bug cannot hide. "
    "RC4 is pinned to the published test vectors; wrong passwords and "
    "tampered /U fail loudly; AES-era handlers (/V 4+) stay the "
    "documented seam. Scale: identical to pipeline_pdf_extract — "
    "decryption is a per-record stream pass inside the Arrow kernel, "
    "length-preserving, no extra I/O.",
)
def pipeline_pdf_encrypted_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_enc_files", "pdf", _render_pdf_encrypted
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "handler_rev": [],
                "n_chars": [], "text_exact": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"], pdf_batch["text"]
            ):
                pages = extract_pdf_text(bytes(content))
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["handler_rev"].append(2 + int(doc_id) % 2)
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, handler_rev int, n_chars long, "
        "text_exact int",
    )
def _render_pdf_aes(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf_encrypted

    return write_pdf_encrypted(
        _pdf_pages(text),
        rev=4 + doc_id % 3,
        compress=doc_id % 2 == 1,
    )
@register(
    "pipeline_pdf_aes_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      CAST(4 + doc_id % 3 AS INT) AS handler_rev,
      length(text) AS n_chars,
      1 AS text_exact
    FROM b
    """,
    doc="AES-encrypted-PDF text extraction — the post-2008 standard "
    "security handler forms that were round 10's documented seam, now "
    "native: documents stage cycling revision 4 (/V 4 crypt filters, "
    "CFM /AESV2, AES-128-CBC with per-object sAlT-suffixed MD5 keys), "
    "revision 5 (interim /V 5 AES-256, single-SHA-256 derivation), "
    "and revision 6 (ISO 32000-2 Algorithm 2.B iterated "
    "SHA-256/384/512 + AES-CBC hash, /U validation+key salts, file "
    "key recovered by decrypting /UE, /Perms signature check), with "
    "FlateDecode alternating so compress-then-encrypt is exercised "
    "both ways. The AES core is an OWN FIPS-197 implementation with "
    "derived (not recalled) tables, pinned to the published FIPS/SP "
    "800-38A vectors and randomized-cross-validated against "
    "javax.crypto through py4j (tests/test_aes.py); wrong passwords, "
    "tampered /U or /Perms, and bad CBC padding all fail loudly. The "
    "oracle demands exact text recovery per document. Scale: "
    "per-record Arrow-kernel decrypt like the RC4 path; the expensive "
    "R6 password hash is a pure function of (password, salt) and is "
    "lru_cached per executor process, so a corpus encrypted under a "
    "handful of credentials pays it once per worker, not per "
    "document.",
)
def pipeline_pdf_aes_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_aes_files", "pdf", _render_pdf_aes
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "handler_rev": [],
                "n_chars": [], "text_exact": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"], pdf_batch["text"]
            ):
                pages = extract_pdf_text(bytes(content))
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["handler_rev"].append(4 + int(doc_id) % 3)
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, handler_rev int, n_chars long, "
        "text_exact int",
    )
@register(
    "pipeline_pdf_xrefstream_incremental",
    oracle="""
    SELECT CAST(doc_id % 5 AS INT) AS variant,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(length(text)) AS BIGINT) AS n_chars,
      CAST(count(DISTINCT length(text)) AS BIGINT) AS n_distinct_lens
    FROM documents
    GROUP BY 1
    """,
    doc="Incremental refresh for the xref-stream family, completing its "
    "operational trio (extract / quarantine / streaming / incremental): "
    "per-variant stats computed on a BASE drop (ids not divisible by 3) "
    "and a DELTA drop separately — each half re-parsed through the "
    "same chain-walking kernel — then MERGED: docs and recovered-char "
    "sums add, but the distinct-length count does NOT (the partials "
    "carry the length SET and the merge unions before counting — the "
    "sum-the-distincts shortcut every naive refresh ships). The oracle "
    "is the direct full-corpus SQL, so the driver value-checks "
    "merge == recompute; a char-sum drift would also expose any "
    "variant whose re-parse stopped recovering text exactly. At scale "
    "the length set becomes the mergeable sketch or stored silver "
    "partials, as in pipeline_document_corpus_incremental.",
)
def pipeline_pdf_xrefstream_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_xrefstream_files", "pdf",
        _render_pdf_xrefstream,
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {"doc_id": [], "variant": [], "n_chars": []}
            for doc_id, content in zip(
                pdf_batch["doc_id"], pdf_batch["content"]
            ):
                did = int(doc_id)
                pages = extract_pdf_text(bytes(content))
                out["doc_id"].append(did)
                out["variant"].append(did % 5)
                out["n_chars"].append(
                    sum(len(ln) for pg in pages for ln in pg)
                )
            yield pd.DataFrame(out)

    extracted = bf.mapInPandas(
        op, schema="doc_id long, variant int, n_chars long"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("variant").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.collect_set("n_chars").alias("len_set"),
        )

    base = partial(extracted.where(F.col("doc_id") % 3 != 0))
    delta = partial(extracted.where(F.col("doc_id") % 3 == 0))
    return (
        base.unionByName(delta)
        .groupBy("variant")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            # the non-additive measure: union the partial SETS before
            # counting — summing per-drop distincts double-counts any
            # length present in both drops
            F.size(
                F.array_distinct(F.flatten(F.collect_list("len_set")))
            ).cast("long").alias("n_distinct_lens"),
        )
    )
_PDF_SHAPES = ("classic", "cid", "rc4", "aes", "xrefstream", "encoded")
def _render_pdf_any_shape(doc_id: int, text: str) -> bytes:
    shape = _PDF_SHAPES[doc_id % 6]
    if shape == "classic":
        return _render_pdf(doc_id, text)
    if shape == "cid":
        return _render_pdf_cid(doc_id, text)
    if shape == "rc4":
        return _render_pdf_encrypted(doc_id, text)
    if shape == "aes":
        return _render_pdf_aes(doc_id, text)
    if shape == "xrefstream":
        return _render_pdf_xrefstream(doc_id, text)
    return _render_pdf_encoded(doc_id, text)
@register(
    "pipeline_pdf_corpus_mixed",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CAST(['classic', 'cid', 'rc4', 'aes', 'xrefstream',
            'encoded'][doc_id % 6 + 1] AS VARCHAR) AS shape,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      length(text) AS n_chars,
      1 AS text_exact
    FROM b
    """,
    doc="The modern-PDF capstone — ONE reader over a bucket cycling "
    "every real-world PDF shape the engine decodes (doc_id%6): "
    "classic xref tables, CID/Identity-H with embedded ToUnicode "
    "CMaps, RC4 rev 2/3 owner-locked, AESV2/AESV3 encrypted, PDF "
    "1.5+ xref streams with ObjStm//Prev/hybrid layouts, and "
    "WinAnsi+/Differences simple-font encodings. The kernel is a "
    "single extract_pdf_text call — the point of the capstone: a "
    "day-one consumer does not know which era or producer wrote each "
    "document, and the same entry point must recover byte-exact text "
    "(demanded per row by the oracle) across all six, dispatching "
    "internally on the trailer form, the font type, and the "
    "security handler. The per-shape families above remain the "
    "focused sentinels; this is the mixed-bucket reality check, the "
    "PDF twin of pipeline_document_corpus_mixed. Scale: identical — "
    "binaryFile scan, per-document Arrow kernel, no payload shuffle.",
)
def pipeline_pdf_corpus_mixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_mixed_files", "pdf", _render_pdf_any_shape
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {
                "doc_id": [], "shape": [], "n_pages": [],
                "n_chars": [], "text_exact": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"],
                pdf_batch["text"],
            ):
                did = int(doc_id)
                pages = extract_pdf_text(bytes(content))
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(did)
                out["shape"].append(_PDF_SHAPES[did % 6])
                out["n_pages"].append(len(pages))
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, shape string, n_pages int, n_chars long, "
        "text_exact int",
    )
@register(
    "stream_pdf_xrefstream_ingest",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents),
    p AS (
      SELECT doc_id, text,
             (n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES}
               AS n_pages
      FROM b)
    SELECT doc_id,
      CAST(n_pages AS INT) AS n_pages,
      CAST(doc_id % 5 AS INT) AS variant,
      length(text) AS n_chars,
      CAST(CASE WHEN doc_id % 5 IN (2, 4) THEN 0 ELSE 3 + n_pages END
        AS INT) AS n_objstm
    FROM p
    """,
    doc="STREAMING ingestion for the xref-stream document family — the "
    "Auto-Loader-shaped counterpart to pipeline_pdf_xrefstream_extract "
    "completing its operational pair with the quarantine below: the "
    "same five-variant staged corpus (ObjStm packing, predictor-coded "
    "rows, /Prev incremental chains, hybrid /XRefStm) consumed through "
    "readStream binaryFile with maxFilesPerTrigger bounding each "
    "micro-batch, parsed per batch by the same chain-walking kernel, "
    "appended to a parquet target whose accumulated content must "
    "hash-equal the batch extraction (same oracle formulas — n_chars "
    "equals the source length only if every micro-batch recovered its "
    "text exactly). Checkpointed listing, bounded batches, restart "
    "resume — how a continuously-filling modern-PDF bucket is "
    "operated at 100 TB.",
)
def stream_pdf_xrefstream_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from ...session import ensure_session_confs

    ensure_session_confs(spark)
    feed = _stage_media_files(
        spark, sf_dir, "pdf_xrefstream_files", "pdf",
        _render_pdf_xrefstream,
    )
    base = os.path.join(cache_root(), f"pdf_xrefstream_stream_{_tag(sf_dir)}")
    target, chk = base + "_target", base + "_chk"
    for p in (target, chk):
        shutil.rmtree(p, ignore_errors=True)

    stream = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.pdf")
        .option("maxFilesPerTrigger", 200)
        .load(feed)
        .select("path", "content")
    )

    def decode(frame: DataFrame) -> DataFrame:
        def op(batches):
            import re as _re

            import pandas as pd

            from ...operators.pdf import extract_pdf_text_profiled

            for pdf in batches:
                out = {
                    "doc_id": [], "n_pages": [], "variant": [],
                    "n_chars": [], "n_objstm": [],
                }
                for p, content in zip(pdf["path"], pdf["content"]):
                    did = int(_re.search(r"(\d+)\.pdf$", p).group(1))
                    pages, prof = extract_pdf_text_profiled(bytes(content))
                    out["doc_id"].append(did)
                    out["n_pages"].append(len(pages))
                    out["variant"].append(did % 5)
                    out["n_chars"].append(
                        sum(len(ln) for pg in pages for ln in pg)
                    )
                    out["n_objstm"].append(prof["objstm"])
                yield pd.DataFrame(out)

        return frame.mapInPandas(
            op,
            schema="doc_id long, n_pages int, variant int, "
            "n_chars long, n_objstm int",
        )

    def ingest(batch_df: DataFrame, _batch_id: int) -> None:
        decode(batch_df).write.mode("append").parquet(target)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(target)
def _render_corrupt_pdf_xrefstream(doc_id: int, text: str) -> bytes:
    buf = _render_pdf_xrefstream(doc_id, text)
    if doc_id % _CORRUPT_MOD == 0:
        # tear INSIDE the newest cross-reference stream's FlateDecoded
        # payload — the damage class unique to PDF 1.5+ files (every
        # object may be intact, but the map to them is gone).  The
        # last "\nstream\n" in the file opens the xref stream in every
        # variant (endstream cannot suffix-match it).
        at = buf.rfind(b"\nstream\n") + len(b"\nstream\n")
        torn = bytearray(buf)
        for i in range(3):
            torn[at + 2 + i] ^= 0xFF
        return bytes(torn)
    return buf
@register(
    "pdf_xrefstream_quarantine",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN 'corrupt' ELSE 'ok' END
             AS status,
           CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN NULL
                ELSE length(text) END AS n_chars
    FROM documents
    """,
    doc="Per-record QUARANTINE for the xref-stream document corpus — "
    f"the operational sibling of pipeline_pdf_xrefstream_extract: every "
    f"{_CORRUPT_MOD}th staged PDF 1.5+ file is torn INSIDE its newest "
    "cross-reference stream's FlateDecoded payload, the damage class "
    "unique to compressed cross-references (every object may be "
    "intact, but the map to them is gone — a truncated or bit-rotted "
    "tail on a modern PDF lands exactly here). The kernel wraps the "
    "same parser that pipeline_pdf_xrefstream_extract uses and routes "
    "failures to a status column; the oracle checks both halves — "
    "corrupt files quarantine with NULL extraction, every healthy "
    "file (all five layout variants, /Prev chains included) still "
    "recovers its text byte-exactly. At 100 TB a curation job cannot "
    "abort on one rotted document; quarantine rows route to a "
    "dead-letter table for re-fetch.",
)
def pdf_xrefstream_quarantine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_xrefstream_corrupt", "pdf",
        _render_corrupt_pdf_xrefstream,
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select("path", "content")
    )

    def op(batches):
        import re as _re

        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf in batches:
            out = {"doc_id": [], "status": [], "n_chars": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                out["doc_id"].append(
                    int(_re.search(r"(\d+)\.pdf$", p).group(1))
                )
                try:
                    pages = extract_pdf_text(bytes(content))
                    out["status"].append("ok")
                    out["n_chars"].append(
                        sum(len(ln) for pg in pages for ln in pg)
                    )
                except (ValueError, NotImplementedError, OSError):
                    out["status"].append("corrupt")
                    out["n_chars"].append(None)
            yield pd.DataFrame(out)

    return bf.mapInPandas(
        op, schema="doc_id long, status string, n_chars long"
    )
def _render_pdf_encoded(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf_encoded

    return write_pdf_encoded(
        _pdf_pages(text),
        mixed=doc_id % 2 == 1,
        compress=doc_id % 3 == 0,
    )
@register(
    "pipeline_pdf_encoding_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines,
             list_distinct(regexp_split_to_array(text, '')) AS dchars
      FROM documents)
    SELECT doc_id,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      CAST(doc_id % 2 AS INT) AS mixed,
      length(text) AS n_chars,
      1 AS text_exact,
      CAST(CASE WHEN doc_id % 2 = 1
           THEN len(list_filter(dchars,
                    x -> unicode(x) < 32 OR unicode(x) > 126))
           ELSE len(dchars) END AS INT) AS n_diffs
    FROM b
    """,
    doc="Simple-font /Encoding extraction (ISO 32000-1 §9.6.6 + Annex "
    "D) — the PRE-CID real-world PDF shape this corpus's domain hits "
    "constantly: a Type1 font whose shown bytes are CODES defined by "
    "/BaseEncoding /WinAnsiEncoding plus a /Differences array (the "
    "font-subsetter output for Cyrillic text), where byte-blind UTF-8 "
    "decoding yields garbage.  Odd ids stage the subsetter shape "
    "(ASCII as WinAnsi bytes, every other char through /Differences "
    "codes from 128); even ids remap EVERY character from code 33 — "
    "using Standard glyph NAMES (/a /space /comma) where one exists "
    "and /uniXXXX otherwise — so exact recovery (text_exact, demanded "
    "per row) PROVES the Differences walk, the AGL name resolution, "
    "and the cp1252-pinned WinAnsi base (operators/pdf.py "
    "glyph_to_char/_base_encoding_char; WinAnsi/MacRoman decode "
    "through CPython's independent codec tables so the mapping "
    "cannot drift).  n_diffs counts the codes the parsed /Differences "
    "actually remapped, which the oracle recomputes as the staged "
    "text's character census.  Unknown glyph names, undefined "
    "WinAnsi slots, and malformed Differences arrays raise per "
    "record.  Scale: identical to the other PDF sentinels — "
    "map-side Arrow kernel, no shuffle before the per-doc frame.",
)
def pipeline_pdf_encoding_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_encoded_files", "pdf", _render_pdf_encoded
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import (
            encoding_differences_count,
            extract_pdf_text,
        )

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "mixed": [],
                "n_chars": [], "text_exact": [], "n_diffs": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"],
                pdf_batch["text"],
            ):
                payload = bytes(content)
                pages = extract_pdf_text(payload)
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["mixed"].append(int(doc_id) % 2)
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
                out["n_diffs"].append(
                    encoding_differences_count(payload)
                )
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, mixed int, n_chars long, "
        "text_exact int, n_diffs int",
    )
def _render_pdf_with_images(doc_id: int, text: str) -> bytes:
    from ...operators.jpeg import encode_jpeg
    from ...operators.multimodal import md5_pixels
    from ...operators.pdf import write_pdf_images

    px = bytes(md5_pixels(text, 64))
    jpg = encode_jpeg(list(px), 8, 8, quality=90)
    return write_pdf_images(
        [("flate", 8, 8, px), ("dct", 8, 8, jpg)],
        compress_content=doc_id % 2 == 1,
    )
@register(
    "pipeline_pdf_images_extract",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, [{", ".join(_ppm_pixel_sql(j) for j in range(64))}]
        AS p
      FROM documents)
    SELECT doc_id, 2 AS n_images,
      CAST(list_sum(p) AS BIGINT) AS flate_sum,
      8 AS dct_w, 8 AS dct_h,
      1 AS dct_bytes_exact, 1 AS dct_decoded_ok
    FROM px
    """,
    doc="PDF embedded-IMAGE extraction (operators/pdf.py "
    "write_pdf_images/extract_pdf_images) — the multimodal half of "
    "document ingest: figures ride as /XObject /Image streams, and a "
    "papers/reports corpus recovers them for image-text pairing. Each "
    "document stages a genuine figure page carrying the SAME "
    "md5-derived raster twice: once /FlateDecode (raw DeviceGray "
    "samples — the oracle recomputes their sum from the shared "
    "md5_pixel_sql formula, exact) and once /DCTDecode holding a real "
    "JFIF file produced by the engine's own baseline JPEG encoder "
    "(operators/jpeg.py, the codec already cross-validated against "
    "javax.imageio). Extraction walks page resources in deterministic "
    "order, inflates the Flate image to samples, and returns the DCT "
    "stream's bytes VERBATIM (the JPEG stream IS the interchange "
    "file — standard extractor behavior); the kernel then proves "
    "byte-exact recovery by re-rendering the staged JPEG and decodes "
    "it with the own decoder for the dimension check. Non-image "
    "filters stay the documented seam. Scale: the usual binaryFile + "
    "Arrow-kernel shape; figure bytes never shuffle.",
)
def pipeline_pdf_images_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_image_files", "pdf", _render_pdf_with_images
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.jpeg import decode_jpeg, encode_jpeg
        from ...operators.multimodal import md5_pixels
        from ...operators.pdf import extract_pdf_images

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_images": [], "flate_sum": [],
                "dct_w": [], "dct_h": [], "dct_bytes_exact": [],
                "dct_decoded_ok": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"],
                pdf_batch["text"],
            ):
                imgs = extract_pdf_images(bytes(content))
                by_filt = {f: (w, h, d) for _n, w, h, f, d in imgs}
                fw, fh, fdata = by_filt["/FlateDecode"]
                dw, dh, ddata = by_filt["/DCTDecode"]
                px = bytes(md5_pixels(text, 64))
                expected_jpg = encode_jpeg(list(px), 8, 8, quality=90)
                jw, jh, _dec = decode_jpeg(ddata)
                out["doc_id"].append(int(doc_id))
                out["n_images"].append(len(imgs))
                out["flate_sum"].append(sum(fdata))
                out["dct_w"].append(dw)
                out["dct_h"].append(dh)
                out["dct_bytes_exact"].append(
                    1 if ddata == expected_jpg else 0
                )
                out["dct_decoded_ok"].append(
                    1 if (jw, jh) == (dw, dh) and fdata == px else 0
                )
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_images int, flate_sum long, dct_w int, "
        "dct_h int, dct_bytes_exact int, dct_decoded_ok int",
    )
def _render_pdf_ccitt(doc_id: int, text: str) -> bytes:
    from ...operators.multimodal import md5_pixels
    from ...operators.pdf import write_pdf_images

    bits = [1 if p >= 128 else 0 for p in md5_pixels(text, 256)]
    return write_pdf_images(
        [("ccitt", 16, 16, (bits, True)), ("ccitt", 16, 16, (bits, False)),
         ("ccitt-g3", 16, 16, (bits, True)),
         ("ccitt-g3-2d", 16, 16, (bits, True))],
        compress_content=doc_id % 2 == 1,
    )
@register(
    "pipeline_pdf_ccitt_extract",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             [{", ".join(_ppm_pixel_sql(j) for j in range(256))}] AS p
      FROM documents)
    SELECT doc_id, 4 AS n_images,
      CAST(len(list_filter(p, x -> x >= 128)) AS INT) AS black_px,
      16 AS w, 16 AS h,
      1 AS polarity_ok,
      1 AS g3_matches_g4,
      1 AS g3_2d_matches_g4
    FROM px
    """,
    doc="PDF CCITTFax G4 image extraction (operators/ccitt.py, ITU-T "
    "T.6 2D MMR — the compression virtually every SCANNED-document "
    "PDF carries, and the r12 verdict's #3 gap): each document stages "
    "a figure page whose raster (the shared md5 pixel formula "
    "thresholded at 128) rides TWICE as /CCITTFaxDecode XObjects with "
    "/K -1, once /BlackIs1 true and once false — the decoder must "
    "honor the polarity flag, so the kernel proves the two decoded "
    "bitmaps are exact inverses (polarity_ok) and the oracle "
    "recomputes the black-pixel count from the staging formula "
    "(black_px), which a mode-table, MH run-length, or "
    "reference-line bug flips. The G4 decode exercises vertical, "
    "horizontal, AND pass modes on real thresholded noise (unit-"
    "pinned vectors in tests/test_ccitt.py cover each mode "
    "explicitly; torn streams are the loud class there), and the "
    "SAME raster rides a third time as 1D G3 (/K 0, T.4 MH runs with "
    "EOL framing, EncodedByteAlign decoding natively) whose decode "
    "must match the G4 image bit-for-bit (g3_matches_g4), and a "
    "FOURTH time as mixed 2D G3 (/K 2, T.4 §4.2 MR — EOL + tag bit "
    "per row, every 2nd row 1D, 2D rows through the same mode coder "
    "G4 uses; r13 verdict #5) cross-checked the same way "
    "(g3_2d_matches_g4) — three independent codings of one picture "
    "against each other. Scale: map-only Arrow "
    "kernel, the standard media-sentinel shape.",
)
def pipeline_pdf_ccitt_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_ccitt_files", "pdf", _render_pdf_ccitt
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_images

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_images": [], "black_px": [],
                "w": [], "h": [], "polarity_ok": [], "g3_matches_g4": [],
                "g3_2d_matches_g4": [],
            }
            for doc_id, content in zip(
                pdf_batch["doc_id"], pdf_batch["content"]
            ):
                imgs = extract_pdf_images(bytes(content))
                (_, w0, h0, _f0, d0), (_, _w1, _h1, _f1, d1), \
                    (_, _w2, _h2, _f2, d2), (_, _w3, _h3, _f3, d3) = imgs
                # BlackIs1 true -> 1 bits are black; false -> inverted
                black = sum(bin(b).count("1") for b in d0)
                inv_ok = all(
                    a ^ b == 0xFF for a, b in zip(d0, d1)
                ) and len(d0) == len(d1)
                out["doc_id"].append(int(doc_id))
                out["n_images"].append(len(imgs))
                out["black_px"].append(black)
                out["w"].append(w0)
                out["h"].append(h0)
                out["polarity_ok"].append(1 if inv_ok else 0)
                out["g3_matches_g4"].append(1 if d2 == d0 else 0)
                out["g3_2d_matches_g4"].append(1 if d3 == d0 else 0)
            yield pd.DataFrame(out)

    return bf.mapInPandas(
        op,
        schema="doc_id long, n_images int, black_px int, w int, h int, "
        "polarity_ok int, g3_matches_g4 int, g3_2d_matches_g4 int",
    )
def _render_pdf_figures(doc_id: int, text: str) -> bytes:
    from ...operators.multimodal import md5_pixels
    from ...operators.pdf import write_pdf_images

    b = bytes(md5_pixels(text, 128))
    images = [("flate", 8, 8, b[:64])]
    captions = [f"Fig {doc_id}: {text[:30]}"]
    if doc_id % 2 == 0:
        images.append(("flate", 8, 8, b[64:128]))
        captions.append(f"Fig {doc_id}b: {text[30:55]}")
    return write_pdf_images(images, captions=captions)
@register(
    "pipeline_pdf_figure_pairs",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, text,
             [{", ".join(_ppm_pixel_sql(j) for j in range(128))}] AS b
      FROM documents)
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) AS n_pairs,
      1 AS cap_exact,
      CAST(list_sum(b[1:64])
           + CASE WHEN doc_id % 2 = 0 THEN list_sum(b[65:128])
             ELSE 0 END AS BIGINT) AS img_sum
    FROM px
    """,
    doc="Figure-caption PAIRING from PDFs — the document-side twin of "
    "the WARC-based image-text pairing capstones: a papers/reports "
    "corpus mines (figure raster, caption text) training pairs from "
    "the SAME page, and both halves must come out of one structural "
    "parse. Each staged document carries one or two genuine figure "
    "pages (write_pdf_images with captions: image XObjects painted "
    "above Helvetica caption lines); the kernel runs BOTH extractors "
    "over the same payload — extract_pdf_images for the rasters, "
    "extract_pdf_text for the caption lines — and pairs them by page "
    "order, the layout heuristic real pipelines start from. The "
    "oracle recomputes the pair count, demands every caption "
    "byte-exact against its staging formula (cap_exact), and "
    "recomputes the paired rasters' sample sum from the shared "
    "md5_pixel_sql formula — a dropped figure, a swapped caption, or "
    "a lossy raster all flip the hash. Scale: one binaryFile scan, "
    "one Arrow kernel doing both extractions per document, no "
    "payload shuffle; the downstream pair table is rows of "
    "(caption, figure-hash), never figure bytes.",
)
def pipeline_pdf_figure_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_figure_files", "pdf", _render_pdf_figures
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_images, extract_pdf_text

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pairs": [], "cap_exact": [], "img_sum": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"],
                pdf_batch["text"],
            ):
                did = int(doc_id)
                payload = bytes(content)
                imgs = extract_pdf_images(payload)
                caps = [ln for pg in extract_pdf_text(payload) for ln in pg]
                exp = [f"Fig {did}: {text[:30]}"]
                if did % 2 == 0:
                    exp.append(f"Fig {did}b: {text[30:55]}")
                out["doc_id"].append(did)
                out["n_pairs"].append(min(len(imgs), len(caps)))
                out["cap_exact"].append(1 if caps == exp else 0)
                out["img_sum"].append(
                    sum(sum(d) for _n, _w, _h, _f, d in imgs)
                )
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pairs int, cap_exact int, img_sum long",
    )
def _render_pdf_cid(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf_cid

    return write_pdf_cid(_pdf_pages(text), compress=doc_id % 2 == 1)
@register(
    "pipeline_pdf_cid_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      CAST(doc_id % 2 AS INT) AS compressed,
      length(text) AS n_chars,
      1 AS text_exact,
      len(list_distinct(regexp_split_to_array(text, '')))::BIGINT AS n_cids
    FROM b
    """,
    doc="CID-keyed PDF text extraction — the post-2010 real-world PDF "
    "shape (r10 verdict #1): one genuine Type0/Identity-H document per "
    "source row (operators/pdf.py write_pdf_cid: CIDFontType2 "
    "descendant, /Resources inherited from the /Pages node, an embedded "
    "/ToUnicode CMap stream with bfchar AND collapsed bfrange rows, "
    "FlateDecode by parity on BOTH the content and CMap streams), where "
    "text rides as 2-byte CID codes — decoding shown bytes as text "
    "yields garbage, so exact recovery (text_exact, demanded by the "
    "oracle) PROVES the CMap path: codespace-aware code splitting and "
    "code-by-code bfchar/bfrange mapping per ISO 32000 §9.10.3. n_cids "
    "is counted from the parsed CMap itself and must equal the source "
    "text's distinct-character count, which the oracle recomputes "
    "independently. Unmapped CIDs, out-of-codespace bytes, and Type0 "
    "fonts without a ToUnicode raise per record (the documented seams). "
    "Scale: identical to pipeline_pdf_extract — Arrow-kernel parse, "
    "cost bounded by each document's own bytes, no shuffle before the "
    "per-doc frame.",
)
def pipeline_pdf_cid_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_cid_files", "pdf", _render_pdf_cid
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text, tounicode_entries

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "compressed": [],
                "n_chars": [], "text_exact": [], "n_cids": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"], pdf_batch["text"]
            ):
                payload = bytes(content)
                pages = extract_pdf_text(payload)
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["compressed"].append(int(doc_id) % 2)
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
                out["n_cids"].append(tounicode_entries(payload))
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, compressed int, n_chars long, "
        "text_exact int, n_cids long",
    )
def _render_pdf_xrefstream(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf_xrefstream

    v = doc_id % 5
    return write_pdf_xrefstream(
        _pdf_pages(text),
        compress=doc_id % 2 == 1,
        objstm=v not in (2, 4),  # 2: objects top-level; 4: hybrid
        predictor=v in (1, 2),   # PNG-Up /Predictor 12 on the xref rows
        incremental=v == 3,      # appended revision + /Prev chain
        hybrid=v == 4,           # classic table + /XRefStm bridge
    )
@register(
    "pipeline_pdf_xrefstream_extract",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents),
    p AS (
      SELECT doc_id, text,
             (n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES}
               AS n_pages
      FROM b)
    SELECT doc_id,
      CAST(n_pages AS INT) AS n_pages,
      CAST(doc_id % 5 AS INT) AS variant,
      length(text) AS n_chars,
      1 AS text_exact,
      CAST(CASE WHEN doc_id % 5 IN (2, 4) THEN 0 ELSE 3 + n_pages END
        AS INT) AS n_objstm
    FROM p
    """,
    doc="PDF 1.5+ cross-reference-stream extraction — the r11 verdict's "
    "#1 real-world gap, closed: virtually every PDF written since ~2005 "
    "records its xref as a FlateDecoded /Type/XRef STREAM (ISO 32000-1 "
    "§7.5.8, binary rows per /W with /Index subsections and usually a "
    "PNG /Predictor 12) and packs small objects into /Type/ObjStm "
    "object streams reached through type-2 entries (§7.5.7); documents "
    "staged here cycle five shapes by doc_id%5: plain xref-stream + "
    "ObjStm, predictor-coded rows, no-ObjStm + predictor, and a REAL "
    "incremental update whose base revision carries superseded "
    "placeholder content so byte-exact recovery (text_exact, demanded "
    "per row by the oracle) PROVES the /Prev chain walk with "
    "newest-entry-wins precedence — a reader that skipped /Prev loses "
    "the catalog, one with old-wins precedence returns the stale "
    "bytes — plus a HYBRID-REFERENCE file (§7.5.8.4, the Acrobat-updated shape) whose classic table covers only page/content objects and whose catalog/page-tree/font are reachable ONLY through the trailer's /XRefStm bridge.  n_objstm counts the type-2 entries the chain walk "
    "resolved (3 + n_pages packed dict objects, or 0 for the "
    "no-ObjStm and hybrid variants), which the oracle recomputes from the page "
    "arithmetic — structural evidence the object-stream indirection "
    "was decoded, not bypassed by a body scan.  Hostile shapes "
    "(cyclic /Prev, overlapping ObjStm mappings, truncated xref data, "
    "bad /W) raise per record: tests/test_pdf_codec.py.  Scale: "
    "identical to the other PDF sentinels — binaryFile scan, "
    "per-document Arrow-kernel parse, no shuffle before the final "
    "per-doc frame.",
)
def pipeline_pdf_xrefstream_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_xrefstream_files", "pdf", _render_pdf_xrefstream
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text_profiled

        for pdf_batch in batches:
            out = {
                "doc_id": [], "n_pages": [], "variant": [],
                "n_chars": [], "text_exact": [], "n_objstm": [],
            }
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"], pdf_batch["text"]
            ):
                pages, prof = extract_pdf_text_profiled(bytes(content))
                rebuilt = "".join(ln for pg in pages for ln in pg)
                out["doc_id"].append(int(doc_id))
                out["n_pages"].append(len(pages))
                out["variant"].append(int(doc_id) % 5)
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
                out["n_objstm"].append(prof["objstm"])
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, n_pages int, variant int, n_chars long, "
        "text_exact int, n_objstm int",
    )
_DOC_MIN_WORDS = 5
def _doc_capstone_oracle() -> str:
    from ...operators import text as TX
    from ...operators.dedup import NORMALIZE_SQL

    norm = NORMALIZE_SQL.format(x="text")
    hits = {
        lang: f"len(list_filter(string_split({norm}, ' '), x -> x IN {tuple(words)}))"
        for lang, words in TX.LANG_STOPWORDS
    }
    best = f"greatest({', '.join(hits.values())})"
    chain = " ".join(
        f"WHEN {hits[lang]} = best AND best > 0 THEN '{lang}'"
        for lang, _ in TX.LANG_STOPWORDS
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, text, {norm} AS norm,
             len(string_split({norm}, ' ')) AS n_words,
             {best} AS best
      FROM documents),
    gated AS (
      SELECT CASE {chain} ELSE 'und' END AS lang_pred, n_words, norm
      FROM scored
      WHERE n_words >= {_DOC_MIN_WORDS})
    SELECT lang_pred,
           count(*)::BIGINT AS n_docs,
           sum(n_words)::BIGINT AS n_tokens,
           count(DISTINCT norm)::BIGINT AS n_unique,
           round(avg(n_words), 2) AS avg_words
    FROM gated
    GROUP BY lang_pred
    """
@register(
    "pipeline_document_corpus",
    oracle=_doc_capstone_oracle(),
    doc="The document-corpus capstone, PDFs to clean corpus in one plan — "
    "the paper/report/book counterpart of pipeline_web_corpus: scan the "
    "staged PDF corpus via binaryFile, recover text through the "
    "structural ISO 32000 parser (Arrow kernel; byte-exact, so the "
    "oracle can recompute everything downstream from the base table), "
    "then JVM-side on the RECOVERED text: whitespace-normalized word "
    "count, short-document gate (n_words >= 5), stopword language ID, "
    "and exact-normalized near-dup accounting; report per-language "
    "corpus stats (docs, tokens, distinct normalized texts, mean "
    "length). A lossy or misordered extraction flips word counts or "
    "language predictions and fails the value hash — extraction "
    "fidelity is verified THROUGH the downstream pipeline, not just "
    "per-record. Scale shape: decode is map-only over blobs (the only "
    "Python), the rest is whole-stage-codegen expressions into one "
    "partial-aggregated groupBy on a handful of language keys, and the "
    "distinct-normalized count is the standard two-phase distinct "
    "aggregate — no joins, no collects.",
)
def pipeline_document_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ...operators.dedup import normalize_text
    from ...operators.text import lang_id

    path = _stage_media_files(spark, sf_dir, "pdf_files", "pdf", _render_pdf)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )

    def op(batches):
        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            ids, texts = [], []
            for doc_id, content in zip(
                pdf_batch["doc_id"], pdf_batch["content"]
            ):
                pages = extract_pdf_text(bytes(content))
                ids.append(int(doc_id))
                texts.append("".join(ln for pg in pages for ln in pg))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    recovered = bf.mapInPandas(op, schema="doc_id long, text string")
    scored = recovered.select(
        lang_id("text").alias("lang_pred"),
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_words"),
        normalize_text(F.col("text")).alias("norm"),
    ).where(F.col("n_words") >= _DOC_MIN_WORDS)
    return scored.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.countDistinct("norm").alias("n_unique"),
        F.round(F.avg("n_words"), 2).alias("avg_words"),
    )
def _render_webm(doc_id: int, text: str) -> bytes:
    from ...operators.ebml import build_webm

    mode = doc_id % 3
    if mode == 1:  # matroska, AV1 video only, live-mux unknown size
        return build_webm(
            "matroska",
            [{"type": "video", "codec": "V_AV1", "width": 1920, "height": 800}],
            [1 + doc_id % 4],
            2500.0,
            unknown_segment_size=True,
        )
    if mode == 2:  # audio-only webm
        return build_webm(
            "webm",
            [{"type": "audio", "codec": "A_OPUS", "rate": 48000, "channels": 2}],
            [1, 1, 1],
            750.0,
        )
    return build_webm(
        "webm",
        [
            {
                "type": "video", "codec": "V_VP9",
                "width": 1280, "height": 720 + doc_id % 16,
            },
            {
                "type": "audio", "codec": "A_OPUS",
                "rate": 48000, "channels": 1 + doc_id % 2,
            },
        ],
        [2, 3 + doc_id % 3],
        1000.0 * (1 + doc_id % 10),
    )


_LEGACY_CODINGS = ("lzw", "rl", "ahx", "a85", "a85+lzw")
_LEGACY_FILTER_NAMES = (
    "/LZWDecode", "/RunLengthDecode", "/ASCIIHexDecode",
    "/ASCII85Decode", "/ASCII85Decode+/LZWDecode",
)


def _render_pdf_legacy_filters(doc_id: int, text: str) -> bytes:
    from ...operators.pdf import write_pdf

    return write_pdf(
        _pdf_pages(text), compress=_LEGACY_CODINGS[doc_id % 5]
    )


@register(
    "pipeline_pdf_legacy_filters",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             greatest(1, (length(text) + {_PDF_LINE - 1}) // {_PDF_LINE})
               AS n_lines
      FROM documents)
    SELECT doc_id,
      CASE doc_id % 5 WHEN 0 THEN '/LZWDecode'
           WHEN 1 THEN '/RunLengthDecode' WHEN 2 THEN '/ASCIIHexDecode'
           WHEN 3 THEN '/ASCII85Decode'
           ELSE '/ASCII85Decode+/LZWDecode' END AS coding,
      CAST((n_lines + {_PDF_PAGE_LINES - 1}) // {_PDF_PAGE_LINES} AS INT)
        AS n_pages,
      length(text) AS n_chars,
      1 AS text_exact
    FROM b
    """,
    doc="Legacy PDF stream filters (operators/pdf_filters.py, ISO "
    "32000-1 §7.4) — what pre-Flate-era documents actually carry "
    "(Acrobat 1.x-3.x exports, PostScript conversions): the staged "
    "corpus cycles /LZWDecode (the TIFF/PDF variant — MSB-first "
    "9..12-bit codes, Clear/EOD, table reset at 4096, and the "
    "EarlyChange one-code-early width convention, pinned to the "
    "spec's own published example in tests/test_pdf_filters.py), "
    "/RunLengthDecode, /ASCIIHexDecode, /ASCII85Decode (z-shortcut, "
    "partial groups), and the CHAINED [/ASCII85Decode /LZWDecode] "
    "filter array old PostScript exports used — the multi-filter walk "
    "is part of what is proven. Byte-exact text recovery through the "
    "same extractor as every PDF family; torn streams raise the "
    "documented loud classes per filter. Scale: the standard "
    "binaryFile + Arrow-kernel sentinel shape.",
)
def pipeline_pdf_legacy_filters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = _stage_media_files(
        spark, sf_dir, "pdf_legacy_filter_files", "pdf",
        _render_pdf_legacy_filters,
    )
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pdf$", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = bf.join(docs, "doc_id")

    def op(batches):
        import re as _re

        import pandas as pd

        from ...operators.pdf import extract_pdf_text

        for pdf_batch in batches:
            out = {"doc_id": [], "coding": [], "n_pages": [],
                   "n_chars": [], "text_exact": []}
            for doc_id, content, text in zip(
                pdf_batch["doc_id"], pdf_batch["content"],
                pdf_batch["text"],
            ):
                payload = bytes(content)
                pages = extract_pdf_text(payload)
                rebuilt = "".join(ln for pg in pages for ln in pg)
                names = _re.findall(
                    rb"/(?:LZW|RunLength|ASCIIHex|ASCII85)Decode", payload
                )
                out["doc_id"].append(int(doc_id))
                out["coding"].append(
                    "+".join(dict.fromkeys(n.decode() for n in names))
                )
                out["n_pages"].append(len(pages))
                out["n_chars"].append(len(rebuilt))
                out["text_exact"].append(1 if rebuilt == text else 0)
            yield pd.DataFrame(out)

    return joined.mapInPandas(
        op,
        schema="doc_id long, coding string, n_pages int, n_chars long, "
        "text_exact int",
    )
