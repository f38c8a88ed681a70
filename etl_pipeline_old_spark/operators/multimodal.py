"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(north-star extension, BASELINE.json).

Images/audio/video are carried as binary columns; decode / feature-extract
/ frame-sample run as Arrow-batched ``mapInPandas`` operators so each
executor processes whole record batches without JVM round-trips per row.

Codec status (r5 verdict #5): UNCOMPRESSED formats are decoded for real —
``decode_image_real`` is a pure-stdlib netpbm parser (binary PPM ``P6``
and PGM ``P5``: magic, comment/whitespace-tolerant header, maxval, raster)
and ``encode_ppm_p6`` emits real, viewer-openable P6 bytes; the phash
dedup queries run decode → grayscale → aHash on real image bytes
end-to-end. COMPRESSED formats (JPEG/PNG/...) still need a codec library
absent from this container, so those magics raise NotImplementedError —
that seam is where Pillow plugs in on a real cluster. ``decode_meta`` and
friends remain deterministic stand-ins for the non-image batch shapes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, payload binary, kind string, n_bytes long"


def make_media_table(docs: DataFrame) -> DataFrame:
    """Wrap a text table as a media table: payload = utf-8 bytes (the
    deterministic stand-in for real image bytes), typed metadata columns."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("kind"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


def encode_ppm_p6(gray: list[int], width: int, height: int) -> bytes:
    """Real binary-PPM (netpbm ``P6``) bytes for a grayscale pixel list:
    each gray value g becomes the RGB triplet (g, g, g). The output is a
    spec-conformant image any netpbm-aware viewer opens."""
    if len(gray) != width * height:
        raise ValueError(f"{len(gray)} pixels for {width}x{height}")
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    raster = bytes(v for g in gray for v in (g, g, g))
    return header + raster


def _pnm_header_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated decimal tokens from a netpbm header,
    honoring ``#``-to-end-of-line comments (the spec allows them anywhere
    in the header). Returns (values, offset past the single whitespace
    byte that terminates the last token — the raster starts there)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i] == ord("#"):
            while i < len(payload) and payload[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"bad netpbm header near byte {i}")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte separates header & raster


def decode_image_real(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL image decode for uncompressed netpbm payloads: binary PPM
    (``P6``, RGB) and binary PGM (``P5``, gray). Pure stdlib — parses the
    magic, the comment-tolerant header (width, height, maxval), then the
    raster; returns (width, height, grayscale pixels 0..255), grayscale
    via the integer mean of R,G,B for P6.

    Compressed formats still require a codec library (e.g. Pillow) that
    this container lacks — their magics raise NotImplementedError, the
    documented seam where ``PIL.Image.open`` plugs in on a real cluster.
    """
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            f"no codec for magic {magic!r}: compressed-image decode requires "
            "an image library (e.g. PIL.Image.open), not available in this "
            "container — only uncompressed netpbm (P6/P5) decodes natively"
        )
    (width, height, maxval), off = _pnm_header_tokens(payload, 3, 2)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported maxval {maxval}")  # 2-byte samples: not needed
    n_px = width * height
    bpp = 3 if magic == b"P6" else 1
    raster = payload[off : off + n_px * bpp]
    if len(raster) != n_px * bpp:
        raise ValueError(f"truncated raster: {len(raster)} != {n_px * bpp}")
    if magic == b"P5":
        gray = list(raster)
    else:
        gray = [
            (raster[3 * k] + raster[3 * k + 1] + raster[3 * k + 2]) // 3
            for k in range(n_px)
        ]
    if maxval != 255:
        gray = [g * 255 // maxval for g in gray]
    return width, height, gray


def md5_pixels(text: str, n: int = 64) -> list[int]:
    """Deterministic 8x8 grayscale 'photo' of a document: pixel j is byte
    j%16 of md5('p{j//16}:' + text) — the same formula the DuckDB phash
    oracle computes in SQL, so an image RENDERED from these pixels and
    then genuinely decoded yields oracle-checkable values."""
    px: list[int] = []
    for k in range((n + 15) // 16):
        d = hashlib.md5(f"p{k}:".encode() + text.encode("utf-8")).digest()
        px.extend(d[:16])
    return px[:n]


def md5_pixel_sql(j: int, text_col: str = "text") -> str:
    """DuckDB SQL for pixel j of md5_pixels: byte j%16 of
    md5('p{j//16}:' || text). The single source of truth for the oracle-side
    formula — the phash and ppm-ingest oracles both build from it, so a
    change here (or in md5_pixels above) cannot desynchronize them."""
    return (
        f"('0x' || substr(md5('p{j // 16}:' || {text_col}), {(j % 16) * 2 + 1}, 2))::INT"
    )


def make_image_table(docs: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Render each document as a REAL 8x8 binary-PPM image (P6 bytes a
    netpbm viewer opens) carried in a binary column — the ingest stand-in
    for scanning a bucket of image files with ``spark.read.format
    ("binaryFile")``, which multimodal_binaryfile_scan covers. Runs as an
    Arrow-batched mapInPandas encode kernel; downstream consumers must
    DECODE the payload (decode_image_real) to get pixels back."""
    n = width * height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["text"].map(
                lambda t: encode_ppm_p6(md5_pixels(t, n), width, height)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "kind": "image/x-portable-pixmap",
                    "n_bytes": payloads.map(len),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(op, schema=MEDIA_SCHEMA)


def ahash64(gray: list[int]) -> str:
    """Average-hash of a decoded grayscale raster: bit j = pixel_j > mean,
    emitted as a 64-char bit string (band-splittable for Hamming LSH)."""
    mean = sum(gray) / len(gray)
    return "".join("1" if g > mean else "0" for g in gray)


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    # DETERMINISTIC FAKE: pretend dimensions derived from payload size
    return 1 + n_bytes % 64, 1 + (n_bytes // 64) % 64


def decode_meta(media: DataFrame) -> DataFrame:
    """'Decode' each payload to (width, height, checksum) via mapInPandas.

    Real plumbing: Arrow binary batches in, new schema out; swap
    ``_fake_dims``/md5 for a real codec on a real cluster.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": 1 + n % 64,
                    "height": 1 + (n // 64) % 64,
                    "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(op, schema="doc_id long, width long, height long, checksum string")


def feature_extract(media: DataFrame, dim: int = 8) -> DataFrame:
    """Pseudo-embedding per payload (md5-seeded floats in [0,1)) —
    deterministic stand-in for a real vision encoder; demonstrates the
    binary → array<float> batch shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def emb(b: bytes) -> list[float]:
                h = hashlib.md5(b).digest()
                return [int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0 for i in range(dim)]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["payload"].map(emb)}
            )

    return media.mapInPandas(op, schema="doc_id long, features array<float>")


def resize(media: DataFrame, factor: int = 2) -> DataFrame:
    """'Resize' payloads by an integer factor — DETERMINISTIC FAKE
    (byte-stride downsample standing in for pixel resampling); keeps the
    binary-in/binary-out batch shape of a real resize kernel."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b[::factor]))
            n = resized.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": 1 + n % 64,
                    "height": 1 + (n // 64) % 64,
                }
            )

    return media.mapInPandas(op, schema="doc_id long, payload binary, width long, height long")


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample N equal-size byte slices ("frames") per payload —
    the video-frame-sampling batch shape: one row in, N rows out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(i)
                    out["frame"].append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame(out)

    return media.mapInPandas(op, schema="doc_id long, frame_id int, frame binary")
