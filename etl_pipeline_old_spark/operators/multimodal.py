"""Multimodal columns: opaque ``binary`` payloads + typed metadata
(north-star extension, BASELINE.json).

Images/audio/video are carried as binary columns; decode / feature-extract
/ frame-sample run as Arrow-batched ``mapInPandas`` operators so each
executor processes whole record batches without JVM round-trips per row.

THE ACTUAL CODECS ARE STUBBED: this container has no image/audio
libraries, so ``decode_image_real`` raises NotImplementedError with the
intended dependency, while ``fake_decode_meta`` is a clearly-marked
deterministic stand-in that keeps the Spark-side plumbing (schema,
batching, UDF signatures, partitioning) real and testable.
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


def decode_image_real(payload: bytes):
    """The real decode path — requires an image codec library (e.g.
    Pillow), which is not installed in this environment."""
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL.Image.open); "
        "not available in this container — use fake_decode_meta for plumbing tests"
    )


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
