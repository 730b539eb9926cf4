"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (and :func:`decode_image` raises
``NotImplementedError`` to mark the integration point), but everything
Spark-side is real and tested: schema, binary column handling, the
batch-iterator UDF signature, and partition-preserving feature
extraction. In production the fake body is replaced by e.g.
PIL/libvips decode — the plan shape does not change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id BIGINT, n_bytes INT, digest8 STRING, thumb_w INT, thumb_h INT"


def decode_image(payload: bytes):  # pragma: no cover - integration stub
    """Real image decode (PIL/libvips) — not available in this container."""
    raise NotImplementedError("image codecs are not installed; see module docstring")


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct (the
    multimodal table shape: payload is e.g. jpeg/wav bytes in prod)."""
    size = F.col("n_chars") if "n_chars" in docs.columns else F.length("text")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("mime"),
            size.alias("orig_size"),
        ).alias("meta"),
    )


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        digest8 = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()[:8])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "digest8": digest8,
                # deterministic fake "thumbnail" dims in place of real decode
                "thumb_w": (n_bytes % 64 + 1).astype("int32"),
                "thumb_h": (n_bytes // 64 % 64 + 1).astype("int32"),
            }
        )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    `mapInPandas` keeps partitioning (no shuffle); batch size is governed
    by spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
    bounded even with large payloads.
    """
    return multimodal.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id BIGINT, thumb BINARY, w INT, h INT"


def resize_thumbnails(multimodal: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Stubbed resize: in prod the batch body decodes + downsamples via
    PIL/libvips; the deterministic fake truncates the payload and derives
    dims from it. Plan shape (binary in → smaller binary out, partition-
    preserving, Arrow-batched) is the real one."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(lambda b: bytes(b)[:max_bytes])
            n = thumbs.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "w": (n % 16 + 1).astype("int32"),
                    "h": (n // 16 % 16 + 1).astype("int32"),
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"


def sample_frames(multimodal: DataFrame, n_frames: int = 4) -> DataFrame:
    """Stubbed video frame sampling: emits ``n_frames`` evenly-spaced
    payload slices per doc as (doc_id, frame_idx, frame) rows — the
    1→N row fan-out shape of real ffmpeg keyframe extraction, with
    deterministic fake frame bytes."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(b[i * step : i * step + step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": blobs})

    return multimodal.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)
