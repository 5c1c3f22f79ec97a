"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video decode libraries are not available in this
environment, so the decode kernels are STUBS behind an import-try /
NotImplementedError gate — but everything Spark-side is real and
tested: schemas, Arrow batch shape, mapInPandas signatures,
partitioning, and a deterministic fallback featurizer (byte histogram)
so downstream plumbing (similarity over media features) can run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), True),    # opaque bytes
    StructField("meta", StructType([
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("features", ArrayType(DoubleType()), False),
    StructField("featurizer", StringType(), False),
])


def decode_image(payload: bytes):
    """Real decode requires PIL/cv2 — absent here by design."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image decode requires pillow/opencv; not available in this "
            "environment — deterministic byte-histogram featurizer is the "
            "supported fallback") from None
    raise NotImplementedError("wire PIL decode here on a real cluster")


def byte_histogram(payload: bytes, bins: int = 32) -> list[float]:
    """Deterministic fallback featurizer: normalized byte histogram."""
    if not payload:
        return [0.0] * bins
    counts = [0] * bins
    step = 256 // bins
    for b in payload:
        counts[b // step] += 1
    total = len(payload)
    return [c / total for c in counts]


def featurize_batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: media rows -> feature rows (Arrow-batched)."""
    for pdf in iterator:
        out = []
        for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                           pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            out.append({
                "media_id": media_id,
                "kind": kind,
                "n_bytes": len(raw),
                "features": byte_histogram(raw),
                "featurizer": "byte_histogram_v1",
            })
        yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_features(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Partition by media_id hash (payloads are large — same giant-blob
    considerations as the document pipeline) and featurize."""
    if num_partitions:
        media = media.repartition(num_partitions, F.xxhash64("media_id"))
    return media.mapInPandas(featurize_batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# PDF layout-analysis boxes (north rule: "pdfminer-style layout analysis
# for binary PDF payloads"). The geometric pass itself lives in
# textlib/pdflayout.py; this operator is the distributed form: binary
# payloads stay in their Arrow batch, one layout pass per document,
# one output row per text box in reading order.
# ---------------------------------------------------------------------------

PDF_BOX_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("page", IntegerType(), False),
    StructField("box_idx", IntegerType(), False),   # reading order
    StructField("box_text", StringType(), False),
    StructField("n_lines", IntegerType(), False),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("x1", DoubleType(), False),
    StructField("y1", DoubleType(), False),
    StructField("confidence", DoubleType(), False),
])


def layout_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..sources import payload as pl
    cols = [f.name for f in PDF_BOX_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for url, data in zip(pdf["url"], pdf["payload"]):
            if data is None:
                continue
            try:
                pages = pl.pdf_extract_layout(bytes(data))
            except pl.PayloadError:
                continue
            for pg in pages:
                for bi, b in enumerate(pg["boxes"]):
                    rows.append((url, pg["page"], bi, b["text"],
                                 b["n_lines"], b["x0"], b["y0"],
                                 b["x1"], b["y1"], b["confidence"]))
        yield pd.DataFrame(rows, columns=cols)


def pdf_layout_boxes(docs: DataFrame,
                     num_partitions: int | None = None) -> DataFrame:
    """Layout-analysis text boxes for every span-carrying page of every
    binary PDF payload in ``docs`` (columns: url, payload). Rows come
    back in reading order per page (box_idx); corrupt or encrypted
    payloads contribute no rows (the extraction pipeline, not this
    side table, is where per-document errors are surfaced)."""
    if num_partitions:
        docs = docs.repartition(num_partitions, F.xxhash64("url"))
    return docs.mapInPandas(layout_batches, schema=PDF_BOX_SCHEMA)
