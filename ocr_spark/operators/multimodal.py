"""Multimodal column plumbing: opaque binary media + typed metadata.

The decode layer is REAL for the formats the stdlib + numpy can
cover: PNG (all color types / bit depths / filters / Adam7),
uncompressed BMP, and PPM from scratch in textlib/imagecodec.py;
JPEG — baseline sequential AND progressive (ITU-T T.81: Huffman
entropy decode, spectral selection + successive approximation,
dequant, exact IDCT, 4:2:0 upsample, JFIF YCbCr->RGB) from scratch
in textlib/jpegcodec.py; GIF87a/89a (variable-width LZW, interlace,
transparency + disposal compositing, animated frame sampling) from
scratch in textlib/gifcodec.py; TIFF 6.0 (strips, PackBits, MSB-first
early-change LZW + predictor, WhiteIsZero/palette) from scratch in
textlib/tiffcodec.py — no PIL/cv2 needed. The compressed
audio/video codecs stay gated (the library swap-in points). Two
featurizers feed downstream similarity:
``pixel_stats_v1`` (decoded-pixel stats + luma histogram) when the
payload decodes, ``byte_histogram_v1`` as the opaque-bytes fallback —
each feature row names which one produced it.
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
    """Decode image bytes to a numpy pixel array (H, W[, C]).

    PNG / BMP / PPM decode natively (textlib/imagecodec.py), as do
    JPEG — baseline and progressive (textlib/jpegcodec.py; arithmetic
    /hierarchical/lossless raise and fall back) — GIF
    (textlib/gifcodec.py, first frame), and TIFF
    (textlib/tiffcodec.py). Raises
    imagecodec.ImageFormatError on corrupt or unrecognized bytes
    (callers fall back to the byte featurizer).
    """
    from ..textlib import imagecodec as ic

    if payload.startswith(ic.PNG_SIGNATURE):
        return ic.decode_png(payload)
    if payload.startswith(b"BM"):
        return ic.decode_bmp(payload)
    if payload.startswith(b"P6"):
        return ic.decode_ppm(payload)
    if payload.startswith(b"\xff\xd8\xff"):
        from ..textlib import jpegcodec as jc
        return jc.decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..textlib import gifcodec as gc
        return gc.decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from ..textlib import tiffcodec as tc
        return tc.decode_tiff(payload)
    raise ic.ImageFormatError("unrecognized image magic")


def decode_audio(payload: bytes):
    """Decode audio bytes to ((n_frames, channels) samples, rate).

    WAV/RIFF PCM decodes natively (textlib/avcodec.py). MP3/AAC/OGG
    need an entropy decoder — gated like JPEG, naming the swap-in."""
    from ..textlib import avcodec as av

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return av.decode_wav(payload)
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3",
                                                b"\xff\xf2"):
        raise NotImplementedError(
            "MP3 decode requires an audio codec library; wire "
            "soundfile/librosa here on a real cluster")
    if payload[:4] == b"OggS":
        raise NotImplementedError(
            "OGG decode requires an audio codec library; wire "
            "soundfile here on a real cluster")
    raise av.MediaFormatError("unrecognized audio magic")


def decode_video_frames(payload: bytes, every_n: int = 1,
                        max_frames: int | None = None):
    """Iterate (frame_index, RGB frame) with every_n-th sampling.

    YUV4MPEG2 decodes natively (textlib/avcodec.py), and animated GIF
    decodes as a frame stream (textlib/gifcodec.py — skipped frames
    still decode because disposal compositing chains, but only
    sampled frames convert and emit). MP4/WebM/MKV need an H.264/VP9
    decoder — gated, naming the swap-in."""
    from ..textlib import avcodec as av

    if payload.startswith(b"YUV4MPEG2"):
        return av.decode_y4m_frames(payload, every_n=every_n,
                                    max_frames=max_frames)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..textlib import gifcodec as gc
        return gc.decode_gif_frames(payload, every_n=every_n,
                                    max_frames=max_frames)
    if payload[4:8] == b"ftyp" or payload[:4] == b"\x1a\x45\xdf\xa3":
        raise NotImplementedError(
            "MP4/WebM decode requires a video codec library; wire "
            "PyAV/ffmpeg here on a real cluster")
    raise av.MediaFormatError("unrecognized video magic")


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


PIXEL_FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),      # null when undecodable
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("features", ArrayType(DoubleType()), False),
    StructField("featurizer", StringType(), False),
    StructField("decode_error", StringType(), True),
])


def pixel_featurize_batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode pixels where the format allows, fall
    back to the byte histogram where it doesn't — never raise (the
    poison-row contract of the extraction pipeline applies here too)."""
    from ..textlib import imagecodec as ic

    cols = [f.name for f in PIXEL_FEATURE_SCHEMA.fields]
    for pdf in iterator:
        out = []
        for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                           pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            try:
                arr = decode_image(raw)
                h, w = int(arr.shape[0]), int(arr.shape[1])
                c = int(arr.shape[2]) if arr.ndim == 3 else 1
                out.append((media_id, kind, len(raw), w, h, c,
                            ic.pixel_features(arr), "pixel_stats_v1", None))
            except (ic.ImageFormatError, NotImplementedError) as e:
                out.append((media_id, kind, len(raw), None, None, None,
                            byte_histogram(raw), "byte_histogram_v1",
                            f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(out, columns=cols)


def extract_pixel_features(media: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """Decoded-pixel feature rows for every media row: real PNG/BMP/PPM
    decode (textlib/imagecodec.py), byte-histogram fallback with the
    decode error recorded per row. Same partitioning contract as
    extract_features."""
    if num_partitions:
        media = media.repartition(num_partitions, F.xxhash64("media_id"))
    return media.mapInPandas(pixel_featurize_batches,
                             schema=PIXEL_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("n_frames", LongType(), True),     # null when undecodable
    StructField("channels", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("features", ArrayType(DoubleType()), False),
    StructField("featurizer", StringType(), False),
    StructField("decode_error", StringType(), True),
])


def audio_featurize_batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..textlib import avcodec as av

    cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]
    for pdf in iterator:
        out = []
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            try:
                samples, rate = decode_audio(raw)
                out.append((media_id, len(raw), samples.shape[0],
                            int(samples.shape[1]), rate,
                            int(samples.shape[0] * 1000 / rate) if rate else 0,
                            av.audio_features(samples, rate),
                            "audio_stats_v1", None))
            except (av.MediaFormatError, NotImplementedError) as e:
                out.append((media_id, len(raw), None, None, None, None,
                            byte_histogram(raw), "byte_histogram_v1",
                            f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(out, columns=cols)


def extract_audio_features(media: DataFrame,
                           num_partitions: int | None = None) -> DataFrame:
    """Decoded-audio feature rows (RMS, peak, zero-cross rate, rfft
    spectrum bins) with per-row byte-histogram fallback — same contract
    as extract_pixel_features."""
    if num_partitions:
        media = media.repartition(num_partitions, F.xxhash64("media_id"))
    return media.mapInPandas(audio_featurize_batches,
                             schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),  # index in the stream
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("features", ArrayType(DoubleType()), False),
    StructField("featurizer", StringType(), False),
])


def _video_frame_batches(every_n: int, max_frames: int | None):
    from ..textlib import imagecodec as ic
    from ..textlib import avcodec as av

    cols = [f.name for f in VIDEO_FRAME_SCHEMA.fields]

    def kernel(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    for idx, rgb in decode_video_frames(
                            raw, every_n=every_n, max_frames=max_frames):
                        rows.append((media_id, idx, rgb.shape[1],
                                     rgb.shape[0], ic.pixel_features(rgb),
                                     "pixel_stats_v1"))
                except (av.MediaFormatError, ic.ImageFormatError,
                        NotImplementedError):
                    continue  # undecodable stream contributes no frames
            yield pd.DataFrame(rows, columns=cols)

    return kernel


def sample_video_frames(media: DataFrame, every_n: int = 1,
                        max_frames: int | None = None,
                        num_partitions: int | None = None) -> DataFrame:
    """One feature row per SAMPLED frame of every decodable video
    payload (Y4M natively; compressed containers contribute no rows
    until a codec library is wired in). Sampling happens at the parse
    — skipped frames are pointer bumps, not conversions — so
    every_n=30 over a long stream is cheap."""
    if num_partitions:
        media = media.repartition(num_partitions, F.xxhash64("media_id"))
    return media.mapInPandas(_video_frame_batches(every_n, max_frames),
                             schema=VIDEO_FRAME_SCHEMA)


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
