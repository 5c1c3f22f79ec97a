"""WARC/WET as a native Spark data source (PySpark 4 Python Data
Source API): ``spark.read.format("warc").load(path)`` and
``spark.readStream.format("warc").load(path)``.

Same row contract as :func:`ocr_spark.sources.warc.read_warc` (the
mapInPandas path) — byte-identical rows, the same one-bookkeeping-row
per lossy segment skip accounting — but expressed as a first-class
source:

* **Partition planning is explicit**: one :class:`InputPartition` per
  segment file, planned driver-side from a cheap listing (no
  ``binaryFile`` scan relation, no repartition shuffle). Common
  Crawl's ~1 GB × ~90k-segment layout makes segment=task the right
  granularity at any executor count.
* **The streaming reader turns a growing crawl directory into a
  Structured Streaming source**: the offset is a cursor over the
  sorted segment listing, so each micro-batch reads exactly the new
  segments — composable with the existing curation-on-ingest jobs
  (``streaming/jobs.py``) without the file-source's per-file
  tracking log growing unbounded.

Registration is per-session and explicit::

    from ocr_spark.sources.warc_datasource import register
    register(spark)
    df = spark.read.format("warc").load("/crawl/segments")

Record parsing reuses :func:`ocr_spark.sources.warc.segment_rows`
(member-streamed gzip decode, malformed-record resync, negative /
truncated Content-Length casualties) so both read paths share one
tested parser.
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Matches read_warc's StructType (DDL form — the DataSource API takes
# a DDL string; keep in lockstep with warc.read_warc).
WARC_DDL = ("url string, warc_ts timestamp, html binary, text string, "
            "lang string, _warc_segment string, _warc_offset long, "
            "_warc_skipped int")


def _list_segments(path: str) -> list[str]:
    """Deterministic (sorted) segment listing for a directory, a glob,
    or a single file — the order is the streaming offset space, so it
    must be stable across calls.

    LOCAL-FILESYSTEM ONLY (posix listdir/glob driver-side, open()
    executor-side): on a multi-node cluster the path must be a shared
    mount, and object-store URIs (s3a://, hdfs://) are not supported —
    the Python Data Source API has no Hadoop FS bridge; use
    ``warc.read_warc`` (binaryFile-based) for those. Rejected loudly
    here rather than failing as an empty listing."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", path):
        raise ValueError(
            f"format('warc') reads local/shared-mount paths only; got "
            f"{path!r} — use ocr_spark.sources.warc.read_warc for "
            f"object-store / HDFS URIs (binaryFile handles them)")
    if os.path.isdir(path):
        names = [os.path.join(path, n) for n in sorted(os.listdir(path))]
        return [p for p in names if os.path.isfile(p)]
    hits = sorted(_glob.glob(path))
    if hits:
        return [p for p in hits if os.path.isfile(p)]
    if os.path.isfile(path):
        return [path]
    return []


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _segment_tuples(path: str):
    """All output tuples of one segment file (the shared parser's rows
    in WARC_DDL column order; the skip bookkeeping row first, matching
    read_warc's emission order)."""
    from ocr_spark.sources.warc import segment_rows

    with open(path, "rb") as f:
        data = f.read()
    rows, skipped = segment_rows(data)
    if skipped:
        yield (None, None, None, None, None, path, None, skipped)
    for r in rows:
        yield (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"],
               path, r["offset"], 0)


class WarcBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self._path = path

    def partitions(self):
        segs = _list_segments(self._path)
        if not segs:
            raise FileNotFoundError(
                f"warc source: no segment files under {self._path!r}")
        return [_SegmentPartition(p) for p in segs]

    def read(self, partition: _SegmentPartition):
        yield from _segment_tuples(partition.path)


class WarcStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing segment directory. The offset
    is ``{"pos": N}`` — the first N entries of the SORTED listing have
    been emitted. Segments must be immutable once present (the Common
    Crawl layout: a segment is written elsewhere and moved in —
    write-then-RENAME, never cp-in-place: a mid-copy file would be
    admitted truncated, its casualties counted, and its tail never
    re-read because the positional cursor does not revisit); files
    that sort BEFORE already-committed ones are never re-listed into a
    batch, so producers must use monotonic names (CC segment names
    are).

    Spark limitation (4.1): Python micro-batch sources don't implement
    Trigger.AvailableNow's admission protocol — Spark logs a warning
    and falls back to ONE catch-up batch, which for this source is
    equivalent (latestOffset is a point-in-time listing). Exactly-once
    restart from the checkpoint is tested either way."""

    def __init__(self, path: str):
        self._path = path

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": len(_list_segments(self._path))}

    def partitions(self, start: dict, end: dict):
        segs = _list_segments(self._path)
        lo, hi = int(start["pos"]), int(end["pos"])
        if len(segs) < hi:
            # The listing SHRANK inside an already-planned offset range
            # (a segment was deleted, or a non-atomic writer's temp
            # file vanished). Clamping would silently skip data the
            # offset log says was admitted — fail loudly instead; the
            # fix is producer-side (write-then-rename, monotonic
            # names), not reader-side guessing.
            raise RuntimeError(
                f"warc stream source: segment listing under "
                f"{self._path!r} shrank to {len(segs)} entries inside "
                f"the planned offset range [{lo}, {hi}) — segments "
                f"must be immutable and move-in only")
        return [_SegmentPartition(p) for p in segs[lo:hi]]

    def read(self, partition: _SegmentPartition):
        yield from _segment_tuples(partition.path)

    def commit(self, end: dict) -> None:
        # Progress lives in the checkpoint's offset log; nothing to
        # clean up source-side (segments are immutable inputs).
        pass


class WarcDataSource(DataSource):
    """``format("warc")``: batch + streaming reads of WARC/WET
    segment files into the north-rule input shape."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_DDL

    def _load_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "warc source requires a path: .load('/dir/or/glob')")
        return path

    def reader(self, schema) -> WarcBatchReader:
        return WarcBatchReader(self._load_path())

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self._load_path())


def register(spark) -> None:
    """Register ``format("warc")`` on this session (idempotent)."""
    spark.dataSource.register(WarcDataSource)
