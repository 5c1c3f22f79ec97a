"""WARC/WET container reader: Common Crawl's distribution format
(WARC 1.0, ISO 28500 — public spec) parsed into the north-rule input
table ``(url, warc_ts, html BINARY, text, lang)``.

Common Crawl ships each crawl as ~90k gzip WARC segments of ~1 GB,
with every record compressed as its own gzip member so readers can
split on member boundaries. WARC records are self-delimiting via
``Content-Length``, so this reader decodes gzip members INCREMENTALLY
and yields records as soon as their bytes are complete — peak
decompressed buffering is max(one member, one record), never the
whole segment (~4-5 GB for a ~1 GB segment; at 16-32 tasks per
executor whole-segment buffering would be the executor's entire
memory). The SEGMENT FILE is the Spark parallelism unit (one
``binaryFile`` row per segment, records split inside a mapInPandas
pass), which matches how the corpus is actually laid out:
parallelism = number of segments, no intra-file splits needed.

Record mapping (everything else — warcinfo, request, metadata,
revisit — is skipped):

  * ``response``   -> the HTTP payload body becomes the ``html``
                      binary column (headers stripped at the first
                      CRLFCRLF), ``text`` = ''.
  * ``conversion`` -> (WET) the block is pre-extracted UTF-8 text:
                      ``text`` column, ``html`` = b''. WET's
                      ``WARC-Identified-Content-Language`` header
                      feeds ``lang`` (first language when a
                      comma-list).

Malformed records don't poison a segment: the reader re-synchronizes
at the next ``WARC/`` version line and counts what it skipped.
"""

from __future__ import annotations

import datetime as dt
import gzip
import zlib
from collections.abc import Iterator

GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"
# Compressed-input feed window: bounds both the per-call decompressor
# input and the post-member ``unused_data`` copy (the naive
# data = d.unused_data loop re-copies the whole compressed remainder
# once per member — O(members x segment) on a ~100k-member segment).
_FEED = 1 << 20
# A WARC header block is a few hundred bytes; a megabyte without the
# terminating CRLFCRLF means the record is garbage, not a header.
_MAX_HEADER = 1 << 20


class _StreamDecoder:
    """Member-by-member gzip decoder (passthrough for plain bytes).

    ``next_chunk()`` returns one decompressed member at a time (or the
    whole input when it isn't gzip), ``None`` at end of stream. A
    corrupt or truncated member keeps every member decoded so far and
    sets ``bad = 1`` instead of raising — one bad segment out of ~90k
    must degrade, never kill the ingest task."""

    def __init__(self, data: bytes):
        self._mv = memoryview(data)
        self._pos = 0
        self._plain = data[:2] != GZIP_MAGIC
        self._done = False
        self.bad = 0

    def next_chunk(self) -> bytes | None:
        if self._done:
            return None
        if self._plain:
            self._done = True
            return bytes(self._mv)
        while self._pos < len(self._mv):
            if bytes(self._mv[self._pos:self._pos + 2]) != GZIP_MAGIC:
                # Non-gzip trailing garbage after valid members.
                self.bad = 1
                break
            d = zlib.decompressobj(wbits=31)
            out = []
            try:
                while not d.eof and self._pos < len(self._mv):
                    piece = self._mv[self._pos:self._pos + _FEED]
                    out.append(d.decompress(piece))
                    self._pos += len(piece)
                if d.eof:
                    self._pos -= len(d.unused_data)
                    out.append(d.flush())
                else:
                    # Input exhausted mid-member: truncated download.
                    self.bad = 1
                    self._done = True
                    return b"".join(out) or None
            except zlib.error:
                self.bad = 1
                break
            chunk = b"".join(out)
            if chunk:
                return chunk
        self._done = True
        return None


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {lower-name: value}, "content": bytes,
    "offset": int}`` per record, decoding the segment INCREMENTALLY —
    peak buffered decompressed bytes is max(one gzip member, one
    record), never the whole segment. Tolerant and total: a record
    that fails to parse (bad/negative Content-Length, endless header,
    body truncated by a cut-off download) is skipped and the scan
    re-synchronizes at the next version line; the cursor strictly
    advances every iteration, so no malformed shape can loop. The
    count of skips is reported in ``headers['_skipped']`` on a
    synthetic trailing record only when nonzero."""
    dec = _StreamDecoder(data)
    buf = b""
    base = 0  # absolute offset of buf[0] in the decompressed stream
    skipped = 0

    def fill() -> bool:
        nonlocal buf
        chunk = dec.next_chunk()
        if chunk is None:
            return False
        buf += chunk
        return True

    def resync(start: int) -> bool:
        """Advance buf past the next ``\\r\\nWARC/`` at/after start,
        pulling more chunks as needed; False when the stream ends
        first. Keeps only a marker-sized tail while scanning."""
        nonlocal buf, base
        while True:
            nxt = buf.find(b"\r\nWARC/", start)
            if nxt >= 0:
                base += nxt + 2
                buf = buf[nxt + 2:]
                return True
            keep = max(len(buf) - 6, start)
            base += keep
            buf = buf[keep:]
            start = 0
            if not fill():
                base += len(buf)
                buf = b""
                return False

    truncated = False
    while True:
        # Skip inter-record blank lines (records start with "WARC/"),
        # refilling as needed — a member boundary can land right before
        # the separator, so the skip must re-run after every fill or a
        # chunk that starts with CRLF would count a phantom casualty.
        while True:
            i = 0
            while i < len(buf) and buf[i] in (0x0D, 0x0A):
                i += 1
            if i:
                base += i
                buf = buf[i:]
            if len(buf) >= 5 or not fill():
                break
        if not buf:
            break
        if not buf.startswith(b"WARC/"):
            # Out of sync: jump to the next version line.
            skipped += 1
            if not resync(0):
                break
            continue
        hdr_end = buf.find(_CRLF2)
        scan = 0
        bad_header = False
        while hdr_end < 0:
            if len(buf) > _MAX_HEADER:
                bad_header = True
                break
            scan = max(0, len(buf) - 3)
            if not fill():
                break
            hdr_end = buf.find(_CRLF2, scan)
        if hdr_end < 0:
            skipped += 1
            if bad_header and resync(5):
                continue
            break
        head = buf[:hdr_end].decode("utf-8", errors="replace")
        headers: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # Unparseable or NEGATIVE Content-Length — a negative value
            # must not walk the cursor backwards (re-yield loop).
            skipped += 1
            if not resync(hdr_end):
                break
            continue
        body_start = hdr_end + 4
        while len(buf) < body_start + length and fill():
            pass
        if len(buf) < body_start + length:
            # Truncated download: a partial body is a casualty, not a
            # silently corrupt document row.
            skipped += 1
            truncated = True
            break
        content = buf[body_start:body_start + length]
        yield {"headers": headers, "content": content, "offset": base}
        base += body_start + length
        buf = buf[body_start + length:]
    # A truncated gzip member and the truncated record it produced are
    # ONE casualty, not two — only add the decoder's flag when the
    # parse loop didn't already count the same byte-stream failure.
    skipped += max(dec.bad - (1 if truncated else 0), 0)
    if skipped:
        yield {"headers": {"_skipped": str(skipped)}, "content": b""}


def _parse_warc_date(s: str) -> dt.datetime | None:
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def record_to_row(rec: dict) -> dict | None:
    """North-rule input row for a response/conversion record, None for
    every other record type."""
    h = rec["headers"]
    rtype = h.get("warc-type")
    url = h.get("warc-target-uri")
    if rtype not in ("response", "conversion") or not url:
        return None
    ts = _parse_warc_date(h.get("warc-date", ""))
    if rtype == "response":
        content = rec["content"]
        # Strip the HTTP envelope: body starts after the first blank
        # line — CRLFCRLF per spec, but crawlers preserve LF-only
        # header blocks from non-compliant servers verbatim, so accept
        # whichever blank line comes first.
        crlf = content.find(_CRLF2)
        lf = content.find(b"\n\n")
        if crlf >= 0 and (lf < 0 or crlf <= lf):
            body = content[crlf + 4:]
        elif lf >= 0:
            body = content[lf + 2:]
        else:
            body = content
        return {"url": url, "warc_ts": ts, "html": body, "text": "",
                "lang": None}
    lang = h.get("warc-identified-content-language")
    if lang:
        lang = lang.split(",")[0].strip() or None
    return {"url": url, "warc_ts": ts, "html": b"",
            "text": rec["content"].decode("utf-8", errors="replace"),
            "lang": lang}


def segment_rows(data: bytes) -> tuple[list[dict], int]:
    """All input rows of one WARC/WET segment + the malformed-record
    skip count."""
    rows, skipped = [], 0
    for rec in iter_warc_records(data):
        if "_skipped" in rec["headers"]:
            skipped = int(rec["headers"]["_skipped"])
            continue
        row = record_to_row(rec)
        if row is not None:
            row["offset"] = rec["offset"]
            rows.append(row)
    return rows, skipped


def read_warc(spark, path, num_partitions: int | None = None,
              skip_accumulator=None):
    """WARC/WET segments -> the north-rule input DataFrame.

    ``binaryFile`` gives one row per segment; Common Crawl's ~1 GB
    segment sizing makes that the right task granularity (a crawl is
    ~90k segments >> any executor count). Records split inside an
    Arrow-batched mapInPandas pass; per-segment skip counts ride a
    ``_warc_skipped`` column so a lossy segment is observable, not
    silent (same contract as the LSH drop counters). Document rows
    always carry ``_warc_skipped = 0``; every segment with casualties
    emits exactly ONE bookkeeping row (NULL url, the segment's count)
    — so ``SUM(_warc_skipped)`` over the frame IS the total casualty
    count, and document consumers filter ``url IS NOT NULL``.
    ``skip_accumulator`` (a SparkContext accumulator) additionally
    collects the total with no second scan — best-effort under task
    retries, for job summaries."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    schema = StructType([
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("_warc_segment", StringType(), True),
        # Record byte offset in the DECOMPRESSED segment stream — the
        # north-rule lineage pair (source split, byte offset) for a
        # row's provenance back into the crawl.
        StructField("_warc_offset", LongType(), True),
        StructField("_warc_skipped", IntegerType(), True),
    ])
    cols = [f.name for f in schema.fields]

    def split(batches):
        for pdf in batches:
            out = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows, skipped = segment_rows(bytes(content))
                if skipped and skip_accumulator is not None:
                    skip_accumulator.add(skipped)
                if skipped:
                    # One bookkeeping row per lossy segment carries the
                    # whole count (document rows stay 0) so a plain
                    # SUM(_warc_skipped) is the total, never a
                    # per-row-replicated overcount.
                    out.append((None, None, None, None, None, path_,
                                None, skipped))
                for r in rows:
                    out.append((r["url"], r["warc_ts"], r["html"],
                                r["text"], r["lang"], path_,
                                r["offset"], 0))
            yield pd.DataFrame(out, columns=cols)

    df = (spark.read.format("binaryFile").load(path)
          .select("path", "content"))
    if num_partitions:
        df = df.repartition(num_partitions, F.xxhash64("path"))
    return df.mapInPandas(split, schema=schema)


# ---------------- test/synth-side writer ----------------

def _record_bytes(headers: list[tuple[str, str]], content: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers)
    head += f"Content-Length: {len(content)}\r\n".encode()
    return head + b"\r\n" + content + b"\r\n\r\n"


def build_warc_bytes(rows: list[dict], gzip_per_record: bool = True) -> bytes:
    """Deterministic WARC segment for tests: one response record per
    row with non-empty ``html`` (wrapped in an HTTP/1.1 envelope), one
    conversion record per row with ``text``; each record its own gzip
    member when ``gzip_per_record`` (the Common-Crawl layout)."""
    out = []
    for r in rows:
        ts = r.get("warc_ts")
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if ts else "2026-01-01T00:00:00Z")
        if r.get("html"):
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"\r\n" + r["html"])
            rec = _record_bytes(
                [("WARC-Type", "response"),
                 ("WARC-Target-URI", r["url"]),
                 ("WARC-Date", date),
                 ("Content-Type", "application/http; msgtype=response")],
                http)
        else:
            hdrs = [("WARC-Type", "conversion"),
                    ("WARC-Target-URI", r["url"]),
                    ("WARC-Date", date),
                    ("Content-Type", "text/plain")]
            if r.get("lang"):
                hdrs.append(("WARC-Identified-Content-Language", r["lang"]))
            rec = _record_bytes(hdrs, r["text"].encode("utf-8"))
        out.append(gzip.compress(rec) if gzip_per_record else rec)
    return b"".join(out)


# ---------------- distributed WET sink ----------------

def _wet_record_bytes(url: str, date: str, text: str,
                      lang: str | None) -> bytes:
    hdrs = [("WARC-Type", "conversion"),
            ("WARC-Target-URI", url),
            ("WARC-Date", date),
            ("Content-Type", "text/plain")]
    if lang:
        hdrs.append(("WARC-Identified-Content-Language", lang))
    return _record_bytes(hdrs, text.encode("utf-8"))


def _gzip_member(raw: bytes) -> bytes:
    """One gzip member with mtime pinned to 0 and no FNAME field —
    gzip.compress() stamps the wall clock into the header, which would
    make two runs of the same job produce different bytes and break
    the sink's determinism contract."""
    import io
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


WET_MANIFEST_SCHEMA = ("segment int, path string, n_records long, "
                       "n_chars long, n_bytes long, n_skipped long, "
                       "content_md5 string")


def write_wet(df, out_dir: str, num_segments: int = 64,
              bucket_mode: str = "xxhash64",
              prefix: str = "part"):
    """Persist the extracted corpus as WET segments — the sink twin of
    ``read_warc``, closing the crawl round trip (read raw WARC ->
    extract -> write WET that any WET consumer, including this repo's
    own source, can read back).

    Input: the north-rule frame (``url``, ``warc_ts``, ``text``,
    optional ``lang``); every row becomes one ``conversion`` record,
    each its own gzip member (the Common-Crawl layout ``read_warc``
    splits on). Returns the MANIFEST DataFrame — one row per segment:
    (segment, path, n_records, n_chars, n_bytes, n_skipped,
    content_md5). Rows with a NULL url or NULL text can't be valid WET
    records; they are counted per segment (``n_skipped``), never
    silently dropped.

    Scale/determinism design:

      * Segment assignment is ``pmod(hash(url), num_segments)`` —
        content-addressed, so WHICH file a url lands in is independent
        of input partitioning, executor count, and task scheduling.
        ``bucket_mode='md5'`` swaps xxhash64 for the DuckDB-expressible
        md5_hash31 family so the driver oracle can replay the manifest.
      * One ``groupBy(segment).applyInPandas`` writes each segment:
        the shuffle is exactly the write amplification a distributed
        writer must pay, rows are sorted (url, warc_ts, text) INSIDE
        the group, and gzip members carry mtime=0 — so segment BYTES
        are a pure function of corpus content. Re-running the job at
        any parallelism reproduces identical files (asserted by md5 in
        tests), which is what makes task retries harmless: writes go
        to a unique tmp name and ``os.replace`` onto the target, so a
        retried task atomically installs the same bytes.
      * Executors write, the driver only collects the tiny manifest
        (num_segments rows). Size ``num_segments`` so a segment is
        ~1 GB at the target scale (Common Crawl's own sizing: a 100 TB
        corpus -> ~10^5 segments), keeping one group ~executor-task
        sized.
    """
    import os as _os
    import uuid as _uuid

    import pandas as pd

    from pyspark.sql import functions as F

    from ..operators.dedup import md5_hash31

    if num_segments < 1:
        raise ValueError("num_segments must be >= 1")
    _os.makedirs(out_dir, exist_ok=True)
    url_c = F.coalesce(F.col("url"), F.lit(""))
    if bucket_mode == "md5":
        seg = F.pmod(md5_hash31(url_c), F.lit(num_segments))
    elif bucket_mode == "xxhash64":
        seg = F.pmod(F.xxhash64(url_c), F.lit(num_segments))
    else:
        raise ValueError(f"unknown bucket_mode: {bucket_mode}")

    cols = ["url", "warc_ts", "text"]
    lang_col = (F.col("lang") if "lang" in df.columns
                else F.lit(None).cast("string"))
    rows = df.select(seg.cast("int").alias("_segment"),
                     F.col("url"), F.col("warc_ts"),
                     F.col("text"), lang_col.alias("lang"))

    def write_one(pdf: pd.DataFrame):
        seg_id = int(pdf["_segment"].iloc[0])
        _os.makedirs(out_dir, exist_ok=True)  # executor-side (shared fs)
        ok = pdf[pdf["url"].notna() & pdf["text"].notna()]
        skipped = len(pdf) - len(ok)
        ok = ok.sort_values(cols, kind="mergesort", na_position="last")
        import hashlib
        h = hashlib.md5()
        n_chars = 0
        path = _os.path.join(out_dir, f"{prefix}-{seg_id:05d}.wet.gz")
        tmp = f"{path}.tmp-{_uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            for url, ts, text, lang in zip(ok["url"], ok["warc_ts"],
                                           ok["text"], ok["lang"]):
                date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                        if ts is not None and not pd.isna(ts)
                        else "2026-01-01T00:00:00Z")
                member = _gzip_member(_wet_record_bytes(
                    url, date, text,
                    None if (lang is None or pd.isna(lang)) else lang))
                fh.write(member)
                h.update(member)
                n_chars += len(text)
        _os.replace(tmp, path)
        return pd.DataFrame([{
            "segment": seg_id, "path": path, "n_records": len(ok),
            "n_chars": n_chars, "n_bytes": _os.path.getsize(path),
            "n_skipped": skipped, "content_md5": h.hexdigest()}])

    return (rows.groupBy("_segment")
            .applyInPandas(write_one, schema=WET_MANIFEST_SCHEMA))
