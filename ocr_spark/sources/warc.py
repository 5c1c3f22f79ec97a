"""WARC/WET container reader: Common Crawl's distribution format
(WARC 1.0, ISO 28500 — public spec) parsed into the north-rule input
table ``(url, warc_ts, html BINARY, text, lang)``.

Common Crawl ships each crawl as ~90k gzip WARC segments of ~1 GB,
with every record compressed as its own gzip member so readers can
split on member boundaries. Python's zlib transparently decodes
multi-member streams and WARC records are self-delimiting via
``Content-Length``, so this reader decompresses a segment once and
walks records sequentially — the SEGMENT FILE is the Spark
parallelism unit (one ``binaryFile`` row per segment, records split
inside a mapInPandas pass), which matches how the corpus is actually
laid out: parallelism = number of segments, no intra-file splits
needed.

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


def _decompress(data: bytes) -> tuple[bytes, int]:
    """Decode a (possibly multi-member) gzip stream; passthrough for
    plain WARC bytes. Returns (decompressed, n_bad): a corrupt member
    or non-gzip trailing garbage keeps every member decoded so far and
    counts one casualty instead of raising — one bad segment out of
    ~90k must degrade, never kill the ingest task."""
    if data[:2] != GZIP_MAGIC:
        return data, 0
    out = []
    bad = 0
    while data:
        if data[:2] != GZIP_MAGIC:
            bad = 1
            break
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            bad = 1
            break
        data = d.unused_data
    return b"".join(out), bad


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {lower-name: value}, "content": bytes}`` per
    record. Tolerant: a record that fails to parse is skipped and the
    scan re-synchronizes at the next version line; the count of such
    skips is reported by parse errors in ``headers['_skipped']`` on a
    synthetic trailing record only when nonzero."""
    buf, skipped = _decompress(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # Skip inter-record blank lines (records start with "WARC/").
        while pos < n and buf[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            # Out of sync: jump to the next version line.
            nxt = buf.find(b"\r\nWARC/", pos)
            skipped += 1
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        rec_offset = pos  # byte offset in the decompressed stream
        hdr_end = buf.find(_CRLF2, pos)
        if hdr_end < 0:
            skipped += 1
            break
        head = buf[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            nxt = buf.find(b"\r\nWARC/", hdr_end)
            skipped += 1
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        body_start = hdr_end + 4
        content = buf[body_start:body_start + length]
        pos = body_start + length
        yield {"headers": headers, "content": content,
               "offset": rec_offset}
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
    silent (same contract as the LSH drop counters) — a segment whose
    every record is malformed still surfaces: it emits one
    bookkeeping row with a NULL url carrying its count (document
    consumers filter ``url IS NOT NULL``). ``skip_accumulator`` (a
    SparkContext accumulator) additionally collects the total with no
    second scan — best-effort under task retries, for job summaries."""
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
                if not rows and skipped:
                    # All-casualty segment: without a bookkeeping row
                    # its loss would vanish from the DataFrame.
                    out.append((None, None, None, None, None, path_,
                                None, skipped))
                for r in rows:
                    out.append((r["url"], r["warc_ts"], r["html"],
                                r["text"], r["lang"], path_,
                                r["offset"], skipped))
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
