"""WARC/WET segment reader (sources/warc.py): record parsing, gzip
member handling, malformed-record resync, and the Spark read path fed
into the real extraction pipeline.
"""

import datetime as dt
import gzip

import pytest

from ocr_spark.sources import synth, warc

TS = dt.datetime(2026, 3, 1, 12, 0, 0)


def _rows(n=6):
    rows = []
    for i in range(n):
        row = synth.make_web_row(i)
        rows.append({"url": row["url"], "warc_ts": TS,
                     "html": row["html"], "text": row["text"],
                     "lang": row["lang"] if not row["html"] else None})
    return rows


# ---------------- pure parsing ----------------

def test_round_trip_response_and_conversion():
    rows = _rows()
    got, skipped = warc.segment_rows(warc.build_warc_bytes(rows))
    assert skipped == 0
    assert len(got) == len(rows)
    for r, g in zip(rows, got):
        assert g["url"] == r["url"]
        assert g["warc_ts"] == TS
        if r["html"]:
            assert g["html"] == r["html"] and g["text"] == ""
        else:
            assert g["html"] == b"" and g["text"] == r["text"]
            assert g["lang"] == r["lang"]


def test_gzip_members_equal_plain():
    rows = _rows()
    gz, _ = warc.segment_rows(warc.build_warc_bytes(rows, True))
    plain, _ = warc.segment_rows(warc.build_warc_bytes(rows, False))
    assert gz == plain


def test_whole_stream_gzip_also_decodes():
    # Some producers gzip the whole segment as one member.
    rows = _rows(3)
    data = gzip.compress(warc.build_warc_bytes(rows, False))
    got, _ = warc.segment_rows(data)
    assert [g["url"] for g in got] == [r["url"] for r in rows]


def test_non_document_records_skipped():
    req = warc._record_bytes(
        [("WARC-Type", "request"),
         ("WARC-Target-URI", "https://x.synth.local/a"),
         ("WARC-Date", "2026-03-01T12:00:00Z")],
        b"GET /a HTTP/1.1\r\n\r\n")
    info = warc._record_bytes(
        [("WARC-Type", "warcinfo"), ("WARC-Date", "2026-03-01T12:00:00Z")],
        b"software: synth")
    rows = _rows(2)
    data = info + req + warc.build_warc_bytes(rows, False)
    got, skipped = warc.segment_rows(data)
    assert skipped == 0
    assert [g["url"] for g in got] == [r["url"] for r in rows]


def test_malformed_record_resync():
    rows = _rows(4)
    recs = [warc.build_warc_bytes([r], False) for r in rows]
    # Corrupt record 1's Content-Length so its parse fails; the reader
    # must resync at record 2's version line and count one skip.
    bad = recs[1].replace(b"Content-Length:", b"Content-Length: junk;", 1)
    got, skipped = warc.segment_rows(recs[0] + bad + recs[2] + recs[3])
    assert skipped >= 1
    urls = [g["url"] for g in got]
    assert rows[0]["url"] in urls and rows[2]["url"] in urls \
        and rows[3]["url"] in urls


def test_negative_content_length_terminates_and_resyncs():
    """Regression (r4 advice, high): a negative Content-Length used to
    move the cursor BACKWARDS and re-yield the same record forever."""
    rows = _rows(3)
    recs = [warc.build_warc_bytes([r], False) for r in rows]
    bad = recs[1].replace(b"Content-Length: ", b"Content-Length: -1", 1)
    got, skipped = warc.segment_rows(recs[0] + bad + recs[2])
    assert skipped >= 1
    urls = [g["url"] for g in got]
    assert rows[0]["url"] in urls and rows[2]["url"] in urls
    # Exactly once each — the old bug re-yielded a record unboundedly.
    assert len(urls) == len(set(urls))


def test_truncated_body_counts_skip_not_corrupt_row():
    """A record whose Content-Length exceeds the remaining bytes (a
    cut-off download) must become a casualty, not a silently truncated
    document row."""
    rows = _rows(2)
    data = warc.build_warc_bytes(rows, False)
    got, skipped = warc.segment_rows(data[:-40])
    assert skipped >= 1
    assert [g["url"] for g in got] == [rows[0]["url"]]


def test_streaming_decode_memory_bounded():
    """Peak decompressed buffering is max(member, record), never the
    whole segment: 32 x 1 MB members must iterate in ~a-member of
    heap, not 32 MB."""
    import tracemalloc

    body = (b"<html><body>" + b"x" * (1 << 20) + b"</body></html>")
    rows = [{"url": f"https://x.synth.local/m{i}", "warc_ts": TS,
             "html": body, "text": "", "lang": None} for i in range(32)]
    data = warc.build_warc_bytes(rows, True)
    tracemalloc.start()
    tracemalloc.reset_peak()
    n = 0
    total = 0
    for rec in warc.iter_warc_records(data):
        if "_skipped" not in rec["headers"]:
            n += 1
            total += len(rec["content"])
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 32 and total > 32 * (1 << 20)
    assert peak < 8 * (1 << 20), f"peak {peak} bytes"


def test_skip_count_sums_once_per_segment(spark, tmp_path):
    """SUM(_warc_skipped) over the frame equals the true casualty
    count: document rows carry 0, one bookkeeping row per lossy
    segment carries its whole count."""
    import pyspark.sql.functions as F
    d = tmp_path / "sumseg"
    d.mkdir()
    good = warc.build_warc_bytes(_rows(3), False)
    bad = warc.build_warc_bytes([_rows(4)[3]], False).replace(
        b"Content-Length:", b"Content-Length: junk;", 1)
    (d / "seg.warc").write_bytes(good + bad)
    df = warc.read_warc(spark, str(d))
    rows = df.collect()
    docs = [r for r in rows if r["url"] is not None]
    book = [r for r in rows if r["url"] is None]
    assert len(docs) == 3 and all(r["_warc_skipped"] == 0 for r in docs)
    assert len(book) == 1 and book[0]["_warc_skipped"] >= 1
    total = df.agg(F.sum("_warc_skipped")).collect()[0][0]
    assert total == book[0]["_warc_skipped"]


def test_member_boundary_before_separator_counts_no_skip():
    """Regression (r4 review): a gzip member that BEGINS with the
    previous record's CRLF separator must not count a phantom casualty
    — the blank-line skip re-runs after every fill."""
    rows = _rows(3)
    recs = [warc.build_warc_bytes([r], False) for r in rows]
    # Move each record's trailing CRLFCRLF to the head of the next
    # member: members 1,2 start with b"\r\n\r\nWARC/".
    members = [gzip.compress(recs[0][:-4]),
               gzip.compress(b"\r\n\r\n" + recs[1][:-4]),
               gzip.compress(b"\r\n\r\n" + recs[2])]
    got, skipped = warc.segment_rows(b"".join(members))
    assert skipped == 0
    assert [g["url"] for g in got] == [r["url"] for r in rows]


def test_truncated_download_counts_one_casualty():
    """Regression (r4 review): a cut-off gzip download (truncated
    member -> truncated record) is ONE casualty, not two."""
    rows = _rows(2)
    data = gzip.compress(warc.build_warc_bytes(rows, False))
    got, skipped = warc.segment_rows(data[:-25])
    assert [g["url"] for g in got] == [rows[0]["url"]]
    assert skipped == 1


def test_http_header_strip_keeps_body_bytes():
    html = b"<html><body>exact \xe2\x82\xac bytes</body></html>"
    data = warc.build_warc_bytes(
        [{"url": "https://x.synth.local/b", "warc_ts": TS,
          "html": html, "text": "", "lang": None}], False)
    got, _ = warc.segment_rows(data)
    assert got[0]["html"] == html


# ---------------- Spark read path ----------------

@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc_segments")
    rows = [dict(synth.make_web_row(i), warc_ts=TS) for i in range(40)]
    for seg in range(2):
        part = [{"url": r["url"], "warc_ts": r["warc_ts"],
                 "html": r["html"], "text": r["text"],
                 "lang": r["lang"] if not r["html"] else None}
                for r in rows[seg * 20:(seg + 1) * 20]]
        (d / f"seg-{seg:05d}.warc.gz").write_bytes(
            warc.build_warc_bytes(part))
    return str(d), rows


def test_read_warc_dataframe(spark, warc_dir):
    d, rows = warc_dir
    df = warc.read_warc(spark, d).orderBy("url")
    got = df.collect()
    assert len(got) == len(rows)
    assert df.columns[:5] == ["url", "warc_ts", "html", "text", "lang"]
    assert all(r["_warc_skipped"] == 0 for r in got)
    by_url = {r["url"]: r for r in got}
    for r in rows:
        g = by_url[r["url"]]
        if r["html"]:
            assert bytes(g["html"]) == r["html"]
        else:
            assert g["text"] == r["text"]


def test_corrupt_gzip_member_degrades_not_raises():
    """A bit-flipped member or trailing garbage keeps every member
    decoded so far and counts a casualty — never an exception."""
    rows = _rows(4)
    members = [gzip.compress(warc.build_warc_bytes([r], False))
               for r in rows]
    flipped = bytearray(members[2])
    flipped[12] ^= 0xFF
    got, skipped = warc.segment_rows(
        b"".join(members[:2]) + bytes(flipped))
    assert skipped >= 1
    assert [g["url"] for g in got] == [r["url"] for r in rows[:2]]
    # Trailing non-gzip padding after valid members.
    got2, skipped2 = warc.segment_rows(b"".join(members[:2]) + b"\x00" * 16)
    assert skipped2 >= 1 and len(got2) == 2


def test_all_malformed_segment_surfaces_bookkeeping_row(spark, tmp_path):
    d = tmp_path / "badseg"
    d.mkdir()
    rec = warc.build_warc_bytes(_rows(1), False)
    (d / "bad.warc").write_bytes(
        rec.replace(b"Content-Length:", b"Content-Length: junk;", 1))
    got = warc.read_warc(spark, str(d)).collect()
    assert len(got) == 1
    assert got[0]["url"] is None and got[0]["_warc_skipped"] >= 1


def test_lf_only_http_envelope_stripped():
    html = b"<html><body>lf-only page</body></html>"
    http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html
    rec = warc._record_bytes(
        [("WARC-Type", "response"),
         ("WARC-Target-URI", "https://x.synth.local/lf"),
         ("WARC-Date", "2026-03-01T12:00:00Z")], http)
    got, _ = warc.segment_rows(rec)
    assert got[0]["html"] == html


def test_job_warc_summary_reports_skips(spark, tmp_path):
    d = tmp_path / "mixseg"
    d.mkdir()
    good = warc.build_warc_bytes(_rows(3), False)
    bad = warc.build_warc_bytes([_rows(4)[3]], False).replace(
        b"Content-Length:", b"Content-Length: junk;", 1)
    (d / "seg.warc").write_bytes(good + bad)
    from ocr_spark import job
    r = job.main(["--warc", str(d), "--table", str(tmp_path / "t"),
                  "--partitions", "2"], spark=spark)
    assert r["processed"] == 3
    assert r["warc_records_skipped"] >= 1


def test_record_offsets_are_lineage_grade():
    """Offsets locate each record in the decompressed stream: strictly
    increasing, first at 0, and each points at a version line."""
    rows = _rows(5)
    data = warc.build_warc_bytes(rows, False)
    got, _ = warc.segment_rows(data)
    offs = [g["offset"] for g in got]
    assert offs[0] == 0
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    for o in offs:
        assert data[o:o + 5] == b"WARC/"


def test_job_reads_warc_segments(spark, warc_dir, tmp_path):
    """The deployment entrypoint ingests WARC segments directly
    (--warc) and commits the same rows a parquet input would."""
    from ocr_spark import job
    d, rows = warc_dir
    table = str(tmp_path / "table")
    r = job.main(["--warc", d, "--table", table, "--partitions", "4"],
                 spark=spark)
    assert r["processed"] == len(rows)
    assert r["committed_rows"] == len(rows)


def test_warc_rows_extract_identically_to_direct_rows(spark, warc_dir):
    """Byte-identical invariant: extraction over WARC-read input equals
    extraction over the same rows fed directly."""
    from ocr_spark.plans.pipeline import run_extraction
    d, rows = warc_dir
    warc_in = warc.read_warc(spark, d).drop("_warc_segment",
                                            "_warc_offset",
                                            "_warc_skipped")
    direct_in = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"] or None, r["text"], r["lang"])
         for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    a = {r["url"]: r["extracted_text"]
         for r in run_extraction(spark, warc_in, run_id="warc").collect()}
    b = {r["url"]: r["extracted_text"]
         for r in run_extraction(spark, direct_in, run_id="direct").collect()}
    assert a == b
    assert sum(1 for v in a.values() if v) == len(rows)


# ---------------- Python Data Source (format("warc")) ----------------

def test_warc_datasource_matches_mapinpandas(spark, warc_dir):
    """spark.read.format('warc') returns the same rows as the
    mapInPandas path — same values, same lineage offsets, same skip
    accounting; only the segment path spelling differs (binaryFile
    reports a file: URI)."""
    import os
    from ocr_spark.sources import warc_datasource
    warc_datasource.register(spark)
    d, rows = warc_dir

    def norm(df):
        return sorted(
            ((r["url"], r["warc_ts"],
              bytes(r["html"]) if r["html"] is not None else None,
              r["text"], r["lang"],
              os.path.basename(r["_warc_segment"]),
              r["_warc_offset"], r["_warc_skipped"])
             for r in df.collect()))

    via_ds = spark.read.format("warc").load(d)
    assert via_ds.schema == warc.read_warc(spark, d).schema
    assert norm(via_ds) == norm(warc.read_warc(spark, d))


def test_warc_datasource_partition_per_segment(spark, warc_dir):
    """Partition planning is segment=task: one input partition per
    file, no shuffle, matching Common Crawl's ~90k-segment layout."""
    from ocr_spark.sources import warc_datasource
    warc_datasource.register(spark)
    d, _ = warc_dir
    df = spark.read.format("warc").load(d)
    assert df.rdd.getNumPartitions() == 2  # warc_dir writes 2 segments


def test_warc_datasource_skip_bookkeeping(spark, tmp_path):
    """A lossy segment yields exactly one NULL-url bookkeeping row so
    SUM(_warc_skipped) is the casualty total, same as read_warc."""
    from pyspark.sql import functions as F
    from ocr_spark.sources import warc_datasource
    warc_datasource.register(spark)
    good = warc.build_warc_bytes(_rows(3), False)
    bad = warc.build_warc_bytes([_rows(4)[3]], False).replace(
        b"WARC/1.0", b"GARBAGE!", 1)
    (tmp_path / "a.warc").write_bytes(good)
    (tmp_path / "b.warc").write_bytes(bad)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.filter("url IS NOT NULL").count() == 3
    assert df.agg(F.sum("_warc_skipped")).collect()[0][0] >= 1
    assert df.filter("url IS NULL").count() == 1


def test_warc_datasource_streaming_incremental(spark, tmp_path):
    """readStream.format('warc'): the offset cursor walks the sorted
    segment listing, so a restart after new segments arrive reads
    exactly the new files (micro-batch = new segments only)."""
    from ocr_spark.sources import warc_datasource
    warc_datasource.register(spark)
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (seg_dir / "seg-00000.warc").write_bytes(
        warc.build_warc_bytes(_rows(6)[:3], False))

    def drain():
        q = (spark.readStream.format("warc").load(str(seg_dir))
             .select("url", "text")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["url"] for r in spark.read.parquet(out).collect()}

    first = drain()
    assert len(first) == 3
    (seg_dir / "seg-00001.warc").write_bytes(
        warc.build_warc_bytes(_rows(6)[3:], False))
    second = drain()
    # The restart appended exactly the NEW segment's rows.
    assert len(second) == 6 and first < second


def test_stream_curate_over_warc_source(spark, tmp_path):
    """Crawl segments curate AS THEY ARRIVE: stream_curate(source=
    'warc') drains WET segments through the quality/lang/dedup gates
    incrementally — the second drain sees only the new segment, and
    bookkeeping rows never reach the gates."""
    import datetime as dt

    from ocr_spark.sources.snapshot import SnapshotTable  # noqa: F401
    from ocr_spark.streaming.jobs import stream_curate

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    ckpt = str(tmp_path / "ck")
    root = str(tmp_path / "tbl")
    ts = dt.datetime(2026, 3, 1)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks away into the quiet evening field with no fuss")
    spam = "\n".join(["buy cheap widgets now"] * 30)

    def seg(name, rows):
        (seg_dir / name).write_bytes(warc.build_warc_bytes(
            [{"url": u, "warc_ts": ts, "html": b"", "text": t,
              "lang": "en"} for u, t in rows], False))

    seg("seg-00000.warc", [("https://w.local/d0", good),
                           ("https://w.local/d1", spam),
                           ("https://w.local/d2", good)])  # in-seg dup
    table = stream_curate(spark, str(seg_dir), root, ckpt,
                          keep_langs=("en",), source="warc")
    assert table.read(spark).count() == 1  # spam gated, dup dropped

    good2 = ("a second perfectly ordinary english document that is "
             "not a duplicate of the first one in any way at all")
    seg("seg-00001.warc", [("https://w.local/d3", good),   # x-seg dup
                           ("https://w.local/d4", good2)])
    table = stream_curate(spark, str(seg_dir), root, ckpt,
                          keep_langs=("en",), source="warc")
    out = table.read(spark)
    assert out.count() == 2
    assert {r["text"] for r in out.collect()} == {good, good2}


def test_warc_datasource_rejects_object_store_uris():
    """The Python Data Source reads local/shared-mount paths only —
    an object-store URI fails loudly with a pointer at read_warc
    instead of planning an empty listing."""
    import pytest as _pt

    from ocr_spark.sources.warc_datasource import _list_segments
    for bad in ("s3a://commoncrawl/crawl-data/seg-*.warc.gz",
                "hdfs://nn:8020/warc", "file://host/x"):
        with _pt.raises(ValueError, match="read_warc"):
            _list_segments(bad)


# ---------------- write_wet sink ----------------

def _sink_input(spark, n=40):
    import pyspark.sql.functions as F
    return (spark.range(n)
            .select(
                F.concat(F.lit("https://s"),
                         F.pmod(F.col("id"), F.lit(7)).cast("string"),
                         F.lit(".example.com/a/"),
                         F.col("id").cast("string")).alias("url"),
                F.to_timestamp(F.lit("2026-03-01 10:00:00")).alias("warc_ts"),
                F.concat(F.lit("body text "),
                         F.col("id").cast("string"),
                         F.lit(" éè")).alias("text"),
                F.when(F.pmod(F.col("id"), F.lit(3)) == 0, F.lit("en"))
                 .otherwise(F.lit(None).cast("string")).alias("lang")))


def test_write_wet_round_trip(spark, tmp_path):
    out = str(tmp_path / "wet")
    df = _sink_input(spark)
    man = warc.write_wet(df, out, num_segments=4).collect()
    assert sum(r.n_records for r in man) == 40
    assert all(r.n_skipped == 0 for r in man)
    back = warc.read_warc(spark, out)
    got = {(r.url, r.warc_ts, r.text, r.lang)
           for r in back.filter("url is not null").collect()}
    want = {(r.url, r.warc_ts, r.text, r.lang) for r in df.collect()}
    assert got == want
    assert back.filter("url is not null").count() == 40


def test_write_wet_deterministic_across_parallelism(spark, tmp_path):
    df = _sink_input(spark, 60)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r.segment: (r.content_md5, r.n_bytes)
          for r in warc.write_wet(
              df.repartition(1), out1, num_segments=3).collect()}
    m2 = {r.segment: (r.content_md5, r.n_bytes)
          for r in warc.write_wet(
              df.repartition(16), out2, num_segments=3).collect()}
    assert m1 == m2
    # the manifest md5 matches the actual file bytes on disk
    import hashlib
    for r in warc.write_wet(df, str(tmp_path / "c"),
                            num_segments=3).collect():
        with open(r.path, "rb") as fh:
            assert hashlib.md5(fh.read()).hexdigest() == r.content_md5


def test_write_wet_null_rows_counted_not_dropped(spark, tmp_path):
    import pyspark.sql.functions as F
    df = _sink_input(spark, 10).withColumn(
        "text", F.when(F.col("url").endswith("/3"),
                       F.lit(None).cast("string"))
                 .otherwise(F.col("text")))
    man = warc.write_wet(df, str(tmp_path / "w"), num_segments=2).collect()
    assert sum(r.n_skipped for r in man) == 1
    assert sum(r.n_records for r in man) == 9


def test_write_wet_md5_bucket_mode_matches_formula(spark, tmp_path):
    from ocr_spark.operators.dedup import md5_hash31
    import pyspark.sql.functions as F
    df = _sink_input(spark, 30)
    man = warc.write_wet(df, str(tmp_path / "m"), num_segments=5,
                         bucket_mode="md5")
    want = (df.groupBy(F.pmod(md5_hash31(F.col("url")), F.lit(5))
                       .cast("int").alias("segment"))
            .agg(F.count("*").alias("n_records"),
                 F.sum(F.length("text")).alias("n_chars")))
    got = {(r.segment, r.n_records, r.n_chars)
           for r in man.select("segment", "n_records", "n_chars").collect()}
    assert got == {(r.segment, r.n_records, r.n_chars)
                   for r in want.collect()}
