"""Deterministic pathology WARC fixture builder.

The sandbox has no network, so a literal Common Crawl excerpt cannot
be fetched; this builds the honest substitute — a byte-level WARC
segment carrying the pathology CLASSES a real CC segment exhibits and
a purely synthetic corpus cannot produce by accident:

  transport/framing:
    * warcinfo / request / metadata / revisit records interleaved
      with responses (the reader must pass over them)
    * one gzip member holding TWO records (legal; CC convention is
      one-per-member but readers must not assume it)
    * gzip members with FNAME / FEXTRA / FCOMMENT header fields set
    * inter-record garbage bytes (resync + skip-count)
    * a record with an unparseable Content-Length (skip + resync)
    * the final member truncated mid-record (one casualty, counted
      once — the double-count trap fixed in r4)
  HTTP envelope:
    * LF-only header blocks (non-compliant servers, stored verbatim)
    * folded (continuation-line) headers
    * 404 and 301 responses (rows still emitted; curation judges)
    * chunked transfer-coding remnants left in the stored body
  charset:
    * meta-declared windows-1252 with real 0x93/0x94/0xE9 bytes
    * a charset LIE: UTF-8 bytes declared iso-8859-1 (the WHATWG
      prescan must honor the declaration -> deterministic mojibake)
    * Shift_JIS with its meta declaration; UTF-8 BOM; UTF-16LE BOM
  markup:
    * unclosed tags, attribute soup, comments containing tags,
      CDATA-wrapped script, a self-closing JSON-LD script, entity
      soup with malformed entities
    * non-HTML payloads: a modeled %PDF document (the cascade's PDF
      branch) and raw binary (PNG) under text/html
  bulk: ~160 sentence-shaped English pages so the corpus is multi-MB
    decompressed and survives the curation gates end-to-end.

All hosts are *.example.com / *.synth.local. URLs follow the repo's
/webpage/ (and /salary_slip/) path-classification convention.

Usage: python tools/make_pathology_warc.py [out.warc.gz]
Writes tests/fixtures/cc_pathology.warc.gz by default; the committed
fixture must byte-match a regeneration (pinned by
tests/test_warc_pathology.py::test_fixture_is_reproducible).
"""

from __future__ import annotations

import os
import struct
import sys
import uuid
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATE = "2026-03-01T12:00:00Z"

# -- deterministic filler (LCG hash words, sentence-shaped like synth)

_STOP = ("the", "and", "are", "near", "of", "with")


def _hash_word(h: int) -> str:
    s = []
    for _ in range(6):
        s.append(chr(97 + h % 26))
        h //= 26
    return "".join(s)


def filler_text(i: int, n_lines: int) -> str:
    x = (i * 6364136223846793005 + 1442695040888963407) % 2 ** 64
    lines = []
    for j in range(n_lines):
        ws = []
        for _ in range(5):
            x = (x * 6364136223846793005 + 1442695040888963407) % 2 ** 64
            ws.append(_hash_word(x >> 33))
        lines.append(f"The {ws[0]} report and the {ws[1]} {ws[2]} are "
                     f"near the {ws[3]} archive {ws[4]}.")
    return "\n".join(lines)


def page_html(title: str, text: str) -> bytes:
    paras = "".join(f"<p>{ln}</p>" for ln in text.split("\n"))
    return (f'<html><head><title>{title}</title></head><body>'
            f'<nav><a href="/">Home</a></nav><article>{paras}</article>'
            f'<footer>Copyright 2026.</footer></body></html>').encode()


# -- HTTP + WARC framing ----------------------------------------------------


def http_response(body: bytes, status: str = "200 OK",
                  ctype: str = "text/html; charset=utf-8",
                  extra: tuple[str, ...] = (), sep: bytes = b"\r\n") -> bytes:
    lines = [f"HTTP/1.1 {status}", f"Content-Type: {ctype}",
             f"Content-Length: {len(body)}", *extra]
    return sep.join(ln.encode("latin-1") for ln in lines) + sep + sep + body


def warc_record(rtype: str, content: bytes, url: str | None = None,
                extra: tuple[tuple[str, str], ...] = (),
                content_length: str | None = None) -> bytes:
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{rtype}:{url}:{len(content)}")
    h = [("WARC-Type", rtype)]
    if url:
        h.append(("WARC-Target-URI", url))
    h += [("WARC-Date", DATE), ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
          *extra,
          ("Content-Length", content_length
           if content_length is not None else str(len(content)))]
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in h)
    return head.encode() + b"\r\n" + content + b"\r\n\r\n"


def gzip_member(raw: bytes, fname: bytes | None = None,
                fextra: bytes | None = None,
                fcomment: bytes | None = None) -> bytes:
    """A gzip member with optional header fields (RFC 1952) — CC tools
    emit plain members, but FNAME/FEXTRA/FCOMMENT are legal and a
    reader gets them from any archive touched by desktop gzip."""
    flg = ((4 if fextra else 0) | (8 if fname else 0)
           | (16 if fcomment else 0))
    out = bytearray(b"\x1f\x8b\x08" + bytes([flg]) + b"\x00\x00\x00\x00"
                    b"\x00\x03")
    if fextra:
        out += struct.pack("<H", len(fextra)) + fextra
    if fname:
        out += fname + b"\x00"
    if fcomment:
        out += fcomment + b"\x00"
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    out += co.compress(raw) + co.flush()
    out += struct.pack("<II", zlib.crc32(raw) & 0xFFFFFFFF,
                       len(raw) & 0xFFFFFFFF)
    return bytes(out)


# -- the segment ------------------------------------------------------------

U = "https://news.example.com/webpage"

#: (name, url) of every pathology document a test may want to address.
PATHOLOGY_URLS = {
    "baseline": f"{U}/baseline.html",
    "charset_lie": f"{U}/charset-lie.html",
    "win1252": f"{U}/win1252.html",
    "shift_jis": f"{U}/tokyo.html",
    "bom_utf8": f"{U}/bom8.html",
    "bom_utf16le": f"{U}/bom16.html",
    "lf_only": f"{U}/lf-only.html",
    "folded": f"{U}/folded.html",
    "chunked": f"{U}/chunked.html",
    "not_found": f"{U}/gone.html",
    "redirect": f"{U}/moved.html",
    "tag_soup": f"{U}/soup.html",
    "binary_png": f"{U}/actually-a-png.html",
    "empty": f"{U}/empty.html",
    "pdf": "https://files.example.com/app7/salary_slip/1001.pdf",
    "wet_en": "https://wet.example.com/webpage/wet-en.html",
    "wet_de": "https://wet.example.com/webpage/wet-de.html",
    # real image payloads built by the repo's own from-scratch
    # encoders — the crawl->media-featurize loop
    "img_png": "https://img.example.com/media/a.png",
    "img_jpeg": "https://img.example.com/media/b.jpg",
    "img_gif": "https://img.example.com/media/c.gif",
}

N_BULK = 220
EXPECTED_SKIPS = 3          # garbage resync + bad Content-Length + truncation


def bulk_url(i: int) -> str:
    return f"https://bulk{i % 7}.example.com/webpage/page-{i}.html"


def build_members() -> list[bytes]:
    from ocr_spark.sources.payload import make_pdf_payload
    P = PATHOLOGY_URLS
    members: list[bytes] = []

    info = (b"software: pathology-fixture-builder/1.0\r\n"
            b"format: WARC File Format 1.0\r\n")
    members.append(gzip_member(warc_record("warcinfo", info,
                                           content_length=None)))

    # request + response pair (request must contribute no row)
    req = (f"GET /webpage/baseline.html HTTP/1.1\r\n"
           f"Host: news.example.com\r\n\r\n").encode()
    members.append(gzip_member(
        warc_record("request", req, url=P["baseline"])))
    members.append(gzip_member(warc_record(
        "response",
        http_response(page_html("Baseline", filler_text(1, 12))),
        url=P["baseline"]), fname=b"baseline.dat"))

    # charset lie: UTF-8 bytes, declared iso-8859-1 (prescan must obey
    # the declaration; WHATWG maps the label to windows-1252 ->
    # deterministic mojibake for the e-acute)
    lie_body = ('<html><head><meta charset="iso-8859-1">'
                '<title>Lie</title></head><body><article>'
                '<p>The café price label survives transport.</p>'
                '<p>' + filler_text(2, 8).replace("\n", "</p><p>")
                + '</p></article></body></html>').encode("utf-8")
    members.append(gzip_member(warc_record(
        "response", http_response(lie_body, ctype="text/html"),
        url=P["charset_lie"])))

    # true windows-1252 with curly quotes 0x93/0x94 and 0xE9
    win_body = (b'<html><head><meta http-equiv="Content-Type" '
                b'content="text/html; charset=windows-1252">'
                b'<title>Quotes</title></head><body><article>'
                b'<p>\x93Smart\x94 caf\xe9 quotes remain legible.</p><p>'
                + filler_text(3, 8).replace("\n", "</p><p>").encode("ascii")
                + b'</p></article></body></html>')
    members.append(gzip_member(warc_record(
        "response",
        http_response(win_body, ctype="text/html; charset=windows-1252"),
        url=P["win1252"]), fextra=b"AB\x04\x00test"))

    # Shift_JIS with declaration
    sj_text = "東京のニュース記事"
    sj_body = ('<html><head><meta charset="shift_jis"><title>SJ</title>'
               '</head><body><article><p>' + sj_text + '</p><p>'
               + filler_text(4, 6).replace("\n", "</p><p>")
               + '</p></article></body></html>').encode("shift_jis")
    members.append(gzip_member(warc_record(
        "response",
        http_response(sj_body, ctype="text/html; charset=shift_jis"),
        url=P["shift_jis"])))

    # BOM pages
    bom8 = b"\xef\xbb\xbf" + page_html("Bom8", filler_text(5, 8))
    members.append(gzip_member(warc_record(
        "response", http_response(bom8), url=P["bom_utf8"])))
    bom16 = b"\xff\xfe" + page_html(
        "Bom16", filler_text(6, 8)).decode("ascii").encode("utf-16-le")
    members.append(gzip_member(warc_record(
        "response", http_response(bom16), url=P["bom_utf16le"])))

    # LF-only HTTP envelope
    members.append(gzip_member(warc_record(
        "response",
        http_response(page_html("LFOnly", filler_text(7, 10)), sep=b"\n"),
        url=P["lf_only"])))

    # folded header (continuation line)
    members.append(gzip_member(warc_record(
        "response",
        http_response(page_html("Folded", filler_text(8, 10)),
                      extra=("X-Served-By: cache-fra-1\r\n "
                             "cache-ams-2 (folded continuation)",)),
        url=P["folded"])))

    # chunked remnants: stored body still carries the chunk framing
    inner = page_html("Chunked", filler_text(9, 10))
    half = len(inner) // 2
    chunked = (f"{half:x}\r\n".encode() + inner[:half] + b"\r\n"
               + f"{len(inner) - half:x}\r\n".encode() + inner[half:]
               + b"\r\n0\r\n\r\n")
    members.append(gzip_member(warc_record(
        "response",
        http_response(chunked, extra=("Transfer-Encoding: chunked",)),
        url=P["chunked"])))

    # 404 + 301
    members.append(gzip_member(warc_record(
        "response",
        http_response(page_html("Not Found", "This page has gone away."),
                      status="404 Not Found"),
        url=P["not_found"])))
    members.append(gzip_member(warc_record(
        "response",
        http_response(b"<html><body>Moved</body></html>",
                      status="301 Moved Permanently",
                      extra=("Location: https://news.example.com/webpage/"
                             "baseline.html",)),
        url=P["redirect"])))

    # tag soup incl. self-closing JSON-LD script + CDATA + entity mess
    soup = (b'<html><head><script type="application/ld+json"/>'
            b'<script type="application/ld+json">{"@type":"NewsArticle",'
            b'"headline":"Soup"}</script>'
            b'<script>/*<![CDATA[*/ var x = "<p>not content</p>"; '
            b'/*]]>*/</script></head>'
            b'<body><article><p>Unclosed paragraph with &nbsp;&#x27;'
            b'&broken; entities<p>Attribute <span class=bare data-x = 1>'
            b'soup</span> survives<!-- a comment with <p>tags</p> -->'
            b'<table><tr><td><p>' +
            filler_text(10, 8).replace("\n", "</p><p>").encode("ascii") +
            b'</p></td></table></body>')
    members.append(gzip_member(warc_record(
        "response", http_response(soup), url=P["tag_soup"])))

    # PNG bytes served as text/html (mislabeled binary)
    png_ish = (b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8)
    members.append(gzip_member(warc_record(
        "response", http_response(png_ish), url=P["binary_png"])))

    # empty body
    members.append(gzip_member(warc_record(
        "response", http_response(b""), url=P["empty"])))

    # modeled PDF document through the cascade's PDF branch
    pdf = make_pdf_payload([{"text_rows": [
        "ACME Industries Pvt Ltd", "Salary Slip for March 2026",
        "Name: Ravi Kumar", "Net Pay: 52,340.00",
        "Account Number: 123456789012"]}])
    members.append(gzip_member(warc_record(
        "response", http_response(pdf, ctype="application/pdf"),
        url=P["pdf"])))

    # real decodable image payloads (PNG / baseline JPEG / GIF) from
    # the repo's own encoders, served with image/* content types
    import numpy as np

    from ocr_spark.textlib import gifcodec, imagecodec, jpegcodec
    rng = np.random.RandomState(42)
    png_img = rng.randint(0, 256, size=(24, 24, 3)).astype(np.uint8)
    members.append(gzip_member(warc_record(
        "response",
        http_response(imagecodec.encode_png(png_img, filter_type=-1),
                      ctype="image/png"),
        url=P["img_png"])))
    jpg_img = rng.randint(0, 256, size=(24, 24, 3)).astype(np.uint8)
    members.append(gzip_member(warc_record(
        "response",
        http_response(jpegcodec.encode_jpeg_baseline(jpg_img),
                      ctype="image/jpeg"),
        url=P["img_jpeg"])))
    gif_pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    gif_idx = rng.randint(0, 16, size=(24, 24)).astype(np.uint8)
    members.append(gzip_member(warc_record(
        "response",
        http_response(gifcodec.encode_gif([gif_idx], gif_pal),
                      ctype="image/gif"),
        url=P["img_gif"])))

    # revisit + metadata records (no rows)
    members.append(gzip_member(warc_record(
        "revisit", b"", url=P["baseline"],
        extra=(("WARC-Refers-To", "<urn:uuid:0>"),))))
    members.append(gzip_member(warc_record(
        "metadata", b"fetchTimeMs: 120\r\n", url=P["baseline"])))

    # conversion (WET-style) records with language tags
    members.append(gzip_member(warc_record(
        "conversion", filler_text(11, 20).encode(), url=P["wet_en"],
        extra=(("WARC-Identified-Content-Language", "en,de"),))))
    members.append(gzip_member(warc_record(
        "conversion", ("Deutscher Beispieltext.\n"
                       + filler_text(12, 10)).encode(),
        url=P["wet_de"],
        extra=(("WARC-Identified-Content-Language", "de"),))))

    # a response record with NO target URI (no row, no skip)
    members.append(gzip_member(warc_record(
        "response", http_response(page_html("NoUri", "orphan")))))

    # pathology: garbage bytes then a record IN THE SAME member
    good_after = warc_record(
        "response",
        http_response(page_html("AfterGarbage", filler_text(13, 10))),
        url=f"{U}/after-garbage.html")
    members.append(gzip_member(
        b"this is not a warc record and desyncs the stream\r\n"
        + good_after))

    # pathology: unparseable Content-Length, then resync to a good one
    bad_cl = warc_record("response", http_response(b"<html>x</html>"),
                         url=f"{U}/bad-length.html",
                         content_length="banana")
    good2 = warc_record(
        "response",
        http_response(page_html("AfterBadLength", filler_text(14, 10))),
        url=f"{U}/after-bad-length.html")
    members.append(gzip_member(bad_cl + good2))

    # one member holding TWO records
    two = (warc_record("response",
                       http_response(page_html("TwoA", filler_text(15, 9))),
                       url=f"{U}/two-a.html")
           + warc_record("response",
                         http_response(page_html("TwoB",
                                                 filler_text(16, 9))),
                         url=f"{U}/two-b.html"))
    members.append(gzip_member(two, fcomment=b"double member"))

    # bulk corpus
    for i in range(N_BULK):
        body = page_html(f"Bulk {i}", filler_text(100 + i, 110 + i % 60))
        members.append(gzip_member(warc_record(
            "response", http_response(body), url=bulk_url(i))))

    # final member truncated mid-record: exactly one casualty
    trunc = gzip_member(warc_record(
        "response",
        http_response(page_html("Truncated", filler_text(999, 30))),
        url=f"{U}/truncated.html"))
    members.append(trunc[:int(len(trunc) * 0.6)])
    return members


#: responses with a URI (20 singles incl. the three image payloads and
#: after-garbage/after-bad-length + 2 in the two-record member + bulk)
#: + 2 conversions; the truncated final record, the request/revisit/
#: metadata/warcinfo records, and the no-URI response contribute rows=0.
EXPECTED_ROWS = 20 + 2 + N_BULK + 2


def main(out_path: str | None = None) -> str:
    out = out_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "cc_pathology.warc.gz")
    data = b"".join(build_members())
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(data)
    print(f"{out}: {len(data)} bytes compressed")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
