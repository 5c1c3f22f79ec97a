"""WHATWG-style charset sniffing (textlib/charset.py) + its effect on
the webpage extraction branch: non-UTF-8 pages must extract their
article text correctly through the real pipeline.
"""

import codecs

from ocr_spark.operators.cascade import extract_record
from ocr_spark.textlib.charset import sniff_decode, sniff_encoding

ARTICLE = "Ceci est un résumé — déjà vu café"
PAGE = ("<html><head>{head}</head><body><article><p>"
        + ARTICLE + "</p></article></body></html>")


def test_bom_beats_meta():
    raw = codecs.BOM_UTF8 + PAGE.format(
        head='<meta charset="iso-8859-1"/>').encode("utf-8")
    text, enc = sniff_decode(raw)
    assert enc == "utf-8-sig"
    assert ARTICLE in text and "﻿" not in text


def test_utf16_boms():
    for enc_in, want in (("utf-16-le", "utf-16-le-bom"),
                         ("utf-16-be", "utf-16-be-bom")):
        bom = (codecs.BOM_UTF16_LE if "le" in enc_in
               else codecs.BOM_UTF16_BE)
        raw = bom + PAGE.format(head="").encode(enc_in)
        text, enc = sniff_decode(raw)
        assert enc == want and ARTICLE in text


def test_meta_charset_latin1_maps_to_cp1252():
    raw = PAGE.format(head='<meta charset="ISO-8859-1"/>')\
        .encode("latin-1", errors="replace")
    text, enc = sniff_decode(raw)
    assert enc == "windows-1252"
    assert "résumé" in text


def test_meta_http_equiv_form():
    head = ('<meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1252"/>')
    raw = PAGE.format(head=head).encode("cp1252")
    assert sniff_encoding(raw) == "windows-1252"
    assert ARTICLE in sniff_decode(raw)[0]


def test_declared_utf16_treated_as_utf8():
    # WHATWG: an ASCII prescan can only have matched on a non-UTF-16
    # stream, so a utf-16 label means utf-8.
    raw = PAGE.format(head='<meta charset="utf-16"/>').encode("utf-8")
    assert sniff_encoding(raw) == "utf-8"


def test_unknown_label_falls_through():
    raw = PAGE.format(head='<meta charset="x-bogus-enc"/>').encode("utf-8")
    assert sniff_encoding(raw) == "utf-8"


def test_charset_mention_in_content_not_sniffed():
    # WHATWG prescan: charset= inside content only counts with
    # http-equiv=content-type — a description MENTIONING a charset
    # must not hijack the page encoding.
    head = ('<meta name="description" '
            'content="how to set charset=koi8-r in html"/>')
    raw = PAGE.format(head=head).encode("utf-8")
    assert sniff_encoding(raw) == "utf-8"
    assert "résumé" in sniff_decode(raw)[0]


def test_non_text_codec_label_rejected_by_both_forms():
    # codecs.lookup accepts bytes-to-bytes codecs like zlib/hex;
    # neither sniff function may select one.
    for label in ("zlib", "hex", "base64"):
        raw = PAGE.format(head=f'<meta charset="{label}"/>').encode("utf-8")
        assert sniff_encoding(raw) == "utf-8"
        text, enc = sniff_decode(raw)
        assert enc == "utf-8" and ARTICLE in text


def test_page_metadata_uses_charset_sniff(spark):
    from ocr_spark.operators.webpage import page_metadata
    html = ('<html><head><meta charset="iso-8859-1"/>'
            '<title>Café Guide</title></head>'
            '<body><h1>x</h1></body></html>').encode("cp1252")
    df = spark.createDataFrame([("https://x/1", bytearray(html))],
                               "url string, html binary")
    row = page_metadata(df).collect()[0]
    assert row["title"] == "Café Guide"


def test_undeclared_utf8_and_cp1252():
    utf8 = PAGE.format(head="").encode("utf-8")
    assert sniff_encoding(utf8) == "utf-8"
    cp = PAGE.format(head="").encode("cp1252")
    assert sniff_encoding(cp) == "windows-1252"
    assert "déjà" in sniff_decode(cp)[0]


def test_ascii_pages_unchanged():
    raw = b"<html><body><p>plain ascii page body text</p></body></html>"
    text, enc = sniff_decode(raw)
    assert enc == "utf-8" and text == raw.decode("ascii")


def test_webpage_branch_extracts_cp1252_article():
    html = PAGE.format(head='<meta charset="iso-8859-1"/>')\
        .encode("cp1252")
    out = extract_record("https://x.synth.local/a/webpage/1.html",
                         html, "", "webpage")
    assert out["error"] is None
    assert ARTICLE in out["extracted_text"]


def test_webpage_branch_extracts_utf16_article():
    html = codecs.BOM_UTF16_LE + PAGE.format(head="").encode("utf-16-le")
    out = extract_record("https://x.synth.local/a/webpage/2.html",
                         html, "", "webpage")
    assert out["error"] is None
    assert ARTICLE in out["extracted_text"]
