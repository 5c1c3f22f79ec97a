"""WHATWG-style encoding sniffing for web-page bytes (public
algorithm: the HTML Standard's "determining the character encoding"
steps, simplified to the byte-stream-only signals available in a batch
pipeline — no Content-Type header survives into a WARC-stripped html
column).

Order of signals:
  1. BOM (UTF-8 / UTF-16 LE / UTF-16 BE) — wins over everything.
  2. ASCII prescan of the first 1024 bytes for ``<meta charset=...>``
     or ``<meta http-equiv=content-type content="...charset=...">``.
     Per the standard: a declared ``utf-16`` is treated as utf-8 (the
     prescan only works on ASCII-compatible streams, so a real UTF-16
     page can't have produced the match), and ``iso-8859-1`` maps to
     windows-1252.
  3. Strict UTF-8 attempt (the de-facto dominant web encoding).
  4. windows-1252 fallback (the standard's default for most locales).

Decoding always finishes with errors="replace" so one mojibake page
never poisons a partition.
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._\-]+)",
    re.IGNORECASE)

# WHATWG label normalizations relevant to the fallback chain.
_LABEL_MAP = {
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "utf-16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
    "utf16": "utf-8",
}


def sniff_encoding(body: bytes) -> str:
    """The encoding the WHATWG steps select for this byte stream."""
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le-bom"
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be-bom"
    m = _META_RE.search(body[:1024])
    if m:
        label = m.group(1).decode("ascii", errors="replace").lower()
        label = _LABEL_MAP.get(label, label)
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass  # unknown label: fall through to content sniffing
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def sniff_decode(body: bytes) -> tuple[str, str]:
    """Decode page bytes -> (text, encoding_used). Single decode pass
    on the dominant path: an undeclared stream's strict utf-8 attempt
    IS the returned text when it succeeds (hot path: one decode, one
    1 KB regex — not the sniff-then-redecode double scan)."""
    if body.startswith(codecs.BOM_UTF8):
        return body.decode("utf-8-sig", errors="replace"), "utf-8-sig"
    if body.startswith(codecs.BOM_UTF16_LE):
        return body[2:].decode("utf-16-le", errors="replace"), "utf-16-le-bom"
    if body.startswith(codecs.BOM_UTF16_BE):
        return body[2:].decode("utf-16-be", errors="replace"), "utf-16-be-bom"
    m = _META_RE.search(body[:1024])
    if m:
        label = m.group(1).decode("ascii", errors="replace").lower()
        label = _LABEL_MAP.get(label, label)
        try:
            return body.decode(label, errors="replace"), label
        except LookupError:
            pass  # unknown label: fall through to content sniffing
    try:
        return body.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return body.decode("windows-1252", errors="replace"), "windows-1252"
