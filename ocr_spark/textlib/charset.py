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

_META_TAG_RE = re.compile(rb"<meta\b([^>]{0,512})", re.IGNORECASE)
_ATTR_RE = re.compile(
    rb"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))")
_CONTENT_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?\s*([a-zA-Z0-9._\-]+)",
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


def _declared_label(body: bytes) -> str | None:
    """The meta-declared encoding label from the 1 KB ASCII prescan,
    normalized and validated (None when absent/unusable). Faithful to
    the WHATWG prescan's attribute semantics: a bare ``charset``
    ATTRIBUTE on a <meta> tag counts anywhere, but ``charset=`` inside
    a ``content`` value only counts when that tag also carries
    ``http-equiv=content-type`` — so a page whose description merely
    MENTIONS a charset is never mis-sniffed."""
    for m in _META_TAG_RE.finditer(body[:1024]):
        attrs: dict[bytes, bytes] = {}
        for am in _ATTR_RE.finditer(m.group(1)):
            name = am.group(1).lower()
            if name not in attrs:
                attrs[name] = am.group(2) or am.group(3) or am.group(4) or b""
        raw = attrs.get(b"charset")
        if raw is None and \
                attrs.get(b"http-equiv", b"").lower() == b"content-type":
            cm = _CONTENT_CHARSET_RE.search(attrs.get(b"content", b""))
            raw = cm.group(1) if cm else None
        if raw is None:
            continue
        label = raw.decode("ascii", errors="replace").strip().lower()
        label = _LABEL_MAP.get(label, label)
        try:
            # bytes.decode rejects non-TEXT codecs (zlib/hex/base64),
            # unlike codecs.lookup — both sniff functions must agree.
            # Probe a real byte: empty bytes short-circuit before the
            # codec lookup; errors="replace" so width-sensitive codecs
            # (utf-32) validate instead of raising on the short probe.
            b"A".decode(label, "replace")
            return label
        except (LookupError, ValueError):
            continue  # unknown label: keep scanning / fall through
    return None


def sniff_encoding(body: bytes) -> str:
    """The encoding the WHATWG steps select for this byte stream."""
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le-bom"
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be-bom"
    label = _declared_label(body)
    if label is not None:
        return label
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
    label = _declared_label(body)
    if label is not None:
        return body.decode(label, errors="replace"), label
    try:
        return body.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return body.decode("windows-1252", errors="replace"), "windows-1252"
