"""Aadhaar-letter parsing (ref utils/aadhaar_parser.go:14-355) and the
QR XML fast path (ref dto/aadhaar_dto.go:51-129,
service/aadhaar_service.go:151-187).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from .bank import normalize_lines
from .goutil import byte_len, title_word

_DOB_LABELED = re.compile(r"(?i)dob\s*[:\-]?\s*([0-9]{2}[/-][0-9]{2}[/-][0-9]{4})")
_DOB_ANY = re.compile(r"\b([0-9]{2}[/-][0-9]{2}[/-][0-9]{4})\b")
_NON_ALPHA = re.compile(r"[^A-Za-z\s]+")
_MULTISPACE = re.compile(r"\s+")
_AADHAAR_12 = re.compile(r"\b(\d{4})\s+(\d{4})\s+(\d{4})\b")
_ANY_4 = re.compile(r"\b(\d{4})\b")
_ADDR_AFTER_LABEL = re.compile(r"(?i)address\s*[:\-]?\s*(.+)")
_LEADING_JUNK = re.compile(r"^[^A-Za-z0-9]+")
_COMMA_SPACE = re.compile(r"\s*,\s*")

_BAD_NAME_TOKENS = ("government", "india", "authority", "unique",
                    "identification", "aadhaar", "address", "pin", "code")

_ADDR_GENERIC_TOKENS = ("aadhaar is proof", "date of birth", "it should be used",
                        "authentication", "online", "offline xml",
                        "unique and secure")


def extract_dob_line_based(lines: list[str]) -> tuple[str, int]:
    """extractDOBLineBased (ref utils/aadhaar_parser.go:52-71): returns
    (dob, line index) — the index anchors name/gender extraction."""
    for i, line in enumerate(lines):
        m = _DOB_LABELED.search(line)
        if m:
            return m.group(1), i
    for i, line in enumerate(lines):
        m = _DOB_ANY.search(line)
        if m:
            return m.group(1), i
    return "", -1


def clean_name_from_line(line: str) -> str:
    """cleanNameFromLine (ref utils/aadhaar_parser.go:110-136)."""
    line = _NON_ALPHA.sub(" ", line)
    line = _MULTISPACE.sub(" ", line.strip())
    if line == "":
        return ""
    parts = line.split()
    if not parts:
        return ""
    parts = parts[:min(3, len(parts))]
    return " ".join(title_word(p) for p in parts)


def is_likely_person_name(name: str) -> bool:
    """isLikelyPersonName (ref utils/aadhaar_parser.go:140-181)."""
    if name == "":
        return False
    words = name.split()
    if len(words) < 2 or len(words) > 4:
        return False
    lower = name.lower()
    if any(t in lower for t in _BAD_NAME_TOKENS):
        return False
    if sum(1 for c in name if c.isalpha()) < 4:
        return False
    # Go: len(w) counts bytes.
    return all(byte_len(w) >= 2 for w in words)


def extract_name_near_dob(lines: list[str], dob_idx: int) -> str:
    """extractNameNearDOB (ref utils/aadhaar_parser.go:76-107)."""
    if dob_idx <= 0 or dob_idx >= len(lines):
        return ""
    i = dob_idx - 1
    while i >= 0 and dob_idx - i <= 3:
        candidate = lines[i].strip()
        if candidate != "":
            name = clean_name_from_line(candidate)
            if is_likely_person_name(name):
                return name
        i -= 1
    # Fallback: window ±5 around the DOB line.
    start = max(0, dob_idx - 5)
    end = min(len(lines), dob_idx + 5)
    for i in range(start, end):
        name = clean_name_from_line(lines[i])
        if is_likely_person_name(name):
            return name
    return ""


def extract_gender_near_dob(lines: list[str], dob_idx: int) -> str:
    """extractGenderNearDOB (ref utils/aadhaar_parser.go:185-212):
    female is checked before male per line ('female' contains 'male')."""
    start = max(0, dob_idx - 2) if dob_idx > 0 else 0
    end = min(len(lines), dob_idx + 5)
    for i in range(start, end):
        lower = lines[i].lower()
        if "female" in lower:
            return "Female"
        if "male" in lower:
            return "Male"
        if "महिला" in lower:
            return "Female"
        if "पुरुष" in lower:
            return "Male"
    return ""


def extract_aadhaar_last4(text: str) -> str:
    """extractAadhaarLast4 (ref utils/aadhaar_parser.go:216-232)."""
    m = _AADHAAR_12.search(text)
    if m:
        return m.group(3)
    all4 = _ANY_4.findall(text)
    if not all4:
        return ""
    return all4[-1]


def clean_address_line(line: str) -> str:
    """cleanAddressLine (ref utils/aadhaar_parser.go:319-355)."""
    line = _LEADING_JUNK.sub("", line).strip()
    if line == "":
        return ""
    line = _MULTISPACE.sub(" ", line)
    line = _COMMA_SPACE.sub(", ", line)
    lower = line.lower()
    if any(t in lower for t in _ADDR_GENERIC_TOKENS):
        return ""
    if sum(1 for c in line if c.isalnum()) < 4:
        return ""
    return line


def extract_address_block(lines: list[str]) -> str:
    """extractAddressBlock (ref utils/aadhaar_parser.go:238-315)."""
    start_idx = -1
    for i, line in enumerate(lines):
        if "address" in line.lower():
            start_idx = i
            break
    if start_idx == -1:
        for i, line in enumerate(lines):
            lower = line.lower()
            if any(t in lower for t in ("s/o", "d/o", "c/o", "w/o")):
                start_idx = i
                break
    if start_idx == -1:
        return ""

    addr_lines: list[str] = []
    addr_first = lines[start_idx]
    if "address" in addr_first.lower():
        m = _ADDR_AFTER_LABEL.search(addr_first)
        if m:
            cl = clean_address_line(m.group(1))
            if cl != "":
                addr_lines.append(cl)

    i = start_idx + 1
    while i < len(lines) and len(addr_lines) < 6:
        line = lines[i].strip()
        i += 1
        if line == "":
            continue
        lower = line.lower()
        if ("aadhaar is proof" in lower
                or "aadhaar is proof of identity" in lower
                or "it should be used with verification" in lower
                or "authentication" in lower):
            break
        cl = clean_address_line(line)
        if cl != "":
            addr_lines.append(cl)

    if not addr_lines:
        return ""
    seen: set[str] = set()
    final = []
    for l in addr_lines:
        if l not in seen:
            seen.add(l)
            final.append(l)
    return ", ".join(final)


def parse_aadhaar_from_text(text: str) -> dict:
    """ParseAadhaarFromText (ref utils/aadhaar_parser.go:14-31)."""
    lines = normalize_lines(text)
    dob, dob_idx = extract_dob_line_based(lines)
    return {
        "name": extract_name_near_dob(lines, dob_idx),
        "dob": dob,
        "gender": extract_gender_near_dob(lines, dob_idx),
        "address": extract_address_block(lines),
        "aadhaar_last4": extract_aadhaar_last4(text),
        "source": "ocr",
    }


# ---------------- QR fast path ----------------

_QR_ADDR_PARTS = [
    ("co", "C/O "), ("house", ""), ("street", ""), ("lm", ""), ("loc", ""),
    ("vtc", ""), ("po", "PO "), ("subdist", ""), ("dist", ""), ("state", ""),
    ("pc", ""),
]


def parse_aadhaar_qr_xml(qr_xml: str) -> dict | None:
    """QR XML → response struct (ref service/aadhaar_service.go:151-187,
    dto/aadhaar_dto.go:72-129). Returns None on parse failure so the
    caller falls through to OCR, like the Go error path."""
    try:
        root = ET.fromstring(qr_xml)
    except ET.ParseError:
        return None
    if root.tag != "PrintLetterBarcodeData":
        return None
    a = root.attrib

    parts = []
    for attr, prefix in _QR_ADDR_PARTS:
        v = a.get(attr, "")
        if v != "":
            parts.append(prefix + v)

    uid = a.get("uid", "")
    last4 = uid[-4:] if len(uid) >= 4 else uid
    dob = a.get("dob", "") or a.get("yob", "")

    return {
        "name": a.get("name", ""),
        "dob": dob,
        "gender": a.get("gender", ""),
        "address": ", ".join(parts),
        "aadhaar_last4": last4,
        "source": "qr",
    }
